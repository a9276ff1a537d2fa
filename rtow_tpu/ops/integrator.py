"""Wavefront path-tracing integrator.

The reference estimates radiance with bounded recursion per ray
(``ray_color``, reference src/render.cpp:112-129).  Recursion is
anathema to XLA; here the whole wavefront advances together through an
iterative bounce loop (``lax.fori_loop``) carrying masked per-lane state
(origin, direction, time, throughput, radiance, alive) — the classic
wavefront formulation of the megakernel.

Semantics replicated exactly (SURVEY.md §3.2):
 * miss  -> radiance += throughput * sky gradient; lane dies,
 * hit with exhausted bounce budget -> black (the reference checks depth
   *after* the hit test, src/render.cpp:113-115: budget ``D`` allows D
   scatters and D+1 hit tests),
 * scatter -> throughput *= attenuation, ray moves to the hit point.

The loop is differentiable w.r.t. scene geometry/materials (grads flow
through hit positions, normals and attenuations; the discrete hit/miss
and material choices are treated as piecewise-constant).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.camera import Rays
from ..models.materials import scatter, sky_color
from ..models.scene import Scene
from ..utils import rng
from . import intersect


class WavefrontState(NamedTuple):
    origin: jax.Array  # (L, 3)
    direction: jax.Array  # (L, 3)
    time: jax.Array  # (L,)
    throughput: jax.Array  # (L, 3)
    radiance: jax.Array  # (L, 3)
    alive: jax.Array  # (L,) bool


NearestHitFn = Callable[..., "intersect.HitRecord"]


def trace(
    scene: Scene,
    rays: Rays,
    key: jax.Array,
    max_depth: int,
    nearest_hit: Optional[NearestHitFn] = None,
    cull_backfaces: bool = True,
) -> jax.Array:
    """Trace a wavefront to completion -> per-lane radiance (L, 3).

    ``max_depth`` is the reference's ``max_child_rays`` bounce budget
    (src/render.h:17).  ``nearest_hit`` defaults to the brute-force sweep;
    the BVH traversal or a Pallas kernel slot in through the same
    signature.
    """
    if nearest_hit is None:
        nearest_hit = intersect.nearest_hit_bruteforce

    dtype = rays.origin.dtype
    lanes = rays.time.shape

    init = WavefrontState(
        origin=rays.origin,
        direction=rays.direction,
        time=rays.time,
        throughput=jnp.ones((*lanes, 3), dtype=dtype),
        radiance=jnp.zeros((*lanes, 3), dtype=dtype),
        alive=jnp.ones(lanes, dtype=bool),
    )

    def bounce(st: WavefrontState, i: jax.Array):
        rec = nearest_hit(
            scene, st.origin, st.direction, st.time, cull_backfaces=cull_backfaces
        )

        missed = st.alive & ~rec.hit
        radiance = st.radiance + jnp.where(
            missed[..., None], st.throughput * sky_color(st.direction), 0.0
        )

        # A hit on the final iteration has no scatter budget left -> black
        # (reference src/render.cpp:114-115).
        can_scatter = st.alive & rec.hit & (i < max_depth)

        sc = scatter(jax.random.fold_in(key, i), st.direction, rec)
        origin = jnp.where(can_scatter[..., None], rec.point, st.origin)
        direction = jnp.where(can_scatter[..., None], sc.direction, st.direction)
        throughput = jnp.where(
            can_scatter[..., None], st.throughput * sc.attenuation, st.throughput
        )
        alive = can_scatter
        return (
            WavefrontState(origin, direction, st.time, throughput, radiance, alive),
            None,
        )

    # D scatters require D+1 intersection tests (depth checked after the
    # hit test in the reference).  lax.scan (not while_loop) so the loop
    # is reverse-mode differentiable with per-bounce checkpointing.
    final, _ = jax.lax.scan(bounce, init, jnp.arange(max_depth + 1))
    return final.radiance
