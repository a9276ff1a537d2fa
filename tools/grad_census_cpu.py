#!/usr/bin/env python
"""CPU transport census for the gradient-kernel drain (VERDICT r4 #3).

The grad bounce kernels dispatch EVERY tile every bounce; round 5
added an all-dead tile skip.  This probe predicts, on CPU, what that
skip plus a lane sort can reclaim at the bench shapes, by tracing the
cover scene with the production estimator's transport (BVH nearest hit
+ the real material dispatch) and recording per bounce:

  - live-lane fraction (the drain itself),
  - all-dead TILE share in the grad kernel's pixel-major static lane
    order (what the round-5 skip reclaims),
  - all-dead tile share after the wavefront sort (what sort_lanes=True
    would additionally reclaim),
  - the residual live-lane occupancy of non-skipped tiles (the bound
    on what any tile-skip scheme leaves on the table).

Usage: python tools/grad_census_cpu.py [width] [spp] [depth]
(defaults: the grad bench 400x267 spp16 depth8, ~1.7M lanes — use
width 200 for a quick pass).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from rtow_tpu.config import Config
from rtow_tpu.models.builders import cover_scene
from rtow_tpu.models.camera import camera_rays, pixel_coords
from rtow_tpu.models.materials import scatter
from rtow_tpu.ops import bvh
from rtow_tpu.ops.wavefront_sorted import TILE, sort_keys

W = int(sys.argv[1]) if len(sys.argv) > 1 else 400
SPP = int(sys.argv[2]) if len(sys.argv) > 2 else 16
DEPTH = int(sys.argv[3]) if len(sys.argv) > 3 else 8
H = int(W / 1.5)


def main():
    cfg = Config(image_width=W, aspect_ratio=1.5, samples_per_pixel=SPP,
                 max_child_rays=DEPTH)
    scene, cam = cover_scene(cfg)
    nearest = bvh.make_nearest_hit(scene)

    L_raw = W * H * SPP
    L = -(-L_raw // TILE) * TILE
    pix = jnp.repeat(jnp.arange(W * H, dtype=jnp.int32), SPP)
    key = jax.random.key(0)
    k_pix, k_cam, key = jax.random.split(key, 3)
    s, t = pixel_coords(W, H, k_pix, pix, dtype=cam.origin.dtype)
    rays = camera_rays(cam, k_cam, s, t)

    def pad(x, fill=0.0):
        fillv = jnp.full((L - L_raw,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, fillv])

    o = pad(rays.origin)
    d = pad(rays.direction, 1.0)
    tm = pad(rays.time)
    alive = pad(jnp.ones((L_raw,), bool), False)

    # Scene bounds for the sort key (sphere block boxes not needed —
    # use the primitive extent).
    c = scene.spheres.center0
    r = jnp.abs(scene.spheres.radius)[:, None]
    bmin = (c - r).min(axis=0)
    bmax = (c + r).max(axis=0)
    inv_ext = 1.0 / jnp.maximum(bmax - bmin, 1e-6)

    n_tiles = L // TILE

    @jax.jit
    def bounce(o, d, tm, alive, key):
        rec = nearest(scene, o, d, tm)
        k_s, k_n = jax.random.split(key)
        sc = scatter(k_s, d, rec)
        # Every material scatters in this framework (metal keeps the
        # reference's no-horizon-absorb semantics); lanes die on miss
        # or depth only.
        live = alive & rec.hit
        return rec.point, sc.direction, live, k_n

    def stats(alive_np, order=None):
        a = alive_np if order is None else alive_np[order]
        tiles = a.reshape(n_tiles, TILE)
        any_live = tiles.any(axis=1)
        dead_share = 1.0 - any_live.mean()
        occ_live = (tiles[any_live].mean() if any_live.any() else 0.0)
        return dead_share, occ_live

    print(f"cover {W}x{H} spp{SPP} depth{DEPTH}: {L} lanes, "
          f"{n_tiles} tiles")
    print("bounce  live%   dead-tiles(pixel-major)  occ(rest)   "
          "dead-tiles(sorted)  occ(rest)")
    tot_pm = tot_sorted = tot_live = 0.0
    for it in range(DEPTH + 1):
        alive_np = np.asarray(alive)
        livef = alive_np.mean()
        dp, op_ = stats(alive_np)
        k = sort_keys(o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1],
                      d[:, 2], jnp.asarray(alive_np).astype(jnp.int32),
                      bmin, inv_ext)
        order = np.argsort(np.asarray(k), kind="stable")
        ds, os_ = stats(alive_np, order)
        print(f"{it:5d} {livef:7.1%} {dp:14.1%} {op_:14.1%} "
              f"{ds:14.1%} {os_:14.1%}")
        tot_pm += 1.0 - dp
        tot_sorted += 1.0 - ds
        tot_live += livef
        p, nd, alive2, key = bounce(o, d, tm, alive, key)
        o = jnp.where(alive[:, None], p, o)
        d = jnp.where(alive[:, None], nd, d)
        alive = alive2

    n = DEPTH + 1
    print(f"\ntile-bounces dispatched: classic {n:.2f}x, with dead-skip "
          f"{tot_pm:.2f}x, dead-skip+sort {tot_sorted:.2f}x "
          f"(mean live {tot_live / n:.1%})")
    print(f"predicted sweep-dispatch reduction: skip alone "
          f"{1 - tot_pm / n:.1%}, skip+sort {1 - tot_sorted / n:.1%}")


if __name__ == "__main__":
    main()
