"""Top-level renderer — the TPU-native analogue of ``rt::render``
(reference src/render.cpp:135-191).

The reference fans the sample budget out over ``std::async`` threads,
each re-rendering the whole frame, and sums the per-thread images.  Here
the (pixel × sample) lane space is flattened, chunked to bound device
memory, traced as a wavefront per chunk inside one jitted step, and
scatter-added into the framebuffer.  Device parallelism lives in
``rtow_tpu.parallel`` (mesh-sharded lanes + psum), not here.

Unlike the reference, spp accounting is exact — no silent
``spp / nthreads`` floor division (src/render.cpp:174,185 quirk, fixed
per SURVEY.md quirks ledger).
"""
from __future__ import annotations

import functools
import sys
import time as _time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .models.camera import Camera, camera_rays, pixel_coords
from .models.scene import Scene
from .ops import integrator, intersect
from .utils.dtypes import REAL


def _chunk_step(
    scene: Scene,
    camera: Camera,
    framebuffer: jax.Array,
    key: jax.Array,
    lane_start: jax.Array,
    *,
    chunk: int,
    spp: int,
    lane_count: int,
    width: int,
    height: int,
    max_depth: int,
    nearest_hit: Optional[Callable],
    cull_backfaces: bool,
) -> jax.Array:
    """Trace one chunk of (pixel, sample) lanes and accumulate radiance."""
    dtype = framebuffer.dtype
    lane_ids = lane_start + jnp.arange(chunk, dtype=jnp.int64 if lane_count > 2**31 else jnp.int32)
    valid = lane_ids < lane_count
    lane_safe = jnp.minimum(lane_ids, lane_count - 1)
    pixel_ids = (lane_safe // spp).astype(jnp.int32)

    k_pix, k_cam, k_trace = jax.random.split(key, 3)
    s, t = pixel_coords(width, height, k_pix, pixel_ids, dtype=dtype)
    rays = camera_rays(camera, k_cam, s, t)
    radiance = integrator.trace(
        scene,
        rays,
        k_trace,
        max_depth,
        nearest_hit=nearest_hit,
        cull_backfaces=cull_backfaces,
    )
    radiance = jnp.where(valid[..., None], radiance, 0.0)
    return framebuffer.at[pixel_ids].add(radiance)


def render(
    scene: Scene,
    camera: Camera,
    cfg: Config,
    key: Optional[jax.Array] = None,
    nearest_hit: Optional[Callable] = None,
    cull_backfaces: bool = True,
    progress: bool = False,
) -> np.ndarray:
    """Render the mean-radiance image (H, W, 3) float, row 0 = top.

    Single-device path; ``rtow_tpu.parallel.render_sharded`` is the
    multi-chip version.
    """
    width, height = cfg.image_width, cfg.image_height
    spp = cfg.samples_per_pixel
    n_pixels = width * height
    lane_count = n_pixels * spp
    chunk = min(cfg.rays_per_batch, lane_count)
    n_chunks = -(-lane_count // chunk)

    if key is None:
        key = jax.random.key(cfg.seed)

    step = jax.jit(
        functools.partial(
            _chunk_step,
            chunk=chunk,
            spp=spp,
            lane_count=lane_count,
            width=width,
            height=height,
            max_depth=cfg.max_child_rays,
            nearest_hit=nearest_hit,
            cull_backfaces=cull_backfaces,
        ),
        donate_argnums=(2,),
    )

    fb = jnp.zeros((n_pixels, 3), dtype=REAL)
    t_start = _time.perf_counter()
    for c in range(n_chunks):
        fb = step(scene, camera, fb, jax.random.fold_in(key, c), c * chunk)
        if progress:
            print(f"\rChunks remaining: {n_chunks - c - 1} ", end="", file=sys.stderr, flush=True)
    fb.block_until_ready()
    elapsed = _time.perf_counter() - t_start
    if progress:
        primary_mrays = lane_count / elapsed / 1e6
        print(
            f"\nDone in {int(elapsed * 1000)}ms "
            f"({primary_mrays:.2f} Mprimary-rays/s)",
            file=sys.stderr,
        )

    mean = np.asarray(fb, dtype=np.float64).reshape(height, width, 3) / spp
    return mean
