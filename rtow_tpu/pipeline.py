"""Backend/parallelism dispatch for rendering.

Picks the intersection backend (brute-force fused sweep, stackless BVH,
or the Pallas megakernel) and the execution layout (single device vs
mesh-sharded) from a Config.  Keeps `render.py` (the scheduler) free of
policy.
"""
from __future__ import annotations

import functools
import sys
import time as _time
from typing import Optional

import numpy as np

from .config import Config
from .models.camera import Camera
from .models.scene import Scene
from .render import render


def pick_nearest_hit(scene: Scene, cfg: Config):
    """Choose the nearest-hit implementation for this scene/config."""
    if cfg.use_bvh and scene.n_triangles > 64:
        from .ops import bvh

        nearest = bvh.make_nearest_hit(scene)
        if cfg.verbose:
            from .utils.profiling import bvh_quality

            built = bvh.build_bvh(scene)
            print(f"BVH quality (stupid_volume): {bvh_quality(built):.3f}",
                  file=sys.stderr)
        return nearest
    return None  # integrator defaults to the fused brute-force sweep


def pallas_supported(scene: Scene, cfg: Config) -> bool:
    """The persistent megakernel covers sphere scenes and small meshes
    whose whole block table is VMEM-resident; larger meshes take the
    sorted-wavefront megakernel path (wavefront_supported).
    "auto" selects a kernel whenever the default device is a real TPU."""
    import jax

    from .ops.wavefront_sorted import WAVEFRONT_MIN_TRIS

    if scene.n_primitives == 0 or scene.n_triangles > WAVEFRONT_MIN_TRIS:
        return False
    if getattr(scene, "has_image", False):
        return False  # texel gathers serialize on the VPU; jnp path only
    if cfg.backend == "pallas":
        return True
    return cfg.backend == "auto" and jax.devices()[0].platform == "tpu"


def wavefront_supported(scene: Scene, cfg: Config) -> bool:
    """Large meshes route through the sorted-wavefront megakernel:
    bounce-synchronous lanes re-sorted by spatial key between bounces,
    so the per-tile block cull keeps working after rays diverge."""
    import jax

    from .ops.wavefront_sorted import WAVEFRONT_MIN_TRIS

    if scene.n_triangles <= WAVEFRONT_MIN_TRIS:
        return False
    if getattr(scene, "has_image", False):
        return False  # texel gathers serialize on the VPU; jnp path only
    if cfg.backend == "pallas":
        return True
    return cfg.backend == "auto" and jax.devices()[0].platform == "tpu"


def _pool_knobs() -> tuple:
    """Trace-time pool-scheduler env knobs, read here so they join the
    jit cache keys below: _kernel reads RTOW_POOL/RTOW_POOL_K/
    RTOW_POOL_CHUNK at trace time, so without them in the key a pool
    toggle after the first render would silently reuse the previously
    traced scheduler (ADVICE r4)."""
    import os

    return (os.environ.get("RTOW_POOL", "1"),
            os.environ.get("RTOW_POOL_K", "4"),
            os.environ.get("RTOW_POOL_CHUNK", "16"))


@functools.lru_cache(maxsize=8)
def _banded_pallas_fn(width: int, height: int, band_tiles: int,
                      roulette: bool = False, pool_knobs: tuple = ()):
    """Jitted tile-band megakernel call (one compile serves every band)."""
    import jax

    from .ops.pallas_megakernel import render_blocks_pallas

    def fn(scene, camera, seed, spp, max_depth, tile0):
        return render_blocks_pallas(
            scene, camera, seed, width=width, height=height, spp=spp,
            max_depth=max_depth, tile0=tile0, n_tiles_local=band_tiles,
            roulette=roulette,
        )

    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def _whole_frame_pallas_fn(width: int, height: int, roulette: bool,
                           pool_knobs: tuple = ()):
    """Jitted whole-frame megakernel step (non-progress path): keeps the
    scene->table build on-device instead of eager tunnel round trips —
    measured ~10% of the spp128 bench before jitting."""
    import jax

    from .ops.pallas_megakernel import render_spheres_pallas

    def fn(scene, camera, seed, spp, max_depth):
        return render_spheres_pallas(
            scene, camera, seed, width=width, height=height, spp=spp,
            max_depth=max_depth, roulette=roulette,
        )

    return jax.jit(fn)


def render_pallas(
    scene: Scene,
    camera: Camera,
    cfg: Config,
    seed: Optional[int] = None,
    progress: bool = False,
) -> np.ndarray:
    """Whole-frame render through the Pallas megakernel.

    With ``progress`` the frame is issued as ~10 sequential tile bands
    with a carriage-return ticker between them (the reference's
    scanlines-remaining ticker, src/render.cpp:154); the extra
    dispatches cost ~30ms each through the tunnel — a few percent of a
    full-frame render."""
    import jax
    import jax.numpy as jnp

    from .ops.pallas_megakernel import (
        LANES, TILE_ROWS, render_spheres_pallas, unblock_image,
    )

    width, height = cfg.image_width, cfg.image_height
    spp = cfg.samples_per_pixel
    if seed is None:
        seed = cfg.seed

    tiles_x = -(-width // LANES)
    tiles_y = -(-height // TILE_ROWS)
    tiles_total = tiles_x * tiles_y
    t0 = _time.perf_counter()
    if progress and tiles_total >= 20:
        n_bands = 10
        band_tiles = -(-tiles_total // n_bands)
        fn = _banded_pallas_fn(width, height, band_tiles,
                               cfg.russian_roulette, _pool_knobs())
        parts = []
        for band in range(n_bands):
            out = fn(scene, camera, jnp.int32(seed), jnp.int32(spp),
                     jnp.int32(cfg.max_child_rays),
                     jnp.int32(band * band_tiles))
            jax.block_until_ready(out)
            parts.append(out)
            rows_done = min((band + 1) * band_tiles * TILE_ROWS // tiles_x,
                            height)
            print(f"\rScanlines remaining: {height - rows_done}   ",
                  end="" if rows_done < height else "\n",
                  file=sys.stderr, flush=True)
        rows = tiles_total * TILE_ROWS
        r = jnp.concatenate([p[0] for p in parts])[:rows]
        g = jnp.concatenate([p[1] for p in parts])[:rows]
        b = jnp.concatenate([p[2] for p in parts])[:rows]
        rad = unblock_image(r, g, b, width=width, height=height)
    else:
        import jax.numpy as jnp

        fn = _whole_frame_pallas_fn(width, height, cfg.russian_roulette,
                                    _pool_knobs())
        rad = fn(scene, camera, jnp.int32(seed), jnp.int32(spp),
                 jnp.int32(cfg.max_child_rays))
        rad.block_until_ready()
    elapsed = _time.perf_counter() - t0
    if progress:
        from .utils.profiling import RenderStats

        stats = RenderStats(elapsed, width * height, spp, cfg.max_child_rays,
                            backend="pallas")
        print(stats.summary(), file=sys.stderr)
    return np.asarray(rad, dtype=np.float64).reshape(height, width, 3) / spp


def render_auto(
    scene: Scene,
    camera: Camera,
    cfg: Config,
    key=None,
    progress: bool = False,
) -> np.ndarray:
    """Render with the best available backend for the config."""
    import jax

    from .utils.profiling import trace_profile

    with trace_profile(cfg.profile_dir):
        return _render_auto(scene, camera, cfg, key, progress)


def _render_auto(
    scene: Scene,
    camera: Camera,
    cfg: Config,
    key=None,
    progress: bool = False,
) -> np.ndarray:
    import jax

    if cfg.n_devices > 1 and len(jax.devices()) > 1:
        if pallas_supported(scene, cfg):
            # Parallel-by-default megakernel path (the reference fans out
            # by default too, src/render.cpp:172-175): devices own
            # contiguous image-tile ranges and run the fused kernel.
            from .parallel.sharded import render_sharded_pallas

            return render_sharded_pallas(scene, camera, cfg, progress=progress)
        if wavefront_supported(scene, cfg):
            from .parallel.sharded import render_sharded_wavefront

            return render_sharded_wavefront(scene, camera, cfg, key=key,
                                            progress=progress)
        from .parallel.sharded import render_sharded

        nearest = pick_nearest_hit(scene, cfg)
        return render_sharded(scene, camera, cfg, key=key, nearest_hit=nearest,
                              progress=progress)
    if wavefront_supported(scene, cfg):
        from .ops.wavefront_sorted import render_wavefront

        return render_wavefront(scene, camera, cfg, key=key, progress=progress)
    if pallas_supported(scene, cfg):
        return render_pallas(scene, camera, cfg, progress=progress)
    nearest = pick_nearest_hit(scene, cfg)
    return render(scene, camera, cfg, key=key, nearest_hit=nearest, progress=progress)
