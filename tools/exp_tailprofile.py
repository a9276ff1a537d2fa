#!/usr/bin/env python
"""Per-bounce tail profile of the sorted-wavefront path (one chunk).

Replays _trace_lane_per_sample's loop at Python level on ONE chunk of
the knot bench (bounce_step_pallas(stats=True) + the per-bounce sort),
timing every bounce and printing live lanes / live tiles / blocks /
supers / hypers swept — the instrument behind ROADMAP #1's "45% of
device time in the tail" claim, re-run after the interleaved-key and
ladder changes.

Usage: python tools/exp_tailprofile.py [65k|360k] [chunk_pixels]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from make_mesh import make_knot  # noqa: E402

from rtow_tpu.models.camera import camera_rays, make_camera, pixel_coords  # noqa: E402
from rtow_tpu.models.scene import SceneBuilder  # noqa: E402
from rtow_tpu.ops.pallas_megakernel import TILE, bounce_step_pallas  # noqa: E402
from rtow_tpu.ops.wavefront_sorted import _scene_tables, sort_keys  # noqa: E402


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "65k"
    ppc = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    morton_px = os.environ.get("RTOW_EXP_MORTON", "0") == "1"
    segments, rings = (256, 128) if which == "65k" else (600, 300)
    verts, faces = make_knot(segments, rings)
    b = SceneBuilder()
    b.add_mesh(verts[faces], b.add_lambertian((0.6, 0.5, 0.4)))
    knot = b.build()
    cam = make_camera(lookfrom=(0.0, 0.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      fov_degrees=45.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=3.0)
    W = H = 400
    spp, max_depth = 64, 20
    tables, counts, bmin, inv_ext = _scene_tables(knot)
    n_blocks, n_tri_blocks, n_super = counts
    print(f"{which}: {n_tri_blocks} blocks, {n_super} supers; chunk "
          f"{ppc}px x {spp}spp = {ppc * spp} lanes, morton_px={morton_px}",
          flush=True)

    # Chunk pixel ids: scanline run (production) or Morton-tiled square.
    if morton_px:
        rows = np.arange(H, dtype=np.uint32)[:, None]
        cols = np.arange(W, dtype=np.uint32)[None, :]

        def spread(x):
            x = (x | (x << 8)) & 0x00FF00FF
            x = (x | (x << 4)) & 0x0F0F0F0F
            x = (x | (x << 2)) & 0x33333333
            x = (x | (x << 1)) & 0x55555555
            return x

        code = (spread(cols) | (spread(rows) << 1)).ravel()
        perm = np.argsort(code)
        # chunk containing the image-center pixel (on-knot)
        c = int(np.where(perm == (H // 2) * W + W // 2)[0][0]) // ppc
        pix = jnp.asarray(perm[c * ppc:(c + 1) * ppc], jnp.int32)
    else:
        pix = jnp.asarray(np.arange(19 * ppc, 20 * ppc), jnp.int32)

    L_raw = ppc * spp
    L = -(-L_raw // TILE) * TILE
    key = jax.random.fold_in(jax.random.key(0), 19)
    k_pix, k_cam = jax.random.split(key)
    lane_pix = jnp.repeat(pix, spp, total_repeat_length=L_raw)
    s, t = pixel_coords(W, H, k_pix, lane_pix, dtype=jnp.float32)
    rays = camera_rays(cam, k_cam, s, t)

    def pad(x, fill=0.0):
        return jnp.concatenate(
            [x.astype(jnp.float32), jnp.full((L - L_raw,), fill, jnp.float32)])

    lane_id = jnp.arange(L, dtype=jnp.int32)
    zero = jnp.zeros((L,), jnp.float32)
    state = (
        pad(rays.origin[:, 0]), pad(rays.origin[:, 1]), pad(rays.origin[:, 2]),
        pad(rays.direction[:, 0]), pad(rays.direction[:, 1]),
        pad(rays.direction[:, 2], fill=1.0), pad(rays.time),
        zero + 1.0, zero + 1.0, zero + 1.0, zero, zero, zero,
        (lane_id < L_raw).astype(jnp.int32),
        jnp.zeros((L,), jnp.int32), lane_id,
    )

    @jax.jit
    def dosort(st):
        keys = sort_keys(st[0], st[1], st[2], st[3], st[4], st[5],
                         st[13], bmin, inv_ext)
        return jax.lax.sort((keys,) + st, dimension=0, num_keys=1)[1:]

    step = jax.jit(lambda st, it: bounce_step_pallas(
        st, it, jnp.int32(317), jnp.int32(max_depth), tables,
        n_blocks=n_blocks, n_tri_blocks=n_tri_blocks, n_super=n_super,
        stats=True))

    # warm-up compile
    jax.block_until_ready(dosort(state))
    jax.block_until_ready(step(state, jnp.int32(0))[0])

    tot = 0.0
    tail = 0.0
    for it in range(max_depth + 1):
        t0 = time.perf_counter()
        state = dosort(state)
        jax.block_until_ready(state)
        t_sort = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, stats = step(state, jnp.int32(it))
        jax.block_until_ready(state)
        t_step = time.perf_counter() - t0
        st = np.asarray(stats)
        live = int((np.asarray(state[13]) > 0).sum())
        live_tiles = int((st[:, 3] > 0).sum())
        tot += t_sort + t_step
        if it >= 3:
            tail += t_sort + t_step
        print(f"b{it:2d}: live {live:7d} tiles {live_tiles:4d} "
              f"sort {t_sort * 1e3:6.1f}ms step {t_step * 1e3:7.1f}ms "
              f"blocks {int(st[:, 0].sum()):6d} supers {int(st[:, 1].sum()):5d} "
              f"hypers {int(st[:, 2].sum()):4d} "
              f"blk/livetile {st[:, 0].sum() / max(live_tiles, 1):6.1f}",
              flush=True)
        if live == 0:
            break
    print(f"total {tot:.3f}s, bounces>=3 {tail:.3f}s = {tail / tot:.0%}")


if __name__ == "__main__":
    main()
