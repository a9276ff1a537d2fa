#!/usr/bin/env python
"""Roofline for the GRADIENT kernels (VERDICT r4 #3).

Decomposes the grad-forward gap vs the production forward kernel
(BENCH_r04: grad fwd 9.66 Mrays/s at 400x267/spp16/d8 vs ~20-27 for
the forward persistent kernel on sphere workloads) with three
instruments, all at the bench shapes:

1. depth-prefix timing: jit fwd at max_depth 0/1/2/4/6/8 — segment
   times per added bounce.  A flat per-bounce cost against a decaying
   live-lane count indicts dead-lane sweep work.
2. live-lane census: drive _bounce_fwd_impl one bounce at a time and
   read the alive flags — per-bounce live fraction, plus the share of
   tiles that are ALL-dead (skippable) in pixel-major order vs after a
   sort_keys lane compaction.
3. fwd+bwd ratio at each depth (the creeping grad_fwdbwd_ratio).

Usage: python tools/grad_roofline.py [--sorted]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from rtow_tpu.config import Config
from rtow_tpu.models.builders import cover_scene
from rtow_tpu.ops.pallas_grad import (
    loss_and_grad_kernel, render_pixels_kernel,
)

W, H, SPP, DEPTH = 400, 267, 16, 8
TILE = 1024


def scene_variants(scene, n):
    """``n`` copies of ``scene``, each with a distinct O(1e-6) radius
    perturbation — bit-distinct device inputs with identical cost."""
    import jax.tree_util as jtu

    out = []
    for i in range(n):
        eps = 1e-6 * (i + 1)
        out.append(jtu.tree_map(lambda x, e=eps: x * (1.0 + e)
                                if x.dtype == jnp.float32 else x, scene))
    return out


def med_time(fn, scenes, repeats=3):
    """Median of ``repeats`` timed calls, each on a DISTINCT scene copy.

    The tunneled chip serves a repeated bit-identical jitted call in
    ~0.1 ms (a result-cache fast path — observed as the sporadic 3-4x
    "outlier" since round 2, and as a persistent whole-ladder corruption
    in the round-5 sorted run).  Feeding each timed call a perturbed
    scene copy keeps the executable identical (compile-cache-friendly)
    but the input distinct, so every timing is a real device execution.
    """
    jax.block_until_ready(fn(scenes[0]))  # warm-up/compile
    ts = []
    for i in range(repeats):
        s = scenes[1 + i % (len(scenes) - 1)]
        t0 = time.perf_counter()
        jax.block_until_ready(fn(s))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    sort_lanes = "--sorted" in sys.argv
    cfg = Config(image_width=W, aspect_ratio=1.5, samples_per_pixel=SPP,
                 max_child_rays=DEPTH)
    scene, cam = cover_scene(cfg)
    pix = jnp.arange(W * H, dtype=jnp.int32)
    target = jnp.zeros((W * H, 3), jnp.float32)
    key = jax.random.key(0)
    lanes = W * H * SPP

    # 1+3. depth-prefix timing, fwd and fwd+bwd.
    print(f"grad roofline: cover {W}x{H} spp{SPP} sort_lanes={sort_lanes}, "
          f"{lanes / 1e6:.2f}M lanes ({lanes // TILE} tiles)")
    depths = [0, 1, 2, 4, 6, 8]
    tf_prev = tb_prev = 0.0
    d_prev = 0
    variants = scene_variants(scene, 4)
    for d in depths:
        fwd = jax.jit(lambda s, d=d: render_pixels_kernel(
            s, cam, key, pix, width=W, height=H, spp=SPP, max_depth=d,
            sort_lanes=sort_lanes))
        lg = jax.jit(lambda s, d=d: loss_and_grad_kernel(
            s, cam, key, target, pix, width=W, height=H, spp=SPP,
            max_depth=d, sort_lanes=sort_lanes))
        tf = med_time(fwd, variants)
        tb = med_time(lg, variants)
        seg = (tf - tf_prev) / max(d - d_prev, 1) * 1e3
        print(f"depth {d}: fwd {tf * 1e3:7.1f} ms "
              f"({lanes / tf / 1e6:6.2f} Mrays/s), fwd+bwd {tb * 1e3:7.1f} ms "
              f"(x{tb / tf:4.2f}); marginal fwd {seg:6.1f} ms/bounce")
        tf_prev, tb_prev, d_prev = tf, tb, d

    # 2. live-lane census per bounce (pixel-major vs sorted compaction).
    from rtow_tpu.ops import pallas_grad as pg
    from rtow_tpu.models.camera import camera_rays, pixel_coords
    from rtow_tpu.ops.pallas_megakernel import SPHERE_BLOCK
    from rtow_tpu.ops.pallas_grad import _bounce_fwd_impl
    from rtow_tpu.ops.wavefront_sorted import sort_keys

    tbl, boxes = pg.build_sphere_table(scene)
    n_blocks = tbl.shape[0] // SPHERE_BLOCK
    tri = jnp.zeros((128, 16), jnp.float32)
    tri_boxes = jnp.zeros((1, 8), jnp.float32)
    tri_sup = jnp.zeros((1, 8), jnp.float32)
    tri_hyp = jnp.zeros((1, 8), jnp.float32)
    lights = jnp.zeros((1, 14), jnp.float32)
    statics = (n_blocks, 0, 0, 0, True, False, None, False, (), (), 0)

    L_raw = W * H * SPP
    L = -(-L_raw // TILE) * TILE
    lane_pix = jnp.repeat(pix, SPP, total_repeat_length=L_raw)
    k_pix, k_cam = jax.random.split(key)
    s, t = pixel_coords(W, H, k_pix, lane_pix, dtype=cam.origin.dtype)
    rays = camera_rays(cam, k_cam, s, t)

    def pad(x, fill=0.0):
        return jnp.concatenate(
            [x.astype(jnp.float32),
             jnp.full((L - L_raw,), fill, jnp.float32)])

    lane_id = jnp.arange(L, dtype=jnp.int32)
    zero = jnp.zeros((L,), jnp.float32)
    cont = (pad(rays.origin[:, 0]), pad(rays.origin[:, 1]),
            pad(rays.origin[:, 2]), pad(rays.direction[:, 0]),
            pad(rays.direction[:, 1]), pad(rays.direction[:, 2], fill=1.0),
            pad(rays.time), zero + 1.0, zero + 1.0, zero + 1.0,
            zero, zero, zero)
    ints = ((lane_id < L_raw).astype(jnp.int32), jnp.zeros((L,), jnp.int32),
            lane_id)

    bmin = jax.lax.stop_gradient(boxes[:n_blocks, 0:3]).min(axis=0)
    bmax = jax.lax.stop_gradient(boxes[:n_blocks, 3:6]).max(axis=0)
    inv_ext = 1.0 / jnp.maximum(bmax - bmin, 1e-6)

    step = jax.jit(lambda c, i, it: _bounce_fwd_impl(
        c, i, tbl, boxes, tri, tri_boxes, tri_sup, tri_hyp, lights,
        statics, (it, jnp.int32(0), jnp.int32(DEPTH)))[0])

    n_tiles = L // TILE
    print(f"\nper-bounce live census ({n_tiles} tiles):")
    print("bounce  live%   all-dead tiles (pixel-major)   (sorted)")
    for it in range(DEPTH + 1):
        alive = np.asarray(ints[0]) > 0
        livef = alive.mean()
        dead_pm = (~alive.reshape(n_tiles, TILE)).all(axis=1).mean()
        k = np.asarray(sort_keys(cont[0], cont[1], cont[2], cont[3],
                                 cont[4], cont[5], ints[0], bmin, inv_ext))
        order = np.argsort(k, kind="stable")
        dead_s = (~alive[order].reshape(n_tiles, TILE)).all(axis=1).mean()
        print(f"{it:5d} {livef:7.1%} {dead_pm:15.1%} {dead_s:22.1%}")
        cont, ints = step(cont, ints, jnp.int32(it))


if __name__ == "__main__":
    main()
