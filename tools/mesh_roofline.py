#!/usr/bin/env python
"""Mesh-path roofline: sorted-wavefront sweep share + Gpairs/s (VERDICT r3 #2).

Does for ``wavefront_sorted`` what tools/roofline.py did for the cover
kernel.  Three measurements on the bench knots (400x400, spp 64,
depth 20 — bench.py's mesh65k/mesh360k shapes):

1. whole-frame production time (median) -> Mrays/s, matches bench.py;
2. a stats re-trace (bounce_step_pallas stats=True through
   trace_wavefront_sorted) -> exact block sweeps (sub-tile-split
   scaled), super/hyper descends, tile-iterations, live-lane and
   live-tile occupancy, per ladder level and per chunk;
3. a trip-count PREFIX profile of the heaviest chunks: the SAME
   production computation re-run at pinned ladder trip prefixes
   (fixed_trips), so consecutive (time, pairs) increments give the
   attained pair rate PER BOUNCE SEGMENT — including the straggler
   tail — without an ablation that changes liveness.  (A nosweep
   ablation was tried first and measured degenerate: with sweeps
   removed every lane dies at bounce 0 and the replay costs ~0.)

The pair-rate ceiling reference: the cover roofline measured the fused
production SPHERE sweep at ~42 Gpairs/s (~30 flops/pair ~= 1.3
TFLOP/s effective, BASELINE.md round-3 section).  A Moller-Trumbore
triangle pair is ~2.4x the flops of a sphere pair (~72 vs ~30), so the
VPU flop ceiling maps to ~17-18 G tri-pairs/s.

Usage: python tools/mesh_roofline.py [65k|360k] [repeats]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from make_mesh import make_knot  # noqa: E402

from rtow_tpu.config import Config  # noqa: E402
from rtow_tpu.models.camera import make_camera  # noqa: E402
from rtow_tpu.models.scene import SceneBuilder  # noqa: E402
from rtow_tpu.ops import pallas_megakernel as _mk  # noqa: E402
from rtow_tpu.ops.wavefront_sorted import (  # noqa: E402
    TILE, _morton_pixel_perm, _scene_tables, render_wavefront,
    trace_wavefront_sorted,
)

SPH_GPAIRS = 42.0   # cover kernel attained sphere-pair rate (v5e)
SPH_FLOPS = 30.0    # flops per sphere pair (quadratic + select chain)
TRI_FLOPS = 72.0    # flops per MT tri pair (_mt_rows arithmetic count)


def med_time(fn, repeats, *args):
    jax.block_until_ready(fn(*args))  # warm-up / compile
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts), ts


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "65k"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    segments, rings = (256, 128) if which == "65k" else (600, 300)
    width = height = 400
    spp, depth = 64, 20

    cam = make_camera(lookfrom=(0.0, 0.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      fov_degrees=45.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=3.0)
    cfg = Config(image_width=width, aspect_ratio=1.0, samples_per_pixel=spp,
                 max_child_rays=depth)
    verts, faces = make_knot(segments, rings)
    b = SceneBuilder()
    b.add_mesh(verts[faces], b.add_lambertian((0.6, 0.5, 0.4)))
    scene = b.build()
    n_tris = len(faces)
    # Per-scene TRI_BLOCK (round 5): pin the same pick render_wavefront
    # uses for the whole instrumentation session so table build, stats
    # sweeps, and pair math all match the production kernel.
    ctx = _mk.tri_block_for(scene.n_triangles)
    TRI_BLOCK = ctx.__enter__()
    print(f"TRI_BLOCK {TRI_BLOCK} (per-scene pick)")

    # 1. Whole-frame production timing (the bench number).
    t_full, ts = med_time(lambda: render_wavefront(scene, cam, cfg), repeats)
    lanes = width * height * spp
    mrays = lanes / t_full / 1e6
    print(f"knot{which} {width}px spp{spp} depth{depth}: {t_full:.3f}s = "
          f"{mrays:.2f} Mrays/s "
          f"(runs: {', '.join(f'{t:.2f}' for t in ts)})")

    # Chunking exactly as render_wavefront (lane-per-sample, Morton px).
    n_pixels = width * height
    ppc = min(max(cfg.rays_per_batch // spp, 1), n_pixels)
    ppc = max(ppc, -(-TILE // spp))
    n_chunks = -(-n_pixels // ppc)
    tables, counts, bmin, inv_ext = _scene_tables(scene)
    perm = np.full((n_chunks * ppc,), n_pixels, np.int32)
    perm[:n_pixels] = _morton_pixel_perm(width, height)
    key = jax.random.key(cfg.seed)

    def chunk_ids(g):
        pix = perm[g * ppc:(g + 1) * ppc]
        return jnp.asarray(np.minimum(pix, n_pixels - 1))

    def make_chunk_fn(stats, fixed_trips=None):
        def f(key_g, pix, seed_g):
            return trace_wavefront_sorted(
                None, cam, key_g, pix, seed_g, spp=spp, max_depth=depth,
                width=width, height=height, tables=tables, counts=counts,
                bmin=bmin, inv_ext=inv_ext, lanes_per_pixel=spp,
                stats=stats, fixed_trips=fixed_trips,
            )
        return jax.jit(f)

    # 2. Stats sweep over every chunk.
    stat_fn = make_chunk_fn(True)
    accs, its = [], []
    for g in range(n_chunks):
        _, acc, lvl = stat_fn(jax.random.fold_in(key, g), chunk_ids(g),
                              jnp.int32(cfg.seed + g * 7919))
        accs.append(np.asarray(acc))
        its.append(np.asarray(lvl))
    accs = np.stack(accs)          # (n_chunks, 6)
    its = np.stack(its)            # (n_chunks, n_levels)
    tot = accs.sum(axis=0)
    sweeps, supers, hypers, tile_iters, live_lane, live_tile = tot
    pairs = sweeps * TILE * TRI_BLOCK
    gpairs_lb = pairs / t_full / 1e9
    print(f"chunks {n_chunks} x {ppc}px ({ppc * spp} lanes), "
          f"tris {n_tris} ({n_tris // TRI_BLOCK} blocks)")
    print(f"block sweeps {sweeps:.3e} (supers {supers:.3e}, "
          f"hypers {hypers:.3e}) -> pairs {pairs:.3e}")
    print(f"tile-iterations {tile_iters:.3e}, live-lane occupancy "
          f"{live_lane / (tile_iters * TILE):.1%}, live-tile share "
          f"{live_tile / tile_iters:.1%}")
    print(f"whole-frame lower-bound rate {gpairs_lb:.1f} G tri-pairs/s "
          f"(= {gpairs_lb * TRI_FLOPS / 1e3:.2f} TFLOP/s effective; "
          f"sphere-sweep ceiling was {SPH_GPAIRS:.0f} Gpairs/s = "
          f"{SPH_GPAIRS * SPH_FLOPS / 1e3:.2f} TFLOP/s)")

    # 3. Trip-prefix profile of the heaviest chunk: time and pairs at
    # each pinned prefix; increments give per-segment attained rates.
    g = int(np.argmax(accs[:, 0]))
    full = tuple(int(x) for x in
                 np.concatenate([[its[g, 0]], np.diff(its[g])]))
    args = (jax.random.fold_in(key, g), chunk_ids(g),
            jnp.int32(cfg.seed + g * 7919))
    plain_fn = make_chunk_fn(False)
    t_c, _ = med_time(plain_fn, max(repeats, 5), *args)
    print(f"chunk {g} (max-sweeps): {t_c * 1e3:.1f} ms production, "
          f"ladder trips {full}")

    def prefixes(full):
        # (0,..,0) isolates the chunk-fixed cost (camera ray gen, the
        # initial + final sorts, teardown) from bounce work.
        out = [tuple([0] * len(full))]
        acc = [0] * len(full)
        for lvl, n in enumerate(full):
            steps = sorted({1, max(n // 2, 1), n}) if n else []
            for s in steps:
                p = list(acc)
                p[lvl] = s
                out.append(tuple(p))
            acc[lvl] = n
        return out

    rows = []
    prev_t = prev_p = 0.0
    for p in prefixes(full):
        tfn = make_chunk_fn(False, fixed_trips=p)
        sfn = make_chunk_fn(True, fixed_trips=p)
        t_p, _ = med_time(tfn, max(repeats, 5), *args)
        _, acc_p, _ = sfn(*args)
        pairs_p = float(np.asarray(acc_p)[0]) * TILE * TRI_BLOCK
        if t_p < prev_t * 0.95:
            # Anomalous measurement (a longer prefix can't be faster);
            # drop the row rather than poisoning the fit.
            print(f"  prefix {p}: {t_p * 1e3:7.1f} ms ANOMALOUS "
                  f"(< previous prefix) — dropped")
            continue
        dt, dp = t_p - prev_t, pairs_p - prev_p
        seg = dp / dt / 1e9 if dt > 1e-5 else float("nan")
        rows.append((p, t_p, pairs_p, seg))
        print(f"  prefix {p}: {t_p * 1e3:7.1f} ms, pairs {pairs_p:10.3e}, "
              f"segment rate {seg:6.1f} G tri-pairs/s "
              f"({seg * TRI_FLOPS / 1e3:.2f} TFLOP/s)")
        prev_t, prev_p = t_p, pairs_p
    # Least-squares slope of t vs pairs over the prefs = attained rate;
    # intercept/call = fixed per-bounce cost (sorts, dispatch, regen).
    ts = np.array([r[1] for r in rows])
    ps = np.array([r[2] for r in rows])
    ns = np.array([sum(r[0]) for r in rows], dtype=np.float64)
    A = np.stack([ps, ns, np.ones_like(ps)], axis=1)
    (slope, per_call, const), *_ = np.linalg.lstsq(A, ts, rcond=None)
    rate = 1.0 / slope / 1e9 if slope > 0 else float("inf")
    sweep_share = slope * ps[-1] / ts[-1]
    print(f"fit: rate {rate:.1f} G tri-pairs/s "
          f"({rate * TRI_FLOPS / 1e3:.2f} TFLOP/s), fixed "
          f"{per_call * 1e3:.2f} ms/bounce, const {const * 1e3:.1f} ms "
          f"-> sweep share of heavy chunk {sweep_share:.1%}")

    import json
    print(json.dumps({
        "mesh": which, "mrays": round(float(mrays), 2),
        "pairs": float(pairs),
        "gpairs_lower_bound": round(float(gpairs_lb), 2),
        "occupancy": round(float(live_lane / (tile_iters * TILE)), 4),
        "live_tile_share": round(float(live_tile / tile_iters), 4),
        "heavy_chunk_ms": round(float(t_c * 1e3), 1),
        "fit_gpairs": round(float(rate), 1),
        "fit_ms_per_bounce": round(float(per_call * 1e3), 3),
        "heavy_sweep_share": round(float(sweep_share), 3),
    }))


if __name__ == "__main__":
    main()
