#!/usr/bin/env python
"""Benchmark harness: cover-scene throughput on the current JAX backend.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Workload: the book-cover ball field (reference src/main.cpp:23-83) at the
north-star frame size 1200x675, depth 50 (BASELINE.json).  Throughput is
reported in primary Mrays/s (= pixel-samples per second; each primary ray
carries its full transport through the bounce loop, so this is directly
comparable across implementations on the same workload).

``value`` is the MEDIAN of ``RTOW_BENCH_REPEATS`` timed runs at the
default spp (run-to-run variance on the tunneled TPU measured ±15% in
round 1 — a single sample is not interpretable); ``min``/``max`` bound
the spread.  The true north-star config (spp=500) is additionally run
once and reported as ``northstar_mrays`` unless RTOW_BENCH_NORTHSTAR=0.

``vs_baseline`` compares the median against the measured CPU floor of
the reference implementation stored in baseline_measured.json (written
by tools/measure_cpu_floor.py); 0.0 if no floor has been recorded yet.

A large-mesh metric (65,536-triangle procedural knot through the
sorted-wavefront megakernel, 400x400 spp=64 depth=20 — the round-2
README config) is additionally reported as ``mesh_mrays`` unless
RTOW_BENCH_MESH=0 or the backend is not a real TPU (interpret-mode
Pallas on CPU would take hours).  The 360k-triangle knot (BASELINE
config (e)'s dragon-class mesh) is reported as ``mesh360k_mrays``
unless RTOW_BENCH_MESH360=0; both carry ``*_vs_baseline`` ratios
against their same-workload CPU floors (baseline_measured.json).

A kernel-gradient metric (cover train-step shapes, 400x267/16spp/
depth8) is reported as ``grad_fwd_mrays``/``grad_fwdbwd_ratio`` unless
RTOW_BENCH_GRAD=0 — the north-star "verified gradients at kernel
speed" gate (target ratio <= 3x).

A russian-roulette run of the cover config (``roulette_mrays`` +
``roulette_dradiance``, the unbiasedness check) reports the RR
throughput lever at the reference's depth-50 budget unless
RTOW_BENCH_RR=0.

The n=1 shard_map leg (``sharded_vs_direct`` — the measurable leg of
the >=90% scaling gate, re-measured every round) runs unless
RTOW_BENCH_SHARDED=0.

Env overrides: RTOW_BENCH_SPP, RTOW_BENCH_WIDTH, RTOW_BENCH_DEPTH,
RTOW_BENCH_BACKEND (jnp|pallas), RTOW_BENCH_REPEATS, RTOW_BENCH_NORTHSTAR,
RTOW_BENCH_MESH, RTOW_BENCH_MESH360, RTOW_BENCH_GRAD, RTOW_BENCH_RR,
RTOW_BENCH_SHARDED.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

import jax


def _render_once(scene, camera, cfg):
    """One timed whole-frame render on the best backend -> seconds."""
    from rtow_tpu.pipeline import pallas_supported, pick_nearest_hit, render_pallas
    from rtow_tpu.render import render

    if pallas_supported(scene, cfg):
        t0 = time.perf_counter()
        img = render_pallas(scene, camera, cfg)
        return time.perf_counter() - t0, img
    nearest = pick_nearest_hit(scene, cfg)
    t0 = time.perf_counter()
    img = render(scene, camera, cfg, nearest_hit=nearest)
    return time.perf_counter() - t0, img


def main() -> int:
    if "--quick" in sys.argv:
        # Smoke mode (the verify recipe's sanity check): one small jnp
        # render, every TPU-only leg off — finishes in seconds on any
        # backend and still prints the one JSON line.
        for k, v in (("RTOW_BENCH_WIDTH", "200"), ("RTOW_BENCH_SPP", "8"),
                     ("RTOW_BENCH_DEPTH", "8"), ("RTOW_BENCH_REPEATS", "1"),
                     ("RTOW_BENCH_BACKEND", "jnp"),
                     ("RTOW_BENCH_NORTHSTAR", "0"), ("RTOW_BENCH_MESH", "0"),
                     ("RTOW_BENCH_RR", "0"), ("RTOW_BENCH_SHARDED", "0"),
                     ("RTOW_BENCH_GRAD", "0")):
            os.environ.setdefault(k, v)
    spp = int(os.environ.get("RTOW_BENCH_SPP", "128"))
    width = int(os.environ.get("RTOW_BENCH_WIDTH", "1200"))
    depth = int(os.environ.get("RTOW_BENCH_DEPTH", "50"))
    backend = os.environ.get("RTOW_BENCH_BACKEND", "auto")
    repeats = int(os.environ.get("RTOW_BENCH_REPEATS", "3"))
    northstar = os.environ.get("RTOW_BENCH_NORTHSTAR", "1") != "0"

    from rtow_tpu.config import Config
    from rtow_tpu.models.builders import cover_scene

    def cfg_for(n_spp, roulette=False):
        return Config(
            image_width=width, aspect_ratio=16.0 / 9.0, samples_per_pixel=n_spp,
            max_child_rays=depth, backend=backend, russian_roulette=roulette,
        )

    cfg = cfg_for(spp)
    scene, camera = cover_scene(cfg)
    print(
        f"bench: cover scene {cfg.image_width}x{cfg.image_height} spp={spp} "
        f"depth={depth} backend={backend} on {jax.devices()[0].platform}, "
        f"{repeats} repeats",
        file=sys.stderr,
    )

    _render_once(scene, camera, cfg)  # warm-up/compile
    lanes = cfg.image_width * cfg.image_height * spp
    samples = []
    img = None
    for i in range(repeats):
        elapsed, img = _render_once(scene, camera, cfg)
        samples.append(lanes / elapsed / 1e6)
        print(f"bench: run {i + 1}/{repeats}: {elapsed:.2f}s "
              f"= {samples[-1]:.2f} Mrays/s", file=sys.stderr)
    med = statistics.median(samples)
    print(f"bench: mean radiance {float(img.mean()):.4f}", file=sys.stderr)

    ns_mrays = None
    if northstar:
        ns_cfg = cfg_for(500)
        _render_once(scene, camera, ns_cfg)  # compile (new spp is dynamic;
        # shapes identical — warm anyway for queue effects)
        # Median of 3 (same methodology as every other leg): the tunnel
        # sporadically serves a single 3-4x outlier (observed 66s vs
        # 16.5s on identical code), which a median of 3 rejects without
        # the systematic fast bias a min-of-N would have (ADVICE r4).
        ns_samples = [_render_once(scene, camera, ns_cfg)[0]
                      for _ in range(3)]
        ns_elapsed = statistics.median(ns_samples)
        ns_lanes = cfg.image_width * cfg.image_height * 500
        ns_mrays = ns_lanes / ns_elapsed / 1e6
        print(f"bench: north-star 500spp: {ns_elapsed:.2f}s "
              f"= {ns_mrays:.2f} Mrays/s "
              f"(runs {', '.join(f'{t:.2f}' for t in ns_samples)})",
              file=sys.stderr)

    # Mesh legs run FIRST after the cover/north-star warm state and
    # BEFORE the RR/sharded legs: BENCH_r04 measured the mesh legs
    # 12-17% slower with the sharded leg newly ahead of them (r03
    # order had them earlier), and the repeats trended upward —
    # device/allocator state from the shard_map step is the suspected
    # contaminant (VERDICT r4 #1).  Ordering them first removes the
    # confound either way.
    mesh_mrays = None
    if (os.environ.get("RTOW_BENCH_MESH", "1") != "0"
            and jax.devices()[0].platform == "tpu"):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
        from make_mesh import make_knot

        from rtow_tpu.models.camera import make_camera
        from rtow_tpu.models.scene import SceneBuilder
        from rtow_tpu.ops.wavefront_sorted import render_wavefront

        kcam = make_camera(lookfrom=(0.0, 0.0, 3.0), lookat=(0.0, 0.0, 0.0),
                           fov_degrees=45.0, aspect_ratio=1.0, aperture=0.0,
                           focus_dist=3.0)
        kcfg = Config(image_width=400, aspect_ratio=1.0,
                      samples_per_pixel=64, max_child_rays=20)

        def mesh_bench(segments, rings, label):
            verts, faces = make_knot(segments, rings)
            b = SceneBuilder()
            b.add_mesh(verts[faces], b.add_lambertian((0.6, 0.5, 0.4)))
            knot = b.build()
            render_wavefront(knot, kcam, kcfg)  # warm-up/compile
            ksamples = []
            for i in range(repeats):
                t0 = time.perf_counter()
                jax.block_until_ready(render_wavefront(knot, kcam, kcfg))
                kel = time.perf_counter() - t0
                ksamples.append(400 * 400 * 64 / kel / 1e6)
                print(f"bench: {label} run {i + 1}/{repeats}: {kel:.2f}s "
                      f"= {ksamples[-1]:.2f} Mrays/s", file=sys.stderr)
            return statistics.median(ksamples)

        # A mesh-bench failure (e.g. a transient tunnel/device error)
        # must not lose the headline metric: report what succeeded.
        mesh360_mrays = None
        try:
            mesh_mrays = mesh_bench(256, 128, "mesh65k")  # 65,536 triangles
            if os.environ.get("RTOW_BENCH_MESH360", "1") != "0":
                mesh360_mrays = mesh_bench(600, 300, "mesh360k")  # 360k tris
        except Exception as e:  # noqa: BLE001 — report partial results
            print(f"bench: mesh bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    rr_mrays = rr_drad = None
    if (os.environ.get("RTOW_BENCH_RR", "1") != "0"
            and jax.devices()[0].platform == "tpu"):
        # Russian-roulette throughput lever at the reference's depth-50
        # budget (north star names RR; off by default for fidelity —
        # the estimator is unbiased, so the radiance delta is MC noise).
        rr_cfg = cfg_for(spp, roulette=True)
        _render_once(scene, camera, rr_cfg)  # compile
        rr_elapsed, rr_img = _render_once(scene, camera, rr_cfg)
        rr_mrays = lanes / rr_elapsed / 1e6
        rr_drad = float(rr_img.mean()) - float(img.mean())
        print(f"bench: russian roulette spp{spp}: {rr_elapsed:.2f}s "
              f"= {rr_mrays:.2f} Mrays/s (plain {med:.2f}), "
              f"mean-radiance delta {rr_drad:+.5f}", file=sys.stderr)

    sharded_ratio = None
    if (os.environ.get("RTOW_BENCH_SHARDED", "1") != "0"
            and jax.devices()[0].platform == "tpu"):
        # The measurable leg of the >=90% scaling gate re-measured every
        # round (VERDICT r3 #6): the n=1 shard_map megakernel step vs
        # the direct dispatch above.
        from rtow_tpu.parallel.mesh import make_mesh
        from rtow_tpu.parallel.sharded import render_sharded_pallas

        try:
            smesh = make_mesh(1, spp)
            render_sharded_pallas(scene, camera, cfg, mesh=smesh)  # compile
            s_samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                render_sharded_pallas(scene, camera, cfg, mesh=smesh)
                s_samples.append(time.perf_counter() - t0)
            s_elapsed = statistics.median(s_samples)
            s_mrays = lanes / s_elapsed / 1e6
            sharded_ratio = s_mrays / med
            print(f"bench: sharded n=1: {s_elapsed:.2f}s = {s_mrays:.2f} "
                  f"Mrays/s ({sharded_ratio:.1%} of direct)",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — report partial results
            print(f"bench: sharded bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    grad_mrays = grad_ratio = None
    if (os.environ.get("RTOW_BENCH_GRAD", "1") != "0"
            and jax.devices()[0].platform == "tpu"):
        # Kernel-gradient metric (north star: verified gradients at
        # kernel speed, fwd+bwd <= 3x fwd): cover train-step shapes.
        import jax.numpy as jnp

        from rtow_tpu.ops.pallas_grad import (
            loss_and_grad_kernel, render_pixels_kernel,
        )

        try:
            gcfg = Config(image_width=400, aspect_ratio=1.5,
                          samples_per_pixel=16, max_child_rays=8)
            gscene, gcam = cover_scene(gcfg)
            gw, gh = 400, 267
            gpix = jnp.arange(gw * gh, dtype=jnp.int32)
            gtarget = jnp.zeros((gw * gh, 3), jnp.float32)
            gkey = jax.random.key(0)
            fwd = jax.jit(lambda s: render_pixels_kernel(
                s, gcam, gkey, gpix, width=gw, height=gh, spp=16,
                max_depth=8))
            lg = jax.jit(lambda s: loss_and_grad_kernel(
                s, gcam, gkey, gtarget, gpix, width=gw, height=gh, spp=16,
                max_depth=8))
            jax.block_until_ready(fwd(gscene))  # compile
            t0 = time.perf_counter()
            jax.block_until_ready(fwd(gscene))
            gf = time.perf_counter() - t0
            jax.block_until_ready(lg(gscene))  # compile
            t0 = time.perf_counter()
            jax.block_until_ready(lg(gscene))
            gfb = time.perf_counter() - t0
            grad_mrays = gw * gh * 16 / gf / 1e6
            grad_ratio = gfb / gf
            print(f"bench: grad fwd {gf:.3f}s ({grad_mrays:.2f} Mrays/s), "
                  f"fwd+bwd {gfb:.3f}s (x{grad_ratio:.2f})", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — report partial results
            print(f"bench: grad bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    floor = 0.0
    floor_path = os.path.join(os.path.dirname(__file__), "baseline_measured.json")
    if os.path.exists(floor_path):
        with open(floor_path) as f:
            floor = float(json.load(f).get("cpu_floor_mrays_per_s", 0.0))

    out = {
        "metric": "cover_scene_primary_rays",
        "value": round(med, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(med / floor, 3) if floor > 0 else 0.0,
        "repeats": repeats,
        "min": round(min(samples), 3),
        "max": round(max(samples), 3),
        "spp": spp,
    }
    if ns_mrays is not None:
        out["northstar_mrays"] = round(ns_mrays, 3)
        out["northstar_vs_baseline"] = (
            round(ns_mrays / floor, 3) if floor > 0 else 0.0
        )
    if mesh_mrays is not None:
        mesh_floor = 0.0
        if os.path.exists(floor_path):
            with open(floor_path) as f:
                mesh_floor = float(
                    json.load(f).get("mesh65k_floor_mrays_per_s", 0.0))
        out["mesh_mrays"] = round(mesh_mrays, 3)
        out["mesh_vs_baseline"] = (
            round(mesh_mrays / mesh_floor, 3) if mesh_floor > 0 else 0.0
        )
        if mesh360_mrays is not None:
            with open(floor_path) as f:
                floor360 = float(
                    json.load(f).get("mesh360k_floor_mrays_per_s", 0.0))
            out["mesh360k_mrays"] = round(mesh360_mrays, 3)
            out["mesh360k_vs_baseline"] = (
                round(mesh360_mrays / floor360, 3) if floor360 > 0 else 0.0
            )
    if rr_mrays is not None:
        out["roulette_mrays"] = round(rr_mrays, 3)
        out["roulette_dradiance"] = round(rr_drad, 5)
    if sharded_ratio is not None:
        out["sharded_vs_direct"] = round(sharded_ratio, 3)
    if grad_mrays is not None:
        out["grad_fwd_mrays"] = round(grad_mrays, 3)
        out["grad_fwdbwd_ratio"] = round(grad_ratio, 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
