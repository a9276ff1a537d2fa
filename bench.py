#!/usr/bin/env python
"""Benchmark harness: cover-scene throughput on the current JAX backend.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: the book-cover ball field (reference src/main.cpp:23-83) at the
north-star frame size 1200x675, depth 50 (BASELINE.json).  Throughput is
reported in primary Mrays/s (= pixel-samples per second; each primary ray
carries its full transport through the bounce loop, so this is directly
comparable across implementations on the same workload).

``vs_baseline`` compares against the measured CPU floor of the reference
implementation stored in baseline_measured.json (written by
tools/measure_cpu_floor.py); 0.0 if no floor has been recorded yet.

Env overrides: RTOW_BENCH_SPP, RTOW_BENCH_WIDTH, RTOW_BENCH_DEPTH,
RTOW_BENCH_BACKEND (jnp|pallas).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax


def main() -> int:
    spp = int(os.environ.get("RTOW_BENCH_SPP", "128"))
    width = int(os.environ.get("RTOW_BENCH_WIDTH", "1200"))
    depth = int(os.environ.get("RTOW_BENCH_DEPTH", "50"))
    backend = os.environ.get("RTOW_BENCH_BACKEND", "auto")

    from rtow_tpu.config import Config
    from rtow_tpu.models.builders import cover_scene
    from rtow_tpu.pipeline import pallas_supported, pick_nearest_hit, render_pallas
    from rtow_tpu.render import render

    cfg = Config(
        image_width=width,
        aspect_ratio=16.0 / 9.0,
        samples_per_pixel=spp,
        max_child_rays=depth,
        backend=backend,
    )
    scene, camera = cover_scene(cfg)

    print(
        f"bench: cover scene {cfg.image_width}x{cfg.image_height} spp={spp} "
        f"depth={depth} backend={backend} on {jax.devices()[0].platform}",
        file=sys.stderr,
    )

    if pallas_supported(scene, cfg):
        render_pallas(scene, camera, cfg, seed=1)  # warm-up/compile
        t0 = time.perf_counter()
        img = render_pallas(scene, camera, cfg)
        elapsed = time.perf_counter() - t0
    else:
        nearest = pick_nearest_hit(scene, cfg)
        warm_cfg = Config(
            image_width=width, aspect_ratio=16.0 / 9.0, samples_per_pixel=1,
            max_child_rays=depth, rays_per_batch=cfg.rays_per_batch,
        )
        render(scene, camera, warm_cfg, nearest_hit=nearest)
        t0 = time.perf_counter()
        img = render(scene, camera, cfg, nearest_hit=nearest)
        elapsed = time.perf_counter() - t0

    lanes = cfg.image_width * cfg.image_height * spp
    mrays = lanes / elapsed / 1e6

    floor = 0.0
    floor_path = os.path.join(os.path.dirname(__file__), "baseline_measured.json")
    if os.path.exists(floor_path):
        with open(floor_path) as f:
            floor = float(json.load(f).get("cpu_floor_mrays_per_s", 0.0))

    vs = mrays / floor if floor > 0 else 0.0
    print(
        f"bench: {elapsed:.2f}s, mean radiance {float(img.mean()):.4f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "cover_scene_primary_rays",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
