#!/usr/bin/env python
"""Chunk-size (lane-density) experiment for the sorted-wavefront path.

Hypothesis (ROADMAP #1 / VERDICT #3): the straggler tail is expensive
because late survivors are spread over a small per-chunk lane pool, so
compacted tail tiles mix incoherent rays and sweep most of the block
table.  Raising rays_per_batch to cover the WHOLE FRAME multiplies the
survivor density in the 6D sort-key space by n_chunks (~40x at
400x400/spp64), shrinking every tail tile's key cell — the same
mechanism that made spp2048 1.7x faster than spp64 on the 360k knot.

Usage: python tools/exp_wholeframe.py [65k|360k] [repeats]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax  # noqa: E402

from make_mesh import make_knot  # noqa: E402

from rtow_tpu.config import Config  # noqa: E402
from rtow_tpu.models.camera import make_camera  # noqa: E402
from rtow_tpu.models.scene import SceneBuilder  # noqa: E402
from rtow_tpu.ops.wavefront_sorted import render_wavefront  # noqa: E402


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "65k"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    segments, rings = (256, 128) if which == "65k" else (600, 300)
    verts, faces = make_knot(segments, rings)
    b = SceneBuilder()
    b.add_mesh(verts[faces], b.add_lambertian((0.6, 0.5, 0.4)))
    knot = b.build()
    cam = make_camera(lookfrom=(0.0, 0.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      fov_degrees=45.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=3.0)
    lanes = 400 * 400 * 64
    print(f"workload: {which} knot ({faces.shape[0]} tris), "
          f"400x400 spp64 depth20, device {jax.devices()[0].platform}",
          flush=True)
    batches = [int(x) for x in os.environ.get(
        "RTOW_EXP_BATCHES", "262144,2097152,16777216").split(",")]
    for rpb in batches:
        cfg = Config(image_width=400, aspect_ratio=1.0,
                     samples_per_pixel=64, max_child_rays=20,
                     rays_per_batch=rpb)
        t0 = time.perf_counter()
        img = render_wavefront(knot, cam, cfg)
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            img = render_wavefront(knot, cam, cfg)
            ts.append(time.perf_counter() - t0)
        med = statistics.median(ts)
        print(f"rpb={rpb:>9}: compile+run {compile_s:6.1f}s, "
              f"median {med:5.2f}s = {lanes / med / 1e6:5.2f} Mrays/s "
              f"(runs: {', '.join(f'{t:.2f}' for t in ts)}), "
              f"mean_rad={float(img.mean()):.4f}", flush=True)


if __name__ == "__main__":
    main()
