#!/usr/bin/env python
"""Same-session A/B for the BENCH_r04 mesh-leg regression (VERDICT r4 #1).

BENCH_r04 measured mesh65k 4.84 (vs r03 5.81) and mesh360k 2.27 (vs
2.58) with a NEW leg order: the sharded cover leg ran before the mesh
legs for the first time.  The r04 repeats also trend upward
(4.69 -> 5.41), which smells like transient device/allocator state, not
code.  This harness answers the question with one session:

  phase A: mesh65k + mesh360k, 5 timed repeats each (nothing ran before
           them except their own compiles) -> "mesh-first" numbers
  phase B: the cover render + sharded n=1 leg (exactly what bench.py
           runs before the mesh legs)
  phase C: the same mesh legs again, 5 repeats -> "after-sharded"

If C is systematically slower than A, the r04 regression is leg-order
contamination and bench.py should run the mesh legs first.  If A ~= C
~= 4.8, the regression is real -> bisect c79485d / d5e47c7.

Also asserts the d5e47c7 hyper padding is a no-op for both bench knots
(whole-super counts: 65k -> 32 supers, 360k -> 176).
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax

from make_mesh import make_knot

from rtow_tpu.config import Config
from rtow_tpu.models.builders import cover_scene
from rtow_tpu.models.camera import make_camera
from rtow_tpu.models.scene import SceneBuilder
from rtow_tpu.ops.wavefront_sorted import render_wavefront

REPEATS = 5

kcam = make_camera(lookfrom=(0.0, 0.0, 3.0), lookat=(0.0, 0.0, 0.0),
                   fov_degrees=45.0, aspect_ratio=1.0, aperture=0.0,
                   focus_dist=3.0)
kcfg = Config(image_width=400, aspect_ratio=1.0,
              samples_per_pixel=64, max_child_rays=20)


def build_knot(segments, rings):
    verts, faces = make_knot(segments, rings)
    b = SceneBuilder()
    b.add_mesh(verts[faces], b.add_lambertian((0.6, 0.5, 0.4)))
    return b.build()


def assert_padding_noop(scene, label):
    from rtow_tpu.ops.pallas_megakernel import SUPER, TRI_BLOCK, build_tri_table
    tbl = build_tri_table(scene)[0]
    nb = tbl.shape[0] // TRI_BLOCK
    nsb = nb // SUPER
    print(f"{label}: {tbl.shape[0]} padded tris, {nb} blocks, {nsb} supers "
          f"(whole-hyper: {nsb % SUPER == 0})", file=sys.stderr)


def time_mesh(scene, label):
    samples = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        jax.block_until_ready(render_wavefront(scene, kcam, kcfg))
        el = time.perf_counter() - t0
        samples.append(400 * 400 * 64 / el / 1e6)
        print(f"{label} run {i + 1}/{REPEATS}: {el:.2f}s = "
              f"{samples[-1]:.2f} Mrays/s", file=sys.stderr)
    med = statistics.median(samples)
    print(f"{label} MEDIAN {med:.2f} (min {min(samples):.2f} "
          f"max {max(samples):.2f})", file=sys.stderr)
    return med


def main():
    knot65 = build_knot(256, 128)
    knot360 = build_knot(600, 300)
    assert_padding_noop(knot65, "65k")
    assert_padding_noop(knot360, "360k")

    print("=== compile warmups ===", file=sys.stderr)
    render_wavefront(knot65, kcam, kcfg)
    render_wavefront(knot360, kcam, kcfg)

    print("=== phase A: mesh-first ===", file=sys.stderr)
    a65 = time_mesh(knot65, "A.mesh65k")
    a360 = time_mesh(knot360, "A.mesh360k")

    print("=== phase B: cover + sharded leg (bench.py preamble) ===",
          file=sys.stderr)
    ccfg = Config(image_width=1200, aspect_ratio=16.0 / 9.0,
                  samples_per_pixel=128, max_child_rays=50)
    scene, camera = cover_scene(ccfg)
    from rtow_tpu.parallel.mesh import make_mesh
    from rtow_tpu.parallel.sharded import render_sharded_pallas
    from rtow_tpu.pipeline import render_pallas
    jax.block_until_ready(render_pallas(scene, camera, ccfg))
    smesh = make_mesh(1, 128)
    jax.block_until_ready(render_sharded_pallas(scene, camera, ccfg, mesh=smesh))
    for _ in range(2):
        jax.block_until_ready(
            render_sharded_pallas(scene, camera, ccfg, mesh=smesh))

    print("=== phase C: mesh after sharded ===", file=sys.stderr)
    c65 = time_mesh(knot65, "C.mesh65k")
    c360 = time_mesh(knot360, "C.mesh360k")

    print(f"RESULT 65k  mesh-first {a65:.2f}  after-sharded {c65:.2f}  "
          f"(r03 5.81, r04 4.84)")
    print(f"RESULT 360k mesh-first {a360:.2f}  after-sharded {c360:.2f}  "
          f"(r03 2.58, r04 2.27)")


if __name__ == "__main__":
    main()
