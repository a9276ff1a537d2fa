#!/usr/bin/env python
"""Cover-scene roofline: pairs-swept/s vs the VPU sweep speed-of-light.

VERDICT r2 #7: either push the north-star past 21 Mrays/s or publish a
roofline proving the persistent megakernel runs within ~20% of the
hardware bound.  tools/mxu_probe.py measured the standalone sphere pair
sweep at ~30.4 Gpairs/s on v5e (64 tiles x 40 iters x 4 blocks in
44.1 ms) — VPU speed-of-light for this op mix; MXU offload ties at best
(ROADMAP #3).

This tool instruments the production kernel (render_blocks_pallas
stats=True) on the bench configs and reports:
  - exact block sweeps, loop iterations, live-lane occupancy,
  - pairs swept / wall second (LOWER bound on sweep-unit attainment:
    wall time also covers shade/regen/RNG),
  - the sweep-only attainment using the nosweep ablation delta at a
    FIXED iteration count (same loop trips, pairs removed).

Usage: python tools/roofline.py [spp [repeats]]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from rtow_tpu.config import Config  # noqa: E402
from rtow_tpu.models.builders import cover_scene  # noqa: E402
from rtow_tpu.ops.pallas_megakernel import (  # noqa: E402
    SPHERE_BLOCK, TILE, render_blocks_pallas,
)

SOL_GPAIRS = 30.4  # mxu_probe VPU sweep speed-of-light (v5e)


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    depth = 50
    cfg = Config(image_width=1200, aspect_ratio=16.0 / 9.0,
                 samples_per_pixel=spp, max_child_rays=depth)
    scene, camera = cover_scene(cfg)
    W, H = cfg.image_width, cfg.image_height

    run = jax.jit(lambda: render_blocks_pallas(
        scene, camera, cfg.seed, width=W, height=H, spp=spp,
        max_depth=depth))
    jax.block_until_ready(run())
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        ts.append(time.perf_counter() - t0)
    t_full = statistics.median(ts)

    stat_run = jax.jit(lambda: render_blocks_pallas(
        scene, camera, cfg.seed, width=W, height=H, spp=spp,
        max_depth=depth, stats=True))
    out = stat_run()
    jax.block_until_ready(out)
    st = np.asarray(out[3])  # (n_tiles, LANES)
    sweeps = st[:, 0].sum()
    iters = st[:, 3].sum()
    live = st[:, 4].sum()
    n_tiles = st.shape[0]
    pairs = sweeps * TILE * SPHERE_BLOCK
    lanes = W * H * spp
    mrays = lanes / t_full / 1e6
    gpairs = pairs / t_full / 1e9
    print(f"cover {W}x{H} spp{spp} depth{depth}: {t_full:.3f}s = "
          f"{mrays:.2f} Mrays/s "
          f"(runs: {', '.join(f'{t:.2f}' for t in ts)})")
    print(f"tiles {n_tiles}, block sweeps {sweeps:.3e}, "
          f"iterations {iters:.3e} (mean {iters / n_tiles:.1f}/tile), "
          f"live-lane occupancy {live / (iters * TILE):.1%}, "
          f"sweeps/iter {sweeps / iters:.2f} of 4 blocks")
    print(f"pairs swept {pairs:.3e} -> {gpairs:.2f} Gpairs/s over the "
          f"FULL frame = {gpairs / SOL_GPAIRS:.1%} of the "
          f"{SOL_GPAIRS} Gpairs/s sweep speed-of-light (lower bound)")

    # Sweep-time isolation: same kernel, fixed iteration count, with
    # and without the pair math (RTOW_SPH_ABLATE=nosweep re-trace).
    fixed = int(np.ceil(st[:, 3].max()))
    for ab in ("full", "nosweep"):
        os.environ.pop("RTOW_SPH_ABLATE", None)
        if ab == "nosweep":
            os.environ["RTOW_SPH_ABLATE"] = "nosweep"
        f = jax.jit(lambda: render_blocks_pallas(
            scene, camera, cfg.seed, width=W, height=H, spp=spp,
            max_depth=depth, fixed_iters=fixed))
        jax.block_until_ready(f())
        t0 = time.perf_counter()
        jax.block_until_ready(f())
        el = time.perf_counter() - t0
        print(f"fixed_iters={fixed} {ab}: {el:.3f}s")
        if ab == "full":
            t_fix = el
        else:
            t_sweep = t_fix - el
            # nosweep kills hits -> later iterations sweep nothing, so
            # scale pairs to the fixed-iter full run via its own stats.
            print(f"sweep-only time {t_sweep:.3f}s of {t_fix:.3f}s "
                  f"({t_sweep / t_fix:.0%}); NOTE nosweep changes hit "
                  f"patterns after bounce 0 — treat as a bound, see "
                  f"BASELINE.md roofline table")
    os.environ.pop("RTOW_SPH_ABLATE", None)


if __name__ == "__main__":
    main()
