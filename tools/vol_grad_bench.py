#!/usr/bin/env python
"""Volume-gradient kernel speed check (VERDICT r3 #4 'done' criterion):
forward vs forward+backward through the Pallas kernels on the --smoke
Cornell-smoke scene shapes — media + NEE + MIS in both kernels.

Target: fwd+bwd <= 3x fwd (the north-star gradient-speed gate).

Usage: python tools/vol_grad_bench.py [width] [spp] [depth]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rtow_tpu.models.builders import smoke_scene  # noqa: E402
from rtow_tpu.ops.pallas_grad import (  # noqa: E402
    loss_and_grad_kernel, render_pixels_kernel,
)


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    h = w
    scene, cam = smoke_scene(aspect_ratio=1.0)
    pix = jnp.arange(w * h, dtype=jnp.int32)
    target = jnp.zeros((w * h, 3), jnp.float32)
    key = jax.random.key(0)

    fwd = jax.jit(lambda s: render_pixels_kernel(
        s, cam, key, pix, width=w, height=h, spp=spp, max_depth=depth,
        nee=True))
    lg = jax.jit(lambda s: loss_and_grad_kernel(
        s, cam, key, target, pix, width=w, height=h, spp=spp,
        max_depth=depth, nee=True))
    jax.block_until_ready(fwd(scene))
    t0 = time.perf_counter()
    jax.block_until_ready(fwd(scene))
    tf = time.perf_counter() - t0
    out = lg(scene)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    jax.block_until_ready(lg(scene))
    tfb = time.perf_counter() - t0
    loss, grads = out
    import numpy as np

    gd = np.asarray(grads.volumes.density)
    print(f"smoke {w}x{h} spp{spp} depth{depth}: fwd {tf * 1e3:.1f} ms "
          f"({w * h * spp / tf / 1e6:.2f} Mrays/s), fwd+bwd "
          f"{tfb * 1e3:.1f} ms = x{tfb / tf:.2f} (target <= 3); "
          f"density grads {gd}")


if __name__ == "__main__":
    main()
