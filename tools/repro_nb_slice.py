#!/usr/bin/env python
"""Minimal repro for the TRI_BLOCK=256 runtime abort (ROADMAP round-4).

Hypothesis: a Pallas TPU kernel that DYNAMIC-slices the major dim of a
(NB, 16, 256) VMEM operand (two lane-tiles in the minor dim) aborts at
runtime past NB ~512, while NB <= 512 works and the 128-wide variant
works at any NB.  This script isolates exactly that op: a fori_loop of
dynamic block reads, summed — no other machinery.

Usage: python tools/repro_nb_slice.py [NB ...]   (default: 256 512 782 1408)
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(nb, width):
    def kernel(tbl_ref, out_ref):
        def body(b, acc):
            blk = tbl_ref[b, :, :]  # dynamic major-dim slice
            return acc + jnp.sum(blk[:, :128])

        acc = jax.lax.fori_loop(0, nb, body, jnp.float32(0.0))
        out_ref[...] = jnp.full((8, 128), acc, jnp.float32)

    return pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid=(),
    )


def main():
    nbs = [int(a) for a in sys.argv[1:]] or [256, 512, 782, 1408]
    for width in (128, 256):
        for nb in nbs:
            tbl = jnp.ones((nb, 16, width), jnp.float32)
            try:
                out = make_kernel(nb, width)(tbl)
                got = float(np.asarray(out)[0, 0])
                want = nb * 16 * 128
                ok = "OK " if got == want else f"WRONG ({got} != {want})"
                print(f"(NB={nb:5d}, 16, {width}): {ok}", flush=True)
            except Exception as e:  # noqa: BLE001 — repro reporting
                print(f"(NB={nb:5d}, 16, {width}): {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
