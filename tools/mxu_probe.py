#!/usr/bin/env python
"""MXU-offload probe for the sphere-sweep quadratic (ROADMAP #2).

The megakernel's sphere sweep is VPU-bound broadcast arithmetic over
(TILE_ROWS, 128 spheres, 128 lanes) pair tensors.  The pair quadratic's
h and c terms are LINEAR in per-sphere features, so they factor into a
(2*128 spheres, K) x (K, lanes) matmul that runs on the MXU instead;
the one-hot winner fetch likewise factors into
(16 params, 128 spheres) x (128 spheres, lanes).

This probe measures three standalone kernels at bench-like scale on
real hardware (small kernels -> fast Mosaic compiles, unlike the 8-20
minute persistent-megakernel compiles through the tunnel):

  vpu     — the current formulation (replicated arithmetic + fetch)
  mxu     — matmul h/c (Precision.HIGHEST) + matmul one-hot fetch,
            per-row (128,16)@(16,128) form
  mxu_b   — same but batched rank-3 dot_general, probing whether
            Mosaic lowers it at all

and checks mxu-vs-vpu output agreement (the f32 cancellation hazard:
h^2 - a*c for the r=1000 ground sphere cancels catastrophically; the
expanded matmul form must not be meaningfully worse than the direct
form).

Usage: python tools/mxu_probe.py [iters] [n_blocks] [tiles]
"""
from __future__ import annotations

import functools
import os
import sys
import time

import jax

if os.environ.get("RTOW_PROBE_CPU") == "1":
    # sitecustomize pins JAX_PLATFORMS=axon at interpreter boot; the
    # config route still works (same dance as tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 8, 128
NSPH = 128  # spheres per block
NPAR = 13  # fetched params per winner
BIG = np.float32(3.0e38)
T_MIN = np.float32(1e-3)
HI = (jax.lax.Precision.DEFAULT
      if os.environ.get("RTOW_PROBE_PREC") == "default"
      else jax.lax.Precision.HIGHEST)


def _rng_state(key, n_tiles):
    ks = jax.random.split(key, 8)
    shape = (n_tiles * ROWS, LANES)
    ox = jax.random.uniform(ks[0], shape, jnp.float32, -10.0, 10.0)
    oy = jax.random.uniform(ks[1], shape, jnp.float32, 0.0, 3.0)
    oz = jax.random.uniform(ks[2], shape, jnp.float32, -10.0, 10.0)
    dx = jax.random.normal(ks[3], shape, jnp.float32)
    dy = jax.random.normal(ks[4], shape, jnp.float32)
    dz = jax.random.normal(ks[5], shape, jnp.float32)
    tm = jax.random.uniform(ks[6], shape, jnp.float32)
    return ox, oy, oz, dx, dy, dz, tm


def _sphere_table(key, n_blocks):
    """Cover-scene-like sphere table incl. an r=1000 ground sphere."""
    n = n_blocks * NSPH
    ks = jax.random.split(key, 6)
    c0 = jax.random.uniform(ks[0], (n, 3), jnp.float32, -11.0, 11.0)
    c0 = c0.at[:, 1].set(jnp.abs(c0[:, 1]) * 0.05 + 0.2)
    dc = jax.random.uniform(ks[1], (n, 3), jnp.float32, 0.0, 0.5) * (
        jax.random.uniform(ks[2], (n, 1)) < 0.3
    )
    r = jax.random.uniform(ks[3], (n,), jnp.float32, 0.15, 0.25)
    # Ground sphere: the f32-cancellation stress case.
    c0 = c0.at[0].set(jnp.asarray([0.0, -1000.0, 0.0]))
    dc = dc.at[0].set(0.0)
    r = r.at[0].set(1000.0)
    alb = jax.random.uniform(ks[4], (n, 3), jnp.float32)
    misc = jax.random.uniform(ks[5], (n, 3), jnp.float32)
    tbl = jnp.concatenate(
        [c0, dc, r[:, None], alb, misc, jnp.zeros((n, 3), jnp.float32)],
        axis=1,
    )  # (n, 16): c0 dc r alb fuzz ir kind pad3
    return tbl


def _mxu_weights(tbl):
    """(2N, 16) h/c matmul weights from an (N, 16) sphere table.

    Lane features (16): [dx dy dz  tm*dx tm*dy tm*dz  ox oy oz
                         tm*ox tm*oy tm*oz  1  tm  tm^2  0]
    h  = o.d + W_h  @ feat   (W_h rows 0..N-1)
    c  = o.o + W_c  @ feat   (W_c rows N..2N-1)
    with  h = o.d - c0.d - tm dc.d
          c = |o|^2 - 2o.c0 - 2tm o.dc + (|c0|^2 - r^2) + 2tm c0.dc
              + tm^2 |dc|^2
    The constant-term features (|c0|^2 - r^2 etc.) are computed here in
    host f64 — exactly where the direct form cancels worst.
    """
    t = np.asarray(tbl, np.float64)
    c0, dc, r = t[:, 0:3], t[:, 3:6], t[:, 6]
    n = t.shape[0]
    z = np.zeros((n,))
    wh = np.stack(
        [-c0[:, 0], -c0[:, 1], -c0[:, 2], -dc[:, 0], -dc[:, 1], -dc[:, 2],
         z, z, z, z, z, z, z, z, z, z], axis=1)
    cc0 = (c0 * c0).sum(1) - r * r
    c0dc = (c0 * dc).sum(1)
    dc2 = (dc * dc).sum(1)
    wc = np.stack(
        [z, z, z, z, z, z,
         -2.0 * c0[:, 0], -2.0 * c0[:, 1], -2.0 * c0[:, 2],
         -2.0 * dc[:, 0], -2.0 * dc[:, 1], -2.0 * dc[:, 2],
         cc0, 2.0 * c0dc, dc2, z], axis=1)
    # Interleave per block: rows [b*256, b*256+128) = W_h of block b,
    # [b*256+128, (b+1)*256) = W_c of block b — the kernel slices one
    # (256, 16) window per block.
    nb = n // NSPH
    w = np.concatenate(
        [wh.reshape(nb, NSPH, 16), wc.reshape(nb, NSPH, 16)], axis=1
    ).reshape(2 * n, 16)
    return jnp.asarray(w, jnp.float32)


# ---------------------------------------------------------------- kernels


def _vpu_kernel(tbl_ref, w_ref, st_ref, out_ref, *, n_blocks, iters,
                mxu_fetch=False):
    """Current megakernel formulation: broadcast pair arithmetic."""
    ox, oy, oz = st_ref[0], st_ref[1], st_ref[2]
    dx, dy, dz = st_ref[3], st_ref[4], st_ref[5]
    tm = st_ref[6]
    a = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / a
    o3x, o3y, o3z = ox[:, None, :], oy[:, None, :], oz[:, None, :]
    d3x, d3y, d3z = dx[:, None, :], dy[:, None, :], dz[:, None, :]
    tm3, a3, inva3 = tm[:, None, :], a[:, None, :], inv_a[:, None, :]

    def col(blk, p):
        return blk[:, p][None, :, None]

    def sweep(b, carry):
        best_t, best_k = carry[0], carry[1]
        blk = tbl_ref[pl.ds(pl.multiple_of(b * NSPH, NSPH), NSPH), :]
        bt3 = best_t[:, None, :]
        ocx = o3x - (col(blk, 0) + tm3 * col(blk, 3))
        ocy = o3y - (col(blk, 1) + tm3 * col(blk, 4))
        ocz = o3z - (col(blk, 2) + tm3 * col(blk, 5))
        r_ = col(blk, 6)
        h = ocx * d3x + ocy * d3y + ocz * d3z
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r_ * r_
        disc = h * h - a3 * cc
        pos = disc > 0.0
        sq = jnp.sqrt(jnp.where(pos, disc, 1.0))
        near = (-h - sq) * inva3
        far = (-h + sq) * inva3
        near_ok = jnp.logical_and(near >= T_MIN, near <= bt3)
        far_ok = jnp.logical_and(far >= T_MIN, far <= bt3)
        t_pair = jnp.where(near_ok, near, far)
        ok = jnp.logical_and(pos, jnp.logical_or(near_ok, far_ok))
        t_pair = jnp.where(ok, t_pair, BIG)
        bt = jnp.min(t_pair, axis=1)
        bk = jnp.argmin(t_pair, axis=1).astype(jnp.int32)
        upd = bt < best_t
        best_t = jnp.where(upd, bt, best_t)
        best_k = jnp.where(upd, bk + b * NSPH, best_k)
        oh = (bk[:, None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (ROWS, NSPH, LANES), 1)).astype(jnp.float32)
        if mxu_fetch:
            # One-hot fetch as a batched matmul contracting the FULL
            # 128-sphere axis — the MXU-shaped half of the sweep.
            blk3 = jnp.broadcast_to(blk.T[None], (ROWS, 16, NSPH))
            fetched = jax.lax.dot_general(
                blk3, oh, (((2,), (1,)), ((0,), (0,))),
                precision=HI, preferred_element_type=jnp.float32,
            )  # (ROWS, 16, LANES)
            params = tuple(
                jnp.where(upd, fetched[:, p], carry[2 + p])
                for p in range(NPAR))
        else:
            params = tuple(
                jnp.where(upd, jnp.sum(oh * col(blk, p), axis=1),
                          carry[2 + p])
                for p in range(NPAR))
        return (best_t, best_k) + params

    def it_body(i, acc):
        zero = jnp.zeros(ox.shape, jnp.float32)
        init = (jnp.full(ox.shape, BIG, jnp.float32),
                jnp.zeros(ox.shape, jnp.int32)) + (zero,) * NPAR
        res = jax.lax.fori_loop(0, n_blocks, sweep, init)
        t_ok = jnp.where(res[0] < BIG, res[0], 0.0)
        return acc + t_ok + res[2] * 0.25 + res[5] * 0.5 + res[8]

    out_ref[...] = jax.lax.fori_loop(
        0, iters, it_body, jnp.zeros(ox.shape, jnp.float32))


def _mxu_kernel(tbl_ref, w_ref, st_ref, out_ref, *, n_blocks, iters,
                batched=False):
    """Matmul h/c + matmul one-hot fetch, per-row (or batched) form."""
    ox, oy, oz = st_ref[0], st_ref[1], st_ref[2]
    dx, dy, dz = st_ref[3], st_ref[4], st_ref[5]
    tm = st_ref[6]
    a = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / a
    od = ox * dx + oy * dy + oz * dz
    oo = ox * ox + oy * oy + oz * oz
    one = jnp.ones_like(tm)

    # Per-row feature matrices (16, LANES), built once per iteration.
    feats = []
    for r in range(ROWS):
        feats.append(jnp.stack([
            dx[r], dy[r], dz[r],
            tm[r] * dx[r], tm[r] * dy[r], tm[r] * dz[r],
            ox[r], oy[r], oz[r],
            tm[r] * ox[r], tm[r] * oy[r], tm[r] * oz[r],
            one[r], tm[r], tm[r] * tm[r], jnp.zeros_like(tm[r]),
        ]))  # (16, LANES)

    iota_s = jax.lax.broadcasted_iota(jnp.int32, (NSPH, LANES), 0)

    def sweep(b, carry):
        best_t, best_k = carry[0], carry[1]
        wblk = w_ref[pl.ds(pl.multiple_of(b * 2 * NSPH, 2 * NSPH),
                           2 * NSPH), :]  # (256, 16)
        blk = tbl_ref[pl.ds(pl.multiple_of(b * NSPH, NSPH), NSPH), :]
        new = [None] * (2 + NPAR)
        for p in range(2 + NPAR):
            new[p] = []
        for r in range(ROWS):
            hc = jax.lax.dot_general(
                wblk, feats[r], (((1,), (0,)), ((), ())),
                precision=HI, preferred_element_type=jnp.float32,
            )  # (256, LANES)
            h = hc[:NSPH] + od[r][None, :]
            cc = hc[NSPH:] + oo[r][None, :]
            disc = h * h - a[r][None, :] * cc
            pos = disc > 0.0
            sq = jnp.sqrt(jnp.where(pos, disc, 1.0))
            near = (-h - sq) * inv_a[r][None, :]
            far = (-h + sq) * inv_a[r][None, :]
            btr = best_t[r][None, :]
            near_ok = jnp.logical_and(near >= T_MIN, near <= btr)
            far_ok = jnp.logical_and(far >= T_MIN, far <= btr)
            t_pair = jnp.where(near_ok, near, far)
            ok = jnp.logical_and(pos, jnp.logical_or(near_ok, far_ok))
            t_pair = jnp.where(ok, t_pair, BIG)
            bt = jnp.min(t_pair, axis=0)  # (LANES,)
            bk = jnp.argmin(t_pair, axis=0).astype(jnp.int32)
            upd = bt < best_t[r]
            oh = (bk[None, :] == iota_s).astype(jnp.float32)  # (NSPH, LANES)
            fetched = jax.lax.dot_general(
                blk, oh, (((0,), (0,)), ((), ())),
                precision=HI, preferred_element_type=jnp.float32,
            )  # (16, LANES)
            new[0].append(jnp.where(upd, bt, best_t[r]))
            new[1].append(jnp.where(upd, bk + b * NSPH, best_k[r]))
            for p in range(NPAR):
                new[2 + p].append(
                    jnp.where(upd, fetched[p], carry[2 + p][r]))
        return tuple(jnp.stack(v) for v in new)

    def sweep_batched(b, carry):
        best_t, best_k = carry[0], carry[1]
        wblk = w_ref[pl.ds(pl.multiple_of(b * 2 * NSPH, 2 * NSPH),
                           2 * NSPH), :]
        blk = tbl_ref[pl.ds(pl.multiple_of(b * NSPH, NSPH), NSPH), :]
        feat3 = jnp.stack(feats)  # (ROWS, 16, LANES)
        wb3 = jnp.broadcast_to(wblk[None], (ROWS, 2 * NSPH, 16))
        hc = jax.lax.dot_general(
            wb3, feat3, (((2,), (1,)), ((0,), (0,))),
            precision=HI, preferred_element_type=jnp.float32,
        )  # (ROWS, 256, LANES)
        h = hc[:, :NSPH] + od[:, None, :]
        cc = hc[:, NSPH:] + oo[:, None, :]
        disc = h * h - a[:, None, :] * cc
        pos = disc > 0.0
        sq = jnp.sqrt(jnp.where(pos, disc, 1.0))
        near = (-h - sq) * inv_a[:, None, :]
        far = (-h + sq) * inv_a[:, None, :]
        bt3 = best_t[:, None, :]
        near_ok = jnp.logical_and(near >= T_MIN, near <= bt3)
        far_ok = jnp.logical_and(far >= T_MIN, far <= bt3)
        t_pair = jnp.where(near_ok, near, far)
        ok = jnp.logical_and(pos, jnp.logical_or(near_ok, far_ok))
        t_pair = jnp.where(ok, t_pair, BIG)
        bt = jnp.min(t_pair, axis=1)
        bk = jnp.argmin(t_pair, axis=1).astype(jnp.int32)
        upd = bt < best_t
        oh = (bk[:, None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (ROWS, NSPH, LANES), 1)).astype(jnp.float32)
        blk3 = jnp.broadcast_to(blk[None], (ROWS, NSPH, 16))
        fetched = jax.lax.dot_general(
            blk3, oh, (((1,), (1,)), ((0,), (0,))),
            precision=HI, preferred_element_type=jnp.float32,
        )  # (ROWS, 16, LANES)
        best_t = jnp.where(upd, bt, best_t)
        best_k = jnp.where(upd, bk + b * NSPH, best_k)
        params = tuple(
            jnp.where(upd, fetched[:, p], carry[2 + p])
            for p in range(NPAR))
        return (best_t, best_k) + params

    def it_body(i, acc):
        zero = jnp.zeros(ox.shape, jnp.float32)
        init = (jnp.full(ox.shape, BIG, jnp.float32),
                jnp.zeros(ox.shape, jnp.int32)) + (zero,) * NPAR
        res = jax.lax.fori_loop(
            0, n_blocks, sweep_batched if batched else sweep, init)
        t_ok = jnp.where(res[0] < BIG, res[0], 0.0)
        return acc + t_ok + res[2] * 0.25 + res[5] * 0.5 + res[8]

    out_ref[...] = jax.lax.fori_loop(
        0, iters, it_body, jnp.zeros(ox.shape, jnp.float32))


@functools.lru_cache(maxsize=8)
def _build(kind, n_blocks, iters, n_tiles, interpret=False):
    kern = {
        "vpu": functools.partial(_vpu_kernel, n_blocks=n_blocks,
                                 iters=iters),
        "mxu": functools.partial(_mxu_kernel, n_blocks=n_blocks,
                                 iters=iters),
        "mxu_b": functools.partial(_mxu_kernel, n_blocks=n_blocks,
                                   iters=iters, batched=True),
        "mxu_f": functools.partial(_vpu_kernel, n_blocks=n_blocks,
                                   iters=iters, mxu_fetch=True),
    }[kind]
    st_spec = pl.BlockSpec((7, ROWS, LANES), lambda i: (0, i, 0))
    fn = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            st_spec,
        ],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles * ROWS, LANES), jnp.float32),
        interpret=interpret,
    )
    return jax.jit(lambda *a: fn(*a))


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    n_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_tiles = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    key = jax.random.key(7)
    tbl = _sphere_table(jax.random.fold_in(key, 0), n_blocks)
    w = _mxu_weights(tbl)
    state = _rng_state(jax.random.fold_in(key, 1), n_tiles)
    dev = jax.devices()[0].platform
    interp = dev == "cpu"
    print(f"probe on {dev}{' (interpret)' if interp else ''}: "
          f"{n_tiles} tiles x {iters} iters x "
          f"{n_blocks} blocks", file=sys.stderr)

    packed = jnp.stack(state).reshape(7, n_tiles * ROWS, LANES)
    outs, times = {}, {}
    kinds = os.environ.get("RTOW_PROBE_KINDS", "vpu,mxu,mxu_b,mxu_f")
    for kind in kinds.split(","):
        try:
            fn = _build(kind, n_blocks, iters, n_tiles, interp)
            o = fn(tbl, w, packed)  # compile + warm
            o.block_until_ready()
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                o = fn(tbl, w, packed)
                o.block_until_ready()
                reps.append(time.perf_counter() - t0)
            times[kind] = min(reps)
            outs[kind] = np.asarray(o)
        except Exception as e:  # noqa: BLE001 — probe reports and moves on
            print(f"{kind}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", file=sys.stderr)

    for kind, t in times.items():
        pair_gops = (n_tiles * ROWS * LANES * NSPH * n_blocks * iters
                     / t / 1e9)
        print(f"{kind:6s} {t * 1e3:8.2f} ms   {pair_gops:8.1f} Gpairs/s")
    for kind in outs:
        if kind == "vpu" or "vpu" not in outs:
            continue
        d = np.abs(outs["vpu"] - outs[kind])
        rel = d / np.maximum(np.abs(outs["vpu"]), 1e-3)
        print(f"{kind} vs vpu: max abs diff {d.max():.3e}  "
              f"max rel {rel.max():.3e}  mismatched>1e-3: "
              f"{(rel > 1e-3).mean() * 100:.4f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
