"""Megakernel gradients: Pallas forward + Pallas backward per bounce.

The north star couples "verified pixel gradients" with "speed-of-light
Mrays/s per chip" (BASELINE.md).  Round 1 delivered them separately:
the Pallas megakernel for speed, the jnp ``lax.scan`` path for
``jax.grad`` (~25x slower).  This module closes the gap with a
per-bounce ``jax.custom_vjp`` whose BOTH sides are Pallas kernels:

* forward — the flat bounce kernel (`pallas_megakernel._bounce_core`)
  over (pixel x sample) lanes; an XLA ``lax.scan`` chains bounces and
  its reverse pass supplies each step's input state (the tape).
* backward — a kernel that REPLAYS the bounce from the saved input
  state: the RNG is counter-based on (lane id, iteration), so the
  sweep, draws and all discrete decisions reproduce exactly (common
  random numbers by construction), then calls ``jax.vjp`` on
  ``_shade_pure`` *inside the kernel* — the shade math is elementwise,
  so its transpose is elementwise and Mosaic-compiles like any other
  kernel.  d(out)/d(sphere params) is exact because ``_shade_pure``
  re-derives the intersection t from the winner's parameters.
* parameter gradients — each program accumulates its lanes' cotangents
  into per-block rows of a (Npad, 16) gradient table via the same
  one-hot trick as the winner fetch (no scatter); XLA sums the
  per-program partials.  The chain scene -> sphere table is plain jnp
  (build_sphere_table), so ``jax.grad`` w.r.t. the Scene pytree flows
  end-to-end.

Scope: sphere AND triangle scenes.  Large meshes auto-enable the
sorted-lane path (``sort_lanes``): lanes are re-sorted by the
wavefront's interleaved Morton key before every bounce (the same
scheme as the forward pipeline's ops/wavefront_sorted), with a
sort-based custom_vjp for the permutation so the backward never
gathers.  Measured (65k-tri knot, v5e): fwd+bwd = 2.1x forward-only;
the jnp gradient path OOMs at 90 GB at the same size.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.camera import camera_rays, pixel_coords
from ..models.scene import Scene
from . import pallas_megakernel as _mk
from .pallas_megakernel import (
    KEY_ROW,
    LANES,
    SPHERE_BLOCK,
    SUPER,
    TILE,
    TILE_ROWS,
    _TBL_ROWS,
    _draw_scatter,
    _mix,
    _nee_contrib,
    _shade_pure,
    _sweep_all,
    _uniform,
    pick_sweep_split,
    build_sphere_table,
    build_tri_table,
)

#: continuous state arrays carried between bounces (cot-bearing).
N_CONT = 13  # ox oy oz dx dy dz tm tpr tpg tpb rr rg rb

#: light-table rows the gradient kernels carry (ops/lights.py layout).
_LIGHT_COLS = 14


class _RowsVal:
    """Adapter: a nested tuple of scalars indexed like a (R, C) ref.

    ops/lights.py indexes the light table as ``table[r, c]`` (scalar
    SMEM reads in the forward kernels).  The backward kernel needs the
    table as a DIFFERENTIABLE ``jax.vjp`` input, and a nested tuple of
    traced scalars is a valid pytree — this wrapper gives it the same
    two-index read surface.
    """

    def __init__(self, rows):
        self.rows = rows

    def __getitem__(self, idx):
        r, c = idx
        return self.rows[r][c]


def _lane_u32(lid):
    return _mix(lid.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))


def _salt(seed, it):
    return _mix((seed + it * jnp.int32(40503)).astype(jnp.uint32))


def _grad_fwd_kernel(meta_ref, tbl_ref, box_ref, tri_ref, tri_box_ref,
                     sup_ref, hyp_ref, lights_ref, *refs,
                     n_blocks, n_tri_blocks, n_super, n_hyper, cull,
                     emissive, bg, checker, nee_kinds, vol_kinds=(),
                     vol_row0=0):
    """Forward bounce for the gradient path (spheres + triangles).

    refs = 16 inputs (13 cont f32 + alive i32 + bounce i32 + lid i32),
    16 outputs, then (when ``n_super``) the hierarchy scratch
    (box_scr SMEM, sem_box DMA, key_scr SMEM).  Small meshes
    (< 2*SUPER blocks) sweep flat from SMEM boxes; larger ones use the
    same super/hyper front-to-back descent as the forward pipeline.

    ``nee_kinds`` non-empty runs next-event estimation exactly as the
    production forward kernels do (shadow sweep + MIS, _bounce_core):
    alive becomes the {0,1,2} diffuse-history code.

    ``vol_kinds`` non-empty samples constant-density media exactly as
    ``_bounce_core`` does (ops/volumes.py, volume rows ride the light
    operand at rows >= ``vol_row0``, one uniform per volume at salts
    16+).
    """
    ins, outs = refs[:16], refs[16:32]
    box_scr = sem_box = key_scr = None
    if n_super:
        box_scr, sem_box, key_scr = refs[32:35]
    it = meta_ref[0, 0]
    seed = meta_ref[0, 1]
    max_depth = meta_ref[0, 2]
    vals = [r[...] for r in ins]
    alive_i, bounce, lid = vals[13], vals[14], vals[15]
    any_alive = jnp.any(alive_i > 0)

    @pl.when(jnp.logical_not(any_alive))
    def _drained_tile():
        # A fully-drained tile's bounce is the IDENTITY: every per-lane
        # output is where(dead, old, new) with dead everywhere, so the
        # sweeps + shade can be skipped and the state copied through.
        # At the bench shapes (pixel-major lanes, cover scene) 30-60%
        # of tile-bounces are all-dead by mid-depth — this skip is the
        # scan-path analogue of the forward persistent kernel's
        # dead-tile cond-skip (grad roofline, round 5).
        for o, v in zip(outs, vals):
            o[...] = v

    @pl.when(any_alive)
    def _live_tile():
        state = tuple(vals[:N_CONT])
        alive = alive_i > 0
        lane = _lane_u32(lid)
        salt = _salt(seed, it)

        (ox, oy, oz, dx, dy, dz, tm, tpr, tpg, tpb, rr, rg, rb) = state
        best_t, best_k, sph_params, tri_params = _sweep_all(
            tbl_ref, box_ref, tri_ref, tri_box_ref, sup_ref,
            ox, oy, oz, dx, dy, dz, tm, alive,
            n_blocks=n_blocks, n_tri_blocks=n_tri_blocks, n_super=n_super,
            cull=cull, tri_t=n_tri_blocks > 0,
            box_scr=box_scr, sem_box=sem_box, key_scr=key_scr,
            tri_hyp_ref=hyp_ref, n_hyper=n_hyper, checker=checker,
            sweep_split=pick_sweep_split(n_tri_blocks),
        )
        draws = _draw_scatter(lane, salt)
        v_event = None
        if vol_kinds:
            from .volumes import (
                _OffsetAlbedo, _OffsetRows, sample_volume_event,
            )

            vus = tuple(_uniform(lane, salt, 16 + j)
                        for j in range(len(vol_kinds)))
            v_hit0, v_t, (v_ar, v_ag, v_ab) = sample_volume_event(
                _OffsetRows(lights_ref, vol_row0),
                _OffsetAlbedo(lights_ref, vol_row0),
                vol_kinds, vus, ox, oy, oz, dx, dy, dz, best_t)
            uvx, uvy, uvz, _choice = draws
            v_event = (v_hit0, v_t, v_ar, v_ag, v_ab,
                       uvx * 0.5, uvy * 0.5, uvz * 0.5)
        basics = None
        from_diffuse = None
        if nee_kinds:
            from_diffuse = alive_i > 1
            nee_us = (_uniform(lane, salt, 8), _uniform(lane, salt, 9),
                      _uniform(lane, salt, 10))
            basics, (px, py, pz), (ldx, ldy, ldz), thresh, contrib, \
                nee_act = _nee_contrib(
                    state, sph_params, tri_params, best_t, best_k,
                    alive, bounce, max_depth, nee_us, lights_ref,
                    nee_kinds, n_blocks=n_blocks,
                    n_tri_blocks=n_tri_blocks, cull=cull,
                    checker=checker, v_event=v_event,
                    vol_kinds=vol_kinds, vol_row0=vol_row0)
            s_t, _sk, _sp, _tp = _sweep_all(
                tbl_ref, box_ref, tri_ref, tri_box_ref, sup_ref,
                px, py, pz, ldx, ldy, ldz, tm, nee_act,
                n_blocks=n_blocks, n_tri_blocks=n_tri_blocks,
                n_super=n_super,
                cull=cull, tri_t=n_tri_blocks > 0,
                box_scr=box_scr, sem_box=sem_box, key_scr=key_scr,
                tri_hyp_ref=hyp_ref, n_hyper=n_hyper,
                t_init=thresh, fetch=False,
                sweep_split=pick_sweep_split(n_tri_blocks),
            )
            add = jnp.logical_and(nee_act, s_t >= thresh)
            rr = rr + jnp.where(add, contrib[0], 0.0)
            rg = rg + jnp.where(add, contrib[1], 0.0)
            rb = rb + jnp.where(add, contrib[2], 0.0)
            state = (ox, oy, oz, dx, dy, dz, tm, tpr, tpg, tpb, rr, rg, rb)
        out = _shade_pure(state, sph_params, tri_params, draws, best_t,
                          best_k, alive, bounce, max_depth,
                          n_blocks=n_blocks, n_tri_blocks=n_tri_blocks,
                          cull=cull, emissive=emissive, bg=bg,
                          basics=basics, from_diffuse=from_diffuse,
                          checker=checker, lights_ref=lights_ref,
                          nee_kinds=nee_kinds, v_event=v_event)
        (nox, noy, noz, ndx, ndy, ndz, ntpr, ntpg, ntpb, nrr, nrg, nrb,
         can, nbounce) = out
        new_vals = [nox, noy, noz, ndx, ndy, ndz, tm, ntpr, ntpg, ntpb,
                    nrr, nrg, nrb, can.astype(jnp.int32), nbounce, lid]
        for o, v in zip(outs, new_vals):
            o[...] = v


def _grad_bwd_kernel(meta_ref, tbl_ref, box_ref, tri_ref, tri_box_ref,
                     sup_ref, hyp_ref, lights_ref, *refs,
                     n_blocks, n_tri_blocks, n_super, n_hyper, cull,
                     emissive, bg, checker, nee_kinds, vol_kinds=(),
                     vol_row0=0):
    """Backward bounce: replay forward, vjp the shade, one-hot the
    parameter cotangents into the shared gradient-table accumulators.

    refs = 16 saved inputs + 13 output cotangents (cont only), then
    13 input cotangents + the (1, 16, Npad) sphere and (1, 16, Mpad)
    triangle gradient tables (+ the (1, 16, LANES) light-table
    gradient when ``nee_kinds``) — mapped to the SAME block for every
    grid step (zeroed at program 0, accumulated in VMEM across tiles,
    one writeback), so memory is O(table), not O(tiles x table) — then
    (when ``n_super``) the hierarchy scratch.

    Under NEE the shadow sweep is replayed to recover the visibility
    bit (piecewise-constant — a replayed CONSTANT in the vjp), and the
    vjp'd function recomputes the rest of the NEE contribution
    (:func:`pallas_megakernel._nee_contrib`) plus the MIS-weighted
    shade, so material, emission, AND light-table cotangents are exact
    under common random numbers.

    Constant-density media (``vol_kinds``) follow the same convention
    (VERDICT r3 #4): the free-flight uniforms replay from the counter
    RNG (salts 16+), the scatter-vs-pass EVENT is the replayed
    comparisons' piecewise-constant bit, and the reparameterized
    free-flight distance, medium albedo, and shadow-ray transmittance
    are recomputed INSIDE the vjp from the differentiable table rows —
    so density/albedo/boundary-geometry cotangents flow into the
    volume rows (packed behind the light rows in the same operand and
    the same ``glgt`` accumulator).
    """
    ins = refs[:16]
    cot_out = refs[16:16 + N_CONT]
    cot_in = refs[16 + N_CONT:16 + 2 * N_CONT]
    gtbl = refs[16 + 2 * N_CONT]
    gtri = refs[16 + 2 * N_CONT + 1]
    nxt = 16 + 2 * N_CONT + 2
    need_lt = bool(nee_kinds) or bool(vol_kinds)
    glgt = None
    if need_lt:
        glgt = refs[nxt]
        nxt += 1
    box_scr = sem_box = key_scr = None
    if n_super:
        box_scr, sem_box, key_scr = refs[nxt:]

    it = meta_ref[0, 0]
    seed = meta_ref[0, 1]
    max_depth = meta_ref[0, 2]
    vals = [r[...] for r in ins]
    alive_i, bounce, lid = vals[13], vals[14], vals[15]
    any_alive = jnp.any(alive_i > 0)

    # Shared accumulators: every grid step maps to the same output
    # block, so zero once and accumulate across tiles.  Unconditional:
    # program 0's own tile can itself be drained.
    @pl.when(pl.program_id(0) == 0)
    def _init():
        gtbl[...] = jnp.zeros(gtbl.shape, jnp.float32)
        gtri[...] = jnp.zeros(gtri.shape, jnp.float32)
        if need_lt:
            glgt[...] = jnp.zeros(glgt.shape, jnp.float32)

    @pl.when(jnp.logical_not(any_alive))
    def _drained_tile():
        # All lanes dead -> the forward bounce was the identity, so its
        # vjp passes every cotangent through untouched and contributes
        # nothing to the parameter tables (grad roofline, round 5).
        for o, ct_ref in zip(cot_in, cot_out):
            o[...] = ct_ref[...]

    @pl.when(any_alive)
    def _live_tile():
        state = tuple(vals[:N_CONT])
        alive = alive_i > 0
        lane = _lane_u32(lid)
        salt = _salt(seed, it)

        (ox, oy, oz, dx, dy, dz, tm, tpr, tpg, tpb, rr, rg, rb) = state
        # Replay the discrete half exactly (counter RNG + same sweep).
        best_t, best_k, sph_params, tri_params = _sweep_all(
            tbl_ref, box_ref, tri_ref, tri_box_ref, sup_ref,
            ox, oy, oz, dx, dy, dz, tm, alive,
            n_blocks=n_blocks, n_tri_blocks=n_tri_blocks, n_super=n_super,
            cull=cull, tri_t=n_tri_blocks > 0,
            box_scr=box_scr, sem_box=sem_box, key_scr=key_scr,
            tri_hyp_ref=hyp_ref, n_hyper=n_hyper, checker=checker,
            sweep_split=pick_sweep_split(n_tri_blocks),
        )
        draws = _draw_scatter(lane, salt)

        vus = None
        if vol_kinds:
            vus = tuple(_uniform(lane, salt, 16 + j)
                        for j in range(len(vol_kinds)))

        def _mk_v_event(table_like, st):
            """Volume event from a (possibly differentiable) row table and
            (possibly differentiable) ray state — the free-flight distance
            is a reparameterized function of density and boundary geometry
            (ops/volumes.py); the scatter-vs-pass bit is the replayed
            comparisons (piecewise-constant, zero cotangent)."""
            from .volumes import _OffsetAlbedo, _OffsetRows, sample_volume_event

            v_hit0, v_t, (v_ar, v_ag, v_ab) = sample_volume_event(
                _OffsetRows(table_like, vol_row0),
                _OffsetAlbedo(table_like, vol_row0),
                vol_kinds, vus, st[0], st[1], st[2], st[3], st[4], st[5],
                best_t)
            uvx, uvy, uvz, _choice = draws
            return (v_hit0, v_t, v_ar, v_ag, v_ab,
                    uvx * 0.5, uvy * 0.5, uvz * 0.5)

        from_diffuse = None
        open_ = None
        nee_us = None
        lt_rows = None
        n_rows = 0
        if need_lt:
            n_rows = lights_ref.shape[0]
            lt_rows = tuple(
                tuple(lights_ref[r, c] for c in range(_LIGHT_COLS))
                for r in range(n_rows)
            )
        if nee_kinds:
            from_diffuse = alive_i > 1
            nee_us = (_uniform(lane, salt, 8), _uniform(lane, salt, 9),
                      _uniform(lane, salt, 10))
            # Replay the shadow ray (non-differentiated) to recover the
            # occlusion bit — visibility is piecewise-constant.
            v_ev0 = _mk_v_event(lights_ref, state) if vol_kinds else None
            _b, (px, py, pz), (ldx, ldy, ldz), thresh, _c, nee_act = \
                _nee_contrib(state, sph_params, tri_params, best_t, best_k,
                             alive, bounce, max_depth, nee_us,
                             _RowsVal(lt_rows), nee_kinds,
                             n_blocks=n_blocks, n_tri_blocks=n_tri_blocks,
                             cull=cull, checker=checker, v_event=v_ev0,
                             vol_kinds=vol_kinds, vol_row0=vol_row0)
            s_t, _sk, _sp, _tp = _sweep_all(
                tbl_ref, box_ref, tri_ref, tri_box_ref, sup_ref,
                px, py, pz, ldx, ldy, ldz, tm, nee_act,
                n_blocks=n_blocks, n_tri_blocks=n_tri_blocks, n_super=n_super,
                cull=cull, tri_t=n_tri_blocks > 0,
                box_scr=box_scr, sem_box=sem_box, key_scr=key_scr,
                tri_hyp_ref=hyp_ref, n_hyper=n_hyper,
                t_init=thresh, fetch=False,
                sweep_split=pick_sweep_split(n_tri_blocks),
            )
            open_ = s_t >= thresh

        def _shade_full(state_cont, sparams, tparams, lt):
            """NEE contribution + MIS shade — everything differentiable."""
            basics = None
            lt_ref = _RowsVal(lt) if need_lt else None
            v_ev = _mk_v_event(lt_ref, state_cont) if vol_kinds else None
            if nee_kinds:
                basics, _so, _sd, _th, contrib, nee_act2 = _nee_contrib(
                    state_cont, sparams, tparams, best_t, best_k, alive,
                    bounce, max_depth, nee_us, lt_ref, nee_kinds,
                    n_blocks=n_blocks, n_tri_blocks=n_tri_blocks, cull=cull,
                    checker=checker, v_event=v_ev, vol_kinds=vol_kinds,
                    vol_row0=vol_row0)
                add = jnp.logical_and(nee_act2, open_)
                s = list(state_cont)
                s[10] = s[10] + jnp.where(add, contrib[0], 0.0)
                s[11] = s[11] + jnp.where(add, contrib[1], 0.0)
                s[12] = s[12] + jnp.where(add, contrib[2], 0.0)
                state_cont = tuple(s)
            out = _shade_pure(state_cont, sparams, tparams, draws, best_t,
                              best_k, alive, bounce, max_depth,
                              n_blocks=n_blocks, n_tri_blocks=n_tri_blocks,
                              cull=cull, emissive=emissive, bg=bg,
                              basics=basics, from_diffuse=from_diffuse,
                              checker=checker, lights_ref=lt_ref,
                              nee_kinds=nee_kinds, v_event=v_ev)
            return tuple(out[:12])  # cont outputs (tm passes through)

        if n_tri_blocks and need_lt:
            _, vjp_fn = jax.vjp(
                lambda st, sp, tp, lt: _shade_full(st, sp, tp, lt),
                state, sph_params, tri_params, lt_rows)
        elif n_tri_blocks:
            _, vjp_fn = jax.vjp(
                lambda st, sp, tp: _shade_full(st, sp, tp, None),
                state, sph_params, tri_params)
        elif need_lt:
            _, vjp_fn = jax.vjp(
                lambda st, sp, lt: _shade_full(st, sp, tri_params, lt),
                state, sph_params, lt_rows)
        else:
            _, vjp_fn = jax.vjp(
                lambda st, sp: _shade_full(st, sp, tri_params, None),
                state, sph_params)
        # Output cotangents in shade's output order: ox..dz, tpr..b, rr..b
        # (cot_out is the full 13-cont ordering incl. tm at index 6).
        ct = tuple(r[...] for r in cot_out)
        g_out = (ct[0], ct[1], ct[2], ct[3], ct[4], ct[5],
                 ct[7], ct[8], ct[9], ct[10], ct[11], ct[12])
        g_tparams = g_lt = None
        if n_tri_blocks and need_lt:
            g_state, g_params, g_tparams, g_lt = vjp_fn(g_out)
        elif n_tri_blocks:
            g_state, g_params, g_tparams = vjp_fn(g_out)
        elif need_lt:
            g_state, g_params, g_lt = vjp_fn(g_out)
        else:
            g_state, g_params = vjp_fn(g_out)
        # tm is an identity passthrough output plus a shade input; add the
        # downstream tm cotangent to shade's contribution.
        g_state = list(g_state)
        g_state[6] = g_state[6] + ct[6]
        for o, v in zip(cot_in, g_state):
            o[...] = v

        # ---- parameter cotangents -> per-block table gradients ----------
        # Layout (1, 16 params, N prims): primitives on the LANE axis so
        # each block's contribution writes lane-contiguously.
        shape = ox.shape
        bk3 = best_k[:, None, :]
        hit3 = (best_t < np.float32(3.0e38))[:, None, :]


        if need_lt:
            # Light/volume-table cotangent: tiny (R x 14), assembled from
            # the vjp's nested scalar cotangents with one-hot masks (no
            # scatter) and accumulated into a shared (1, 16, LANES) block
            # exactly like gtbl (param rows on sublanes, row index on
            # lanes).
            p_iota = jax.lax.broadcasted_iota(jnp.int32, (16, LANES), 0)
            r_iota = jax.lax.broadcasted_iota(jnp.int32, (16, LANES), 1)
            gl = jnp.zeros((16, LANES), jnp.float32)
            for r in range(n_rows):
                for c in range(_LIGHT_COLS):
                    gl = gl + jnp.where(
                        jnp.logical_and(p_iota == c, r_iota == r),
                        g_lt[r][c], 0.0)
            glgt[0] += gl

        if n_blocks:
            k_iota = jax.lax.broadcasted_iota(
                jnp.int32, (shape[0], SPHERE_BLOCK, shape[1]), 1
            )

            def accum_block(b, _):
                oh = jnp.where(hit3, (bk3 - b * SPHERE_BLOCK == k_iota)
                               .astype(jnp.float32), 0.0)
                for p in range(16 if checker else _TBL_ROWS):
                    # (rows, prims, lanes): rows reduce (sublane, cheap)
                    # then lanes -> per-primitive contribution.
                    contrib = jnp.sum(
                        jnp.sum(oh * g_params[p][:, None, :], axis=0), axis=1
                    )
                    sl = pl.ds(pl.multiple_of(b * SPHERE_BLOCK, SPHERE_BLOCK),
                               SPHERE_BLOCK)
                    gtbl[0, p, sl] += contrib
                return 0

            # Distinct-winner-block accumulation (see the tri loop below).
            sph_lim = jnp.int32(n_blocks * SPHERE_BLOCK)
            sph_hit = jnp.logical_and(hit3[:, 0, :], best_k < sph_lim)
            blk_sph = best_k // jnp.int32(SPHERE_BLOCK)
            big_b = jnp.int32(0x7FFFFFFF)

            def scond(c):
                return jnp.any(c[0] > 0)

            def sbody(c):
                pend = c[0]
                b = jnp.min(jnp.where(pend > 0, blk_sph, big_b))
                accum_block(b, 0)
                return (jnp.where(blk_sph == b, 0, pend),)

            jax.lax.while_loop(scond, sbody, (sph_hit.astype(jnp.int32),))

        if n_tri_blocks:
            sph_pad = n_blocks * SPHERE_BLOCK
            t_iota = jax.lax.broadcasted_iota(
                jnp.int32, (shape[0], _mk.TRI_BLOCK, shape[1]), 1
            )

            def accum_tri(b, _):
                oh = jnp.where(hit3, (bk3 - sph_pad - b * _mk.TRI_BLOCK == t_iota)
                               .astype(jnp.float32), 0.0)
                for p in range(15):  # v0(3), e1(3), e2(3), albedo(3), fuzz, ir, kind
                    contrib = jnp.sum(
                        jnp.sum(oh * g_tparams[p][:, None, :], axis=0), axis=1
                    )
                    sl = pl.ds(pl.multiple_of(b * _mk.TRI_BLOCK, _mk.TRI_BLOCK),
                               _mk.TRI_BLOCK)
                    gtri[0, p, sl] += contrib
                return 0

            # Accumulate once per DISTINCT winner block (a while over the
            # pending-lane min block id, the deferred-fetch trick): a
            # sorted tile's winners live in ~1-3 blocks, and a fori over
            # all n_tri_blocks made the backward 5.9x the forward at 512
            # blocks (measured, 65k knot).
            tri_hit = jnp.logical_and(hit3[:, 0, :],
                                      best_k >= np.int32(sph_pad))
            blk_of = (best_k - sph_pad) // np.int32(_mk.TRI_BLOCK)
            sentinel = jnp.int32(0x7FFFFFFF)

            def tcond(c):
                return jnp.any(c[0] > 0)

            def tbody(c):
                pend = c[0]
                b = jnp.min(jnp.where(pend > 0, blk_of, sentinel))
                accum_tri(b, 0)
                return (jnp.where(blk_of == b, 0, pend),)

            jax.lax.while_loop(
                tcond, tbody, (tri_hit.astype(jnp.int32),)
            )

def _lane_spec():
    return pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0))


def _blocked(arrs, n_tiles):
    return [a.reshape(n_tiles * TILE_ROWS, LANES) for a in arrs]


def _meta(it, seed, max_depth):
    return jnp.stack([
        jnp.asarray(it, jnp.int32), jnp.asarray(seed, jnp.int32),
        jnp.asarray(max_depth, jnp.int32),
    ])[None, :]


def _hier_specs(n_super):
    """(tri_box spec, scratch_shapes) for the hierarchy mode.

    Flat mode keeps per-block AABBs in SMEM; super mode packs them
    (n_super, SUPER*8) in ANY memory and descended supers DMA one row
    into SMEM scratch (the forward pipeline's scheme), with a key
    scratch for the front-to-back ordered descent.
    """
    if not n_super:
        return pl.BlockSpec(memory_space=pltpu.SMEM), []
    return pl.BlockSpec(memory_space=pl.ANY), [
        pltpu.SMEM((1, SUPER * 8), jnp.float32),
        pltpu.SemaphoreType.DMA,
        pltpu.SMEM((3, KEY_ROW), jnp.float32),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def bounce_grad(cont, ints, tbl, boxes, tri, tri_boxes, tri_sup, tri_hyp,
                lights, statics, scalars):
    """One differentiable bounce: (cont 13-tuple, ints 3-tuple) advance.

    ``scalars`` = (it, seed, max_depth) int32 scalars; ``tbl``/``tri``
    are the sphere/triangle tables (differentiable), ``boxes``/
    ``tri_boxes``/``tri_sup``/``tri_hyp`` the cull AABBs (decisions
    only — piecewise-constant, no cotangent); ``lights`` the (R, 14)
    light + volume row table (differentiable when ``nee_kinds`` or
    ``vol_kinds``).  ``statics`` = (n_blocks, n_tri_blocks, n_super,
    n_hyper, cull, emissive, bg, checker, nee_kinds, vol_kinds,
    vol_row0) python constants.
    """
    out, _ = _bounce_fwd_impl(cont, ints, tbl, boxes, tri, tri_boxes,
                              tri_sup, tri_hyp, lights, statics, scalars)
    return out


def _bounce_fwd_impl(cont, ints, tbl, boxes, tri, tri_boxes, tri_sup,
                     tri_hyp, lights, statics, scalars):
    (n_blocks, n_tri_blocks, n_super, n_hyper, cull, emissive, bg,
     checker, nee_kinds, vol_kinds, vol_row0) = statics
    L = cont[0].shape[0]
    n_tiles = L // TILE
    it, seed, max_depth = scalars
    state = _blocked(list(cont) + list(ints), n_tiles)
    spec = _lane_spec()
    tri_box_spec, scratch = _hier_specs(n_super)
    out = pl.pallas_call(
        functools.partial(_grad_fwd_kernel, n_blocks=n_blocks,
                          n_tri_blocks=n_tri_blocks, n_super=n_super,
                          n_hyper=n_hyper, cull=cull, emissive=emissive,
                          bg=bg, checker=checker, nee_kinds=nee_kinds,
                          vol_kinds=vol_kinds, vol_row0=vol_row0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024 + tri.size * 4
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            tri_box_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # light table
        ] + [spec] * 16,
        out_specs=[spec] * 16,
        out_shape=[jax.ShapeDtypeStruct(b.shape, b.dtype) for b in state],
        scratch_shapes=scratch,
    )(_meta(it, seed, max_depth), tbl, boxes, tri, tri_boxes, tri_sup,
      tri_hyp, lights, *state)
    flat = tuple(o.reshape(L) for o in out)
    return (flat[:N_CONT], flat[N_CONT:]), None


def _bounce_grad_fwd(cont, ints, tbl, boxes, tri, tri_boxes, tri_sup,
                     tri_hyp, lights, statics, scalars):
    out, _ = _bounce_fwd_impl(cont, ints, tbl, boxes, tri, tri_boxes,
                              tri_sup, tri_hyp, lights, statics, scalars)
    return out, (cont, ints, tbl, boxes, tri, tri_boxes, tri_sup,
                 tri_hyp, lights, scalars)


def _bounce_grad_bwd(statics, res, cot):
    (cont, ints, tbl, boxes, tri, tri_boxes, tri_sup, tri_hyp, lights,
     scalars) = res
    (n_blocks, n_tri_blocks, n_super, n_hyper, cull, emissive, bg,
     checker, nee_kinds, vol_kinds, vol_row0) = statics
    need_lt = bool(nee_kinds) or bool(vol_kinds)
    cot_cont, _cot_ints = cot
    it, seed, max_depth = scalars
    L = cont[0].shape[0]
    n_tiles = L // TILE
    state = _blocked(list(cont) + list(ints), n_tiles)
    cots = _blocked(list(cot_cont), n_tiles)
    spec = _lane_spec()
    npad = tbl.shape[0]
    tri_transposed = tri.ndim == 3  # (NB, 16, TRI_BLOCK) VMEM layout
    mpad = tri.shape[0] * _mk.TRI_BLOCK if tri_transposed else tri.shape[0]
    tri_box_spec, scratch = _hier_specs(n_super)
    # Gradient tables are single shared accumulator blocks (constant
    # index map): memory is O(table), not O(tiles x table) — a 360k-tri
    # mesh's 23MB table stays 23MB instead of 23MB x n_tiles.
    out_shapes = (
        [jax.ShapeDtypeStruct((n_tiles * TILE_ROWS, LANES), jnp.float32)]
        * N_CONT
        + [jax.ShapeDtypeStruct((1, 16, npad), jnp.float32),
           jax.ShapeDtypeStruct((1, 16, mpad), jnp.float32)]
    )
    out_specs = (
        [spec] * N_CONT
        + [pl.BlockSpec((1, 16, npad), lambda i: (0, 0, 0)),
           pl.BlockSpec((1, 16, mpad), lambda i: (0, 0, 0))]
    )
    if need_lt:
        out_shapes.append(
            jax.ShapeDtypeStruct((1, 16, LANES), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 16, LANES), lambda i: (0, 0, 0)))
    out = pl.pallas_call(
        functools.partial(_grad_bwd_kernel, n_blocks=n_blocks,
                          n_tri_blocks=n_tri_blocks, n_super=n_super,
                          n_hyper=n_hyper, cull=cull, emissive=emissive,
                          bg=bg, checker=checker, nee_kinds=nee_kinds,
                          vol_kinds=vol_kinds, vol_row0=vol_row0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(32 * 1024 * 1024 + tri.size * 4
                              + 16 * (npad + mpad) * 4)
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            tri_box_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # light table
        ] + [spec] * 16 + [spec] * N_CONT,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
    )(_meta(it, seed, max_depth), tbl, boxes, tri, tri_boxes, tri_sup,
      tri_hyp, lights, *state, *cots)
    g_cont = tuple(o.reshape(L) for o in out[:N_CONT])
    g_tbl = out[N_CONT][0].T  # (16, npad) -> (npad, 16)
    g_tri = out[N_CONT + 1][0]  # (16, mpad)
    if tri_transposed:
        # Match the (NB, 16, TRI_BLOCK) input layout.
        g_tri = g_tri.reshape(16, -1, _mk.TRI_BLOCK).transpose(1, 0, 2)
    else:
        g_tri = g_tri.T  # (mpad, 16)
    if need_lt:
        n_rows = lights.shape[0]
        g_lights = out[N_CONT + 2][0, :_LIGHT_COLS, :n_rows].T  # (R, 14)
    else:
        g_lights = jnp.zeros_like(lights)
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    g_ints = tuple(f0(x) for x in ints)
    g_scalars = tuple(f0(s) for s in scalars)
    return (g_cont, g_ints, g_tbl, jnp.zeros_like(boxes), g_tri,
            jnp.zeros_like(tri_boxes), jnp.zeros_like(tri_sup),
            jnp.zeros_like(tri_hyp), g_lights, g_scalars)


bounce_grad.defvjp(_bounce_grad_fwd, _bounce_grad_bwd)


@jax.custom_vjp
def _permute_by(keys, cont, ints):
    """Differentiable lane permutation: sort (cont, ints) by ``keys``.

    Both directions are multi-operand ``lax.sort``s — no gathers (a
    TPU gather serializes; jax's default sort VJP would transpose a
    take_along_axis into a scatter).  The key->permutation dependence
    is discrete (piecewise-constant), so ``keys`` carries no cotangent
    — the same treatment as the sweep's argmin.
    """
    out, _ = _permute_fwd(keys, cont, ints)
    return out


def _permute_fwd(keys, cont, ints):
    iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
    srt = jax.lax.sort((keys,) + tuple(cont) + tuple(ints) + (iota,),
                       dimension=0, num_keys=1)
    # The sorted iota records each slot's PRE-SORT position — the
    # permutation the backward must invert.
    out = (tuple(srt[1:1 + N_CONT]), tuple(srt[1 + N_CONT:-1]))
    return out, srt[-1]


def _permute_bwd(src, cot):
    cot_cont, _cot_ints = cot
    # Un-permute: sorting the cotangents by the recorded source lane id
    # restores the pre-sort order (lane ids are a permutation of iota).
    unsrt = jax.lax.sort((src,) + tuple(cot_cont), dimension=0,
                         num_keys=1)[1:]
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return (f0(src), tuple(unsrt), tuple(f0(x) for x in _cot_ints))


_permute_by.defvjp(_permute_fwd, _permute_bwd)


def render_pixels_kernel(
    scene: Scene,
    camera,
    key: jax.Array,
    pixel_ids: jax.Array,
    *,
    width: int,
    height: int,
    spp: int,
    max_depth: int,
    seed: int = 0,
    jitter: bool = True,
    sort_lanes=None,
    nee: bool = False,
    grad_reduce_axes: Tuple = (),
    _force_flat: bool = False,
) -> jax.Array:
    """Differentiable mean radiance of the given pixels -> (P, 3).

    The kernel-speed counterpart of ``diff.render_pixels``: forward and
    backward both run as Pallas bounce kernels chained by ``lax.scan``
    (the scan's saved carries are the tape; each backward step replays
    its forward from the carry — O(depth) recompute, O(depth) memory).
    Gradients flow into every Scene leaf that build_sphere_table /
    build_tri_table touch (sphere centers/radii, triangle vertices,
    albedo, fuzz, ir).  ``jitter=False`` pins rays to pixel centers
    (FD gates).

    ``sort_lanes``: re-sort lanes by the wavefront's spatial key before
    every bounce (ops/wavefront_sorted.sort_keys) so the per-tile block
    cull keeps working after rays diverge — the sorted-wavefront scheme
    for the GRADIENT path, making inverse rendering on large meshes
    kernel-fast.  The permutation is differentiable via
    :func:`_permute_by` (both directions are sorts, no gathers); the
    per-lane math is identical (counter RNG on the immutable lane id),
    so radiance and gradients match the unsorted path.  Default
    ``None`` auto-enables it past WAVEFRONT_MIN_TRIS — the same
    dispatch split as the forward pipeline.

    Meshes of >= 2*SUPER blocks use the forward pipeline's super/hyper
    front-to-back hierarchy inside both gradient kernels (the flat
    block sweep is O(n_blocks) per tile-bounce — untenable past ~100
    blocks); ``_force_flat`` pins the flat path for parity tests.

    ``nee=True`` (emissive scenes) runs next-event estimation with MIS
    in BOTH gradient kernels — the same estimator as the production
    forward (ops/lights.py + _bounce_core) — so emissive-scene inverse
    rendering runs at kernel speed: the backward replays the shadow
    sweep (visibility is a piecewise-constant replayed bit) and vjp's
    the full NEE contribution + MIS-weighted shade, giving exact
    material, emission, AND light-geometry gradients under common
    random numbers (the cone-sampling reparameterization carries the
    radius/center interior derivative; FD-gated in
    tests/test_pallas_grad_nee.py); the light-table cotangent flows
    back into the Scene through build_light_table.

    Constant-density media run in BOTH gradient kernels too (VERDICT
    r3 #4): the free-flight event replays from the counter RNG, its
    scatter-vs-pass bit is piecewise-constant, and the reparameterized
    distance, medium albedo, and shadow transmittance are vjp'd from
    the volume rows (packed behind the light rows), so density/albedo/
    boundary gradients flow through pack_volume_rows.  Only image
    textures stay jnp-only (per-lane texel gathers — ROADMAP 9c).
    """
    if scene.has_image:
        raise NotImplementedError(
            "image textures are not in the gradient kernels (per-lane "
            "texel gathers are a measured architectural no-go on the "
            "VPU, ROADMAP 9c); use diff.loss_and_grad"
        )
    if sort_lanes is None:
        # Default: sort only for large meshes (round-4 auto-pick).  A
        # round-5 hardware A/B at the bench shapes REVERTED the brief
        # sort-for-every-scene default: the CPU drain census predicted
        # a 70% tile-bounce reclaim, but a dispatched all-dead tile is
        # already ~free (the pl.when skip copies state through), so the
        # per-bounce 16-operand sort only ADDED cost — same-session
        # fwd 174 ms unsorted vs 261 ms sorted (fwd+bwd 412 vs 562 ms)
        # on the cover at 400x267/spp16/d8.  Mesh scenes keep the sort:
        # there a live tile's block sweep is ~35x a coherent one, so
        # compaction pays for itself.  RTOW_GRAD_SORT=1 forces the
        # sort everywhere for A/B runs.
        import os as _os2

        if _os2.environ.get("RTOW_GRAD_SORT", "") == "1":
            sort_lanes = True
        else:
            from .wavefront_sorted import WAVEFRONT_MIN_TRIS

            sort_lanes = scene.n_triangles > WAVEFRONT_MIN_TRIS
    tbl, boxes = build_sphere_table(scene) if scene.n_spheres else (
        jnp.zeros((SPHERE_BLOCK, 16), jnp.float32),
        jnp.zeros((1, 8), jnp.float32),
    )
    n_blocks = tbl.shape[0] // SPHERE_BLOCK if scene.n_spheres else 0
    if scene.n_triangles:
        tri, tri_boxes, tri_sup, tri_hyp = build_tri_table(scene)
        n_tri_blocks = tri.shape[0] // _mk.TRI_BLOCK
        # Transposed (NB, 16, TRI_BLOCK) VMEM layout — 64 B/tri instead
        # of the row-major form's 512 (lane-dim tile padding); the
        # transpose is differentiable, so the table cotangent flows
        # back to build_tri_table's row-major output for free.
        tri = tri.reshape(n_tri_blocks, _mk.TRI_BLOCK, 16).transpose(0, 2, 1)
        # VMEM budget: the backward holds the table AND its gradient
        # accumulator resident (64 B/tri each) — caps around half a
        # million triangles on a 128MB-VMEM chip.
        assert n_tri_blocks <= 4096, "gradient path caps at ~512k tris"
        n_super = (n_tri_blocks // SUPER if tri_sup.shape[0] > 1
                   and not _force_flat else 0)
        n_hyper = (tri_hyp.shape[0] if tri_hyp.shape[0] > 1
                   and n_super else 0)
    else:
        tri = jnp.zeros((_mk.TRI_BLOCK, 16), jnp.float32)
        tri_boxes = jnp.zeros((1, 8), jnp.float32)
        tri_sup = jnp.zeros((1, 8), jnp.float32)
        tri_hyp = jnp.zeros((1, 8), jnp.float32)
        n_tri_blocks = 0
        n_super = n_hyper = 0
    tri_boxes_flat = tri_boxes  # cull-bounds source (pre-packing)
    if n_super:
        # Pack each super's 16 block AABBs into one row so a descended
        # super DMAs a tile-aligned slice (the forward pipeline's
        # layout, pallas_megakernel.bounce_step_pallas).
        tri_boxes = tri_boxes[: n_super * SUPER].reshape(n_super, SUPER * 8)
    else:
        assert n_tri_blocks <= 1536, "flat gradient path caps at ~200k"
    nee_kinds = ()
    if nee:
        if not scene.has_emissive:
            raise ValueError("nee=True needs an emissive scene "
                             "(SceneBuilder.add_light)")
        nee_kinds = tuple(k for k, _ in scene.light_ids)
    rows = []
    if nee_kinds:
        from .lights import build_light_table

        rows.append(build_light_table(scene))
    vol_kinds = scene.volume_kinds
    vol_row0 = rows[0].shape[0] if rows else 0
    if vol_kinds:
        # Volume rows pack behind the light rows in the same (R, 14)
        # differentiable operand (the forward kernels' layout) — the
        # table cotangent flows back into the Scene's density/albedo/
        # boundary leaves through pack_volume_rows.
        from .volumes import pack_volume_rows

        rows.append(pack_volume_rows(scene))
    lights = (jnp.concatenate(rows) if rows
              else jnp.zeros((1, _LIGHT_COLS), jnp.float32))
    statics = (n_blocks, n_tri_blocks, n_super, n_hyper, True,
               scene.has_emissive,
               None if scene.background == "sky" else scene.background,
               scene.has_checker, nee_kinds, vol_kinds, vol_row0)

    P = pixel_ids.shape[0]
    L_raw = P * spp
    L = -(-L_raw // TILE) * TILE
    f32 = jnp.float32

    lane_pix = jnp.repeat(pixel_ids, spp, total_repeat_length=L_raw)
    k_pix, k_cam = jax.random.split(key)
    s, t = pixel_coords(width, height, k_pix, lane_pix,
                        dtype=camera.origin.dtype)
    if not jitter:
        row = lane_pix // width
        col = lane_pix % width
        s = (col.astype(s.dtype) + 0.5) / (width - 1)
        t = ((height - 1 - row).astype(t.dtype) + 0.5) / (height - 1)
    rays = camera_rays(camera, k_cam, s, t)

    def pad(x, fill=0.0):
        return jnp.concatenate(
            [x.astype(f32), jnp.full((L - L_raw,), fill, f32)]
        )

    lane_id = jnp.arange(L, dtype=jnp.int32)
    zero = jnp.zeros((L,), f32)
    cont = (
        pad(rays.origin[:, 0]), pad(rays.origin[:, 1]), pad(rays.origin[:, 2]),
        pad(rays.direction[:, 0]), pad(rays.direction[:, 1]),
        pad(rays.direction[:, 2], fill=1.0),
        pad(rays.time),
        zero + 1.0, zero + 1.0, zero + 1.0,
        zero, zero, zero,
    )
    ints = (
        (lane_id < L_raw).astype(jnp.int32),
        jnp.zeros((L,), jnp.int32),
        lane_id,
    )

    if sort_lanes:
        from .wavefront_sorted import sort_keys

        # Scene bounds for the Morton key (cull-only — no cotangent).
        def _bounds(bx, n):
            return (jax.lax.stop_gradient(bx[:n, 0:3]).min(axis=0),
                    jax.lax.stop_gradient(bx[:n, 3:6]).max(axis=0))

        parts = []
        if n_blocks:
            parts.append(_bounds(boxes, n_blocks))
        if n_tri_blocks:
            parts.append(_bounds(tri_boxes_flat, n_tri_blocks))
        bmin = functools.reduce(jnp.minimum, [p[0] for p in parts])
        bmax = functools.reduce(jnp.maximum, [p[1] for p in parts])
        inv_ext = 1.0 / jnp.maximum(bmax - bmin, 1e-6)

    def step(carry, it):
        cont, ints = carry
        if sort_lanes:
            keys = sort_keys(cont[0], cont[1], cont[2], cont[3], cont[4],
                             cont[5], ints[0], bmin, inv_ext)
            cont, ints = _permute_by(keys, cont, ints)
        tbl_b, tri_b, lights_b = tbl, tri, lights
        if grad_reduce_axes:
            # Overlapped gradient all-reduce (DDP-style bucketing by
            # bounce, same scheme as the jnp path's psum_in_bwd in
            # integrator.trace): each scan step's backward emits one
            # partial psum of the table cotangents right after that
            # bounce's backward kernel, which XLA's latency-hiding
            # scheduler can overlap with the next step's compute.
            from ..diff import psum_in_bwd

            tbl_b, tri_b, lights_b = psum_in_bwd(
                (tbl, tri, lights), grad_reduce_axes)
        out = bounce_grad(cont, ints, tbl_b, boxes, tri_b, tri_boxes,
                          tri_sup, tri_hyp, lights_b, statics,
                          (it, jnp.int32(seed), jnp.int32(max_depth)))
        return out, None

    (cont, ints), _ = jax.lax.scan(
        step, (cont, ints), jnp.arange(max_depth + 1, dtype=jnp.int32)
    )
    if sort_lanes:
        # Restore pixel-major lane order (lane ids ascending) so the
        # per-pixel reduction below reads contiguous samples.
        cont, ints = _permute_by(ints[2], cont, ints)
    rad = jnp.stack([cont[10][:L_raw], cont[11][:L_raw], cont[12][:L_raw]],
                    axis=-1)
    return rad.reshape(P, spp, 3).mean(axis=1)


def loss_and_grad_kernel(
    scene: Scene,
    camera,
    key: jax.Array,
    target: jax.Array,
    pixel_ids: jax.Array,
    **render_kw,
) -> Tuple[jax.Array, Scene]:
    """(loss, dloss/dscene) with kernel-speed forward AND backward."""

    def mse(scene):
        img = render_pixels_kernel(scene, camera, key, pixel_ids,
                                   **render_kw)
        return jnp.mean((img - target) ** 2)

    return jax.value_and_grad(mse, allow_int=True)(scene)
