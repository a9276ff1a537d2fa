"""Pallas TPU megakernel: the fully-fused progressive path tracer.

One ``pallas_call`` renders the whole frame: each program owns a tile of
``TILE_ROWS x 128`` pixels and runs the complete persistent-wavefront
loop (camera-ray regeneration -> sphere sweep -> nearest select ->
masked material scatter -> sky/depth termination) entirely in
VMEM/registers.  This is the megakernel the north star asks for
(BASELINE.json): zero HBM traffic per bounce (the jnp path re-reads and
re-writes ~15 lane arrays per iteration), per-tile early exit (a tile
whose pixels finished all samples stops — sky tiles exit after ~2
iterations while glass tiles run long; the jnp wavefront runs every
iteration at full width), and the on-core PRNG instead of threefry
key-chains.

Scope: sphere scenes (the flagship cover workload).  Triangle meshes
route through the jnp integrator + BVH (ops/bvh.py).

Semantics match ``integrator.trace_progressive`` exactly (same
reference-faithful bounce rules, reference src/render.cpp:112-129);
images agree statistically (different RNG streams).

Layout notes (see pallas guide):
* lane state is (TILE_ROWS, 128) f32 — sublane x lane native tiling,
* the sphere table is (Npad, 16) f32 in VMEM — spheres on the SUBLANE
  axis.  Pair arrays are (TILE_ROWS, 128 spheres, 128 lanes): lane state
  broadcasts as (TILE_ROWS, 1, 128) and sphere params as (1, 128, 1), so
  every pair reduction (min/argmin/one-hot fetch) runs over the sublane
  axis — lane-axis reductions cost cross-lane shuffles and measured 3x
  slower (55 vs ~18 us/tile-iteration),
* the winner's 13 parameters are fetched with an exact one-hot
  (argmin index match) multiply-reduce per block — no per-lane gathers.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.scene import (
    CHECKER, DIELECTRIC, EMISSIVE, LAMBERTIAN, METAL, NOISE, Scene,
)

import contextlib as _contextlib
import os as _os

# Sublane rows per program (8 -> 1024 pixels/tile). Overridable for tile
# tuning experiments; 8 measured best on v5e (16 coarsens the early-exit
# granularity and grows pair temps past comfortable VMEM occupancy).
TILE_ROWS = int(_os.environ.get("RTOW_TILE_ROWS", "8"))
LANES = 128
TILE = TILE_ROWS * LANES
#: Spheres per Morton block (env-tunable; must be a multiple of 8 —
#: the pair tensor's sublane axis).  The cover's 487 spheres fit 4
#: blocks of 128 whose unions a tile almost never culls (3.7 of 4
#: swept per iteration); smaller blocks buy finer cull granularity at
#: more per-block cond machinery.
SPHERE_BLOCK = int(_os.environ.get("RTOW_SPHERE_BLOCK", "128"))
#: Triangles per Morton block.  Smaller blocks buy tighter AABBs but
#: pay more per-block cond/reduce machinery (32 was ~20% slower); the
#: round-4 bisect measured 256 WINNING +3-4% at <= ~131k tris (bigger
#: sweeps amortize the per-block descent) and LOSING past ~200k
#: (coarser culling), so ``render_wavefront`` auto-picks per scene via
#: ``tri_block_for`` below.  RTOW_TRI_BLOCK pins a single value for
#: every scene (experiments); other paths read the 128 default.
_TRI_BLOCK_FORCED = int(_os.environ.get("RTOW_TRI_BLOCK", "0"))  # 0 = auto
TRI_BLOCK = _TRI_BLOCK_FORCED or 128
#: Auto-pick crossover: between the measured 131k win and 200k loss.
TRI_BLOCK_256_MAX_TRIS = int(_os.environ.get("RTOW_TRI_BLOCK_256_MAX",
                                             "160000"))


def pick_tri_block(n_triangles: int) -> int:
    """Per-scene triangle block width (round-4 measured crossover)."""
    if _TRI_BLOCK_FORCED:
        return _TRI_BLOCK_FORCED
    return 256 if 0 < n_triangles <= TRI_BLOCK_256_MAX_TRIS else 128


@_contextlib.contextmanager
def tri_block_for(n_triangles: int):
    """Pin the module-global ``TRI_BLOCK`` to the per-scene pick for one
    table-build + kernel-trace span.

    Every kernel constructor and ``build_tri_table`` read the global at
    TRACE time, so wrapping a whole render call keeps table layout and
    sweep code consistent; distinct picks cannot collide in any jit
    cache because the block count changes every traced table shape
    (``tri_boxes`` has one row per block) and ``_frame_fn`` keys on the
    block counts."""
    global TRI_BLOCK
    old, TRI_BLOCK = TRI_BLOCK, pick_tri_block(n_triangles)
    try:
        yield TRI_BLOCK
    finally:
        TRI_BLOCK = old

# Sphere-table rows.
_C0X, _C0Y, _C0Z, _DCX, _DCY, _DCZ, _R, _ALR, _ALG, _ALB, _FUZZ, _IR, _KIND = range(13)
_TBL_ROWS = 13

_INV24 = np.float32(1.0 / (1 << 24))
_TWO_PI = np.float32(2.0 * np.pi)
T_MIN = np.float32(1e-3)
BIG = np.float32(3.0e38)


def _mix(x):
    """murmur3 finalizer — full-avalanche uint32 hash (vector-friendly)."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _uniform(lane_u32, salt_u32, draw: int):
    """U[0,1) per lane from a counter-based hash of (lane, salt, draw).

    Stateless by construction — identical on hardware, in interpret
    mode, and across replays (pltpu.prng_* is a zero-stub under the
    interpreter and its statefulness is invisible to checkpoint/replay).
    """
    h = _mix(lane_u32 ^ (salt_u32 + jnp.uint32((draw * 0x9E3779B9) & 0xFFFFFFFF)))
    # Mosaic has no uint32->f32 cast; (h >> 8) < 2^24 fits int32 exactly.
    return (h >> 8).astype(jnp.int32).astype(jnp.float32) * _INV24


def build_sphere_table(scene: Scene) -> Tuple[jax.Array, jax.Array]:
    """Sphere tables: ((Npad, 16) params, (NB, 8) block AABBs).

    Spheres are Morton-sorted so 128-blocks are spatially compact and the
    kernel can cull whole blocks per tile iteration (same machinery as
    triangles; boxes cover the full motion sweep center0..center0+dc
    with |r| half-extent).  Padding spheres are never hittable (r = 0,
    far-away center).

    Pure jnp — traceable under the jitted kernel entry point (and
    differentiable, should the kernel ever grow a custom VJP)."""
    sp = scene.spheres
    mats = scene.materials
    n = sp.radius.shape[0]
    npad = -(-n // SPHERE_BLOCK) * SPHERE_BLOCK
    f32 = jnp.float32

    r_abs = jnp.abs(sp.radius)[:, None]
    smin = jnp.minimum(sp.center0, sp.center0 + sp.dcenter) - r_abs
    smax = jnp.maximum(sp.center0, sp.center0 + sp.dcenter) + r_abs
    cent = 0.5 * (smin + smax)
    order = _morton_order(smin.min(axis=0), smax.max(axis=0), cent)
    c0 = sp.center0[order]
    dc = sp.dcenter[order]
    rad = sp.radius[order]
    mid = sp.material[order]
    smin, smax = smin[order], smax[order]

    tbl = jnp.stack([
        c0[:, 0], c0[:, 1], c0[:, 2],
        dc[:, 0], dc[:, 1], dc[:, 2],
        rad,
        mats.albedo[mid, 0], mats.albedo[mid, 1], mats.albedo[mid, 2],
        mats.fuzz[mid], mats.ir[mid], mats.kind[mid].astype(f32),
        # Checker odd color (cols 13-15; = albedo for other kinds) —
        # fetched only when the scene's static has_checker flag is set.
        mats.albedo2[mid, 0], mats.albedo2[mid, 1], mats.albedo2[mid, 2],
    ], axis=1).astype(f32)  # (n, 16)
    # Padding spheres: r = 0 -> discriminant h^2 - a*|oc|^2 < 0 unless the
    # ray passes exactly through the origin; also force far-away center.
    pad = jnp.zeros((npad - n, 16), f32).at[:, _C0X].set(1.0e9)
    tbl = jnp.concatenate([tbl, pad], axis=0)

    big = jnp.float32(1.0e30)
    bmin = jnp.concatenate([smin, jnp.full((npad - n, 3), big)], axis=0)
    bmax = jnp.concatenate([smax, jnp.full((npad - n, 3), -big)], axis=0)
    nb = npad // SPHERE_BLOCK
    blk_min = bmin.reshape(nb, SPHERE_BLOCK, 3).min(axis=1)
    blk_max = bmax.reshape(nb, SPHERE_BLOCK, 3).max(axis=1)
    pad_eps = 1e-4 + 1e-4 * jnp.abs(blk_max - blk_min)
    boxes = jnp.concatenate(
        [blk_min - pad_eps, blk_max + pad_eps, jnp.zeros((nb, 2), f32)],
        axis=1,
    ).astype(f32)  # (NB, 8)
    return tbl, boxes


def _morton_order(cmin: jax.Array, cmax: jax.Array, cent: jax.Array) -> jax.Array:
    """Morton (z-order) permutation of centroids — spatially coherent
    128-primitive blocks get tight AABBs for the block-cull test.

    Quantization uses ROBUST (5th-95th percentile) centroid bounds, not
    the full extent: one outlier primitive (the cover's radius-1000
    ground sphere, main.cpp:24) otherwise stretches the grid ~80x past
    the ball field, every ball lands in one Morton cell, and the order
    degenerates to insertion order — measured on the cover bench as
    3.63 of 4 blocks swept per tile-iteration (no cull at all).
    Outliers clamp into the extreme cells and simply join an edge
    block, whose AABB they already dominate."""
    plo = jnp.quantile(cent, 0.05, axis=0)
    phi = jnp.quantile(cent, 0.95, axis=0)
    # Degenerate axes (flat percentile range) fall back to full bounds.
    ok = (phi - plo) > 1e-9
    lo = jnp.where(ok, plo, cmin)
    hi = jnp.where(ok, phi, cmax)
    ext = jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip((cent - lo) / ext * 1023.0, 0.0, 1023.0).astype(
        jnp.uint32)  # (M, 3) 10 bits

    def spread(x):  # interleave 10 bits with two zero bits each
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    return jnp.argsort(code)


#: 128-triangle blocks per super-block for the two-level cull.
SUPER = 16

#: Sub-tile sweep split env override (0 = pick by mesh size): each
#: TILE_ROWS/nsplit row group of a tile culls and sweeps triangle
#: blocks independently — post-sort row groups span tighter key ranges
#: than the whole-tile union, so straggler tiles skip blocks only some
#: of their lanes need, at the cost of nsplit conds per descended
#: block.  Measured on v5e (morton chunks, 400px spp64 depth20):
#: 65k knot 5.41 / 5.34 / 5.67 Mrays/s at split 1/2/4; 360k knot
#: 2.23 / 2.45 / 2.37 — finer groups pay off until the per-block cond
#: machinery (x nsplit per descended block) catches up, which happens
#: sooner on big meshes where more blocks descend per tile.
WF_SWEEP_SPLIT = int(_os.environ.get("RTOW_WF_SWEEP_SPLIT", "0"))


def pick_sweep_split(n_tri_blocks: int) -> int:
    """Measured-default sub-tile sweep split for a mesh size."""
    if WF_SWEEP_SPLIT:
        return WF_SWEEP_SPLIT
    if n_tri_blocks == 0:
        return 1
    return 4 if n_tri_blocks <= 1024 else 2

#: Width of one front-to-back key-scratch row (children per ordered
#: hierarchy level); 3 rows = one per level (hyper/super/block).
KEY_ROW = 128


def _median_split_order(cent: np.ndarray) -> np.ndarray:
    """BVH-style recursive median-split permutation over centroids.

    Orders triangles so every consecutive TRI_BLOCK range is a compact
    spatial cluster (a leaf of the recursion), with cut points aligned
    to SUPER multiples higher up so super/hyper groups are subtrees.
    Replaces the raw Morton-range blocks (reference purpose:
    src/render.cpp:73-110's median-split build) — straddling Morton
    cell jumps inflated block AABBs and the mean blocks-swept tail.
    Host-side NumPy: only runs on concrete geometry (the differentiable
    table path keeps the traceable Morton order)."""
    def rec(ids):
        n = ids.shape[0]
        if n <= TRI_BLOCK:
            return [ids]
        unit = TRI_BLOCK
        while unit * SUPER * 2 <= n:
            unit *= SUPER
        c = cent[ids]
        ext = c.max(axis=0) - c.min(axis=0)
        ids = ids[np.argsort(c[:, int(ext.argmax())], kind="stable")]
        hi = ((n - 1) // unit) * unit
        cut = min(max(unit, int(round(n / 2 / unit)) * unit), hi)
        return rec(ids[:cut]) + rec(ids[cut:])

    return np.concatenate(rec(np.arange(cent.shape[0])))


def build_tri_table(scene: Scene) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Triangle tables: ((Mpad, 16) params, (NB, 8) block AABBs,
    (NSB, 8) super-block AABBs).

    Triangles are Morton-sorted so each 128-triangle block is spatially
    compact; the kernel slab-tests each block's AABB per tile iteration
    and skips blocks no live ray can hit.  Padding rows are fully
    degenerate (e1 = e2 = 0 -> zero normal -> det = 0 -> culled) and
    padding blocks get inverted AABBs (never hit)."""
    tr = scene.triangles
    mats = scene.materials
    m = tr.material.shape[0]
    mpad = -(-m // TRI_BLOCK) * TRI_BLOCK
    # Pad to whole super-blocks when the mesh is big enough to use the
    # two-level cull (kernel only descends into hit super-blocks).
    if mpad // TRI_BLOCK >= 2 * SUPER:
        mpad = -(-mpad // (TRI_BLOCK * SUPER)) * TRI_BLOCK * SUPER
    # When the HYPER level activates (>= 2*SUPER supers), pad supers to
    # whole hypers too: meshes whose super count was NOT a multiple of
    # SUPER (e.g. a 200k-tri mesh -> 98 supers) reproducibly ABORTED on
    # device at default settings with padded inverted super boxes, while
    # every exact-super mesh (65k/131k/360k benches) works — padding the
    # table instead sidesteps the padded-super kernel path entirely
    # (degenerate rows cost nothing: inverted boxes never descend).
    if mpad // (TRI_BLOCK * SUPER) >= 2 * SUPER:
        mpad = (-(-mpad // (TRI_BLOCK * SUPER * SUPER))
                * TRI_BLOCK * SUPER * SUPER)
    f32 = jnp.float32

    verts = tr.verts
    tmin = verts.min(axis=1)  # (M, 3)
    tmax = verts.max(axis=1)
    cent = 0.5 * (tmin + tmax)
    if isinstance(jnp.asarray(cent), jax.core.Tracer):
        # Differentiable path (verts is a tracer): data-dependent
        # recursion can't trace; Morton ranges are traceable and the
        # gradient math is ordering-independent.
        order = _morton_order(tmin.min(axis=0), tmax.max(axis=0), cent)
    else:
        order = jnp.asarray(_median_split_order(np.asarray(cent)))
    verts = verts[order]
    mid = tr.material[order]
    tmin, tmax = tmin[order], tmax[order]

    v0, v1, v2 = verts[:, 0], verts[:, 1], verts[:, 2]
    e1, e2 = v1 - v0, v2 - v0
    tbl = jnp.stack([
        v0[:, 0], v0[:, 1], v0[:, 2],
        e1[:, 0], e1[:, 1], e1[:, 2],
        e2[:, 0], e2[:, 1], e2[:, 2],
        mats.albedo[mid, 0], mats.albedo[mid, 1], mats.albedo[mid, 2],
        mats.fuzz[mid], mats.ir[mid], mats.kind[mid].astype(f32),
        jnp.zeros((m,), f32),
    ], axis=1).astype(f32)  # (m, 16)
    tbl = jnp.concatenate([tbl, jnp.zeros((mpad - m, 16), f32)], axis=0)

    # Per-128-block AABBs; padded triangles get inverted boxes.
    big = jnp.float32(1.0e30)
    bmin = jnp.concatenate([tmin, jnp.full((mpad - m, 3), big)], axis=0)
    bmax = jnp.concatenate([tmax, jnp.full((mpad - m, 3), -big)], axis=0)
    nb = mpad // TRI_BLOCK
    blk_min = bmin.reshape(nb, TRI_BLOCK, 3).min(axis=1)
    blk_max = bmax.reshape(nb, TRI_BLOCK, 3).max(axis=1)
    # Epsilon-pad: axis-aligned flat blocks (zero extent) would fail the
    # strict slab inequality and be culled outright.
    pad_eps = 1e-4 + 1e-4 * jnp.abs(blk_max - blk_min)
    blk_min = blk_min - pad_eps
    blk_max = blk_max + pad_eps
    boxes = jnp.concatenate(
        [blk_min, blk_max, jnp.zeros((nb, 2), f32)], axis=1
    ).astype(f32)  # (NB, 8)

    if nb % SUPER == 0 and nb >= 2 * SUPER:
        nsb = nb // SUPER
        sup_min = blk_min.reshape(nsb, SUPER, 3).min(axis=1)
        sup_max = blk_max.reshape(nsb, SUPER, 3).max(axis=1)
        super_boxes = jnp.concatenate(
            [sup_min, sup_max, jnp.zeros((nsb, 2), f32)], axis=1
        ).astype(f32)
    else:
        super_boxes = jnp.zeros((1, 8), f32)  # flat path sentinel
        return tbl, boxes, super_boxes, jnp.zeros((1, 8), f32)

    # Third level for big meshes: hyper-blocks of 16 supers (32k tris)
    # cut the uniform per-iteration scalar sweep from n_super tests to
    # n_hyper.  Supers pad to a HYPER multiple with inverted boxes
    # (never descended).
    if nsb >= 2 * SUPER:
        nsb_pad = -(-nsb // SUPER) * SUPER
        pad_lo = jnp.tile(
            jnp.asarray([[big, big, big, -big, -big, -big, 0.0, 0.0]], f32),
            (nsb_pad - nsb, 1),
        )
        super_boxes = jnp.concatenate([super_boxes, pad_lo], axis=0)
        nhb = nsb_pad // SUPER
        hyp_lo = jnp.concatenate(
            [sup_min, jnp.full((nsb_pad - nsb, 3), big)], axis=0
        ).reshape(nhb, SUPER, 3).min(axis=1)
        hyp_hi = jnp.concatenate(
            [sup_max, jnp.full((nsb_pad - nsb, 3), -big)], axis=0
        ).reshape(nhb, SUPER, 3).max(axis=1)
        hyper_boxes = jnp.concatenate(
            [hyp_lo, hyp_hi, jnp.zeros((nhb, 2), f32)], axis=1
        ).astype(f32)
    else:
        hyper_boxes = jnp.zeros((1, 8), f32)
    return tbl, boxes, super_boxes, hyper_boxes


def _sweep_all(tbl_ref, sph_box_ref, tri_ref, tri_box_ref, tri_sup_ref,
               ox, oy, oz, dx, dy, dz, tm, alive, *,
               n_blocks, n_tri_blocks, n_super=0, cull=True,
               tri_hbm=False, tri_scr=None, box_scr=None, sem_tri=None,
               sem_box=None, tri_hyp_ref=None, n_hyper=0, tri_t=False,
               key_scr=None, cnt_scr=None, t_init=None, fetch=True,
               checker=False, sweep_split=1):
    """Nearest-hit sweep over Morton blocks with AABB culling and fused
    one-hot winner fetch.

    The discrete half of a bounce: returns
    (best_t, best_k, sph_params 13-tuple, tri_params 15-tuple) — the
    winner's table rows, fetched while each block is resident so culled
    blocks pay nothing.  Differentiable quantities (hit point, normal,
    scatter) are re-derived from the fetched parameters in
    :func:`_shade_pure`, which is what makes the backward kernel exact:
    d(output)/d(params) flows through the re-derived intersection t,
    not through the argmin.

    ``tri_hbm``: large meshes keep the triangle table and block AABBs in
    HBM (a VMEM-resident (Mpad, 16) table pays 8x for lane-dim tile
    padding — 360k triangles would need 176MB of the 128MB VMEM);
    descended super-blocks DMA their 16 block AABBs into an SMEM scratch
    and each surviving block DMAs its (128, 16) rows into a VMEM scratch
    right before the sweep.  Requires ``n_super > 0``.

    ``tri_t``: the VMEM table is stored TRANSPOSED as (NB, 16,
    TRI_BLOCK) — 16 param rows on sublanes, triangles on lanes — which
    pads to exactly 64 B/triangle instead of the (Mpad, 16) layout's
    512 B (16->128 lane-dim tile pad).  Each descended block pays one
    in-register (16, 128) -> (128, 16) transpose; in exchange meshes up
    to ~1M triangles stay VMEM-resident (ROADMAP #3).
    """
    shape = ox.shape
    zero = jnp.zeros(shape, jnp.float32)
    # Pair tensors are (rows, prims, lanes): primitive axis = 1
    # (sublanes); all pair reductions run over SUBLANES (lane-axis
    # reductions need cross-lane shuffles, measured ~3x slower).

    a = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / a
    o3x, o3y, o3z = ox[:, None, :], oy[:, None, :], oz[:, None, :]
    d3x, d3y, d3z = dx[:, None, :], dy[:, None, :], dz[:, None, :]
    tm3 = tm[:, None, :]
    inva3 = inv_a[:, None, :]
    a3 = a[:, None, :]

    def col(blk, p):
        return blk[:, p][None, :, None]  # (1, 128 spheres, 1)

    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz

    def _box_enter_exit(box_ref, b, best_t, col0=0):
        """Slab-test entry/exit for block b's AABB per lane.

        ``col0`` offsets into packed rows (the HBM mode packs a super's
        16 block AABBs as one (1, 128) row so the DMA slice stays
        tile-aligned)."""
        bx0, by0, bz0 = (box_ref[b, col0 + 0], box_ref[b, col0 + 1],
                         box_ref[b, col0 + 2])
        bx1, by1, bz1 = (box_ref[b, col0 + 3], box_ref[b, col0 + 4],
                         box_ref[b, col0 + 5])
        tx0 = (bx0 - ox) * inv_dx
        tx1 = (bx1 - ox) * inv_dx
        ty0 = (by0 - oy) * inv_dy
        ty1 = (by1 - oy) * inv_dy
        tz0 = (bz0 - oz) * inv_dz
        tz1 = (bz1 - oz) * inv_dz
        enter = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.maximum(jnp.minimum(tz0, tz1), T_MIN),
        )
        exit_ = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.minimum(jnp.maximum(tz0, tz1), best_t),
        )
        return enter, exit_

    def _box_any_hit(box_ref, b, best_t):
        """True when any live lane's ray enters block b's AABB."""
        enter, exit_ = _box_enter_exit(box_ref, b, best_t)
        return jnp.any(jnp.logical_and(exit_ > enter, alive))

    def _box_key(box_ref, b, best_t, col0=0):
        """Front-to-back visit key: min entry distance over live lanes
        that enter box b (BIG when nobody does)."""
        enter, exit_ = _box_enter_exit(box_ref, b, best_t, col0)
        m = jnp.logical_and(exit_ > enter, alive)
        return jnp.min(jnp.where(m, enter, BIG))

    def _count(lvl, w=1.0):
        """Bump a per-tile sweep counter (stats builds only): row 3 of
        the counter scratch holds [blocks, supers, hypers] swept.

        ``cnt_scr`` is a DEDICATED argument so enabling stats cannot
        change traversal order (``ordered_ok`` keys off ``key_scr``
        alone); ``w`` scales sub-tile row-group sweeps so the roofline
        formula pairs = block sweeps x TILE x 128 stays exact under
        ``sweep_split``."""
        if cnt_scr is not None and cnt_scr.shape[0] > 3:
            cnt_scr[3, lvl] = cnt_scr[3, lvl] + w

    def _ordered(nc, lvl, child_key, child_visit, carry):
        """Visit children 0..nc-1 in increasing ``child_key`` order.

        The TPU form of the reference BVH's near-child-first recursion
        (src/render.cpp:67-70, tmax clamped by the left hit): sweeping
        near geometry first collapses ``best_t``, and the per-visit
        re-test (exit clamped by the CURRENT best_t) then culls far
        children outright.  Keys are scalars in an SMEM scratch row;
        each phase-2 step scans the row for the min (nc <= 16ish, so
        the O(nc^2) scalar scan is noise next to one block sweep).
        Children whose key is BIG (no live lane enters) are skipped
        without a re-test.
        """
        def p1(j, z):
            key_scr[lvl, j] = child_key(j)
            return z

        jax.lax.fori_loop(0, nc, p1, 0)

        def p2(v, c):
            def scan(j, best):
                k = key_scr[lvl, j]
                pick = k < best[0]
                return (jnp.where(pick, k, best[0]),
                        jnp.where(pick, j, best[1]))

            kmin, jmin = jax.lax.fori_loop(0, nc, scan,
                                           (BIG, jnp.int32(0)))
            # Unconditional mark-visited: when kmin == BIG every slot
            # already holds BIG, so the write is a no-op.
            key_scr[lvl, jmin] = BIG
            return jax.lax.cond(kmin < BIG,
                                lambda c2: child_visit(jmin, c2),
                                lambda c2: c2, c)

        return jax.lax.fori_loop(0, nc, p2, carry)

    def _fused_fetch(blk, bk, upd, params, first_col, n_params):
        """Overwrite ``params`` with block-winner values where ``upd``."""
        nrows = blk.shape[0]
        oh = (bk[:, None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (shape[0], nrows, shape[1]), 1)).astype(jnp.float32)
        return tuple(
            jnp.where(upd, jnp.sum(oh * col(blk, first_col + p), axis=1),
                      params[p])
            for p in range(n_params)
        )

    # Deferred winner fetch: sweeps carry only (best_t, best_k) and the
    # winner's table row is fetched AFTER all sweeps, once per DISTINCT
    # winner block (a while_loop over the pending-lane min block id).
    # The eager alternative fetched inside every swept block — at 16
    # params x ~16 swept blocks/tile on big meshes the fetch was ~half
    # the sweep cost, while distinct winner blocks post-sort are ~1-3.
    defer = _os.environ.get("RTOW_DEFER_FETCH", "1") == "1"

    # fori_loop (not a python loop) over sphere blocks: the unrolled
    # form blew Mosaic's compile time past 20 minutes at 4 blocks.
    def sweep_block(b, carry):
        return jax.lax.cond(
            _box_any_hit(sph_box_ref, b, carry[0]),
            lambda c: _sphere_block_sweep(b, c), lambda c: c, carry,
        )

    def _sphere_block_sweep(b, carry):
        if _os.environ.get("RTOW_SPH_ABLATE") == "nosweep":
            return carry  # roofline: cull/cond machinery minus the pairs
        _count(0)
        best_t, best_k = carry[0], carry[1]
        blk = tbl_ref[
            pl.ds(pl.multiple_of(b * SPHERE_BLOCK, SPHERE_BLOCK),
                  SPHERE_BLOCK), :
        ]  # (128 spheres, 16 params)
        bt3 = best_t[:, None, :]
        ocx = o3x - (col(blk, _C0X) + tm3 * col(blk, _DCX))
        ocy = o3y - (col(blk, _C0Y) + tm3 * col(blk, _DCY))
        ocz = o3z - (col(blk, _C0Z) + tm3 * col(blk, _DCZ))
        r_ = col(blk, _R)
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
        best_k = jnp.where(upd, bk + b * SPHERE_BLOCK, best_k)
        if defer:
            return (best_t, best_k)
        params = _fused_fetch(blk, bk, upd, carry[2:], 0, n_sp)
        return (best_t, best_k) + params

    # Occlusion sweeps (NEE shadow rays) seed best_t with the light
    # distance: the f2b ordered descent then culls every box whose
    # entry lies beyond the light, and ``fetch=False`` skips the
    # winner-row fetch (only the final best_t is consumed).
    best_t = (jnp.full(shape, BIG, jnp.float32) if t_init is None
              else t_init)
    best_k = jnp.zeros(shape, jnp.int32)
    n_sp = 16 if checker else _TBL_ROWS
    sph_params = tuple([zero] * n_sp)
    if n_blocks:
        init = (best_t, best_k) if defer else (best_t, best_k) + sph_params
        carry = jax.lax.fori_loop(0, n_blocks, sweep_block, init)
        best_t, best_k = carry[0], carry[1]
        if not defer:
            sph_params = carry[2:]

    sph_pad = n_blocks * SPHERE_BLOCK
    tri_params = tuple([zero] * 15)
    if n_tri_blocks:
        # Block culling: triangles are Morton-sorted into spatially
        # compact 128-blocks; slab-test each block AABB against the
        # tile's live rays and cond-skip blocks nobody can hit.
        # Moller-Trumbore in the reference's determinant form
        # (src/common-model.cpp:104-125) over triangle blocks.
        def tri_sweep(b, carry):
            # Small meshes (no super level): boxes in SMEM, table in
            # VMEM, direct per-block slab test + sweep.
            enter, exit_ = _box_enter_exit(tri_box_ref, b, carry[0])
            box_hit = jnp.logical_and(exit_ > enter, alive)

            return jax.lax.cond(
                jnp.any(box_hit),
                lambda c: _tri_block_sweep(b, c, box_hit), lambda c: c,
                carry)

        def _load_tri_block(b):
            """Fetch block b's (TRI_BLOCK, 16) param rows."""
            if tri_hbm:
                cp = pltpu.make_async_copy(
                    tri_ref.at[pl.ds(b * TRI_BLOCK, TRI_BLOCK), :],
                    tri_scr, sem_tri,
                )
                cp.start()
                cp.wait()
                return tri_scr[...]
            if tri_t:
                # (NB, 16, TRI_BLOCK) transposed table: one dynamic
                # major-dim slice + an in-register lane<->sublane
                # transpose (no dynamic lane-offset load, which Mosaic
                # rejects).
                return tri_ref[b, :, :].T
            return tri_ref[
                pl.ds(pl.multiple_of(b * TRI_BLOCK, TRI_BLOCK),
                      TRI_BLOCK), :
            ]

        def tri_sweep_in_super(sb, jb, carry):
            # Block AABB scalars come from the SMEM scratch the enclosing
            # super-block descent DMA'd (one packed (1, SUPER*8) row).
            enter, exit_ = _box_enter_exit(box_scr, 0, carry[0],
                                           col0=jb * 8)
            box_hit = jnp.logical_and(exit_ > enter, alive)
            return jax.lax.cond(
                jnp.any(box_hit),
                lambda c: _tri_block_sweep(sb * SUPER + jb, c, box_hit),
                lambda c: c, carry)

        def _mt_rows(blk, b, carry, sl):
            """Moller-Trumbore sweep of block ``b`` over tile rows ``sl``.

            ``carry`` holds (best_t, best_k) slices matching ``sl``; the
            pair tensor is (rows(sl), TRI_BLOCK, LANES)."""
            _count(0, carry[0].shape[0] / TILE_ROWS)
            best_t, best_k = carry[0], carry[1]
            bt3 = best_t[:, None, :]
            ax_, ay_, az_ = col(blk, 0), col(blk, 1), col(blk, 2)
            e1x, e1y, e1z = col(blk, 3), col(blk, 4), col(blk, 5)
            e2x, e2y, e2z = col(blk, 6), col(blk, 7), col(blk, 8)
            nxb = e1y * e2z - e1z * e2y
            nyb = e1z * e2x - e1x * e2z
            nzb = e1x * e2y - e1y * e2x
            det = -(d3x[sl] * nxb + d3y[sl] * nyb + d3z[sl] * nzb)
            if cull:
                det_ok = det >= np.float32(1e-6)
            else:
                det_ok = jnp.abs(det) >= np.float32(1e-6)
            invdet = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0),
                               0.0)
            aox = o3x[sl] - ax_
            aoy = o3y[sl] - ay_
            aoz = o3z[sl] - az_
            daox = aoy * d3z[sl] - aoz * d3y[sl]
            daoy = aoz * d3x[sl] - aox * d3z[sl]
            daoz = aox * d3y[sl] - aoy * d3x[sl]
            u = (e2x * daox + e2y * daoy + e2z * daoz) * invdet
            v = -(e1x * daox + e1y * daoy + e1z * daoz) * invdet
            tt = (aox * nxb + aoy * nyb + aoz * nzb) * invdet
            ok = jnp.logical_and(
                jnp.logical_and(det_ok, tt >= T_MIN),
                jnp.logical_and(tt <= bt3,
                                jnp.logical_and(u >= 0.0,
                                                jnp.logical_and(v >= 0.0,
                                                                u + v <= 1.0))),
            )
            t_pair = jnp.where(ok, tt, BIG)
            bt = jnp.min(t_pair, axis=1)
            bk = jnp.argmin(t_pair, axis=1).astype(jnp.int32)
            upd = bt < best_t
            best_t = jnp.where(upd, bt, best_t)
            best_k = jnp.where(upd, bk + sph_pad + b * TRI_BLOCK,
                               best_k)
            return (best_t, best_k) + carry[2:]

        def _tri_block_sweep(b, carry, box_hit=None):
            if _os.environ.get("RTOW_WF_ABLATE") == "nosweep":
                return carry  # measure cull/cond machinery alone
            nsplit = sweep_split if (defer and box_hit is not None) else 1
            rows_tile = ox.shape[0]
            if nsplit > 1 and rows_tile % nsplit == 0:
                # Sub-tile sweep split: each row group culls this block
                # against ITS OWN lanes (post-sort, consecutive rows are
                # consecutive key ranges, so group frusta are tighter
                # than the tile union) and sweeps a (rows/nsplit,
                # TRI_BLOCK, LANES) pair tensor only when it must.
                blk = _load_tri_block(b)
                best_t, best_k = carry[0], carry[1]
                R = rows_tile // nsplit
                parts = []
                for gi in range(nsplit):
                    sl = slice(gi * R, (gi + 1) * R)
                    parts.append(jax.lax.cond(
                        jnp.any(box_hit[sl]),
                        functools.partial(_mt_rows, blk, b, sl=sl),
                        lambda c: c,
                        (best_t[sl], best_k[sl]),
                    ))
                return (jnp.concatenate([p[0] for p in parts]),
                        jnp.concatenate([p[1] for p in parts]))
            blk = _load_tri_block(b)
            out = _mt_rows(blk, b, carry[:2], slice(None))
            if defer:
                return out
            # Full row: v0(3), e1(3), e2(3), albedo(3), fuzz, ir, kind.
            best_t, best_k = out
            upd = best_k != carry[1]
            bk = best_k - sph_pad - b * TRI_BLOCK
            params = _fused_fetch(blk, bk, upd, carry[2:], 0, 15)
            return (best_t, best_k) + params

        tri_carry = (best_t, best_k) if defer \
            else (best_t, best_k) + tri_params
        if n_super:
            # Hierarchical cull with packed box rows: a descended super
            # DMAs its 16 block AABBs into SMEM scratch (a full box
            # table would blow the 1MB SMEM past ~2000 blocks), then
            # each surviving block is swept — from VMEM directly, or
            # via its own DMA when the table lives in HBM.
            def _super_descend(sb, c):
                # NOTE: batching the 16 sibling box tests into one pair
                # slab op + scalar bitmask (1 vector->scalar sync
                # instead of 16 any-reduce conds) measured NEUTRAL to
                # slightly negative on the 65k knot — the per-sibling
                # conds are not the bottleneck.  Kept serial.
                _count(1)
                cp = pltpu.make_async_copy(
                    tri_box_ref.at[pl.ds(sb, 1), :], box_scr, sem_box,
                )
                cp.start()
                cp.wait()
                if key_scr is None:
                    return jax.lax.fori_loop(
                        0, SUPER,
                        lambda jb, c2: tri_sweep_in_super(sb, jb, c2), c
                    )
                return _ordered(
                    SUPER, 2,
                    lambda jb: _box_key(box_scr, 0, c[0], col0=jb * 8),
                    lambda jb, c2: tri_sweep_in_super(sb, jb, c2), c,
                )

            def super_sweep(sb, carry):
                s_enter, s_exit = _box_enter_exit(tri_sup_ref, sb, carry[0])
                s_hit = jnp.logical_and(s_exit > s_enter, alive)
                return jax.lax.cond(
                    jnp.any(s_hit),
                    lambda c: _super_descend(sb, c), lambda c: c, carry)

            #: Children per ordered level is bounded by the key-scratch
            #: row width; meshes past ~4M tris (n_hyper > 128) fall back
            #: to the fixed-order loop at the hyper level.
            ordered_ok = key_scr is not None

            if n_hyper:
                def hyper_sweep(hb, carry):
                    h_enter, h_exit = _box_enter_exit(tri_hyp_ref, hb,
                                                      carry[0])
                    h_hit = jnp.logical_and(h_exit > h_enter, alive)

                    def descend_h(c):
                        _count(2)
                        if not ordered_ok:
                            return jax.lax.fori_loop(
                                0, SUPER,
                                lambda js, c2: super_sweep(
                                    hb * SUPER + js, c2),
                                c
                            )
                        return _ordered(
                            SUPER, 1,
                            lambda js: _box_key(tri_sup_ref,
                                                hb * SUPER + js, c[0]),
                            lambda js, c2: super_sweep(hb * SUPER + js, c2),
                            c,
                        )

                    return jax.lax.cond(jnp.any(h_hit), descend_h,
                                        lambda c: c, carry)

                if ordered_ok and n_hyper <= KEY_ROW:
                    tri_carry = _ordered(
                        n_hyper, 0,
                        lambda hb: _box_key(tri_hyp_ref, hb, tri_carry[0]),
                        hyper_sweep, tri_carry,
                    )
                else:
                    tri_carry = jax.lax.fori_loop(
                        0, n_hyper, hyper_sweep, tri_carry
                    )
            elif ordered_ok and n_super <= KEY_ROW:
                tri_carry = _ordered(
                    n_super, 0,
                    lambda sb: _box_key(tri_sup_ref, sb, tri_carry[0]),
                    super_sweep, tri_carry,
                )
            else:
                tri_carry = jax.lax.fori_loop(
                    0, n_super, super_sweep, tri_carry
                )
        else:
            tri_carry = jax.lax.fori_loop(
                0, n_tri_blocks, tri_sweep, tri_carry
            )
        best_t, best_k = tri_carry[0], tri_carry[1]
        if not defer:
            tri_params = tri_carry[2:]

    if not fetch:  # occlusion-only sweep: callers consume best_t alone
        return best_t, best_k, sph_params, tri_params

    if defer:
        hit = jnp.logical_and(alive, best_t < BIG)

        def _winner_fetch(pend0, blk_of, load, base, block_sz, params,
                          n_params):
            """Fetch winner rows once per DISTINCT winner block.

            ``pend0``: int32 mask of lanes whose winner lives in this
            table; ``blk_of``: per-lane winner block id; terminates in
            as many iterations as there are distinct winner blocks in
            the tile (post-sort typically 1-3)."""
            sentinel = jnp.int32(0x7FFFFFFF)

            def cond(c):
                return jnp.any(c[0] > 0)

            def body(c):
                pend = c[0]
                b = jnp.min(jnp.where(pend > 0, blk_of, sentinel))
                blk = load(b)
                upd = jnp.logical_and(pend > 0, blk_of == b)
                bk_local = best_k - base - b * block_sz
                new = _fused_fetch(blk, bk_local, upd, c[1:], 0, n_params)
                return (jnp.where(upd, 0, pend),) + new

            out = jax.lax.while_loop(cond, body, (pend0,) + params)
            return out[1:]

        if n_blocks:
            sph_params = _winner_fetch(
                jnp.logical_and(hit, best_k < sph_pad).astype(jnp.int32),
                best_k // SPHERE_BLOCK,
                lambda b: tbl_ref[
                    pl.ds(pl.multiple_of(b * SPHERE_BLOCK, SPHERE_BLOCK),
                          SPHERE_BLOCK), :
                ],
                0, SPHERE_BLOCK, sph_params, n_sp,
            )
        if n_tri_blocks:
            tri_params = _winner_fetch(
                jnp.logical_and(hit, best_k >= sph_pad).astype(jnp.int32),
                (best_k - sph_pad) // TRI_BLOCK,
                _load_tri_block, sph_pad, TRI_BLOCK, tri_params, 15,
            )

    return best_t, best_k, sph_params, tri_params


def _hit_basics(state, sph_params, tri_params, best_t, best_k, *,
                n_blocks, n_tri_blocks, cull=True, checker=False):
    """Re-derive the hit record from the winner's parameters.

    Shared by :func:`_shade_pure` (scatter) and the NEE direct-light
    block (:func:`_bounce_core`): (hit, t_hit, p, n, front, albedo,
    fuzz, ir, kind, |d|^2).  Differentiable — the t re-derivation is
    what makes the gradient kernels exact (see _shade_pure docstring).
    """
    (ox, oy, oz, dx, dy, dz, tm, _tpr, _tpg, _tpb, _rr, _rg, _rb) = state
    (c0x, c0y, c0z, dcx, dcy, dcz, r_, alr, alg, alb, fuzz, ir,
     kind) = sph_params[:13]
    hit = best_t < BIG
    a = dx * dx + dy * dy + dz * dz

    # ---- re-derive sphere t from winner params ----------------------
    ocx = ox - (c0x + tm * dcx)
    ocy = oy - (c0y + tm * dcy)
    ocz = oz - (c0z + tm * dcz)
    h = ocx * dx + ocy * dy + ocz * dz
    cc = ocx * ocx + ocy * ocy + ocz * ocz - r_ * r_
    disc = h * h - a * cc
    sq = jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0))
    inv_a = 1.0 / a
    near = (-h - sq) * inv_a
    far = (-h + sq) * inv_a
    root_is_near = jnp.abs(near - best_t) <= jnp.abs(far - best_t)
    t_sph = jnp.where(root_is_near, near, far)
    t_hit = jnp.where(hit, t_sph, 1.0)

    tnxb = tnyb = tnzb = None
    if n_tri_blocks:
        (tv0x, tv0y, tv0z, te1x, te1y, te1z, te2x, te2y, te2z,
         talr, talg, talb, tfuzz, tir, tkind) = tri_params
        is_tri = best_k >= n_blocks * SPHERE_BLOCK
        # Re-derive triangle t: (ao . n) / det (determinant form).
        tnxb = te1y * te2z - te1z * te2y
        tnyb = te1z * te2x - te1x * te2z
        tnzb = te1x * te2y - te1y * te2x
        tdet = -(dx * tnxb + dy * tnyb + dz * tnzb)
        tdet_safe = jnp.where(jnp.abs(tdet) > 1e-12, tdet, 1.0)
        aox = ox - tv0x
        aoy = oy - tv0y
        aoz = oz - tv0z
        t_tri = (aox * tnxb + aoy * tnyb + aoz * tnzb) / tdet_safe
        t_hit = jnp.where(hit & is_tri, t_tri, t_hit)
        alr = jnp.where(is_tri, talr, alr)
        alg = jnp.where(is_tri, talg, alg)
        alb = jnp.where(is_tri, talb, alb)
        fuzz = jnp.where(is_tri, tfuzz, fuzz)
        ir = jnp.where(is_tri, tir, ir)
        kind = jnp.where(is_tri, tkind, kind)

    # ---- hit record -------------------------------------------------
    px = ox + t_hit * dx
    py = oy + t_hit * dy
    pz = oz + t_hit * dz
    r_abs = jnp.where(r_ == 0.0, 1.0, jnp.abs(r_))
    nx = (px - (c0x + tm * dcx)) / r_abs
    ny = (py - (c0y + tm * dcy)) / r_abs
    nz = (pz - (c0z + tm * dcz)) / r_abs
    dn = dx * nx + dy * ny + dz * nz
    front = jnp.logical_xor(dn < 0.0, r_ < 0.0)
    flip = jnp.where(front, 1.0, -1.0)
    nx, ny, nz = nx * flip, ny * flip, nz * flip

    if n_tri_blocks:
        # Triangle normal: unit cross(e1, e2); reference reports
        # triangles always front-facing (src/common-model.cpp:122).
        tl2 = tnxb * tnxb + tnyb * tnyb + tnzb * tnzb
        tl_ok = tl2 > 0.0
        tinv = jnp.where(tl_ok,
                         jax.lax.rsqrt(jnp.where(tl_ok, tl2, 1.0)), 0.0)
        tnx, tny, tnz = tnxb * tinv, tnyb * tinv, tnzb * tinv
        if not cull:
            tflip = jnp.where(dx * tnx + dy * tny + dz * tnz < 0.0,
                              1.0, -1.0)
            tnx, tny, tnz = tnx * tflip, tny * tflip, tnz * tflip
        nx = jnp.where(is_tri, tnx, nx)
        ny = jnp.where(is_tri, tny, ny)
        nz = jnp.where(is_tri, tnz, nz)
        front = jnp.logical_or(is_tri, front)

    if checker:
        # Textured albedos (sphere-only; build() rejects textures on
        # triangles): the second color rides the sphere table's cols
        # 13-15, the scale the ir column.  CHECKER picks by cell
        # parity; NOISE lerps by the marble weight (hash value noise —
        # pure arithmetic, kernel-safe).
        from ..models.materials import marble_t

        al2r, al2g, al2b = sph_params[13:16]
        sp = (jnp.sin(ir * px) * jnp.sin(ir * py) * jnp.sin(ir * pz))
        use_odd = jnp.logical_and(kind == np.float32(CHECKER), sp < 0.0)
        alr = jnp.where(use_odd, al2r, alr)
        alg = jnp.where(use_odd, al2g, alg)
        alb = jnp.where(use_odd, al2b, alb)
        is_noise = kind == np.float32(NOISE)
        t = marble_t(px, py, pz, ir)
        alr = jnp.where(is_noise, alr + (al2r - alr) * t, alr)
        alg = jnp.where(is_noise, alg + (al2g - alg) * t, alg)
        alb = jnp.where(is_noise, alb + (al2b - alb) * t, alb)

    return (hit, t_hit, px, py, pz, nx, ny, nz, front,
            alr, alg, alb, fuzz, ir, kind, a)


def _shade_pure(state, sph_params, tri_params, draws,
                best_t, best_k, alive, bounce, max_depth, *,
                n_blocks, n_tri_blocks, cull=True, ablate="full",
                emissive=False, bg=None, basics=None, from_diffuse=None,
                checker=False, lights_ref=None, nee_kinds=(),
                v_event=None, rr_u=None):
    """The differentiable half of a bounce: winner params -> new state.

    ``v_event`` (constant-density media, ops/volumes.py): a
    (v_hit, t_v, albedo_r, g, b, dir_x, y, z) tuple — a volume scatter
    at t_v OVERRIDES the surface interaction (and the sky on misses):
    the lane advances to the free-flight point with the isotropic
    direction and picks up the medium's albedo.  The volume direction
    is u_hat/2, so the stateless MIS pdf recovery sqrt(a)/(2 pi) in the
    emissive block yields exactly the isotropic phase pdf 1/(4 pi).

    ``state`` = 13-tuple (ox..dz, tm, tpr..tpb, rr..rb); ``sph_params``
    the winner's 13 sphere-table values; ``tri_params`` the winner's 15
    triangle-table values; ``draws`` = (uvx, uvy, uvz, choice) RNG
    values.  The intersection t is RE-DERIVED here from the winner's
    parameters (root selection pinned to the sweep's best_t), so
    ``jax.vjp`` of this function gives the exact geometry gradient —
    d(hit point)/d(center, radius, vertex) flows through the quadratic /
    Moller-Trumbore root, while argmin winner choice and material
    branches stay piecewise-constant (standard inverse rendering
    practice; same convention as the jnp path, diff.py).

    Discrete comparisons are computed inside; jax.vjp naturally assigns
    them zero cotangent.  Reference semantics: ray_color
    (src/render.cpp:112-129).
    """
    (ox, oy, oz, dx, dy, dz, tm, tpr, tpg, tpb, rr, rg, rb) = state
    uvx, uvy, uvz, choice = draws
    if basics is None:
        basics = _hit_basics(state, sph_params, tri_params, best_t, best_k,
                             n_blocks=n_blocks, n_tri_blocks=n_tri_blocks,
                             cull=cull, checker=checker)
    (hit, t_hit, px, py, pz, nx, ny, nz, front,
     alr, alg, alb, fuzz, ir, kind, a) = basics

    # Lambertian: n + unit (degenerate -> n).
    lamx, lamy, lamz = nx + uvx, ny + uvy, nz + uvz
    degen = lamx * lamx + lamy * lamy + lamz * lamz < 1e-12
    lamx = jnp.where(degen, nx, lamx)
    lamy = jnp.where(degen, ny, lamy)
    lamz = jnp.where(degen, nz, lamz)

    # Metal: reflect(raw d) + fuzz*unit (no horizon check — reference).
    ddn2 = 2.0 * (dx * nx + dy * ny + dz * nz)
    mrx = dx - ddn2 * nx + fuzz * uvx
    mry = dy - ddn2 * ny + fuzz * uvy
    mrz = dz - ddn2 * nz + fuzz * uvz

    # Dielectric: Schlick + TIR stochastic choice, + fuzz extension.
    dlen = jnp.sqrt(a)
    inv_dlen = 1.0 / dlen
    udx, udy, udz = dx * inv_dlen, dy * inv_dlen, dz * inv_dlen
    cos_t = jnp.minimum(-(udx * nx + udy * ny + udz * nz), 1.0)
    # Epsilon floor (not a where-guard): sin_t's VALUE feeds the TIR
    # test, and sqrt'(0)=inf would NaN-poison reverse mode at normal
    # incidence even though the comparison carries no cotangent.
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 1e-12))
    ir_safe = jnp.where(ir > 0.0, ir, 1.0)
    ratio = jnp.where(front, 1.0 / ir_safe, ir_safe)
    cannot = ratio * sin_t > 1.0
    r0 = (1.0 - ratio) / (1.0 + ratio)
    r0 = r0 * r0
    omc = 1.0 - cos_t
    omc2 = omc * omc
    refl_p = r0 + (1.0 - r0) * omc2 * omc2 * omc
    must_reflect = jnp.logical_or(cannot, refl_p > choice)
    # refract (glm semantics, unit incident).  Double-where guard: under
    # TIR k_raw <= 0 and sqrt's derivative is inf; the refract branch is
    # discarded by must_reflect's where, but inf * 0 = NaN in reverse
    # mode unless the sqrt argument itself is guarded.
    k_raw = 1.0 - ratio * ratio * (1.0 - cos_t * cos_t)
    k_ok = k_raw > 0.0
    sqk = jnp.sqrt(jnp.where(k_ok, k_raw, 1.0))
    sqk = jnp.where(k_ok, sqk, 0.0)
    rfx = ratio * udx + (ratio * cos_t - sqk) * nx
    rfy = ratio * udy + (ratio * cos_t - sqk) * ny
    rfz = ratio * udz + (ratio * cos_t - sqk) * nz
    # reflect (unit incident)
    udn2 = 2.0 * (udx * nx + udy * ny + udz * nz)
    rlx = udx - udn2 * nx
    rly = udy - udn2 * ny
    rlz = udz - udn2 * nz
    dix = jnp.where(must_reflect, rlx, rfx) + fuzz * uvx
    diy = jnp.where(must_reflect, rly, rfy) + fuzz * uvy
    diz = jnp.where(must_reflect, rlz, rfz) + fuzz * uvz

    is_metal = kind == np.float32(METAL)
    is_diel = kind == np.float32(DIELECTRIC)
    sdx = jnp.where(is_metal, mrx, jnp.where(is_diel, dix, lamx))
    sdy = jnp.where(is_metal, mry, jnp.where(is_diel, diy, lamy))
    sdz = jnp.where(is_metal, mrz, jnp.where(is_diel, diz, lamz))
    atr = jnp.where(is_diel, 1.0, alr)
    atg = jnp.where(is_diel, 1.0, alg)
    atb = jnp.where(is_diel, 1.0, alb)

    if v_event is not None:
        (v_hit, v_t, v_ar, v_ag, v_ab, v_dx, v_dy, v_dz) = v_event
        v_hit = jnp.logical_and(v_hit, alive)
        v_can = jnp.logical_and(v_hit, bounce < max_depth)
        # Free-flight point from the INCOMING ray (before the advance
        # selects overwrite o/d below).
        vpx = ox + v_t * dx
        vpy = oy + v_t * dy
        vpz = oz + v_t * dz
    else:
        v_hit = v_can = jnp.zeros_like(alive)

    # ---- background for missed live lanes ---------------------------
    missed = jnp.logical_and(jnp.logical_and(alive, jnp.logical_not(hit)),
                             jnp.logical_not(v_hit))
    if bg is None:  # reference sky gradient
        inv_len = 1.0 / jnp.sqrt(a)
        sky_t = 0.5 * (dy * inv_len + 1.0)
        skyr = 1.0 - sky_t + sky_t * 0.5
        skyg = 1.0 - sky_t + sky_t * 0.7
        skyb = 1.0  # 1-t + t*1.0
    else:  # static flat color (light-driven scenes: black)
        skyr = np.float32(bg[0])
        skyg = np.float32(bg[1])
        skyb = np.float32(bg[2])
    rr = rr + jnp.where(missed, tpr * skyr, 0.0)
    rg = rg + jnp.where(missed, tpg * skyg, 0.0)
    rb = rb + jnp.where(missed, tpb * skyb, 0.0)

    # ---- advance ----------------------------------------------------
    can = jnp.logical_and(jnp.logical_and(alive, hit), bounce < max_depth)
    can = jnp.logical_and(can, jnp.logical_not(v_hit))
    if emissive:
        # Area lights: a hit on an EMISSIVE winner adds throughput *
        # emitted (the albedo columns) and retires the lane — no
        # scatter budget consumed, so emission lands even at depth.
        # Static-gated: lightless scenes compile the unchanged bounce.
        is_emis = kind == np.float32(EMISSIVE)
        lit = jnp.logical_and(jnp.logical_and(alive, hit), is_emis)
        lit = jnp.logical_and(lit, jnp.logical_not(v_hit))
        if from_diffuse is not None:
            # MIS balance heuristic: a BRDF-sampled emissive hit shares
            # its path with the previous Lambertian bounce's light
            # sample; weight by pdf_brdf/(pdf_brdf + pdf_light).  The
            # scatter cosine needs NO extra state: a diffuse direction
            # is the raw n_hat + u_hat, so cos = |d|/2 = sqrt(a)/2 and
            # pdf_brdf = sqrt(a)/(2 pi).  Specular/camera lanes
            # (from_diffuse False) keep full weight.
            from .lights import light_pdf_toward

            p_l = light_pdf_toward(lights_ref, nee_kinds,
                                   ox, oy, oz, dx, dy, dz, t_hit, tm)
            p_b = jnp.sqrt(a) * np.float32(0.5 / np.pi)
            w_emit = jnp.where(
                from_diffuse,
                p_b / jnp.maximum(p_b + p_l, 1e-12), 1.0)
        else:
            w_emit = 1.0
        rr = rr + jnp.where(lit, tpr * alr * w_emit, 0.0)
        rg = rg + jnp.where(lit, tpg * alg * w_emit, 0.0)
        rb = rb + jnp.where(lit, tpb * alb * w_emit, 0.0)
        can = jnp.logical_and(can, jnp.logical_not(is_emis))
    if ablate == "noscatter":
        can = jnp.zeros_like(can)  # hit lanes retire; scatter code DCEs
    ox = jnp.where(can, px, ox)
    oy = jnp.where(can, py, oy)
    oz = jnp.where(can, pz, oz)
    dx = jnp.where(can, sdx, dx)
    dy = jnp.where(can, sdy, dy)
    dz = jnp.where(can, sdz, dz)
    tpr = jnp.where(can, tpr * atr, tpr)
    tpg = jnp.where(can, tpg * atg, tpg)
    tpb = jnp.where(can, tpb * atb, tpb)
    bounce = bounce + can.astype(jnp.int32)
    if v_event is not None:
        # Volume scatter: advance to the free-flight point with the
        # isotropic u_hat/2 direction (see docstring), throughput picks
        # up the medium albedo; one bounce of budget consumed.
        ox = jnp.where(v_can, vpx, ox)
        oy = jnp.where(v_can, vpy, oy)
        oz = jnp.where(v_can, vpz, oz)
        dx = jnp.where(v_can, v_dx, dx)
        dy = jnp.where(v_can, v_dy, dy)
        dz = jnp.where(v_can, v_dz, dz)
        tpr = jnp.where(v_can, tpr * v_ar, tpr)
        tpg = jnp.where(v_can, tpg * v_ag, tpg)
        tpb = jnp.where(v_can, tpb * v_ab, tpb)
        bounce = bounce + v_can.astype(jnp.int32)
    if rr_u is not None:
        # Russian roulette (integrator.RR_START/RR_PMIN semantics;
        # off by default — reference terminates by depth only,
        # src/render.cpp:114-115): lanes past RR_START scatters survive
        # with p = clamp(max throughput channel, PMIN, 1), boosted 1/p.
        # ``bounce`` is post-increment here (scatters completed), so the
        # > comparison matches the jnp paths' pre-increment >=.
        from .integrator import RR_PMIN, RR_START

        p = jnp.clip(jnp.maximum(jnp.maximum(tpr, tpg), tpb),
                     np.float32(RR_PMIN), 1.0)
        cont = (jnp.logical_or(can, v_can) if v_event is not None
                else can)
        consider = jnp.logical_and(cont, bounce > RR_START)
        kill = jnp.logical_and(consider, rr_u >= p)
        boost = jnp.where(
            jnp.logical_and(consider, jnp.logical_not(kill)), 1.0 / p, 1.0)
        tpr, tpg, tpb = tpr * boost, tpg * boost, tpb * boost
        not_kill = jnp.logical_not(kill)
        can = jnp.logical_and(can, not_kill)
        if v_event is not None:
            v_can = jnp.logical_and(v_can, not_kill)
    if from_diffuse is not None:
        # NEE: encode came-from-Lambertian in the alive code (0 dead,
        # 1 specular-alive, 2 diffuse-alive) — no extra state array.
        # CHECKER/NOISE are Lambertians with point-dependent albedo;
        # volume scatters count as diffuse (their NEE sample fired).
        is_lam = jnp.logical_or(
            kind == np.float32(LAMBERTIAN),
            jnp.logical_or(kind == np.float32(CHECKER),
                           kind == np.float32(NOISE)))
        can = can.astype(jnp.int32) * jnp.where(is_lam, 2, 1)
        can = jnp.where(v_can, 2, can)
    elif v_event is not None:
        can = jnp.logical_or(can, v_can)
    return (ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, rr, rg, rb, can,
            bounce)


def _draw_scatter(lane_u32, salt, ablate="full"):
    """The bounce's RNG draws (unit vector + dielectric choice).

    Counter-based and stateless: the backward kernel replays the exact
    same values from (lane id, iteration) — common random numbers by
    construction."""
    uz = 1.0 - 2.0 * _uniform(lane_u32, salt, 5)
    uu = _uniform(lane_u32, salt, 6)
    uxy = jnp.sqrt(jnp.maximum(1.0 - uz * uz, 0.0))
    if ablate == "noregen":
        uvx, uvy = uxy * uu, uxy * (1.0 - uu)
    else:
        uph = _TWO_PI * uu
        uvx = uxy * jnp.cos(uph)
        uvy = uxy * jnp.sin(uph)
    choice = _uniform(lane_u32, salt, 7)
    return uvx, uvy, uz, choice


def _nee_contrib(state, sph_params, tri_params, best_t, best_k, alive,
                 bounce, max_depth, nee_us, lights_ref, nee_kinds, *,
                 n_blocks, n_tri_blocks, cull=True, checker=False,
                 v_event=None, vol_kinds=(), vol_row0=0):
    """The differentiable half of next-event estimation.

    Everything between the main sweep and the shadow sweep: hit basics,
    the light sample (ops/lights.py), and the unoccluded direct
    contribution — i.e. all of NEE except the shadow ray's visibility
    bit, which the caller supplies by sweeping the returned ray.
    Shared by :func:`_bounce_core` (forward) and the backward gradient
    kernel (ops/pallas_grad.py), whose ``jax.vjp`` of this function +
    :func:`_shade_pure` yields exact NEE gradients under common random
    numbers (visibility is piecewise-constant, so treating ``open_`` as
    a replayed constant drops no cotangent).

    ``nee_us`` = (pick, u1, u2) per-lane uniforms.  Returns
    (basics, (sx, sy, sz), (ldx, ldy, ldz), thresh, (cr, cg, cb),
    nee_act): shadow origin/direction, the occlusion threshold, and the
    per-channel contribution to ADD where the shadow ray is open.
    """
    from .lights import sample_light_dirs

    (ox, oy, oz, dx, dy, dz, tm, tpr, tpg, tpb, _rr, _rg, _rb) = state
    pick, u1, u2 = nee_us
    basics = _hit_basics(
        state, sph_params, tri_params, best_t, best_k,
        n_blocks=n_blocks, n_tri_blocks=n_tri_blocks, cull=cull,
        checker=checker,
    )
    (hit, _t_hit, px, py, pz, nx, ny, nz, _front,
     alr, alg, alb, _fuzz, _ir, kind, _a) = basics
    v_act = None
    if v_event is not None:
        # Volume scatters sample a light too (from the free-flight
        # point, isotropic phase: factor 1/4 instead of cos, pdf
        # 1/(4 pi) in the balance weight).
        v_act = jnp.logical_and(jnp.logical_and(alive, v_event[0]),
                                bounce < max_depth)
        px = jnp.where(v_act, ox + v_event[1] * dx, px)
        py = jnp.where(v_act, oy + v_event[1] * dy, py)
        pz = jnp.where(v_act, oz + v_event[1] * dz, pz)
    ldx, ldy, ldz, t_l, (w0, w1, w2), l_pdf = sample_light_dirs(
        lights_ref, nee_kinds, pick, u1, u2, px, py, pz, tm)
    nee_act = jnp.logical_and(
        jnp.logical_and(jnp.logical_and(alive, hit),
                        bounce < max_depth),
        jnp.logical_or(
            kind == np.float32(LAMBERTIAN),
            jnp.logical_or(kind == np.float32(CHECKER),
                           kind == np.float32(NOISE))),
    )
    if v_event is not None:
        nee_act = jnp.logical_or(
            jnp.logical_and(nee_act, jnp.logical_not(v_event[0])),
            v_act)
    thresh = t_l * np.float32(1.0 - 1e-3)
    cos_t = jnp.maximum(nx * ldx + ny * ldy + nz * ldz, 0.0)
    # MIS: balance the light sample against the scatter strategy
    # (cosine pdf at surfaces, 1/(4 pi) phase at volume events) —
    # the paired weight lands on emission-on-hit in _shade_pure.
    phase = cos_t * np.float32(1.0 / np.pi)
    factor = cos_t
    nar, nag, nab = alr, alg, alb
    if v_event is not None:
        phase = jnp.where(v_act, np.float32(0.25 / np.pi), phase)
        factor = jnp.where(v_act, np.float32(0.25), factor)
        nar = jnp.where(v_act, v_event[2], nar)
        nag = jnp.where(v_act, v_event[3], nag)
        nab = jnp.where(v_act, v_event[4], nab)
    w_l = l_pdf / jnp.maximum(l_pdf + phase, 1e-12)
    if vol_kinds:
        # Shadow rays attenuate through media deterministically
        # (exp(-sigma * overlap)); without it NEE overcounts.
        from .volumes import _OffsetRows, volume_transmittance

        factor = factor * volume_transmittance(
            _OffsetRows(lights_ref, vol_row0), vol_kinds,
            px, py, pz, ldx, ldy, ldz, t_l)
    cw = factor * w_l
    contrib = (tpr * nar * w0 * cw, tpg * nag * w1 * cw,
               tpb * nab * w2 * cw)
    return basics, (px, py, pz), (ldx, ldy, ldz), thresh, contrib, nee_act


def _bounce_core(tbl_ref, sph_box_ref, tri_ref, tri_box_ref, tri_sup_ref,
                 ox, oy, oz, dx, dy, dz, tm, tpr, tpg, tpb, rr, rg, rb,
                 alive, bounce, lane_u32, salt, max_depth, *,
                 n_blocks, n_tri_blocks, n_super=0, cull=True, ablate="full",
                 tri_hbm=False, tri_scr=None, box_scr=None, sem_tri=None,
                 sem_box=None, tri_hyp_ref=None, n_hyper=0, tri_t=False,
                 key_scr=None, cnt_scr=None, emissive=False, bg=None,
                 lights_ref=None, nee_kinds=(), from_diffuse=None,
                 checker=False, vol_kinds=(), vol_row0=0, roulette=False,
                 sweep_split=1):
    """One intersect+shade step for every live lane of a tile.

    The shared heart of the megakernels (persistent whole-frame,
    flat sorted-wavefront, and the gradient kernels): _sweep_all
    (discrete nearest hit + winner fetch) followed by _shade_pure
    (differentiable shade/advance).  Reference semantics are
    ``ray_color`` (src/render.cpp:112-129).

    ``nee_kinds`` (static light-kind tuple) enables next-event
    estimation: a second sweep traces one shadow ray per Lambertian
    hit toward a sampled light (ops/lights.py) and adds the direct
    contribution; the returned alive value is then a CODE (0 dead,
    1 specular-alive, 2 diffuse-alive) and ``from_diffuse`` must carry
    the previous bounce's flag so emission-on-hit is suppressed.

    All state is (rows, LANES) f32 except ``alive`` (bool) and
    ``bounce`` (int32).  Returns the advanced 14-tuple
    (ox..dz, tpr..tpb, rr..rb, can, bounce) — ``tm`` is unchanged.
    """
    best_t, best_k, sph_params, tri_params = _sweep_all(
        tbl_ref, sph_box_ref, tri_ref, tri_box_ref, tri_sup_ref,
        ox, oy, oz, dx, dy, dz, tm, alive,
        n_blocks=n_blocks, n_tri_blocks=n_tri_blocks, n_super=n_super,
        cull=cull, tri_hbm=tri_hbm, tri_scr=tri_scr, box_scr=box_scr,
        sem_tri=sem_tri, sem_box=sem_box, tri_hyp_ref=tri_hyp_ref,
        n_hyper=n_hyper, tri_t=tri_t, key_scr=key_scr, cnt_scr=cnt_scr,
        checker=checker, sweep_split=sweep_split,
    )
    if ablate == "nofetch":
        zero = jnp.zeros(ox.shape, jnp.float32)
        sph_params = tuple(zero + 0.3 for _ in range(_TBL_ROWS))
    draws = _draw_scatter(lane_u32, salt, ablate)
    v_event = None
    if vol_kinds:
        # Constant-density media (ops/volumes.py): the volume rows ride
        # the light-table operand at rows >= vol_row0.  One independent
        # uniform per volume (salts 16+), isotropic direction = the
        # bounce's unit draw scaled to 1/2 (stateless MIS pdf — see
        # _shade_pure docstring).
        from .volumes import _OffsetAlbedo, _OffsetRows, sample_volume_event

        vus = tuple(_uniform(lane_u32, salt, 16 + j)
                    for j in range(len(vol_kinds)))
        v_hit0, v_t, (v_ar, v_ag, v_ab) = sample_volume_event(
            _OffsetRows(lights_ref, vol_row0),
            _OffsetAlbedo(lights_ref, vol_row0),
            vol_kinds, vus, ox, oy, oz, dx, dy, dz, best_t)
        uvx, uvy, uvz, _choice = draws
        v_event = (v_hit0, v_t, v_ar, v_ag, v_ab,
                   uvx * 0.5, uvy * 0.5, uvz * 0.5)
    basics = None
    if nee_kinds:
        nee_us = (_uniform(lane_u32, salt, 8), _uniform(lane_u32, salt, 9),
                  _uniform(lane_u32, salt, 10))
        basics, (px, py, pz), (ldx, ldy, ldz), thresh, contrib, nee_act = \
            _nee_contrib(
                (ox, oy, oz, dx, dy, dz, tm, tpr, tpg, tpb, rr, rg, rb),
                sph_params, tri_params, best_t, best_k, alive, bounce,
                max_depth, nee_us, lights_ref, nee_kinds,
                n_blocks=n_blocks, n_tri_blocks=n_tri_blocks, cull=cull,
                checker=checker, v_event=v_event, vol_kinds=vol_kinds,
                vol_row0=vol_row0,
            )
        # Shadow sweep: occlusion = anything nearer than the sampled
        # light point (a culled back-facing light is transparent AND
        # zero-weighted, consistently).  best_t is seeded with the
        # light distance so the f2b descent culls boxes beyond the
        # light, and the winner fetch is skipped entirely.
        s_t, _sk, _sp, _tp = _sweep_all(
            tbl_ref, sph_box_ref, tri_ref, tri_box_ref, tri_sup_ref,
            px, py, pz, ldx, ldy, ldz, tm, nee_act,
            n_blocks=n_blocks, n_tri_blocks=n_tri_blocks, n_super=n_super,
            cull=cull, tri_hbm=tri_hbm, tri_scr=tri_scr, box_scr=box_scr,
            sem_tri=sem_tri, sem_box=sem_box, tri_hyp_ref=tri_hyp_ref,
            n_hyper=n_hyper, tri_t=tri_t, key_scr=key_scr,
            cnt_scr=cnt_scr, t_init=thresh, fetch=False,
            sweep_split=sweep_split,
        )
        add = jnp.logical_and(nee_act, s_t >= thresh)
        rr = rr + jnp.where(add, contrib[0], 0.0)
        rg = rg + jnp.where(add, contrib[1], 0.0)
        rb = rb + jnp.where(add, contrib[2], 0.0)
    return _shade_pure(
        (ox, oy, oz, dx, dy, dz, tm, tpr, tpg, tpb, rr, rg, rb),
        sph_params, tri_params, draws, best_t, best_k, alive, bounce,
        max_depth, n_blocks=n_blocks, n_tri_blocks=n_tri_blocks,
        cull=cull, ablate=ablate, emissive=emissive, bg=bg,
        basics=basics, from_diffuse=from_diffuse if nee_kinds else None,
        checker=checker, lights_ref=lights_ref, nee_kinds=nee_kinds,
        v_event=v_event,
        rr_u=_uniform(lane_u32, salt, 11) if roulette else None,
    )


def _kernel(cam_ref, meta_ref, tbl_ref, sph_box_ref, tri_ref, tri_box_ref,
            tri_sup_ref, lights_ref, out_r, out_g, out_b, *extra, n_blocks,
            n_tri_blocks, n_super=0, cull=True, ablate="full",
            fixed_iters=0, emissive=False, bg=None, nee_kinds=(),
            checker=False, vol_kinds=(), vol_row0=0, roulette=False,
            stats=False):
    key_scr = stats_o = None
    if stats:
        # Roofline instrument: per-tile counters [0]=block sweeps
        # (sphere+tri, incl. NEE shadow sweeps), [1]=supers, [2]=hypers,
        # [3]=loop iterations, [4]=live-lane-iterations.
        stats_o, key_scr = extra
        for j in range(5):
            key_scr[3, j] = 0.0
    # Global tile id: grid position + this shard's tile offset (meta[0,4])
    # — devices in a mesh each render a contiguous tile range.
    pid = pl.program_id(0) + meta_ref[0, 4]

    width = meta_ref[0, 1]
    height = meta_ref[0, 2]
    n_pixels = meta_ref[0, 3]
    # Runtime knobs (not compile-time): one compiled kernel serves every
    # spp/depth — Mosaic compiles take minutes through the remote tunnel.
    spp = meta_ref[0, 5]
    max_depth = meta_ref[0, 6]

    # Camera scalars.
    cox, coy, coz = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
    cux, cuy, cuz = cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5]
    cvx, cvy, cvz = cam_ref[0, 6], cam_ref[0, 7], cam_ref[0, 8]
    llx, lly, llz = cam_ref[0, 9], cam_ref[0, 10], cam_ref[0, 11]
    chx, chy, chz = cam_ref[0, 12], cam_ref[0, 13], cam_ref[0, 14]
    cwx, cwy, cwz = cam_ref[0, 15], cam_ref[0, 16], cam_ref[0, 17]
    lens_r = cam_ref[0, 18]
    t0 = cam_ref[0, 19]
    dt = cam_ref[0, 20]

    shape = (TILE_ROWS, LANES)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    # Spatially coherent tiling: each program owns an 8x128 IMAGE block
    # (not a full-width strip), so blocks without long glass paths hit
    # their early exit together — the tail of the per-tile while loop is
    # set by the slowest pixel in the block.
    tiles_x = (width + LANES - 1) // LANES
    prow = (pid // tiles_x) * TILE_ROWS + rows
    pcol = (pid % tiles_x) * LANES + cols
    in_img = jnp.logical_and(prow < height, pcol < width)
    pix = pid * TILE + rows * LANES + cols  # globally unique lane id (RNG)
    lane_u32 = _mix(pix.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    spp_lim = jnp.where(in_img, spp, 0)

    inv_w = 1.0 / (width - 1).astype(jnp.float32)
    inv_h = 1.0 / (height - 1).astype(jnp.float32)
    frow = (height - 1 - prow).astype(jnp.float32)
    fcol = pcol.astype(jnp.float32)

    zero = jnp.zeros(shape, jnp.float32)

    # ---- drain-balanced work pool (RTOW_POOL) --------------------------
    # Classic layout binds each lane to ONE pixel for all spp samples, so
    # a tile runs until its hardest pixel finishes — measured live-lane
    # occupancy 55-62% on the cover (the drain is pixel-difficulty
    # spread, not path-length variance).  Pool mode instead treats a
    # ROW's 128 pixels x spp samples as a shared queue of
    # (column, CHUNK-sample) items: at every K-th iteration, idle lanes
    # take the next item (distinct via an exclusive prefix sum — one
    # small triangular matmul) and FLUSH their accumulated
    # radiance into a per-pixel accumulator through a one-hot matmul, so
    # accumulation never needs a scatter.  Exact spp accounting is
    # preserved: items partition (pixel, sample) space and the row
    # counter hands each out exactly once.
    # Default ON (production): cover spp128 15.0 -> 19.5 Mrays/s and the
    # spp500 north star 18.4 -> 25.0 on v5e (bench methodology, round 4);
    # golden parity vs the C++ reference and the exact sample audit both
    # pass in pool mode.  Stats builds follow the same setting so the
    # roofline instruments the PRODUCTION scheduler; RTOW_POOL=0
    # measures the classic layout's drain for comparison.
    pool = _os.environ.get("RTOW_POOL", "1") == "1"
    POOL_CHUNK = int(_os.environ.get("RTOW_POOL_CHUNK", "16"))
    # Handout period: measured on the cover (spp500) K=8 24.41, K=4
    # 25.01, K=2 24.26 Mrays/s — boundary-wait idle halves from 8 to 4,
    # then the flush cost catches up.
    POOL_K = int(_os.environ.get("RTOW_POOL_K", "4"))
    # Emergency mid-K handout (round-5 experiment, VERDICT r4 #6): when
    # a whole ROW has gone idle with pool items left, fire take_items
    # immediately instead of waiting for the K boundary — targets the
    # residual ~10% occupancy (K-boundary idle).  Two cheap reduces per
    # iteration; semantically a no-op (take_items at any iteration
    # preserves the handout/flush invariants).
    POOL_EMERGENCY = _os.environ.get("RTOW_POOL_EMERGENCY", "0") == "1"
    if pool:
        n_chunks = (spp + POOL_CHUNK - 1) // POOL_CHUNK  # runtime scalar
        n_items = n_chunks * LANES
        pcol0 = (pid % tiles_x) * LANES  # tile's first image column
        row_ok = prow < height  # (8,128), constant per row
        # Exclusive-prefix-sum matrix: out[j] = sum_{i<j} in[i] needs
        # M[i, j] = 1 iff i < j (strictly upper triangular) — built from
        # iota in-kernel (pallas kernels cannot capture constant arrays).
        iota_i = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        slt = (iota_i < iota_j).astype(jnp.float32)

        def item_budget(col, chunk):
            """Samples in item (col, chunk): 0 off-image / past spp."""
            ok = jnp.logical_and(row_ok, pcol0 + col < width)
            left = spp - chunk * POOL_CHUNK
            return jnp.where(ok, jnp.clip(left, 0, POOL_CHUNK), 0)

    def cond(c):
        # c[13] is the int32 alive mask (bool vectors fail Mosaic's
        # while-carry legalization).
        if pool:
            # rem>0: mid-chunk; next<n_items: pool not drained.
            return jnp.any((c[13] > 0) | (c[15] > 0)
                           | (c[17] < jnp.int32(n_items)))
        return jnp.any((c[13] > 0) | (c[15] < spp_lim))

    def body(c):
        if pool:
            (ox, oy, oz, dx, dy, dz, tm, tpr, tpg, tpb, rr, rg, rb,
             alive_i, bounce, rem, cur_col, nxt, ar, ag, ab, it) = c
        else:
            (ox, oy, oz, dx, dy, dz, tm, tpr, tpg, tpb, rr, rg, rb,
             alive_i, bounce, started, it) = c
        alive = alive_i > 0
        from_diffuse = alive_i > 1 if nee_kinds else None
        salt = (meta_ref[0, 0] + it * jnp.int32(40503)).astype(jnp.uint32)
        salt = _mix(salt)

        if pool:
            # ---- boundary: take new items + flush adopted radiance ----
            def take_items(args):
                (rr, rg, rb, rem, cur_col, nxt, ar, ag, ab) = args
                done = jnp.logical_and(jnp.logical_not(alive), rem == 0)
                done_f = done.astype(jnp.float32)
                off = jax.lax.dot_general(
                    done_f, slt, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)  # exclusive prefix sum along lanes
                item = nxt + off
                take = jnp.logical_and(done, item < n_items)
                # Flush BEFORE switching pixels: lane radiance belongs
                # to cur_col; one-hot matmul per row (no scatter).
                # Bool (128,)->(128,1) reshapes are not legal in Mosaic
                # (1-bit minor-dim insert); mask via f32 products.
                take_f = take.astype(jnp.float32)
                new_a = []
                for ch, acc in ((rr, ar), (rg, ag), (rb, ab)):
                    outs = []
                    for r in range(TILE_ROWS):
                        oh = jnp.where(iota_j == cur_col[r][:, None],
                                       1.0, 0.0)
                        oh = oh * take_f[r][:, None]
                        outs.append(acc[r][None, :] + jax.lax.dot_general(
                            ch[r][None, :], oh, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )[0][None, :])
                    new_a.append(jnp.concatenate(outs, axis=0))
                ar, ag, ab = new_a
                rr = jnp.where(take, 0.0, rr)
                rg = jnp.where(take, 0.0, rg)
                rb = jnp.where(take, 0.0, rb)
                chunk = item // LANES
                col = item % LANES
                cur_col = jnp.where(take, col, cur_col)
                rem = jnp.where(take, item_budget(col, chunk), rem)
                nxt = nxt + jnp.sum(
                    take.astype(jnp.int32), axis=1, keepdims=True
                ).astype(jnp.int32) * jnp.ones((1, LANES), jnp.int32)
                return (rr, rg, rb, rem, cur_col, nxt, ar, ag, ab)

            take_now = it % POOL_K == 0
            if POOL_EMERGENCY:
                done0 = jnp.logical_and(jnp.logical_not(alive), rem == 0)
                starved = jnp.any(jnp.logical_and(
                    jnp.all(done0, axis=1), nxt[:, 0] < n_items))
                take_now = jnp.logical_or(take_now, starved)
            (rr, rg, rb, rem, cur_col, nxt, ar, ag, ab) = jax.lax.cond(
                take_now, take_items, lambda a: a,
                (rr, rg, rb, rem, cur_col, nxt, ar, ag, ab))
            need = jnp.logical_and(jnp.logical_not(alive), rem > 0)
            fcol_cur = (pcol0 + cur_col).astype(jnp.float32)
        else:
            # ---- regeneration: idle lanes with samples left -----------
            need = jnp.logical_and(jnp.logical_not(alive),
                                   started < spp_lim)
            fcol_cur = fcol
        ju = _uniform(lane_u32, salt, 0)
        jv = _uniform(lane_u32, salt, 1)
        s = (fcol_cur + ju) * inv_w
        t = (frow + jv) * inv_h
        du = _uniform(lane_u32, salt, 2)
        dv = _uniform(lane_u32, salt, 3)
        rad_l = lens_r * jnp.sqrt(du)
        if ablate == "noregen":  # measure transcendental cost: skip trig
            lx, ly = rad_l * dv, rad_l * (1.0 - dv)
        else:
            th = _TWO_PI * dv
            lx = rad_l * jnp.cos(th)
            ly = rad_l * jnp.sin(th)
        nox = cox + lx * cux + ly * cvx
        noy = coy + lx * cuy + ly * cvy
        noz = coz + lx * cuz + ly * cvz
        ndx = llx + s * chx + t * cwx - nox
        ndy = lly + s * chy + t * cwy - noy
        ndz = llz + s * chz + t * cwz - noz
        ntm = t0 + _uniform(lane_u32, salt, 4) * dt

        ox = jnp.where(need, nox, ox)
        oy = jnp.where(need, noy, oy)
        oz = jnp.where(need, noz, oz)
        dx = jnp.where(need, ndx, dx)
        dy = jnp.where(need, ndy, dy)
        dz = jnp.where(need, ndz, dz)
        tm = jnp.where(need, ntm, tm)
        tpr = jnp.where(need, 1.0, tpr)
        tpg = jnp.where(need, 1.0, tpg)
        tpb = jnp.where(need, 1.0, tpb)
        bounce = jnp.where(need, 0, bounce)
        if pool:
            rem = rem - need.astype(jnp.int32)
        else:
            started = started + need.astype(jnp.int32)
        alive = jnp.logical_or(alive, need)
        if stats:
            key_scr[3, 3] = key_scr[3, 3] + 1.0
            key_scr[3, 4] = key_scr[3, 4] + jnp.sum(
                alive.astype(jnp.float32))

        if nee_kinds:
            # Regenerated lanes start a fresh camera path: no flag.
            from_diffuse = jnp.logical_and(from_diffuse,
                                           jnp.logical_not(need))
        (ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, rr, rg, rb, can,
         bounce) = _bounce_core(
            tbl_ref, sph_box_ref, tri_ref, tri_box_ref, tri_sup_ref,
            ox, oy, oz, dx, dy, dz, tm, tpr, tpg, tpb, rr, rg, rb,
            alive, bounce, lane_u32, salt, max_depth,
            n_blocks=n_blocks, n_tri_blocks=n_tri_blocks, n_super=n_super,
            cull=cull, ablate=ablate, emissive=emissive, bg=bg,
            lights_ref=lights_ref, nee_kinds=nee_kinds,
            from_diffuse=from_diffuse, checker=checker,
            vol_kinds=vol_kinds, vol_row0=vol_row0, roulette=roulette,
            # Counters only: the production (stats=False) persistent
            # kernel never orders its traversal, so the instrument must
            # not either (key_scr stays None — ADVICE r3 #1).
            cnt_scr=key_scr,
        )
        if pool:
            return (ox, oy, oz, dx, dy, dz, tm, tpr, tpg, tpb, rr, rg,
                    rb, can.astype(jnp.int32), bounce, rem, cur_col,
                    nxt, ar, ag, ab, it + 1)
        return (ox, oy, oz, dx, dy, dz, tm, tpr, tpg, tpb, rr, rg, rb,
                can.astype(jnp.int32), bounce, started, it + 1)

    izero = jnp.zeros(shape, jnp.int32)
    if pool:
        # Initial assignment: lane (r, i) takes item i (its own column,
        # chunk 0); the row counter starts past those 128 items.
        init = (zero, zero, zero, zero + 1.0, zero, zero, zero,
                zero, zero, zero, zero, zero, zero, izero, izero,
                item_budget(cols, jnp.int32(0)), cols,
                izero + jnp.int32(LANES), zero, zero, zero,
                jnp.int32(0))
    else:
        init = (zero, zero, zero, zero + 1.0, zero, zero, zero,
                zero, zero, zero, zero, zero, zero, izero, izero, izero,
                jnp.int32(0))
    if fixed_iters:
        final = jax.lax.fori_loop(
            0, fixed_iters, lambda i, c: body(c), init
        )
    else:
        final = jax.lax.while_loop(cond, body, init)
    if pool:
        # Final flush: every lane's residual radiance joins its pixel's
        # accumulator (one one-hot matmul per row), then write accum.
        rr, rg, rb = final[10], final[11], final[12]
        cur_col = final[16]
        ar, ag, ab = final[18], final[19], final[20]
        outs3 = []
        for ch, acc in ((rr, ar), (rg, ag), (rb, ab)):
            outs = []
            for r in range(TILE_ROWS):
                oh = jnp.where(iota_j == cur_col[r][:, None], 1.0, 0.0)
                outs.append(acc[r][None, :] + jax.lax.dot_general(
                    ch[r][None, :], oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )[0][None, :])
            outs3.append(jnp.concatenate(outs, axis=0))
        out_r[...] = outs3[0]
        out_g[...] = outs3[1]
        out_b[...] = outs3[2]
    else:
        out_r[...] = final[10]
        out_g[...] = final[11]
        out_b[...] = final[12]
    if stats_o is not None:
        scols = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
        srow = jnp.zeros((8, LANES), jnp.float32)
        for j in range(5):
            srow = jnp.where(scols == j, key_scr[3, j], srow)
        stats_o[...] = srow[None]


def _flat_bounce_kernel(
    *refs,
    n_blocks, n_tri_blocks, n_super=0, cull=True, tri_hbm=False,
    n_hyper=0, tri_t=False, f2b=True, stats=False, emissive=False,
    bg=None, nee_kinds=(), checker=False, vol_kinds=(), vol_row0=0,
    roulette=False, sweep_split=1,
):
    """One bounce over a tile of pre-generated (sorted) rays.

    The grid-parallel building block of the sorted-wavefront mesh path
    (ops/wavefront_sorted.py): ray state lives in HBM between bounces
    so XLA can re-sort lanes by spatial key; each program advances one
    1024-lane tile via :func:`_bounce_core`.  Tiles whose lanes are all
    dead (sorting compacts dead lanes to the tail) skip the sweep
    entirely — the cond falls through to a pure copy.

    State is ONE packed (16, TILE_ROWS, LANES) f32 window (13
    continuous + alive/bounce/lane-id stored as exact f32): windowed
    refs each pay per-grid-step DMA orchestration, and 2 windows
    instead of 32 is ~an order of magnitude less fixed overhead per
    tile — the dominant cost once culling leaves most tiles nearly
    workless.
    """
    (meta_ref, tbl_ref, sph_box_ref, tri_ref, tri_box_ref, tri_sup_ref,
     tri_hyp_ref, lights_ref, st_i) = refs[:9]
    idx = 9
    st_o = refs[idx]
    idx += 1
    stats_o = None
    if stats:
        stats_o = refs[idx]
        idx += 1
    tri_scr = box_scr = sem_tri = sem_box = key_scr = None
    if refs[idx:]:
        tri_scr, box_scr, sem_tri, sem_box, key_scr = refs[idx:]

    it = meta_ref[0, 0]
    seed = meta_ref[0, 1]
    max_depth = meta_ref[0, 2]

    if stats and key_scr is not None:
        key_scr[3, 0] = 0.0
        key_scr[3, 1] = 0.0
        key_scr[3, 2] = 0.0

    vals = [st_i[j] for j in range(16)]
    lid = vals[15].astype(jnp.int32)
    alive_in = vals[13].astype(jnp.int32)
    bounce_in = vals[14].astype(jnp.int32)
    state = tuple(vals[:13]) + (alive_in, bounce_in)
    tm = vals[6]

    lane_u32 = _mix(lid.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    salt = _mix((seed + it * jnp.int32(40503)).astype(jnp.uint32))

    def run(st):
        (ox, oy, oz, dx, dy, dz, tmv, tpr, tpg, tpb, rr, rg, rb,
         al, bo) = st
        out = _bounce_core(
            tbl_ref, sph_box_ref, tri_ref, tri_box_ref, tri_sup_ref,
            ox, oy, oz, dx, dy, dz, tmv, tpr, tpg, tpb, rr, rg, rb,
            al > 0, bo, lane_u32, salt, max_depth,
            n_blocks=n_blocks, n_tri_blocks=n_tri_blocks, n_super=n_super,
            cull=cull, tri_hbm=tri_hbm, tri_scr=tri_scr, box_scr=box_scr,
            sem_tri=sem_tri, sem_box=sem_box, tri_hyp_ref=tri_hyp_ref,
            n_hyper=n_hyper, tri_t=tri_t,
            key_scr=key_scr if f2b else None,
            cnt_scr=key_scr if stats else None,
            emissive=emissive, bg=bg,
            lights_ref=lights_ref, nee_kinds=nee_kinds,
            from_diffuse=(al > 1) if nee_kinds else None,
            checker=checker, vol_kinds=vol_kinds, vol_row0=vol_row0,
            roulette=roulette, sweep_split=sweep_split,
        )
        (ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, rr, rg, rb, can, bo) = out
        return (ox, oy, oz, dx, dy, dz, tmv, tpr, tpg, tpb, rr, rg, rb,
                can.astype(jnp.int32), bo)

    final = jax.lax.cond(jnp.any(alive_in > 0), run, lambda st: st, state)

    for j in range(13):
        st_o[j] = final[j]
    st_o[13] = final[13].astype(jnp.float32)
    st_o[14] = final[14].astype(jnp.float32)
    st_o[15] = vals[15]

    if stats_o is not None:
        # Per-tile counters: [blocks swept, supers, hypers, live lanes]
        # broadcast down the 8 sublanes (min legal output tile).
        live_ct = jnp.sum((alive_in > 0).astype(jnp.float32))
        cols = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
        row = jnp.where(
            cols == 0, key_scr[3, 0],
            jnp.where(cols == 1, key_scr[3, 1],
                      jnp.where(cols == 2, key_scr[3, 2],
                                jnp.where(cols == 3, live_ct, 0.0))))
        stats_o[...] = row[None]


def bounce_step_pallas(
    state: Tuple[jax.Array, ...],
    it: jax.Array,
    seed: jax.Array,
    max_depth: jax.Array,
    tables: Tuple[jax.Array, ...],
    *,
    n_blocks: int,
    n_tri_blocks: int,
    n_super: int = 0,
    cull: bool = True,
    stats: bool = False,
    emissive: bool = False,
    bg=None,
    nee_kinds=(),
    checker: bool = False,
    vol_kinds=(),
    vol_row0: int = 0,
    roulette: bool = False,
    sweep_split: int = 0,
):
    """Advance L flat lanes one bounce through the megakernel core.

    ``sweep_split`` (0 = pick by mesh size, see
    :func:`pick_sweep_split`) sets the sub-tile sweep-split factor —
    bit-identical at every setting, only the skipped work differs.

    ``stats=True`` additionally returns a (n_tiles, 128) f32 array of
    per-tile counters [blocks swept, supers, hypers, live lanes, 0...]
    — the culling-quality instrument behind the README mesh numbers.

    ``state`` is the 16-tuple of (L,) arrays
    (ox, oy, oz, dx, dy, dz, tm, tpr, tpg, tpb, rr, rg, rb,
    alive:i32, bounce:i32, lane_id:i32); L must be a multiple of TILE.
    Under NEE (``nee_kinds`` non-empty) alive is a CODE in {0, 1, 2}
    (2 = alive, previous scatter was Lambertian).
    ``tables`` = (sphere_tbl, sphere_boxes, tri_tbl, tri_boxes,
    tri_super, tri_hyper, lights) from build_sphere_table/
    build_tri_table/build_light_table.
    """
    L = state[0].shape[0]
    assert L % TILE == 0, f"lanes {L} not a multiple of tile {TILE}"
    n_tiles = L // TILE
    tbl, sph_boxes, tri, tri_boxes, tri_super, tri_hyper, lights = tables
    n_hyper = tri_hyper.shape[0] if tri_hyper.shape[0] > 1 else 0

    meta = jnp.stack([
        jnp.asarray(it, jnp.int32), jnp.asarray(seed, jnp.int32),
        jnp.asarray(max_depth, jnp.int32),
    ])[None, :]

    # Pack all 16 state arrays into one (16, rows, LANES) f32 window —
    # ints are exact in f32 (lane ids < 2^24) and one in/out window
    # costs ~16x less per-grid-step DMA orchestration than 32.
    packed = jnp.stack(
        [x.astype(jnp.float32).reshape(n_tiles * TILE_ROWS, LANES)
         for x in state]
    )
    st_spec = pl.BlockSpec((16, TILE_ROWS, LANES), lambda i: (0, i, 0))
    # VMEM triangle-table layout: transposed (NB, 16, TRI_BLOCK) pays
    # exactly 64 B/triangle (the naive (Mpad, 16) layout pays 512 B for
    # the 16 -> 128 lane-dim tile pad), so meshes up to ~1M triangles
    # stay VMEM-resident; beyond that the table goes to HBM and
    # descended blocks are DMA'd into scratch instead (ROADMAP #3).
    tri_t = _os.environ.get("RTOW_TRI_T", "1") == "1" and n_tri_blocks > 0
    bytes_per_tri = 64 if tri_t else 512
    tri_hbm = (n_tri_blocks * TRI_BLOCK * bytes_per_tri > 64 * 1024 * 1024
               or (_os.environ.get("RTOW_TRI_HBM") == "1" and n_super > 0))
    if tri_hbm:
        tri_t = False
    # Front-to-back ordered descent (RTOW_F2B=0 restores the fixed-order
    # sweep for ablation): visits near children first so best_t collapses
    # early and far siblings cull outright.
    f2b = _os.environ.get("RTOW_F2B", "1") == "1"
    kernel = functools.partial(
        _flat_bounce_kernel, n_blocks=n_blocks, n_tri_blocks=n_tri_blocks,
        n_super=n_super, cull=cull, tri_hbm=tri_hbm, n_hyper=n_hyper,
        tri_t=tri_t, f2b=f2b, stats=stats, emissive=emissive, bg=bg,
        nee_kinds=nee_kinds, checker=checker, vol_kinds=vol_kinds,
        vol_row0=vol_row0, roulette=roulette,
        sweep_split=sweep_split or pick_sweep_split(n_tri_blocks),
    )
    if n_super:
        # Pack each super's 16 block AABBs into one (1, SUPER*8) row so
        # the per-descend DMA slice is tile-aligned; a full per-block
        # box table would blow the 1MB SMEM past ~2000 blocks.
        tri_boxes = tri_boxes[: n_super * SUPER].reshape(n_super, SUPER * 8)
        tri_box_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch_shapes = [
            pltpu.VMEM((TRI_BLOCK, LANES if tri_hbm else 16), jnp.float32),
            pltpu.SMEM((1, SUPER * 8), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            # Front-to-back keys; stats builds add a counter row.
            pltpu.SMEM((4 if stats else 3, KEY_ROW), jnp.float32),
        ]
    else:
        tri_box_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        if stats:
            # Flat path with counters: same scratch set (DMA refs idle).
            scratch_shapes = [
                pltpu.VMEM((TRI_BLOCK, 16), jnp.float32),
                pltpu.SMEM((1, SUPER * 8), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SMEM((4, KEY_ROW), jnp.float32),
            ]
        else:
            scratch_shapes = []
    if tri_hbm:
        # Large meshes keep the table in HBM, padded 16 -> 128 wide so
        # per-block DMA slices are lane-aligned (Mosaic requires
        # 128-multiples; 8x HBM padding is noise next to 16GB, and a
        # block DMA is ~100ns of HBM bandwidth).
        tri = jnp.pad(tri, ((0, 0), (0, LANES - tri.shape[1])))
        tri_spec = pl.BlockSpec(memory_space=pl.ANY)
        vmem_limit = 64 * 1024 * 1024
    else:
        if tri_t:
            # (Mpad, 16) -> (NB, 16, TRI_BLOCK): params on sublanes,
            # triangles on lanes — no tile-padding waste.  XLA CSEs the
            # per-bounce transpose of the constant table.
            nb = tri.shape[0] // TRI_BLOCK
            tri = tri.reshape(nb, TRI_BLOCK, 16).transpose(0, 2, 1)
        tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        # The tri-table input window counts against physical VMEM with
        # its tile padding; the scoped limit guards temporaries.
        vmem_limit = 32 * 1024 * 1024 + (tri.size * 4 if tri_t else 0)
    out_specs = [st_spec]
    out_shape = [jax.ShapeDtypeStruct(packed.shape, jnp.float32)]
    if stats:
        out_specs.append(pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((n_tiles, 8, LANES), jnp.float32))
    out = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # meta ints
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sphere table
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sphere block AABBs
            tri_spec,                               # triangle table
            tri_box_spec,                           # tri block AABBs
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tri super AABBs
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tri hyper AABBs
            pl.BlockSpec(memory_space=pltpu.SMEM),  # light table
            st_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
    )(meta, tbl, sph_boxes, tri, tri_boxes, tri_super, tri_hyper, lights,
      packed)
    flat = out[0].reshape(16, L)
    res = [flat[j] for j in range(13)]
    res.append(flat[13].astype(jnp.int32))
    res.append(flat[14].astype(jnp.int32))
    res.append(flat[15].astype(jnp.int32))
    if stats:
        return tuple(res), out[1][:, 0, :]
    return tuple(res)


def render_blocks_pallas(
    scene: Scene,
    camera,
    seed,
    *,
    width: int,
    height: int,
    spp,
    max_depth,
    cull: bool = True,
    ablate: str = "full",
    fixed_iters: int = 0,
    tile0=0,
    n_tiles_local: int = 0,
    roulette: bool = False,
    stats: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Render (n_pixels, 3) radiance SUMS with the fused megakernel.

    Handles spheres and (brute-force block-swept) triangles; large
    meshes where a BVH wins route through the jnp path instead
    (pipeline.pallas_supported).  Jitted with static shape params —
    repeated calls (bench warm-up, multi-frame loops) reuse the
    compiled executable.

    ``stats=True`` additionally returns a (n_tiles, 8, LANES) f32 array
    whose row-0 columns hold per-tile counters [block sweeps, supers,
    hypers, loop iterations, live-lane-iterations] — the roofline
    instrument (pairs swept = block sweeps x TILE x 128).
    """
    if scene.n_spheres:
        tbl, sph_boxes = build_sphere_table(scene)
        n_blocks = tbl.shape[0] // SPHERE_BLOCK
    else:
        tbl = jnp.zeros((SPHERE_BLOCK, 16), jnp.float32)
        sph_boxes = jnp.zeros((1, 8), jnp.float32)
        n_blocks = 0
    if scene.n_triangles:
        # Persistent kernel sweeps blocks FLAT: the hierarchical
        # descent needs the DMA scratch (box_scr) only the flat bounce
        # kernel allocates, and this kernel's dispatch ceiling
        # (WAVEFRONT_MIN_TRIS = 128 blocks) keeps a flat cond-skip loop
        # cheap.  (n_super > 0 here crashed at trace for 4k-16k-tri
        # meshes: _super_descend DMAs into box_scr=None.)
        tri, tri_boxes, tri_super, _ = build_tri_table(scene)
        n_tri_blocks = tri.shape[0] // TRI_BLOCK
        n_super = 0
    else:
        tri = jnp.zeros((TRI_BLOCK, 16), jnp.float32)
        tri_boxes = jnp.zeros((1, 8), jnp.float32)
        tri_super = jnp.zeros((1, 8), jnp.float32)
        n_tri_blocks = 0
        n_super = 0
    n_pixels = width * height
    tiles_x = -(-width // LANES)
    tiles_y = -(-height // TILE_ROWS)
    n_tiles = n_tiles_local or tiles_x * tiles_y

    cam_vec = jnp.stack([
        camera.origin[0], camera.origin[1], camera.origin[2],
        camera.u[0], camera.u[1], camera.u[2],
        camera.v[0], camera.v[1], camera.v[2],
        camera.lower_left[0], camera.lower_left[1], camera.lower_left[2],
        camera.horizontal[0], camera.horizontal[1], camera.horizontal[2],
        camera.vertical[0], camera.vertical[1], camera.vertical[2],
        camera.lens_radius, camera.t0, camera.t1 - camera.t0,
    ]).astype(jnp.float32)[None, :]  # (1, 21) for SMEM
    meta = jnp.stack([
        jnp.asarray(seed, jnp.int32), jnp.int32(width), jnp.int32(height),
        jnp.int32(n_pixels), jnp.asarray(tile0, jnp.int32),
        jnp.asarray(spp, jnp.int32), jnp.asarray(max_depth, jnp.int32),
    ])[None, :]  # (1, 7)

    # Next-event estimation for emissive scenes (static light-kind
    # tuple + a small SMEM light table re-derived from the scene).
    nee_kinds = (tuple(k for k, _ in scene.light_ids)
                 if scene.has_emissive else ())
    rows = []
    if nee_kinds:
        from .lights import build_light_table

        rows.append(build_light_table(scene))
    vol_kinds = scene.volume_kinds
    vol_row0 = rows[0].shape[0] if rows else 0
    if vol_kinds:
        from .volumes import pack_volume_rows

        rows.append(pack_volume_rows(scene))
    lights = (jnp.concatenate(rows) if rows
              else jnp.zeros((1, 16), jnp.float32))

    kernel = functools.partial(
        _kernel, n_blocks=n_blocks, n_tri_blocks=n_tri_blocks,
        n_super=n_super, cull=cull, ablate=ablate, fixed_iters=fixed_iters,
        emissive=scene.has_emissive,
        bg=None if scene.background == "sky" else scene.background,
        nee_kinds=nee_kinds, checker=scene.has_checker,
        vol_kinds=vol_kinds, vol_row0=vol_row0, roulette=roulette,
        stats=stats,
    )
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles * TILE_ROWS, LANES), jnp.float32)
    ] * 3
    out_specs = [
        pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0)),
        pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0)),
        pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0)),
    ]
    scratch_shapes = []
    if stats:
        out_shape.append(
            jax.ShapeDtypeStruct((n_tiles, 8, LANES), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0)))
        scratch_shapes = [pltpu.SMEM((4, KEY_ROW), jnp.float32)]

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # camera scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),  # meta ints
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sphere table
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sphere block AABBs
            pl.BlockSpec(memory_space=pltpu.VMEM),  # triangle table
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tri block AABBs
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tri super-block AABBs
            pl.BlockSpec(memory_space=pltpu.SMEM),  # light table
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
    )(cam_vec, meta, tbl, sph_boxes, tri, tri_boxes, tri_super, lights)

    if stats:
        return out[0], out[1], out[2], out[3][:, 0, :]
    r, g, b = out
    return r, g, b


def unblock_image(r, g, b, *, width: int, height: int) -> jax.Array:
    """Block rows (tiles*TILE_ROWS, 128) x3 -> (H*W, 3) image order."""
    tiles_x = -(-width // LANES)
    tiles_y = -(-height // TILE_ROWS)

    def unblock(x):
        img = x.reshape(tiles_y, tiles_x, TILE_ROWS, LANES)
        img = img.transpose(0, 2, 1, 3).reshape(
            tiles_y * TILE_ROWS, tiles_x * LANES
        )
        return img[:height, :width].reshape(-1)

    return jnp.stack([unblock(r), unblock(g), unblock(b)], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "cull", "ablate", "fixed_iters",
                     "roulette"),
)
def render_spheres_pallas(
    scene: Scene,
    camera,
    seed,
    *,
    width: int,
    height: int,
    spp,
    max_depth,
    cull: bool = True,
    ablate: str = "full",
    fixed_iters: int = 0,
    roulette: bool = False,
) -> jax.Array:
    """Single-device whole-frame render -> (n_pixels, 3) radiance sums."""
    r, g, b = render_blocks_pallas(
        scene, camera, seed, width=width, height=height, spp=spp,
        max_depth=max_depth, cull=cull, ablate=ablate,
        fixed_iters=fixed_iters, roulette=roulette,
    )
    return unblock_image(r, g, b, width=width, height=height)
