"""Sorted-wavefront mesh renderer — the TPU-native large-mesh path.

The reference scales meshes with a recursive BVH walked independently
per ray (reference src/render.cpp:22-110).  Per-lane pointer-chasing is
the worst possible TPU program (divergent control flow, serialized
gathers), and uniform per-tile block culling collapses once rays
diverge after the first diffuse bounce: every tile touches most of the
scene (round-1: 65k-triangle mesh at 0.26 Mrays/s, 8x below the CPU
floor).

The TPU answer is to *restore* coherence instead of chasing pointers:

1.  Ray state lives in flat (L,) arrays in HBM — one lane per
    (pixel, sample) path, bounce-synchronous.
2.  Before every bounce, lanes are reordered by a spatial sort key
    (origin Morton code + direction octant; dead lanes sort to the
    end) with ONE multi-operand ``lax.sort`` — XLA's sort moves all
    17 state arrays along with the key, so there is no gather.
3.  The megakernel bounce core (ops/pallas_megakernel._bounce_core)
    then advances 1024-lane tiles of *spatially coherent* rays: the
    per-tile Morton-block AABB cull now skips almost every block, and
    all-dead tail tiles exit without touching the scene.
4.  After the loop, one final sort by lane id restores pixel-major
    order and the per-pixel radiance reduces with a reshape — no
    scatter (TPU scatter-add measured ~25x slower than contiguous
    accumulation).

Sample accounting is exact, and every lane's RNG stream is
counter-based on its immutable lane id, so the image is independent of
the sort schedule (deterministic for a fixed seed).
"""
from __future__ import annotations

import functools
import os as _os
import sys
import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.camera import Camera, camera_rays, pixel_coords
from ..models.scene import Scene
from . import pallas_megakernel as _mk
from .pallas_megakernel import (
    SPHERE_BLOCK,
    SUPER,
    TILE,
    bounce_step_pallas,
    build_sphere_table,
    build_tri_table,
)

# TRI_BLOCK is read through _mk (NOT imported by value): it is
# per-scene since round 5 (_mk.tri_block_for) and must be the value
# pinned at table-build/trace time.

DEAD_KEY = np.int32(0x7FFFFFFF)

#: Meshes larger than this take the sorted-wavefront path; smaller ones
#: stay on the persistent megakernel whose whole-frame VMEM residency
#: wins while the block count is small.
WAVEFRONT_MIN_TRIS = 16384


def _spread3(x: jax.Array) -> jax.Array:
    """Interleave the low 10 bits of ``x`` with two zero bits each."""
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def sort_keys(
    ox, oy, oz, dx, dy, dz, alive, bmin: jax.Array, inv_ext: jax.Array
) -> jax.Array:
    """Spatial coherence key per lane -> (L,) int32, dead lanes last.

    Six-dimensional Morton code with ALTERNATING origin/direction
    triplets (MSB..LSB: o-triplet, d-triplet, o-triplet, ... — 5 bits
    per axis each, 30 bits total), origin triplet first.  A tile's
    block-cull cost is the UNION of its lanes' frusta, so the key must
    shrink position spread and direction spread together: after the
    first diffuse bounce a pure origin-major key (the round-2 original:
    21 origin bits then 9 direction bits) packs each tile with rays
    from one surface patch scattered over the whole hemisphere, and the
    union covers most of the scene.  Measured on the 360k knot
    (tools/stats probe, bounce 1): 247 blocks/tile origin-major -> 105
    interleaved; total block sweeps -27%.  Direction-major was worse at
    every depth (whole-scene beams); this balanced interleave won every
    deeper bounce too.

    Direction bits are quantized ADAPTIVELY to the live-direction range:
    primary rays span only the camera's fov cone, and a fixed [-1,1]
    grid would put the whole cone in one cell (measured: no effect).

    Origin bits stay on the STATIC scene-bounds grid: re-ranging them
    adaptively to the live-lane extent each bounce (RTOW_WF_ADAPTIVE_O=1,
    mirroring the direction treatment) measured WORSE on the 65k knot
    chunk profile — total block sweeps 19.3k -> 21.6k, bounce-1 4816 ->
    6979 — because the cell boundaries then shift every bounce and
    lanes regroup into different (momentarily less converged) tiles.
    """
    lim = 31.0  # 5 bits/axis for both origin and direction
    if _os.environ.get("RTOW_WF_ADAPTIVE_O") == "1":
        live0 = alive > 0
        big0 = jnp.float32(3.0e38)

        def qorig(o):
            lo = jnp.min(jnp.where(live0, o, big0))
            hi = jnp.max(jnp.where(live0, o, -big0))
            scale = (lim + 0.999) / jnp.maximum(hi - lo, 1e-6)
            return jnp.clip((o - lo) * scale, 0.0, lim)

        qx, qy, qz = qorig(ox), qorig(oy), qorig(oz)
    else:
        qx = jnp.clip((ox - bmin[0]) * inv_ext[0] * lim, 0.0, lim)
        qy = jnp.clip((oy - bmin[1]) * inv_ext[1] * lim, 0.0, lim)
        qz = jnp.clip((oz - bmin[2]) * inv_ext[2] * lim, 0.0, lim)
    ocode = (
        _spread3(qx.astype(jnp.uint32))
        | (_spread3(qy.astype(jnp.uint32)) << 1)
        | (_spread3(qz.astype(jnp.uint32)) << 2)
    )
    inv_len = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    live = alive > 0
    big = jnp.float32(3.0e38)

    def qdir(d):
        nd = d * inv_len
        lo = jnp.min(jnp.where(live, nd, big))
        hi = jnp.max(jnp.where(live, nd, -big))
        scale = (lim + 0.999) / jnp.maximum(hi - lo, 1e-6)
        return jnp.clip((nd - lo) * scale, 0.0, lim)

    dcode = (
        _spread3(qdir(dx).astype(jnp.uint32))
        | (_spread3(qdir(dy).astype(jnp.uint32)) << 1)
        | (_spread3(qdir(dz).astype(jnp.uint32)) << 2)
    )
    key = jnp.zeros_like(ocode)
    for i in range(4, -1, -1):  # MSB triplets first
        key = (key << 3) | ((ocode >> (3 * i)) & 7)
        key = (key << 3) | ((dcode >> (3 * i)) & 7)
    key = key.astype(jnp.int32)
    return jnp.where(alive > 0, key, DEAD_KEY)


def _scene_tables(scene: Scene):
    """Megakernel tables + static block counts + scene bounds.

    ``tables`` is the 7-tuple bounce_step_pallas expects (sphere table,
    sphere boxes, tri table, tri boxes, tri supers, tri hypers, light
    table)."""
    if scene.n_spheres:
        tbl, sph_boxes = build_sphere_table(scene)
        n_blocks = tbl.shape[0] // SPHERE_BLOCK
    else:
        tbl = jnp.zeros((SPHERE_BLOCK, 16), jnp.float32)
        sph_boxes = jnp.zeros((1, 8), jnp.float32)
        n_blocks = 0
    if scene.n_triangles:
        tri, tri_boxes, tri_super, tri_hyper = build_tri_table(scene)
        n_tri_blocks = tri.shape[0] // _mk.TRI_BLOCK
        n_super = n_tri_blocks // SUPER if tri_super.shape[0] > 1 else 0
    else:
        tri = jnp.zeros((_mk.TRI_BLOCK, 16), jnp.float32)
        tri_boxes = jnp.zeros((1, 8), jnp.float32)
        tri_super = jnp.zeros((1, 8), jnp.float32)
        tri_hyper = jnp.zeros((1, 8), jnp.float32)
        n_tri_blocks = 0
        n_super = 0
    rows = []
    if scene.has_emissive and scene.light_ids:
        from .lights import build_light_table

        rows.append(build_light_table(scene))
    if scene.volume_kinds:
        from .volumes import pack_volume_rows

        rows.append(pack_volume_rows(scene))
    lights = (jnp.concatenate(rows) if rows
              else jnp.zeros((1, 16), jnp.float32))
    tables = (tbl, sph_boxes, tri, tri_boxes, tri_super, tri_hyper, lights)

    # Scene bounds for Morton quantization (valid block boxes only).
    def bounds(boxes, n):
        if not n:
            return None
        return boxes[:n, 0:3].min(axis=0), boxes[:n, 3:6].max(axis=0)

    parts = [b for b in (bounds(sph_boxes, n_blocks),
                         bounds(tri_boxes, n_tri_blocks)) if b is not None]
    bmin = functools.reduce(jnp.minimum, [p[0] for p in parts])
    bmax = functools.reduce(jnp.maximum, [p[1] for p in parts])
    inv_ext = 1.0 / jnp.maximum(bmax - bmin, 1e-6)
    return tables, (n_blocks, n_tri_blocks, n_super), bmin, inv_ext


def _window_ladder(L: int) -> list:
    """Shrinking-window widths [L, ~L/8, ~L/64, ...] down to one TILE.

    Each level is the previous one divided by 8 and rounded up to a
    whole tile; draining a handful of survivor tiles at a width far
    above the live count costs nothing in sweeps (all-dead tiles
    cond-skip) but pays the full-width sort every bounce, which at
    whole-frame lane counts (tens of millions) is the dominant tail
    cost the ladder removes.
    """
    widths = [L]
    w = L
    while w // 8 >= TILE:
        w = -(-w // 8 // TILE) * TILE
        widths.append(w)
    return sorted(set(widths), reverse=True)


def _trace_lane_per_sample(
    camera, key, lane_pix, seed, *, L_raw, L, P, lpp, max_depth,
    width, height, cull_backfaces, tables, counts, bmin, inv_ext,
    emissive=False, bg=None, nee_kinds=(), checker=False,
    vol_kinds=(), vol_row0=0, roulette=False, sync_axis=None,
    stats=False, fixed_trips=None,
):
    """The default lane-per-sample fast path (one lane = one sample).

    Camera rays generate once up front and the per-bounce sort moves
    only the 16 state arrays + key — no regeneration machinery, no
    extra sort operands (the committed 5.0 Mrays/s 65k-knot path).

    ``sync_axis``: mesh axis name when running inside ``shard_map`` —
    the bounce-loop conditions then count live lanes GLOBALLY (psum),
    so every device runs the same trip count.  Required under Pallas
    interpret mode, whose per-``pallas_call`` global barrier deadlocks
    if devices launch different kernel counts; safe on hardware (the
    global count bounds every local count, so window narrowing stays
    correct, and finished devices' extra bounces are all-dead tiles
    that cond-skip their sweeps).
    """
    n_blocks, n_tri_blocks, n_super = counts
    f32 = jnp.float32

    k_pix, k_cam = jax.random.split(key)
    s, t = pixel_coords(width, height, k_pix, lane_pix[:L_raw],
                        dtype=camera.origin.dtype)
    rays = camera_rays(camera, k_cam, s, t)

    def pad(x, fill=0.0):
        return jnp.concatenate(
            [x.astype(f32), jnp.full((L - L_raw,), fill, f32)]
        )

    lane_id = jnp.arange(L, dtype=jnp.int32)
    alive0 = (lane_id < L_raw).astype(jnp.int32)
    zero = jnp.zeros((L,), f32)
    state = (
        pad(rays.origin[:, 0]), pad(rays.origin[:, 1]), pad(rays.origin[:, 2]),
        pad(rays.direction[:, 0]), pad(rays.direction[:, 1]),
        pad(rays.direction[:, 2], fill=1.0),
        pad(rays.time),
        zero + 1.0, zero + 1.0, zero + 1.0,  # throughput
        zero, zero, zero,  # radiance
        alive0,
        jnp.zeros((L,), jnp.int32),  # bounce
        lane_id,
    )

    #: Sort cadence experiment knob: sort every K bounces instead of
    #: every bounce (the image is sort-schedule independent — lane-id
    #: counter RNG).  K=1 is the default and the measured winner.
    sort_every = int(_os.environ.get("RTOW_WF_SORT_EVERY", "1"))
    #: Tail-window sweep split override: ladder levels BELOW the full
    #: width can use a finer sub-tile split than the whole-frame default
    #: (their tiles are incoherent stragglers where finer row-group
    #: culling pays; each level compiles its own kernel shape anyway,
    #: so this adds no compile cost).  0 = same split everywhere.
    tail_split = int(_os.environ.get("RTOW_WF_TAIL_SPLIT", "0"))

    def sorted_bounce(st, it, acc, split=0):
        # Sort EVERY bounce including bounce 0: skipping the bounce-0
        # sort (primary rays are already pixel-coherent) measured
        # neutral-to-slightly-negative on the 65k knot — the sort's
        # direction-octant grouping pays even for camera rays.
        def do_sort(st):
            keys = sort_keys(st[0], st[1], st[2], st[3], st[4], st[5],
                             st[13], bmin, inv_ext)
            return jax.lax.sort((keys,) + st, dimension=0, num_keys=1)[1:]

        if sort_every > 1:
            st = jax.lax.cond(it % sort_every == 0, do_sort,
                              lambda s: s, st)
        else:
            st = do_sort(st)
        bounce_kwargs = dict(
            n_blocks=n_blocks, n_tri_blocks=n_tri_blocks, n_super=n_super,
            cull=cull_backfaces, emissive=emissive, bg=bg,
            nee_kinds=nee_kinds, checker=checker,
            vol_kinds=vol_kinds, vol_row0=vol_row0, roulette=roulette,
            sweep_split=split,
        )
        if stats:
            # Roofline accumulator (tools/mesh_roofline.py):
            # [0] block sweeps (sub-tile-split scaled, so
            #     pairs = acc[0] * TILE * TRI_BLOCK is exact),
            # [1] super descends, [2] hyper descends,
            # [3] tile-iterations (window tiles per bounce call),
            # [4] live-lane-iterations, [5] live-tile-iterations.
            Lw = st[0].shape[0]
            live = st[13] > 0
            st2, s = bounce_step_pallas(st, it, seed, max_depth, tables,
                                        stats=True, **bounce_kwargs)
            tiles_live = jnp.any(live.reshape(Lw // TILE, TILE), axis=1)
            acc = acc + jnp.stack([
                s[:, 0].sum(), s[:, 1].sum(), s[:, 2].sum(),
                jnp.float32(Lw // TILE),
                live.sum().astype(jnp.float32),
                tiles_live.sum().astype(jnp.float32),
            ])
            st = st2
        else:
            st = bounce_step_pallas(st, it, seed, max_depth, tables,
                                    **bounce_kwargs)
        return st, it + 1, acc

    # Shrinking-window tail: survivors thin out fast (measured on the
    # 360k knot: 44% of lanes die at bounce 1, 90% by bounce 2, and the
    # last ~20 bounces run ONE live tile); once the live count fits a
    # window 8x smaller, compact live lanes to the head with one sort
    # and loop on the head slice alone.  The ladder keeps dividing by 8
    # down to a single tile so whole-frame lane counts (L in the
    # millions) never drain at a width orders of magnitude above the
    # live count.
    widths = _window_ladder(L)

    it = jnp.int32(0)
    # Stats builds thread a (6,) accumulator through the loop carries;
    # production (stats=False) carries are UNCHANGED (the accumulator
    # stays out of the while state entirely).
    acc = jnp.zeros((6,), jnp.float32) if stats else None
    level_its = []
    for i, w in enumerate(widths):
        nxt = widths[i + 1] if i + 1 < len(widths) else 0

        def cond(carry, nxt=nxt):
            st = carry[0]
            # COUNT live lanes (alive is a {0,1,2} code under NEE).
            n_live = jnp.sum((st[13] > 0).astype(jnp.int32))
            if sync_axis is not None:
                n_live = jax.lax.psum(n_live, sync_axis)
            return jnp.logical_and(n_live > 0, n_live > nxt)

        lvl_split = tail_split if (tail_split and w != L) else 0

        def body(carry, lvl_split=lvl_split):
            st, it = carry[0], carry[1]
            a = carry[2] if stats else None
            st, it, a = sorted_bounce(st, it, a, split=lvl_split)
            return (st, it, a) if stats else (st, it)

        def run_level(carry, i=i):
            # ``fixed_trips`` pins each ladder level's trip count (the
            # roofline's prefix profile: same computation, bounded
            # trips).
            if fixed_trips is not None:
                return jax.lax.fori_loop(
                    0, int(fixed_trips[i]), lambda _, c: body(c), carry)
            return jax.lax.while_loop(cond, body, carry)

        def pack(st, it, acc):
            return (st, it, acc) if stats else (st, it)

        if w == L:
            out = run_level(pack(state, it, acc))
            state, it = out[0], out[1]
            acc = out[2] if stats else None
        else:
            keys = sort_keys(state[0], state[1], state[2], state[3],
                             state[4], state[5], state[13], bmin, inv_ext)
            state = jax.lax.sort((keys,) + state, dimension=0,
                                 num_keys=1)[1:]
            win = tuple(x[:w] for x in state)
            rest = tuple(x[w:] for x in state)
            out = run_level(pack(win, it, acc))
            win, it = out[0], out[1]
            acc = out[2] if stats else None
            state = tuple(jnp.concatenate([a, b])
                          for a, b in zip(win, rest))
        level_its.append(it)

    final = state
    _, rr, rg, rb = jax.lax.sort(
        (final[15], final[10], final[11], final[12]), dimension=0, num_keys=1
    )
    rad = jnp.stack([rr[:L_raw], rg[:L_raw], rb[:L_raw]], axis=-1)
    rad = rad.reshape(P, lpp, 3).sum(axis=1)
    if stats:
        return rad, acc, jnp.stack(level_its)
    return rad


def trace_wavefront_sorted(
    scene: Scene,
    camera: Camera,
    key: jax.Array,
    pixel_ids: jax.Array,
    seed,
    *,
    spp: int,
    max_depth: int,
    width: int,
    height: int,
    cull_backfaces: bool = True,
    tables=None,
    counts=None,
    bmin=None,
    inv_ext=None,
    lanes_per_pixel: int = 0,
    emissive=None,
    bg=None,
    nee_kinds=(),
    checker=False,
    vol_kinds=(),
    vol_row0=0,
    roulette=False,
    sync_axis=None,
    stats=False,
    fixed_trips=None,
) -> jax.Array:
    """Radiance sums for a chunk of pixels -> (P, 3).

    ``key`` drives camera-ray generation (threefry); in-kernel scatter
    draws use the counter-based hash RNG on (lane id, bounce).

    ``lanes_per_pixel`` (``lpp``, must divide ``spp``; 0 = ``spp``)
    sets the lane layout.  The default lane-per-sample layout
    (lpp == spp) is the fast one; lpp < spp switches to persistent
    lanes that trace ``spp / lpp`` samples SEQUENTIALLY, regenerating a
    fresh camera ray when the previous sample dies
    (trace_progressive's scheme fused with the per-bounce sort).
    Regeneration measured 2.1x WORSE on the 65k knot despite near-100%
    lane utilisation: sequential samples decorrelate neighboring
    lanes' bounce depths, so tiles become mixtures of unrelated rays
    and the per-tile block-cull union explodes — utilisation is
    cheaper to waste than coherence (dead tiles cost ~0; an incoherent
    live tile costs ~35x a coherent one).  Kept as a knob because the
    tradeoff may flip for scenes with much longer mean paths.
    """
    if tables is None:
        tables, counts, bmin, inv_ext = _scene_tables(scene)
    if emissive is None:  # derive statics from the scene when present
        emissive = scene.has_emissive if scene is not None else False
        if scene is not None and scene.background != "sky":
            bg = scene.background
        if scene is not None and scene.has_emissive:
            nee_kinds = tuple(k for k, _ in scene.light_ids)
        if scene is not None:
            checker = scene.has_checker
            vol_kinds = scene.volume_kinds
            vol_row0 = len(scene.light_ids) if nee_kinds else 0
    n_blocks, n_tri_blocks, n_super = counts

    P = pixel_ids.shape[0]
    lpp = lanes_per_pixel or spp
    assert spp % lpp == 0, (spp, lpp)
    n_samples = spp // lpp  # sequential samples per lane
    L_raw = P * lpp
    L = -(-L_raw // TILE) * TILE
    f32 = jnp.float32
    dtype = camera.origin.dtype

    lane_id = jnp.arange(L, dtype=jnp.int32)
    lane_pix = jnp.concatenate([
        jnp.repeat(pixel_ids, lpp, total_repeat_length=L_raw),
        jnp.zeros((L - L_raw,), jnp.int32),
    ])

    if n_samples == 1:
        return _trace_lane_per_sample(
            camera, key, lane_pix, seed, L_raw=L_raw, L=L, P=P, lpp=lpp,
            max_depth=max_depth, width=width, height=height,
            cull_backfaces=cull_backfaces, tables=tables, counts=counts,
            bmin=bmin, inv_ext=inv_ext, emissive=emissive, bg=bg,
            nee_kinds=nee_kinds, checker=checker,
            vol_kinds=vol_kinds, vol_row0=vol_row0, roulette=roulette,
            sync_axis=sync_axis, stats=stats, fixed_trips=fixed_trips,
        )
    assert not stats and fixed_trips is None, (
        "stats/fixed_trips cover the lane-per-sample path only"
    )

    zero = jnp.zeros((L,), f32)
    # All lanes start dead with a full sample budget; the first regen
    # fills them.  Padding lanes get an exhausted budget (never start).
    state = (
        zero, zero, zero,  # origin
        zero, zero, zero + 1.0,  # direction (benign placeholder)
        zero,  # time
        zero, zero, zero,  # throughput
        zero, zero, zero,  # radiance
        jnp.zeros((L,), jnp.int32),  # alive
        jnp.zeros((L,), jnp.int32),  # bounce
        lane_id,
    )
    started = jnp.where(lane_id < L_raw, 0, n_samples).astype(jnp.int32)

    def regen(st, started, lane_pix, it):
        """Idle lanes with samples left start a fresh camera ray."""
        alive = st[13] > 0
        need = jnp.logical_and(~alive, started < n_samples)
        k = jax.random.fold_in(key, it)
        k_pix, k_cam = jax.random.split(k)
        s, t = pixel_coords(width, height, k_pix, lane_pix, dtype=dtype)
        rays = camera_rays(camera, k_cam, s, t)

        def sel(fresh, old):
            return jnp.where(need, fresh.astype(f32), old)

        st = (
            sel(rays.origin[:, 0], st[0]), sel(rays.origin[:, 1], st[1]),
            sel(rays.origin[:, 2], st[2]),
            sel(rays.direction[:, 0], st[3]), sel(rays.direction[:, 1], st[4]),
            sel(rays.direction[:, 2], st[5]),
            sel(rays.time, st[6]),
            sel(jnp.ones_like(st[7]), st[7]),
            sel(jnp.ones_like(st[8]), st[8]), sel(jnp.ones_like(st[9]), st[9]),
            st[10], st[11], st[12],  # radiance persists across samples
            jnp.logical_or(alive, need).astype(jnp.int32),
            jnp.where(need, 0, st[14]),
            st[15],
        )
        return st, started + need.astype(jnp.int32)

    def sorted_bounce(st, started, lane_pix, it):
        # regen -> sort -> bounce.  Sorting EVERY bounce including the
        # first measured neutral-to-positive (direction-octant grouping
        # pays even for camera rays); at sort time every lane with
        # budget left is alive, so dead lanes (budget exhausted) sort
        # to the back and all-dead tail tiles cond-skip the sweep.
        st, started = regen(st, started, lane_pix, it)
        keys = sort_keys(st[0], st[1], st[2], st[3], st[4], st[5], st[13],
                         bmin, inv_ext)
        srt = jax.lax.sort((keys,) + st + (started, lane_pix),
                           dimension=0, num_keys=1)
        st, started, lane_pix = srt[1:17], srt[17], srt[18]
        st = bounce_step_pallas(
            st, it, seed, max_depth, tables,
            n_blocks=n_blocks, n_tri_blocks=n_tri_blocks, n_super=n_super,
            cull=cull_backfaces, emissive=emissive, bg=bg,
            nee_kinds=nee_kinds, checker=checker,
            vol_kinds=vol_kinds, vol_row0=vol_row0, roulette=roulette,
        )
        return st, started, lane_pix, it + 1

    # Shrinking-window tail for the final drain: once the PENDING count
    # (live lanes + lanes with samples left) fits a window 8x smaller,
    # compact pending lanes to the head with one regen+sort and loop on
    # the head slice alone — lanes outside the window keep their
    # radiance and rejoin for the final lane-id sort.  With
    # regeneration the window only narrows at the very end of the
    # chunk's sample budget (utilisation stays near 100% before that);
    # the reference has no analogue (its threads always run whole
    # frames, src/render.cpp:150-167).
    widths = _window_ladder(L)

    carry = (state, started, lane_pix, jnp.int32(0))
    for i, w in enumerate(widths):
        nxt = widths[i + 1] if i + 1 < len(widths) else 0

        def cond(carry, nxt=nxt):
            st, started, _, _ = carry
            pend = jnp.sum(jnp.logical_or(st[13] > 0,
                                          started < n_samples))
            if sync_axis is not None:
                pend = jax.lax.psum(pend, sync_axis)
            return jnp.logical_and(pend > 0, pend > nxt)

        def body(carry):
            return sorted_bounce(*carry)

        if w == L:
            carry = jax.lax.while_loop(cond, body, carry)
        else:
            # Regen (so every pending lane is alive), then compact live
            # lanes to the head and loop over the head window only.
            st, started, lane_pix, it = carry
            st, started = regen(st, started, lane_pix, it)
            keys = sort_keys(st[0], st[1], st[2], st[3], st[4], st[5],
                             st[13], bmin, inv_ext)
            srt = jax.lax.sort((keys,) + st + (started, lane_pix),
                               dimension=0, num_keys=1)
            st, started, lane_pix = srt[1:17], srt[17], srt[18]
            win = (tuple(x[:w] for x in st), started[:w], lane_pix[:w], it)
            rest = (tuple(x[w:] for x in st), started[w:], lane_pix[w:])
            win = jax.lax.while_loop(cond, body, win)
            carry = (
                tuple(jnp.concatenate([a, b])
                      for a, b in zip(win[0], rest[0])),
                jnp.concatenate([win[1], rest[1]]),
                jnp.concatenate([win[2], rest[2]]),
                win[3],
            )

    final = carry[0]

    # Restore pixel-major order: one sort by immutable lane id, then the
    # per-pixel sum is a contiguous reshape (no scatter).
    _, rr, rg, rb = jax.lax.sort(
        (final[15], final[10], final[11], final[12]), dimension=0, num_keys=1
    )
    rad = jnp.stack([rr[:L_raw], rg[:L_raw], rb[:L_raw]], axis=-1)
    return rad.reshape(P, lpp, 3).sum(axis=1)


def _morton_pixel_perm(width: int, height: int) -> np.ndarray:
    """Pixel-id permutation in Morton (z-order) over (row, col).

    Consecutive ``ppc``-pixel chunks then cover compact ~square image
    tiles instead of full-width scanline strips: a chunk's bounced rays
    stay inside a smaller world-space neighbourhood, so the sorted
    tiles' block-cull unions tighten exactly where the straggler tail
    spends its time (the same footprint effect that made spp2048 1.7x
    faster than spp64 on the 360k knot — fewer pixels per chunk).
    """
    rows = np.arange(height, dtype=np.uint32)[:, None]
    cols = np.arange(width, dtype=np.uint32)[None, :]

    def spread(x):  # interleave 16 bits with one zero bit each
        x = (x | (x << 8)) & np.uint32(0x00FF00FF)
        x = (x | (x << 4)) & np.uint32(0x0F0F0F0F)
        x = (x | (x << 2)) & np.uint32(0x33333333)
        x = (x | (x << 1)) & np.uint32(0x55555555)
        return x

    code = (spread(cols) | (spread(rows) << 1)).ravel()
    return np.argsort(code).astype(np.int32)


@functools.lru_cache(maxsize=16)
def _frame_fn(width: int, height: int, spp: int, max_depth: int,
              ppc: int, lpp: int, band_chunks: int, counts, cull: bool,
              progress: bool = False, emissive: bool = False, bg=None,
              nee_kinds=(), checker: bool = False, vol_kinds=(),
              vol_row0: int = 0, roulette: bool = False,
              morton_px: bool = False):
    """Cached jitted band renderer (re-jit per call costs seconds).

    Renders ``band_chunks`` consecutive pixel chunks starting at global
    chunk index ``chunk0`` (a traced scalar, so ONE compile serves every
    band).  Chunk RNG folds in the *global* chunk index, so any banding
    of the same frame is bit-identical to the single-dispatch render.

    ``morton_px=True`` reads each chunk's pixel ids from the
    ``pix_perm`` operand (a Morton-ordered pixel permutation padded
    with ``n_pixels`` sentinels) instead of a scanline run; the caller
    un-permutes the returned rows.
    """

    n_pixels = width * height

    def frame(tables, bmin, inv_ext, camera, key, seed, chunk0, pix_perm):
        def chunk_body(c, fb):
            g = chunk0 + c  # global chunk index (RNG + pixel offset)
            pix0 = g * ppc
            if morton_px:
                pixel_ids = jax.lax.dynamic_slice(pix_perm, (pix0,), (ppc,))
            else:
                pixel_ids = pix0 + jnp.arange(ppc, dtype=jnp.int32)
            pix_safe = jnp.minimum(pixel_ids, n_pixels - 1)
            sums = trace_wavefront_sorted(
                None, camera, jax.random.fold_in(key, g), pix_safe,
                seed + g * 7919,
                spp=spp, max_depth=max_depth, width=width, height=height,
                cull_backfaces=cull, tables=tables, counts=counts,
                bmin=bmin, inv_ext=inv_ext, lanes_per_pixel=lpp,
                emissive=emissive, bg=bg, nee_kinds=nee_kinds,
                checker=checker, vol_kinds=vol_kinds, vol_row0=vol_row0,
                roulette=roulette,
            )
            sums = jnp.where((pixel_ids < n_pixels)[:, None], sums, 0.0)
            if progress:
                from ..render import _scanline_tick

                jax.debug.callback(
                    functools.partial(_scanline_tick, ppc=ppc,
                                      width=width, height=height),
                    g, ordered=False,
                )
            return jax.lax.dynamic_update_slice(fb, sums, (c * ppc, 0))

        fb0 = jnp.zeros((ppc * band_chunks, 3), jnp.float32)
        return jax.lax.fori_loop(0, band_chunks, chunk_body, fb0)

    return jax.jit(frame)


def render_wavefront(
    scene: Scene,
    camera: Camera,
    cfg: Config,
    key=None,
    progress: bool = False,
    cull_backfaces: bool = True,
) -> np.ndarray:
    """Whole-frame mean-radiance render (H, W, 3) via the sorted path.

    Wraps the whole table-build + trace + run span in the per-scene
    TRI_BLOCK pick (round-4 bisect: 256 wins +3-4% on <= ~131k-tri
    meshes, 128 past the crossover)."""
    with _mk.tri_block_for(scene.n_triangles):
        return _render_wavefront_impl(
            scene, camera, cfg, key=key, progress=progress,
            cull_backfaces=cull_backfaces)


def _render_wavefront_impl(
    scene: Scene,
    camera: Camera,
    cfg: Config,
    key=None,
    progress: bool = False,
    cull_backfaces: bool = True,
) -> np.ndarray:
    width, height = cfg.image_width, cfg.image_height
    spp = cfg.samples_per_pixel
    n_pixels = width * height
    if key is None:
        key = jax.random.key(cfg.seed)

    # Lane-per-sample layout (lpp == spp): a tile's 1024 lanes are ~16
    # pixels x spp same-bounce samples — maximally coherent, since all
    # of a pixel's samples scatter off the same surface patch.  The
    # persistent lane-per-pixel regeneration alternative (lpp < spp,
    # trace_progressive's scheme) measured 2.1x WORSE on the 65k knot
    # (5.0 -> 2.37 Mrays/s): sequential samples decorrelate neighboring
    # lanes' bounce depths, so every tile becomes a mixture of unrelated
    # rays and the per-tile sweep cost explodes (microbench: coherent
    # tile 37us, incoherent 1.3-2.3ms).  Coherence comes from sample
    # multiplicity per pixel, not pixel adjacency.
    lpp = spp
    ppc = min(max(cfg.rays_per_batch // spp, 1), n_pixels)
    ppc = max(ppc, -(-TILE // spp))  # at least one tile of lanes
    n_chunks = -(-n_pixels // ppc)

    # Cap chunks per device dispatch: a single fori_loop dispatch
    # covering hundreds of chunks runs for minutes, which the remote-TPU
    # tunnel can drop (observed UNAVAILABLE at ~1250 chunks); banding
    # costs one extra host round-trip per band (~30ms) and is
    # bit-identical (global chunk indices drive the RNG).
    band = int(_os.environ.get("RTOW_WF_CHUNKS_PER_DISPATCH", "128"))
    band = n_chunks if band <= 0 else min(band, n_chunks)

    tables, counts, bmin, inv_ext = _scene_tables(scene)
    from ..render import callbacks_supported

    nee_kinds = (tuple(k for k, _ in scene.light_ids)
                 if scene.has_emissive else ())
    # Morton-tiled chunk pixels: each chunk covers a compact ~square
    # image tile instead of a scanline strip (see _morton_pixel_perm).
    morton_px = _os.environ.get("RTOW_WF_MORTON_PX", "1") == "1"
    if morton_px:
        perm = np.full((n_chunks * ppc,), n_pixels, np.int32)
        perm[:n_pixels] = _morton_pixel_perm(width, height)
        pix_perm = jnp.asarray(perm)
    else:
        pix_perm = jnp.zeros((1,), jnp.int32)
    frame = _frame_fn(width, height, spp, cfg.max_child_rays, ppc, lpp,
                      band, counts, cull_backfaces,
                      progress and callbacks_supported(),
                      scene.has_emissive,
                      None if scene.background == "sky" else scene.background,
                      nee_kinds, scene.has_checker, scene.volume_kinds,
                      len(nee_kinds), getattr(cfg, "russian_roulette", False),
                      morton_px)

    t0 = _time.perf_counter()
    n_bands = -(-n_chunks // band)
    if n_bands == 1:
        fb = frame(tables, bmin, inv_ext, camera, key, jnp.int32(cfg.seed),
                   jnp.int32(0), pix_perm)
        fb.block_until_ready()
    else:
        parts = []
        for bi in range(n_bands):
            out = frame(tables, bmin, inv_ext, camera, key,
                        jnp.int32(cfg.seed), jnp.int32(bi * band), pix_perm)
            out.block_until_ready()
            parts.append(out)
        fb = jnp.concatenate(parts)[: ppc * n_chunks]
    elapsed = _time.perf_counter() - t0
    if progress:
        from ..utils.profiling import RenderStats

        stats = RenderStats(elapsed, n_pixels, spp, cfg.max_child_rays,
                            backend="pallas-sorted")
        print(stats.summary(), file=sys.stderr)

    fb_np = np.asarray(fb, dtype=np.float64)
    if morton_px:
        out = np.zeros((n_pixels, 3), np.float64)
        m = perm < n_pixels
        out[perm[m]] = fb_np[: perm.shape[0]][m]
        fb_np = out
    else:
        fb_np = fb_np[:n_pixels]
    return fb_np.reshape(height, width, 3) / spp
