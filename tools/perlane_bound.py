#!/usr/bin/env python
"""Upper-bound the per-lane block-stepping idea with data (VERDICT r4 #2).

The standing mesh targets (65k >= 8 / 360k >= 3.5 Mrays/s) sit above
the tile-sweep kernel model's measured roofline; the one idea past that
model is per-lane block traversal (each lane walks its own skip-index
list over block AABBs, sweeps amortized across requesting lanes).
Before a research-grade kernel rewrite, this script bounds what ANY
such schedule could save, by replaying the production wavefront's lane
population (same transport, same per-bounce spatial sort, same tiles)
in plain jnp on CPU and counting three sweep models per bounce:

  A. tile-sweep (today): per sub-tile row group, a block is swept if
     its AABB overlaps the group's union segment box (origin ->
     origin + t_hit * dir over live lanes) — the production kernel's
     union cull, idealized (the real f2b/shrink machinery only adds).
  B. per-lane distinct (the proposed kernel, no lane regrouping): a
     block is swept for a TILE if >= 1 of its 1024 lanes' ray segments
     actually intersects the block AABB — the exact per-lane need set.
  C. perfect lane binning floor: sum over lanes of per-lane needed
     blocks / lanes-per-tile — what a magical scheduler that regroups
     lanes by need would sweep.  (The round-4 memory analysis argued
     B ~= A for incoherent stragglers; C needs a per-bounce sort by
     block need.)

If B/A ~= 1 the per-lane kernel cannot beat the tile sweep and the
targets retire with a measured negative; if B/A << 1 the kernel is
worth building.  Pairs scale with TRI_BLOCK; run with RTOW_TRI_BLOCK
pinned to compare against roofline history.

Usage: python tools/perlane_bound.py [65k|360k] [n_lanes] [spp]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from make_mesh import make_knot

from rtow_tpu.models.camera import camera_rays, make_camera, pixel_coords
from rtow_tpu.models.scene import SceneBuilder
from rtow_tpu.ops import bvh
from rtow_tpu.ops import pallas_megakernel as mk
from rtow_tpu.ops.wavefront_sorted import TILE, sort_keys

SPLIT = 4          # production pick_sweep_split for <=1024 blocks
MAX_DEPTH = 20


def seg_box_hits(o, e, boxes):
    """(L,3) origin, (L,3) endpoint vs (NB,6) boxes -> (L, NB) bool.

    Exact slab test of the ray SEGMENT against each AABB (the per-lane
    oracle).  Box layout: [minx,miny,minz,maxx,maxy,maxz]."""
    d = e - o
    # Avoid div-by-zero: treat tiny components as parallel.
    inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, jnp.inf)
    lo = (boxes[None, :, 0:3] - o[:, None, :]) * inv[:, None, :]
    hi = (boxes[None, :, 3:6] - o[:, None, :]) * inv[:, None, :]
    t0 = jnp.minimum(lo, hi)
    t1 = jnp.maximum(lo, hi)
    # Parallel axes: inside -> (-inf, inf), outside -> empty.
    par = jnp.abs(d)[:, None, :] <= 1e-12
    inside = jnp.logical_and(o[:, None, :] >= boxes[None, :, 0:3],
                             o[:, None, :] <= boxes[None, :, 3:6])
    t0 = jnp.where(par, jnp.where(inside, -jnp.inf, jnp.inf), t0)
    t1 = jnp.where(par, jnp.where(inside, jnp.inf, -jnp.inf), t1)
    enter = jnp.maximum(t0.max(axis=2), 0.0)
    exit_ = jnp.minimum(t1.min(axis=2), 1.0)
    return enter <= exit_


def union_box_hits(o, e, live, boxes):
    """Union segment box of live lanes vs (NB,6) boxes -> (NB,) bool."""
    big = jnp.float32(3e38)
    pts_min = jnp.minimum(o, e)
    pts_max = jnp.maximum(o, e)
    gmin = jnp.where(live[:, None], pts_min, big).min(axis=0)
    gmax = jnp.where(live[:, None], pts_max, -big).max(axis=0)
    return jnp.logical_and(
        (gmin <= boxes[:, 3:6]).all(axis=1),
        (gmax >= boxes[:, 0:3]).all(axis=1),
    )


SUBSEG = 8


def subseg_box_hits(o, e, live, boxes):
    """Model D: split each lane's segment into SUBSEG parametric
    pieces; a block is swept iff >= 1 sub-piece UNION box overlaps it.
    A swept-volume approximation of the ray bundle that a kernel can
    afford (SUBSEG boxes per row group per bounce, scalar tests in the
    descent) — kills the diagonal-AABB inflation that makes the single
    union box sweep blocks no ray passes near."""
    big = jnp.float32(3e38)
    hit_any = jnp.zeros((boxes.shape[0],), bool)
    for s in range(SUBSEG):
        a = o + (e - o) * (s / SUBSEG)
        b_ = o + (e - o) * ((s + 1) / SUBSEG)
        pmin = jnp.minimum(a, b_)
        pmax = jnp.maximum(a, b_)
        gmin = jnp.where(live[:, None], pmin, big).min(axis=0)
        gmax = jnp.where(live[:, None], pmax, -big).max(axis=0)
        hit_any = jnp.logical_or(hit_any, jnp.logical_and(
            (gmin <= boxes[:, 3:6]).all(axis=1),
            (gmax >= boxes[:, 0:3]).all(axis=1)))
    return hit_any


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "65k"
    n_lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    segments, rings = (256, 128) if which == "65k" else (600, 300)

    verts, faces = make_knot(segments, rings)
    b = SceneBuilder()
    b.add_mesh(verts[faces], b.add_lambertian((0.6, 0.5, 0.4)))
    scene = b.build()

    with mk.tri_block_for(scene.n_triangles):
        tri, tri_boxes, _s, _h = mk.build_tri_table(scene)
        tb = mk.TRI_BLOCK
    nb = tri.shape[0] // tb
    boxes = jnp.asarray(tri_boxes[:nb, :6])
    print(f"{which}: {scene.n_triangles} tris, TRI_BLOCK={tb}, "
          f"{nb} blocks; {n_lanes} lanes ({n_lanes // TILE} tiles), "
          f"spp={spp}")

    cam = make_camera(lookfrom=(0.0, 0.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      fov_degrees=45.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=3.0)

    # Lane population: one production chunk (rays_per_batch 256k at
    # spp64 = 4096 pixels = a compact ~64x64 Morton image tile).  Pick
    # the WINDOW with the highest bounce-0 hit rate so the population
    # matches the heavy chunks the roofline profiles (a centered window
    # looks straight through the knot's hole).
    ppc = n_lanes // spp
    side = int(np.sqrt(ppc))
    ppc = side * side
    n_lanes = ppc * spp
    W = H = 400
    # Raw BVH traverse + direct vertex gathers: make_nearest_hit's
    # one-hot winner fetch materializes an (L, n_tris) matrix — the
    # right call on a TPU MXU, a 377 GB OOM on a CPU host at 360k tris.
    bvh_tree = bvh.build_bvh(scene)
    tri_verts = scene.triangles.verts  # (M, 3, 3); all-triangle scene

    @jax.jit
    def hit_t_normal(o, d, tm):
        t, pid = bvh.traverse(bvh_tree, scene, o, d, tm,
                              1e-3, True)
        v = tri_verts[jnp.clip(pid, 0, tri_verts.shape[0] - 1)]
        n = jnp.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
        n = n / jnp.maximum(
            jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        n = jnp.where((jnp.sum(n * d, axis=-1) > 0)[:, None], -n, n)
        return t, n

    rr_, cc_ = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    s0 = (cc_.reshape(-1) + 0.5) / (W - 1)
    t0_ = ((H - 1 - rr_.reshape(-1)) + 0.5) / (H - 1)
    probe = camera_rays(cam, jax.random.key(1), jnp.asarray(s0),
                        jnp.asarray(t0_))
    pt, _pn = hit_t_normal(probe.origin, probe.direction, probe.time)
    hitmask = np.isfinite(np.asarray(pt)).reshape(H, W).astype(np.float32)
    # Densest side x side window via summed-area table.
    sat = hitmask.cumsum(0).cumsum(1)
    sat = np.pad(sat, ((1, 0), (1, 0)))
    wins = (sat[side:, side:] - sat[:-side, side:]
            - sat[side:, :-side] + sat[:-side, :-side])
    r0, c0 = np.unravel_index(np.argmax(wins), wins.shape)
    print(f"window ({r0},{c0})..+{side}: bounce-0 hit rate "
          f"{wins[r0, c0] / ppc:.1%}")
    rows = (r0 + np.arange(side))[:, None]
    cols = (c0 + np.arange(side))[None, :]
    pix = (rows * W + cols).reshape(-1)
    lane_pix = jnp.asarray(np.repeat(pix, spp).astype(np.int32))

    key = jax.random.key(0)
    k_pix, k_cam, key = jax.random.split(key, 3)
    s, t = pixel_coords(W, H, k_pix, lane_pix, dtype=cam.origin.dtype)
    rays = camera_rays(cam, k_cam, s, t)

    # Scene bounds for the production sort key + miss-segment clamp.
    bmin = boxes[:, 0:3].min(axis=0)
    bmax = boxes[:, 3:6].max(axis=0)
    inv_ext = 1.0 / jnp.maximum(bmax - bmin, 1e-6)
    scene_box = jnp.concatenate([bmin, bmax])[None, :]

    o = rays.origin
    d = rays.direction
    tm = rays.time
    alive = jnp.ones((n_lanes,), bool)

    group = TILE // SPLIT
    tot = {"A": 0.0, "B": 0.0, "C": 0.0, "D": 0.0, "E": 0.0,
           "live": 0.0}

    @jax.jit
    def bounce(o, d, tm, alive, key):
        t, n = hit_t_normal(o, d, tm)
        hit = jnp.isfinite(t)
        live = jnp.logical_and(alive, hit)
        t_hit = jnp.where(hit, t, 1e4)
        point = o + t_hit[:, None] * d
        # Lambertian scatter (the bench scene is all-lambertian).
        k1, k2 = jax.random.split(key)
        u = jax.random.normal(k1, n.shape, n.dtype)
        u = u / jnp.maximum(
            jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-8)
        nd = n + u
        nd = jnp.where(jnp.linalg.norm(nd, axis=-1, keepdims=True) < 1e-6,
                       n, nd)
        return point, nd, t_hit, live, k2

    @jax.jit
    def census_chunk(o, d, t_hit, alive):
        """One 16-tile chunk -> (A, B, C, live, tiles_live) partials.

        Chunked so the (l, NB, 3) slab intermediates stay ~100 MB."""
        # Clamp miss segments (t_hit 1e4) to the scene-box exit: the
        # real kernel's distance cull can't stop before scene exit on a
        # miss, but the union box shouldn't balloon past the geometry.
        inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, jnp.inf)
        lo = (scene_box[:, 0:3] - o) * inv
        hi = (scene_box[:, 3:6] - o) * inv
        t_exit = jnp.minimum(jnp.maximum(lo, hi).min(axis=1), t_hit)
        t_exit = jnp.maximum(t_exit, 0.0)
        e = o + t_exit[:, None] * d
        needs = jnp.logical_and(seg_box_hits(o, e, boxes),
                                alive[:, None])  # (l, NB)
        n_tiles = o.shape[0] // TILE
        tile_needs = needs.reshape(n_tiles, TILE, nb).any(axis=1)
        live_t = alive.reshape(n_tiles, TILE)
        B = tile_needs.sum()
        C = needs.sum() / TILE
        # Model A: per row group union segment box.
        n_groups = o.shape[0] // group
        og = o.reshape(n_groups, group, 3)
        eg = e.reshape(n_groups, group, 3)
        lg = alive.reshape(n_groups, group)
        swept = jax.vmap(union_box_hits, in_axes=(0, 0, 0, None))(
            og, eg, lg, boxes)
        # A counts row-group sweeps / SPLIT = tile-sweep units so A,B
        # are in the same currency (a group sweep costs 1/SPLIT of a
        # tile sweep: same blocks, quarter the rows).
        A = jnp.where(lg.any(axis=1)[:, None], swept, False).sum() / SPLIT
        sweptD = jax.vmap(subseg_box_hits, in_axes=(0, 0, 0, None))(
            og, eg, lg, boxes)
        D = jnp.where(lg.any(axis=1)[:, None], sweptD, False).sum() / SPLIT
        tiles_live = live_t.any(axis=1).sum()
        return A, B, C, D, alive.sum(), tiles_live

    # Keep the (lanes, NB, 3) slab intermediates bounded: 16 tiles at
    # the 65k knot's 512 blocks, proportionally fewer at larger tables
    # (the 360k knot's 2816 blocks OOM'd the host at 16).
    CHUNK = max(2, (16 * 512) // nb) * TILE

    def census(o, d, t_hit, alive):
        acc = np.zeros(6)
        for i in range(0, o.shape[0], CHUNK):
            sl = slice(i, i + CHUNK)
            part = census_chunk(o[sl], d[sl], t_hit[sl], alive[sl])
            acc += np.array([float(x) for x in part])
        return acc

    @jax.jit
    def winner_block(o, d, t_hit, alive):
        """Oracle binning key: the block holding each lane's hit point
        (dead/miss lanes -> NB, sorted last)."""
        hp = o + t_hit[:, None] * d
        inside = jnp.logical_and(
            (hp[:, None, :] >= boxes[None, :, 0:3] - 1e-4).all(axis=2),
            (hp[:, None, :] <= boxes[None, :, 3:6] + 1e-4).all(axis=2))
        first = jnp.argmax(inside, axis=1)
        ok = jnp.logical_and(alive, inside.any(axis=1))
        return jnp.where(ok, first, nb).astype(jnp.int32)

    def census_binned(o, d, t_hit, alive):
        """Model E: lanes re-tiled by winner block (achievable with a
        sort by hit-block id) -> distinct per-tile needs."""
        wb = np.zeros((o.shape[0],), np.int32)
        for i in range(0, o.shape[0], CHUNK):
            sl = slice(i, i + CHUNK)
            wb[sl] = np.asarray(
                winner_block(o[sl], d[sl], t_hit[sl], alive[sl]))
        order = jnp.asarray(np.argsort(wb, kind="stable"))
        acc = census(o[order], d[order], t_hit[order], alive[order])
        return acc[1]  # the B statistic of the re-tiled population

    for it in range(MAX_DEPTH):
        # Production order: sort by the wavefront key, THEN census the
        # tiles the kernel would actually see.
        keyv = sort_keys(o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1],
                         d[:, 2], alive.astype(jnp.int32), bmin, inv_ext)
        order = jnp.argsort(keyv, stable=True)
        o, d, tm, alive = o[order], d[order], tm[order], alive[order]

        p, nd, t_hit, live, key = bounce(o, d, tm, alive, key)
        A, B, C, D, n_live, tiles_live = census(o, d, t_hit, alive)
        E = census_binned(o, d, t_hit, alive)
        print(f"bounce {it:2d}: live {int(n_live):8d} "
              f"({int(tiles_live):4d} tiles)  A {A:9.1f}  B {B:9.1f} "
              f"(B/A {B / max(A, 1e-9):4.2f})  D {D:9.1f} "
              f"(D/A {D / max(A, 1e-9):4.2f})  E {E:9.1f} "
              f"(E/A {E / max(A, 1e-9):4.2f})  C {C:9.1f} "
              f"(C/A {C / max(A, 1e-9):4.2f})")
        tot["A"] += A
        tot["B"] += B
        tot["C"] += C
        tot["D"] += D
        tot["E"] += E
        tot["live"] += float(n_live)
        if int(n_live) == 0:
            break
        o = p + 1e-3 * nd / jnp.maximum(
            jnp.linalg.norm(nd, axis=-1, keepdims=True), 1e-8)
        d = nd
        alive = live

    print(f"\nTOTAL tile-sweep units: A {tot['A']:.0f}  B {tot['B']:.0f} "
          f"(B/A {tot['B'] / tot['A']:.3f})  D {tot['D']:.0f} "
          f"(D/A {tot['D'] / tot['A']:.3f})  E {tot['E']:.0f} "
          f"(E/A {tot['E'] / tot['A']:.3f})  C {tot['C']:.0f} "
          f"(C/A {tot['C'] / tot['A']:.3f})")
    print(f"B/A: per-lane-distinct ceiling (production sort); D/A: "
          f"{SUBSEG}-sub-segment union-box cull (kernel-affordable); "
          f"E/A: per-lane-distinct under winner-block binning (needs a "
          f"hit-block sort key); C/A: perfect lane binning floor.")


if __name__ == "__main__":
    main()
