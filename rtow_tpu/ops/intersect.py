"""Wavefront ray-primitive intersection.

The reference intersects one ray against one primitive at a time through
virtual/variant dispatch (reference src/common-model.cpp:64-125).  Here
intersection is a dense (rays × primitives) computation: every lane of the
wavefront tests every primitive of a kind in one fused VPU pass, then a
single argmin picks the nearest hit.  The scene is tiny (hundreds of
primitives, a few KB) while the wavefront is huge (10^5-10^6 rays), so the
(L, N) sweep is the TPU-shaped formulation; the BVH (ops/bvh.py) replaces
the full sweep with a masked subset for large meshes.

All functions are shape-polymorphic over a leading batch axis L and are
differentiable w.r.t. scene geometry.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.materials import HitRecord
from ..models.scene import Scene, Spheres, Triangles
from . import vec

#: Self-intersection epsilon — the reference's ``root.hit(ray, 0.001, inf)``
#: default (src/render.cpp:32-34).
T_MIN = 1e-3


def sphere_ts(
    spheres: Spheres,
    origin: jax.Array,
    direction: jax.Array,
    time: jax.Array,
    tmin: float = T_MIN,
    tmax=jnp.inf,
) -> jax.Array:
    """Nearest valid hit parameter per (ray, sphere) pair -> (L, N), +inf on miss.

    Same quadratic as ``sphere_hit_helper`` (reference
    src/common-model.cpp:64-91): half-b form, near root preferred, far
    root accepted when the near root is out of range.  Branchless.
    Motion blur: the center is lerped by the per-ray time
    (src/oo-primitives.h:63-66), which folds into the quadratic's
    coefficients without materialising per-pair centers.
    """
    # center(t) = c0 + time * dc;  oc = o - center
    # h = oc.d = o.d - c0.d - time*(dc.d)
    # c = oc.oc - r^2
    #   = o.o - 2 o.c0 + c0.c0 - r^2  - 2*time*(o.dc - c0.dc) + time^2 dc.dc
    o, d, tm = origin, direction, time[..., None]  # (L,3),(L,3),(L,1)
    c0, dc, r = spheres.center0, spheres.dcenter, spheres.radius  # (N,3),(N,3),(N,)

    a = vec.length2(d)[..., None]  # (L, 1)
    o_d = vec.length2(o)  # reused pieces
    # Pairwise dots via small matmuls: (L,3) @ (3,N).  precision=HIGHEST is
    # load-bearing on TPU: the MXU's default bf16 passes lose ~8 mantissa
    # bits, catastrophic for the expanded quadratic when |center| ~ 1e3
    # (the r=1000 ground sphere) — renders as diagonal streak noise.
    hi = jax.lax.Precision.HIGHEST
    od_c0 = jnp.matmul(d, c0.T, precision=hi)  # (L, N) = d.c0
    od_dc = jnp.matmul(d, dc.T, precision=hi)  # (L, N) = d.dc
    oo_c0 = jnp.matmul(o, c0.T, precision=hi)  # (L, N) = o.c0
    oo_dc = jnp.matmul(o, dc.T, precision=hi)  # (L, N) = o.dc
    c0_c0 = vec.length2(c0)  # (N,)
    c0_dc = vec.dot(c0, dc)  # (N,)
    dc_dc = vec.length2(dc)  # (N,)

    h = vec.dot(o, d)[..., None] - od_c0 - tm * od_dc  # (L, N)
    c = (
        o_d[..., None]
        - 2.0 * oo_c0
        + c0_c0
        - r * r
        - 2.0 * tm * (oo_dc - c0_dc)
        + tm * tm * dc_dc
    )  # (L, N)

    disc = h * h - a * c
    sq = vec.safe_sqrt(disc)  # guarded: no inf derivative on miss lanes
    near = (-h - sq) / a
    far = (-h + sq) / a
    near_ok = (near >= tmin) & (near <= tmax)
    far_ok = (far >= tmin) & (far <= tmax)
    root = jnp.where(near_ok, near, far)
    valid = (disc > 0.0) & (near_ok | far_ok)
    return jnp.where(valid, root, jnp.inf)


def triangle_ts(
    triangles: Triangles,
    origin: jax.Array,
    direction: jax.Array,
    tmin: float = T_MIN,
    tmax=jnp.inf,
    cull_backfaces: bool = True,
) -> jax.Array:
    """Hit parameter per (ray, triangle) -> (L, M), +inf on miss.

    Möller–Trumbore in the reference's determinant form
    (src/common-model.cpp:104-125).  The reference backface-culls
    (``det >= 1e-6``); ``cull_backfaces=False`` gives the two-sided
    variant (SURVEY.md quirks ledger: culling is a flag here).
    """
    a = triangles.verts[:, 0]  # (M, 3)
    e1 = triangles.verts[:, 1] - a
    e2 = triangles.verts[:, 2] - a
    n = vec.cross(e1, e2)  # (M, 3)

    o, d = origin, direction
    det = -jnp.matmul(d, n.T, precision=jax.lax.Precision.HIGHEST)  # (L, M)
    # ao and dao are per-pair; decompose via scalar-triple-product algebra:
    #   u = e2.(ao × d) = ao.(d × e2),   v = -e1.(ao × d) = -ao.(d × e1)
    # with ao = o - a.  cross(ao, d) per pair would be (L, M, 3); instead
    # use u*det form:  ao.(d × e2) = o.(d × e2) - a.(d × e2).
    # d × e2 and d × e1 still pair L with M; keep the (L, M, 3) form simple
    # and let XLA fuse — M is small for sphere scenes, and meshes route
    # through the BVH which chunks M.
    ao = o[..., None, :] - a  # (L, M, 3)
    dao = jnp.cross(ao, d[..., None, :])  # (L, M, 3)
    # Guarded reciprocal: 1/det is inf for parallel rays, and inf * zero
    # cotangent = NaN in reverse mode even on masked lanes.
    det_ok = jnp.abs(det) >= 1e-6
    invdet = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    u = vec.dot(jnp.broadcast_to(e2, dao.shape), dao) * invdet
    v = -vec.dot(jnp.broadcast_to(e1, dao.shape), dao) * invdet
    t = vec.dot(ao, jnp.broadcast_to(n, ao.shape)) * invdet

    facing = det >= 1e-6 if cull_backfaces else jnp.abs(det) >= 1e-6
    valid = facing & (t >= tmin) & (t <= tmax) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    return jnp.where(valid, t, jnp.inf)


def hit_record_from(
    scene: Scene,
    origin: jax.Array,
    direction: jax.Array,
    time: jax.Array,
    t: jax.Array,
    prim_idx: jax.Array,
    cull_backfaces: bool = True,
) -> HitRecord:
    """Reconstruct full hit info for the winning primitive index.

    ``prim_idx`` indexes spheres first then triangles (global primitive
    id); lanes with ``t == +inf`` are misses.  Gathering the winner and
    recomputing its normal is O(L) instead of O(L·N) — gradients still
    flow into the winner's geometry through both ``t`` and the normal.
    """
    n_sph = scene.n_spheres
    n_tri = scene.n_triangles
    hit = jnp.isfinite(t)
    t_safe = jnp.where(hit, t, 1.0)
    point = origin + t_safe[..., None] * direction

    if n_sph:
        is_sph = prim_idx < n_sph if n_tri else jnp.ones_like(hit)
        si = jnp.clip(prim_idx, 0, n_sph - 1)
        c0 = scene.spheres.center0[si]
        dc = scene.spheres.dcenter[si]
        r = scene.spheres.radius[si]
        center = c0 + time[..., None] * dc
        n_s = vec.normalize(point - center)
        # front XOR negative-radius hollow-glass trick
        # (reference src/common-model.cpp:88).
        front_s = (vec.dot(direction, n_s) < 0.0) ^ (r < 0.0)
        n_s = jnp.where(front_s[..., None], n_s, -n_s)
        mat_s = scene.spheres.material[si]
    if n_tri:
        is_tri = prim_idx >= n_sph
        ti = jnp.clip(prim_idx - n_sph, 0, n_tri - 1)
        va = scene.triangles.verts[ti, 0]
        e1 = scene.triangles.verts[ti, 1] - va
        e2 = scene.triangles.verts[ti, 2] - va
        n_t = vec.normalize(vec.cross(e1, e2))
        if not cull_backfaces:
            n_t = jnp.where(vec.dot(direction, n_t)[..., None] < 0.0, n_t, -n_t)
        # Reference reports triangles as always front-facing
        # (src/common-model.cpp:122).
        front_t = jnp.ones_like(hit)
        mat_t = scene.triangles.material[ti]

    if n_sph and n_tri:
        normal = jnp.where(is_sph[..., None], n_s, n_t)
        front = jnp.where(is_sph, front_s, front_t)
        mat_id = jnp.where(is_sph, mat_s, mat_t)
    elif n_sph:
        normal, front, mat_id = n_s, front_s, mat_s
    else:
        normal, front, mat_id = n_t, front_t, mat_t

    mats = scene.materials
    return HitRecord(
        t=t,
        hit=hit,
        point=point,
        normal=normal,
        front=front,
        mat_kind=mats.kind[mat_id],
        albedo=mats.albedo[mat_id],
        fuzz=mats.fuzz[mat_id],
        ir=mats.ir[mat_id],
    )


def nearest_hit_bruteforce(
    scene: Scene,
    origin: jax.Array,
    direction: jax.Array,
    time: jax.Array,
    tmin: float = T_MIN,
    cull_backfaces: bool = True,
) -> HitRecord:
    """Nearest hit over the whole scene by dense sweep + argmin.

    The semantic equivalent of ``BVHNode::hit`` root traversal
    (reference src/render.cpp:52-71) without the tree: exact same nearest
    hit, no traversal divergence.
    """
    ts = []
    if scene.n_spheres:
        ts.append(sphere_ts(scene.spheres, origin, direction, time, tmin))
    if scene.n_triangles:
        ts.append(
            triangle_ts(scene.triangles, origin, direction, tmin, cull_backfaces=cull_backfaces)
        )
    t_all = jnp.concatenate(ts, axis=-1) if len(ts) > 1 else ts[0]
    prim_idx = jnp.argmin(t_all, axis=-1)
    t = jnp.take_along_axis(t_all, prim_idx[..., None], axis=-1)[..., 0]
    if scene.n_spheres and not scene.n_triangles:
        pass  # prim ids already global
    elif scene.n_triangles and not scene.n_spheres:
        prim_idx = prim_idx + scene.n_spheres  # keep global id convention
    return hit_record_from(
        scene, origin, direction, time, t, prim_idx, cull_backfaces=cull_backfaces
    )
