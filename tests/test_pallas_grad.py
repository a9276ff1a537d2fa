"""Megakernel gradient tests (interpret mode — no TPU required).

The kernel-speed gradient path (ops/pallas_grad.py) must pass the same
north-star FD gates as the jnp path (tests/test_diff.py): reverse-mode
gradients of a pixel loss through the Pallas forward+backward bounce
kernels vs central finite differences with common random numbers (the
counter-based RNG makes both FD evaluations replay identical draws).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rtow_tpu.models.camera import make_camera
from rtow_tpu.models.scene import SceneBuilder
from rtow_tpu.ops.pallas_grad import (
    loss_and_grad_kernel, render_pixels_kernel,
)

W = H = 12
SPP = 32  # averages away single-sample visibility flips in the FD curve
DEPTH = 2
KEY = jax.random.key(7)
SEED = 11


@pytest.fixture(scope="module")
def setup():
    cam = make_camera(
        lookfrom=(0.0, 0.0, 0.0), lookat=(0.0, 0.0, -1.0), fov_degrees=60.0,
        aspect_ratio=1.0, aperture=0.0, focus_dist=1.0, t0=0.0, t1=0.0,
    )
    b = SceneBuilder()
    red = b.add_lambertian((0.7, 0.3, 0.3))
    ground = b.add_lambertian((0.5, 0.5, 0.5))
    # Two-object scene: every FD flip source is a sphere/ground or
    # sphere/sky boundary; central pixels + 32 spp keep the loss smooth
    # over +-eps (the estimator is piecewise-smooth by construction).
    b.add_sphere((0.0, 0.0, -1.0), 0.5, red)
    b.add_sphere((0.0, -100.5, -1.0), 100.0, ground)
    scene = b.build()
    # Central pixels — squarely on the red sphere, away from silhouettes.
    rows, cols = np.meshgrid(range(4, 8), range(4, 8), indexing="ij")
    pix = jnp.asarray((rows * W + cols).ravel(), dtype=jnp.int32)
    target = jnp.zeros((pix.shape[0], 3))
    return scene, cam, pix, target


def _loss(scene, cam, pix, target):
    img = render_pixels_kernel(scene, cam, KEY, pix, width=W, height=H,
                               spp=SPP, max_depth=DEPTH, seed=SEED,
                               jitter=False)
    return jnp.mean((img - target) ** 2)


def _replace_sphere(scene, **kw):
    return dataclasses.replace(
        scene, spheres=dataclasses.replace(scene.spheres, **kw))


def _replace_mat(scene, **kw):
    return dataclasses.replace(
        scene, materials=dataclasses.replace(scene.materials, **kw))


def test_forward_matches_flat_path(setup):
    """The grad-path forward must be a faithful renderer: statistical
    agreement with the jnp oracle on the same scene."""
    from rtow_tpu.config import Config
    from rtow_tpu.render import render

    scene, cam, _, _ = setup
    pix = jnp.arange(W * H, dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        img_k = np.asarray(
            render_pixels_kernel(scene, cam, KEY, pix, width=W, height=H,
                                 spp=32, max_depth=4, seed=SEED)
        ).reshape(H, W, 3)
    cfg = Config(image_width=W, aspect_ratio=1.0, samples_per_pixel=32,
                 max_child_rays=4, backend="jnp")
    img_j = render(scene, cam, cfg)
    assert abs(img_k.mean() - img_j.mean()) < 0.03
    assert np.abs(img_k - img_j).mean() < 0.05


@pytest.mark.parametrize(
    "name,eps,tol",
    # eps inside the locally-smooth window: at +-1e-2 a discrete
    # visibility flip can cross the FD stencil (the loss is
    # piecewise-smooth; AD gives the correct branch slope).
    [("center_x", 2e-3, 0.08), ("radius", 2e-3, 0.08),
     ("albedo_r", 1e-2, 0.05)],
)
def test_kernel_grad_matches_fd(setup, name, eps, tol):
    scene, cam, pix, target = setup
    with pltpu.force_tpu_interpret_mode():
        loss, grads = loss_and_grad_kernel(
            scene, cam, KEY, target, pix,
            width=W, height=H, spp=SPP, max_depth=DEPTH, seed=SEED,
            jitter=False,
        )
    assert np.isfinite(float(loss))

    if name == "center_x":
        ad = float(grads.spheres.center0[0, 0])

        def f(v):
            c = scene.spheres.center0.at[0, 0].add(v)
            return _replace_sphere(scene, center0=c)
    elif name == "radius":
        ad = float(grads.spheres.radius[0])

        def f(v):
            r = scene.spheres.radius.at[0].add(v)
            return _replace_sphere(scene, radius=r)
    else:
        ad = float(grads.materials.albedo[0, 0])

        def f(v):
            a = scene.materials.albedo.at[0, 0].add(v)
            return _replace_mat(scene, albedo=a)

    def loss_at(v):
        with pltpu.force_tpu_interpret_mode():
            return float(_loss(f(v), cam, pix, target))

    fd = (loss_at(eps) - loss_at(-eps)) / (2 * eps)
    assert fd != 0.0 or ad == pytest.approx(0.0, abs=1e-4)
    denom = max(abs(fd), abs(ad), 1e-6)
    assert abs(ad - fd) / denom < tol, f"{name}: AD {ad} vs FD {fd}"


def test_sharded_kernel_train_step(setup):
    """Full sharded training step with the kernel renderer: forward ->
    MSE -> kernel backward -> psum over both mesh axes -> SGD update,
    on the 8-virtual-device mesh (interpret mode)."""
    from rtow_tpu.diff import build_train_step
    from rtow_tpu.parallel.mesh import make_mesh

    scene, cam, _, _ = setup
    width, height, spp = 8, 4, 16
    mesh = make_mesh(8, spp, tile_shards=4, spp_shards=2)
    step = build_train_step(
        mesh, cam, width=width, height=height, spp=spp, max_depth=2,
        lr=1e-2, renderer=render_pixels_kernel,
    )
    target = jnp.zeros((width * height, 3), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        new_scene, loss = step(scene, jax.random.key(0), target)
    assert np.isfinite(float(loss))
    moved = np.abs(
        np.asarray(new_scene.materials.albedo)
        - np.asarray(scene.materials.albedo)
    ).max()
    assert moved > 0.0, "SGD update did not move material parameters"


def test_kernel_overlap_grad_allreduce_parity(setup):
    """Overlapped (per-bounce, DDP-style) gradient all-reduce on the
    KERNEL train step: numerically identical to the monolithic
    post-backward psum, with the all-reduces lowered inside the
    backward scan (outside @main) where the latency-hiding scheduler
    can overlap them — the kernel-path mirror of
    tests/test_sharded.py::test_overlap_grad_allreduce_parity."""
    from rtow_tpu.diff import build_train_step
    from rtow_tpu.parallel.mesh import make_mesh

    scene, cam, _, _ = setup
    width, height, spp = 8, 4, 16
    mesh = make_mesh(8, spp, tile_shards=4, spp_shards=2)
    kw = dict(width=width, height=height, spp=spp, max_depth=2, lr=1e-2,
              renderer=render_pixels_kernel)
    base = build_train_step(mesh, cam, **kw)
    over = build_train_step(mesh, cam, overlap_grad_allreduce=True, **kw)
    target = jnp.zeros((width * height, 3), jnp.float32)
    key = jax.random.key(0)
    with pltpu.force_tpu_interpret_mode():
        s0, l0 = base(scene, key, target)
        s1, l1 = over(scene, key, target)

        def _ar_outside_main(txt):
            main_end = txt.index("func.func private")
            return txt.count("all_reduce", main_end)

        base_hlo = base.lower(scene, key, target).as_text()
        over_hlo = over.lower(scene, key, target).as_text()
    assert float(l0) == pytest.approx(float(l1), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s0),
                    jax.tree_util.tree_leaves(s1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    assert _ar_outside_main(base_hlo) == 0
    assert _ar_outside_main(over_hlo) > 0


def test_sharded_kernel_train_step_mesh():
    """BASELINE config (e)'s gradient leg on the virtual mesh: sharded
    training step with the kernel renderer on a TRIANGLE mesh,
    pixel+spp sharded over 8 devices with gradient all-reduce.

    Uses a flat-path mesh (< 2*SUPER blocks): interpret-mode DMA
    scratch (the super hierarchy's box descent) hangs under shard_map
    — an interpret-only artifact; on hardware the hierarchy compiles
    under shard_map like any other kernel, and flat-vs-super parity is
    bit-exact (test_super_hierarchy_grads_match_flat)."""
    import sys

    from rtow_tpu.diff import build_train_step
    from rtow_tpu.parallel.mesh import make_mesh

    sys.path.insert(0, "/root/repo/tools")
    from make_mesh import make_knot

    cam = make_camera(lookfrom=(0.0, 0.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      fov_degrees=45.0, aspect_ratio=2.0, aperture=0.0,
                      focus_dist=3.0)
    verts, faces = make_knot(16, 12)  # 384 tris -> 3 blocks, flat sweep
    b = SceneBuilder()
    b.add_mesh(verts[faces], b.add_lambertian((0.6, 0.5, 0.4)))
    scene = b.build()
    width, height, spp = 8, 4, 8
    mesh = make_mesh(8, spp, tile_shards=4, spp_shards=2)
    step = build_train_step(
        mesh, cam, width=width, height=height, spp=spp, max_depth=2,
        lr=1e-2, renderer=render_pixels_kernel,
    )
    target = jnp.zeros((width * height, 3), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        new_scene, loss = step(scene, jax.random.key(0), target)
    assert np.isfinite(float(loss))
    moved = np.abs(
        np.asarray(new_scene.triangles.verts)
        - np.asarray(scene.triangles.verts)
    ).max()
    assert moved > 0.0, "SGD update did not move mesh vertices"


def test_kernel_triangle_grad_matches_fd():
    """FD gate for triangle vertex gradients through the kernel path
    (mirrors tests/test_diff.py::test_triangle_grad_matches_fd)."""
    cam = make_camera(
        lookfrom=(0.0, 0.0, 1.0), lookat=(0.0, 0.0, -1.0), fov_degrees=60.0,
        aspect_ratio=1.0, aperture=0.0, focus_dist=1.0,
    )
    b = SceneBuilder()
    red = b.add_lambertian((0.7, 0.3, 0.3))
    gray = b.add_lambertian((0.5, 0.5, 0.5))
    # One large TILTED triangle covering the pixel window — a vertex
    # perturbation rotates the normal, so interior-pixel shading has a
    # strong smooth dependence on it.
    b.add_triangle((-4.0, -4.0, -0.6), (4.0, -1.0, -1.8), (0.0, 5.0, -1.4),
                   red)
    b.add_sphere((0.0, -100.5, -1.0), 100.0, gray)
    scene = b.build()
    rows, cols = np.meshgrid(range(5, 8), range(5, 8), indexing="ij")
    pix = jnp.asarray((rows * W + cols).ravel(), dtype=jnp.int32)
    target = jnp.zeros((pix.shape[0], 3))

    with pltpu.force_tpu_interpret_mode():
        loss, grads = loss_and_grad_kernel(
            scene, cam, KEY, target, pix,
            width=W, height=H, spp=SPP, max_depth=DEPTH, seed=SEED,
            jitter=False,
        )
    assert np.isfinite(float(loss))
    ad = float(grads.triangles.verts[0, 0, 2])
    for leaf in jax.tree_util.tree_leaves(grads):
        if hasattr(leaf, "dtype") and leaf.dtype != jax.dtypes.float0:
            assert np.isfinite(np.asarray(leaf)).all()

    def loss_at(v):
        tv = scene.triangles.verts.at[0, 0, 2].add(v)
        s2 = dataclasses.replace(
            scene, triangles=dataclasses.replace(scene.triangles, verts=tv)
        )
        with pltpu.force_tpu_interpret_mode():
            return float(_loss(s2, cam, pix, target))

    eps = 2e-3
    fd = (loss_at(eps) - loss_at(-eps)) / (2 * eps)
    denom = max(abs(fd), abs(ad), 1e-6)
    assert abs(ad - fd) / denom < 0.1, f"AD {ad} vs FD {fd}"


def test_kernel_grads_finite_everywhere(setup):
    scene, cam, pix, target = setup
    with pltpu.force_tpu_interpret_mode():
        _, grads = loss_and_grad_kernel(
            scene, cam, KEY, target, pix,
            width=W, height=H, spp=SPP, max_depth=DEPTH, seed=SEED,
        )
    for leaf in jax.tree_util.tree_leaves(grads):
        if hasattr(leaf, "dtype") and leaf.dtype != jax.dtypes.float0:
            assert np.isfinite(np.asarray(leaf)).all()


def test_super_hierarchy_grads_match_flat():
    """Meshes >= 2*SUPER blocks route the gradient kernels through the
    forward pipeline's super-block front-to-back descent; the sweep
    visits blocks in a different order but computes identical per-pair
    intersections, so loss and every gradient leaf must be bit-equal
    to the flat reference sweep."""
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from make_mesh import make_knot

    cam = make_camera(lookfrom=(0.0, 0.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      fov_degrees=45.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=3.0)
    verts, faces = make_knot(64, 32)  # 4096 tris -> 32 blocks, n_super=2
    b = SceneBuilder()
    b.add_mesh(verts[faces], b.add_lambertian((0.6, 0.5, 0.4)))
    b.add_sphere((0.0, -101.0, 0.0), 100.0, b.add_lambertian((0.5, 0.5, 0.5)))
    scene = b.build()
    w = h = 4
    pix = jnp.arange(w * h, dtype=jnp.int32)
    target = jnp.zeros((w * h, 3))
    out = {}
    for force_flat in (True, False):
        with pltpu.force_tpu_interpret_mode():
            loss, grads = loss_and_grad_kernel(
                scene, cam, KEY, target, pix, width=w, height=h, spp=4,
                max_depth=2, seed=SEED, _force_flat=force_flat,
            )
        out[force_flat] = (float(loss), grads)
    assert out[True][0] == out[False][0]
    g_flat = jax.tree_util.tree_leaves(out[True][1])
    g_sup = jax.tree_util.tree_leaves(out[False][1])
    for a, b_ in zip(g_flat, g_sup):
        if a.dtype == jax.dtypes.float0:
            continue
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_sorted_lanes_grads_match_unsorted():
    """sort_lanes=True (the large-mesh sorted gradient path) must match
    the unsorted kernel path: the per-lane math is identical (counter
    RNG on the immutable lane id) and the permutation custom_vjp
    un-permutes cotangents exactly, so loss is bit-equal and gradients
    agree to reduction-order noise."""
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from make_mesh import make_knot

    cam = make_camera(lookfrom=(0.0, 0.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      fov_degrees=45.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=3.0)
    verts, faces = make_knot(16, 12)  # 384 tris -> 3 blocks
    b = SceneBuilder()
    b.add_mesh(verts[faces], b.add_lambertian((0.6, 0.5, 0.4)))
    b.add_sphere((0.0, -101.0, 0.0), 100.0, b.add_lambertian((0.5, 0.5, 0.5)))
    scene = b.build()
    w = h = 8
    pix = jnp.arange(w * h, dtype=jnp.int32)
    target = jnp.zeros((w * h, 3))
    out = {}
    for sort_lanes in (False, True):
        with pltpu.force_tpu_interpret_mode():
            loss, grads = loss_and_grad_kernel(
                scene, cam, KEY, target, pix, width=w, height=h, spp=8,
                max_depth=2, seed=SEED, sort_lanes=sort_lanes,
            )
        out[sort_lanes] = (float(loss), grads)
    assert out[False][0] == pytest.approx(out[True][0], rel=1e-6)
    g0 = jax.tree_util.tree_leaves(out[False][1])
    g1 = jax.tree_util.tree_leaves(out[True][1])
    for a, b_ in zip(g0, g1):
        if a.dtype == jax.dtypes.float0:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-6)

def test_sorted_lanes_sphere_and_nee_match_unsorted():
    """Round 5 prepares sort_lanes for SPHERE scenes too (the grad
    drain census: sorted compaction + the all-dead tile skip reclaims
    ~70% of dispatched tile-bounces at bench shapes).  The sorted path
    must stay bit-equal in loss for sphere-only AND emissive+NEE
    scenes, not just the large-mesh path the default enables."""
    from rtow_tpu.models.builders import light_scene, three_sphere_scene

    w = h = 8
    pix = jnp.arange(w * h, dtype=jnp.int32)
    target = jnp.zeros((w * h, 3))
    for name, (scene, cam), nee in (
        ("spheres", three_sphere_scene(aspect_ratio=1.0), False),
        ("nee", light_scene(aspect_ratio=1.0), True),
    ):
        out = {}
        for sort_lanes in (False, True):
            with pltpu.force_tpu_interpret_mode():
                loss, grads = loss_and_grad_kernel(
                    scene, cam, KEY, target, pix, width=w, height=h,
                    spp=8, max_depth=2, seed=SEED,
                    sort_lanes=sort_lanes, nee=nee,
                )
            out[sort_lanes] = (float(loss), grads)
        assert out[False][0] == pytest.approx(out[True][0], rel=1e-6), name
        g0 = jax.tree_util.tree_leaves(out[False][1])
        g1 = jax.tree_util.tree_leaves(out[True][1])
        for a, b_ in zip(g0, g1):
            if a.dtype == jax.dtypes.float0:
                continue
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=1e-6)
