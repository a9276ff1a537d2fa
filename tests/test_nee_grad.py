"""NEE gradients: the differentiable path can run the low-variance
next-event estimator (``diff.render_pixels(nee=True)``).

Under common random numbers the light-sampling distribution does not
depend on material parameters, so gradients w.r.t. albedo and emitted
radiance through the NEE estimator are exact and FD-verifiable — the
low-variance estimator is usable for inverse rendering on emissive
scenes (the reference has no lights at all; this extends the repo's
north-star gradient gate to the NEE path).  Light GEOMETRY gradients
carry the reparameterized interior derivative and are FD-gated too
(test_nee_light_geometry_grad_matches_fd); only visibility boundary
terms (moving occluder silhouettes) are out of scope.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtow_tpu.diff import image_mse, mask_grads, render_pixels, sgd_update
from rtow_tpu.models.camera import make_camera
from rtow_tpu.models.scene import SceneBuilder

W = H = 12
SPP = 8
DEPTH = 3
KEY = jax.random.key(11)


@pytest.fixture(scope="module")
def setup():
    """Diffuse sphere on a diffuse floor, lit by a small sphere light
    overhead, black background — direct light dominates, so NEE carries
    essentially all the radiance."""
    cam = make_camera(
        lookfrom=(0.0, 0.6, 1.6), lookat=(0.0, 0.0, -1.0), fov_degrees=55.0,
        aspect_ratio=1.0, aperture=0.0, focus_dist=1.0, t0=0.0, t1=0.0,
    )
    b = SceneBuilder()
    red = b.add_lambertian((0.7, 0.3, 0.3))
    ground = b.add_lambertian((0.5, 0.5, 0.5))
    lamp = b.add_light((6.0, 5.0, 4.0))
    b.add_sphere((0.0, 0.0, -1.0), 0.5, red)
    b.add_sphere((0.0, -100.5, -1.0), 100.0, ground)
    b.add_sphere((0.8, 2.2, -0.6), 0.35, lamp)
    scene = b.build(background=(0.0, 0.0, 0.0))
    # Central pixels on the red sphere, away from silhouettes.
    rows, cols = np.meshgrid(range(5, 8), range(5, 8), indexing="ij")
    pix = jnp.asarray((rows * W + cols).ravel(), dtype=jnp.int32)
    target = jnp.zeros((pix.shape[0], 3))
    return scene, cam, pix, target, lamp


def _loss(scene, cam, pix, target):
    return image_mse(
        scene, cam, KEY, target, pix,
        width=W, height=H, spp=SPP, max_depth=DEPTH, jitter=False, nee=True,
    )


def _replace_mat(scene, **kw):
    return dataclasses.replace(
        scene, materials=dataclasses.replace(scene.materials, **kw))


def test_nee_forward_is_lit(setup):
    """Sanity: with a black background the NEE path actually carries
    light (a broken estimator returning 0 would pass trivial FD gates)."""
    scene, cam, pix, _, _ = setup
    img = render_pixels(scene, cam, KEY, pix, width=W, height=H, spp=SPP,
                        max_depth=DEPTH, jitter=False, nee=True)
    assert float(jnp.max(img)) > 0.01


@pytest.mark.parametrize("which", ["albedo", "emit"])
def test_nee_grad_matches_fd(setup, which):
    scene, cam, pix, target, lamp = setup
    loss, grads = jax.jit(
        lambda s: jax.value_and_grad(_loss, allow_int=True)(
            s, cam, pix, target)
    )(scene)
    assert np.isfinite(float(loss))
    mat = 0 if which == "albedo" else lamp  # red sphere vs lamp emit row
    ad = float(grads.materials.albedo[mat, 0])

    def f(v):
        a = scene.materials.albedo.at[mat, 0].add(v)
        return float(_loss(_replace_mat(scene, albedo=a), cam, pix, target))

    eps = 1e-2
    fd = (f(eps) - f(-eps)) / (2 * eps)
    assert fd != 0.0, f"{which}: FD gate is degenerate (no light reaches)"
    denom = max(abs(fd), abs(ad), 1e-6)
    assert abs(ad - fd) / denom < 0.05, f"{which}: AD {ad} vs FD {fd}"


@pytest.mark.parametrize("which", ["radius", "center_y"])
def test_nee_light_geometry_grad_matches_fd(setup, which):
    """Light GEOMETRY gradients (sphere-light radius / center) through
    the NEE estimator match finite differences under common random
    numbers.

    The cone-sampled direction and the 2(1 - cos_max) pdf factor are
    smooth reparameterized functions of the light's center and radius,
    so reverse mode carries the full interior derivative — inverse
    rendering CAN recover light position/size.  What is still dropped
    is the visibility *boundary* term (the moving silhouette of an
    occluder), which is zero on this unoccluded scene — the same class
    of omission as every interior-point path-space gradient.
    """
    scene, cam, pix, target, _ = setup
    _, grads = jax.value_and_grad(_loss, allow_int=True)(
        scene, cam, pix, target)

    def _shift(v):
        sp = scene.spheres
        if which == "radius":
            sp = dataclasses.replace(sp, radius=sp.radius.at[2].add(v))
        else:
            sp = dataclasses.replace(sp, center0=sp.center0.at[2, 1].add(v))
        return _loss(dataclasses.replace(scene, spheres=sp), cam, pix,
                     target)

    ad = float(grads.spheres.radius[2] if which == "radius"
               else grads.spheres.center0[2, 1])
    eps = 1e-3
    fd = (float(_shift(eps)) - float(_shift(-eps))) / (2 * eps)
    assert fd != 0.0, f"{which}: FD gate is degenerate (no light reaches)"
    denom = max(abs(fd), abs(ad), 1e-6)
    assert abs(ad - fd) / denom < 0.05, f"{which}: AD {ad} vs FD {fd}"


def test_nee_grads_finite_everywhere(setup):
    """All scene gradients — including the light's geometry leaves, where
    the clamped sqrts in ops/lights.py hit their degenerate branches —
    must be finite (the double-where guards)."""
    scene, cam, pix, target, _ = setup
    _, grads = jax.value_and_grad(_loss, allow_int=True)(
        scene, cam, pix, target)
    for leaf in jax.tree_util.tree_leaves(grads):
        if hasattr(leaf, "dtype") and leaf.dtype != jax.dtypes.float0:
            assert np.isfinite(np.asarray(leaf)).all()


def test_nee_grads_finite_inside_light():
    """Degenerate-by-construction: the camera (and every shading point)
    sits INSIDE the sphere light, so the sampling cone is undefined
    (cos_max arg < 0) on every lane — the exact sqrt'(0) hazard the
    guards exist for."""
    cam = make_camera(
        lookfrom=(0.0, 0.0, 0.0), lookat=(0.0, 0.0, -1.0), fov_degrees=60.0,
        aspect_ratio=1.0, aperture=0.0, focus_dist=1.0,
    )
    b = SceneBuilder()
    gray = b.add_lambertian((0.6, 0.6, 0.6))
    lamp = b.add_light((1.0, 1.0, 1.0))
    b.add_sphere((0.0, 0.0, -1.0), 0.4, gray)
    b.add_sphere((0.0, 0.0, 0.0), 50.0, lamp)  # everything is inside it
    scene = b.build(background=(0.0, 0.0, 0.0))
    pix = jnp.arange(0, W * H, 5, dtype=jnp.int32)
    target = jnp.zeros((pix.shape[0], 3))
    loss, grads = jax.value_and_grad(_loss, allow_int=True)(
        scene, cam, pix, target)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        if hasattr(leaf, "dtype") and leaf.dtype != jax.dtypes.float0:
            assert np.isfinite(np.asarray(leaf)).all()


def test_nee_inverse_rendering_recovers_emit():
    """End-to-end: recover a light's emitted radiance by SGD through the
    NEE estimator — the practical payoff of NEE gradients (the plain
    estimator needs ~8x the samples for the same gradient noise on
    small-light scenes)."""
    cam = make_camera(
        lookfrom=(0.0, 0.6, 1.6), lookat=(0.0, 0.0, -1.0), fov_degrees=55.0,
        aspect_ratio=1.0, aperture=0.0, focus_dist=1.0,
    )

    def build(emit):
        b = SceneBuilder()
        red = b.add_lambertian((0.7, 0.3, 0.3))
        ground = b.add_lambertian((0.5, 0.5, 0.5))
        lamp = b.add_light(emit)
        b.add_sphere((0.0, 0.0, -1.0), 0.5, red)
        b.add_sphere((0.0, -100.5, -1.0), 100.0, ground)
        b.add_sphere((0.8, 2.2, -0.6), 0.35, lamp)
        return b.build(background=(0.0, 0.0, 0.0)), lamp

    true_scene, lamp = build((6.0, 2.0, 4.0))
    pix = jnp.arange(W * H, dtype=jnp.int32)
    target = render_pixels(true_scene, cam, KEY, pix, width=W, height=H,
                           spp=16, max_depth=DEPTH, nee=True)

    scene, _ = build((3.0, 3.0, 3.0))
    step = jax.jit(lambda s, k: jax.value_and_grad(
        lambda sc: image_mse(sc, cam, k, target, pix, width=W, height=H,
                             spp=16, max_depth=DEPTH, nee=True),
        allow_int=True)(s))
    key = jax.random.key(5)
    loss0 = None
    for _ in range(60):
        key, sub = jax.random.split(key)
        loss, grads = step(scene, sub)
        if loss0 is None:
            loss0 = float(loss)
        grads = mask_grads(grads, lambda p: p.endswith("albedo"))
        # Only the lamp row should move (fix the diffuse albedos).
        grads = dataclasses.replace(
            grads, materials=dataclasses.replace(
                grads.materials,
                albedo=grads.materials.albedo.at[:lamp].set(0.0)))
        # Radiance is linear in emit, so the loss is quadratic with
        # curvature ~2<(dI/de)^2> ~ 2e-5 on this dimly-lit frame; SGD
        # needs lr ~ 1/curvature.
        scene = sgd_update(scene, grads, lr=2e4)
    got = np.asarray(scene.materials.albedo[lamp])
    np.testing.assert_allclose(got, [6.0, 2.0, 4.0], atol=0.4)
    assert float(loss) < loss0


def test_nee_inverse_rendering_recovers_light_position():
    """End-to-end payoff of the reparameterized light-geometry
    gradients: recover a sphere light's full 3D POSITION by SGD through
    the NEE estimator (the displaced light starts 0.5 below its true
    height; all other parameters frozen)."""
    cam = make_camera(
        lookfrom=(0.0, 0.6, 1.6), lookat=(0.0, 0.0, -1.0), fov_degrees=55.0,
        aspect_ratio=1.0, aperture=0.0, focus_dist=1.0,
    )

    def build(ly):
        b = SceneBuilder()
        red = b.add_lambertian((0.7, 0.3, 0.3))
        ground = b.add_lambertian((0.5, 0.5, 0.5))
        lamp = b.add_light((6.0, 5.0, 4.0))
        b.add_sphere((0.0, 0.0, -1.0), 0.5, red)
        b.add_sphere((0.0, -100.5, -1.0), 100.0, ground)
        b.add_sphere((0.8, ly, -0.6), 0.35, lamp)
        return b.build(background=(0.0, 0.0, 0.0))

    pix = jnp.arange(W * H, dtype=jnp.int32)
    target = render_pixels(build(2.2), cam, KEY, pix, width=W, height=H,
                           spp=16, max_depth=DEPTH, nee=True)
    scene = build(1.7)
    step = jax.jit(lambda s, k: jax.value_and_grad(
        lambda sc: image_mse(sc, cam, k, target, pix, width=W, height=H,
                             spp=16, max_depth=DEPTH, nee=True),
        allow_int=True)(s))
    key = jax.random.key(5)
    loss0 = None
    for _ in range(30):
        key, sub = jax.random.split(key)
        loss, grads = step(scene, sub)
        if loss0 is None:
            loss0 = float(loss)
        grads = mask_grads(grads, lambda p: p.endswith("center0"))
        # Only the lamp (row 2) moves; geometry of the rest is frozen.
        gc = grads.spheres.center0.at[:2].set(0.0)
        grads = dataclasses.replace(
            grads, spheres=dataclasses.replace(grads.spheres, center0=gc))
        scene = sgd_update(scene, grads, lr=3e3)
    got = np.asarray(scene.spheres.center0[2])
    np.testing.assert_allclose(got, [0.8, 2.2, -0.6], atol=0.15)
    assert float(loss) < loss0


def test_nee_triangle_light_grad_matches_fd():
    """Same FD gate through the TRIANGLE branch of sample_light_dirs /
    light_pdf_toward (area sampling + Moeller-Trumbore pdf evaluator)."""
    cam = make_camera(
        lookfrom=(0.0, 0.6, 1.6), lookat=(0.0, 0.0, -1.0), fov_degrees=55.0,
        aspect_ratio=1.0, aperture=0.0, focus_dist=1.0,
    )
    b = SceneBuilder()
    red = b.add_lambertian((0.7, 0.3, 0.3))
    ground = b.add_lambertian((0.5, 0.5, 0.5))
    lamp = b.add_light((5.0, 5.0, 5.0))
    b.add_sphere((0.0, 0.0, -1.0), 0.5, red)
    b.add_sphere((0.0, -100.5, -1.0), 100.0, ground)
    # Downward-facing emissive triangle above the sphere: e1 x e2 =
    # (1.4,0,0) x (1.4,0,1.2) = (0,-1.68,0), so the culled-front side
    # faces the scene below.
    b.add_triangle((-0.7, 1.8, -1.6), (0.7, 1.8, -1.6), (0.7, 1.8, -0.4),
                   lamp)
    scene = b.build(background=(0.0, 0.0, 0.0))
    rows, cols = np.meshgrid(range(5, 8), range(5, 8), indexing="ij")
    pix = jnp.asarray((rows * W + cols).ravel(), dtype=jnp.int32)
    target = jnp.zeros((pix.shape[0], 3))

    loss, grads = jax.value_and_grad(_loss, allow_int=True)(
        scene, cam, pix, target)
    assert np.isfinite(float(loss))
    for mat in (0, lamp):
        ad = float(grads.materials.albedo[mat, 0])

        def f(v, mat=mat):
            a = scene.materials.albedo.at[mat, 0].add(v)
            return float(_loss(_replace_mat(scene, albedo=a), cam, pix,
                               target))

        eps = 1e-2
        fd = (f(eps) - f(-eps)) / (2 * eps)
        assert fd != 0.0, f"mat {mat}: degenerate FD gate (unlit)"
        denom = max(abs(fd), abs(ad), 1e-6)
        assert abs(ad - fd) / denom < 0.05, f"mat {mat}: AD {ad} vs FD {fd}"
