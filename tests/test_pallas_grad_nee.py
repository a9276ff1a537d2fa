"""NEE/MIS gradients through the Pallas kernels (interpret mode).

Round-2 left "kernel-speed gradients" excluding the round's own NEE
estimator (``diff.render_pixels(nee=True)`` was jnp-only).  These tests
gate the kernel NEE gradient path the same way tests/test_nee_grad.py
gates the jnp one: forward parity with the production NEE renderer,
central finite differences under common random numbers for material,
emission, AND light-geometry (radius/center) gradients — the cone-
sampling reparameterization carries the interior derivative, so those
leaves are no longer detached (round 4); only the occluder-silhouette
boundary term is dropped.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rtow_tpu.models.builders import cornell_scene
from rtow_tpu.models.camera import make_camera
from rtow_tpu.models.scene import SceneBuilder
from rtow_tpu.ops.pallas_grad import render_pixels_kernel

W = H = 12
SPP = 8
DEPTH = 3
KEY = jax.random.key(11)
SEED = 4


@pytest.fixture(scope="module")
def setup():
    """Same scene as tests/test_nee_grad.py: diffuse sphere + floor lit
    by a small overhead sphere light, black background — direct light
    dominates, so the NEE contribution carries the gradients."""
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
    rows, cols = np.meshgrid(range(5, 8), range(5, 8), indexing="ij")
    pix = jnp.asarray((rows * W + cols).ravel(), dtype=jnp.int32)
    target = jnp.zeros((pix.shape[0], 3))
    return scene, cam, pix, target, lamp


def _loss(scene, cam, pix, target):
    img = render_pixels_kernel(scene, cam, KEY, pix, width=W, height=H,
                               spp=SPP, max_depth=DEPTH, seed=SEED,
                               jitter=False, nee=True)
    return jnp.mean((img - target) ** 2)


def _replace_mat(scene, **kw):
    return dataclasses.replace(
        scene, materials=dataclasses.replace(scene.materials, **kw))


def test_kernel_nee_forward_matches_jnp(setup):
    """The NEE kernel forward must agree statistically with the jnp NEE
    estimator (different RNG streams; tolerance from seed noise)."""
    from rtow_tpu.diff import render_pixels

    scene, cam, _, _, _ = setup
    pix = jnp.arange(W * H, dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        img_k = np.asarray(render_pixels_kernel(
            scene, cam, KEY, pix, width=W, height=H, spp=32,
            max_depth=DEPTH, seed=SEED, nee=True))
    img_j = np.asarray(render_pixels(
        scene, cam, KEY, pix, width=W, height=H, spp=32,
        max_depth=DEPTH, nee=True))
    img_j2 = np.asarray(render_pixels(
        scene, cam, jax.random.key(99), pix, width=W, height=H, spp=32,
        max_depth=DEPTH, nee=True))
    noise = np.abs(img_j2 - img_j).mean()
    assert float(img_k.max()) > 0.01  # actually lit
    assert np.abs(img_k - img_j).mean() < max(3 * noise, 0.02)


@pytest.mark.parametrize("which", ["albedo", "emit"])
def test_kernel_nee_grad_matches_fd(setup, which):
    """The north-star FD gate through the NEE kernels: AD == central FD
    under common random numbers (counter RNG replays both FD sides)."""
    scene, cam, pix, target, lamp = setup
    with pltpu.force_tpu_interpret_mode():
        loss, grads = jax.value_and_grad(_loss, allow_int=True)(
            scene, cam, pix, target)
        assert np.isfinite(float(loss))
        mat = 0 if which == "albedo" else lamp
        ad = float(grads.materials.albedo[mat, 0])

        def f(v):
            a = scene.materials.albedo.at[mat, 0].add(v)
            return float(_loss(_replace_mat(scene, albedo=a), cam, pix,
                               target))

        eps = 1e-2
        fd = (f(eps) - f(-eps)) / (2 * eps)
    assert fd != 0.0, f"{which}: FD gate is degenerate (no light reaches)"
    denom = max(abs(fd), abs(ad), 1e-6)
    assert abs(ad - fd) / denom < 0.05, f"{which}: AD {ad} vs FD {fd}"


@pytest.mark.parametrize("which", ["radius", "center_y"])
def test_kernel_nee_light_geometry_grad_matches_fd(setup, which):
    """Light GEOMETRY gradients (sphere-light radius / center) through
    the NEE KERNELS match finite differences — the kernel counterpart
    of tests/test_nee_grad.py::test_nee_light_geometry_grad_matches_fd
    (VERDICT r3 #3).  The light table is a differentiable kernel input;
    its center/radius columns must carry the cone-sampling
    reparameterized derivative back through build_light_table AND the
    sphere table's own geometry rows (direct BRDF hits on the lamp)."""
    scene, cam, pix, target, _ = setup
    with pltpu.force_tpu_interpret_mode():
        _, grads = jax.value_and_grad(_loss, allow_int=True)(
            scene, cam, pix, target)

        def _shift(v):
            sp = scene.spheres
            if which == "radius":
                sp = dataclasses.replace(sp, radius=sp.radius.at[2].add(v))
            else:
                sp = dataclasses.replace(
                    sp, center0=sp.center0.at[2, 1].add(v))
            return _loss(dataclasses.replace(scene, spheres=sp), cam, pix,
                         target)

        ad = float(grads.spheres.radius[2] if which == "radius"
                   else grads.spheres.center0[2, 1])
        eps = 1e-3
        fd = (float(_shift(eps)) - float(_shift(-eps))) / (2 * eps)
    assert fd != 0.0, f"{which}: FD gate is degenerate (no light reaches)"
    denom = max(abs(fd), abs(ad), 1e-6)
    assert abs(ad - fd) / denom < 0.05, f"{which}: AD {ad} vs FD {fd}"


def test_kernel_nee_grads_finite_everywhere(setup):
    scene, cam, pix, target, _ = setup
    with pltpu.force_tpu_interpret_mode():
        _, grads = jax.value_and_grad(_loss, allow_int=True)(
            scene, cam, pix, target)
    for leaf in jax.tree_util.tree_leaves(grads):
        if hasattr(leaf, "dtype") and leaf.dtype != jax.dtypes.float0:
            assert np.isfinite(np.asarray(leaf)).all()


def test_kernel_nee_cornell_triangle_light_grad():
    """Triangle-lamp FD gate on the Cornell box — the emissive winner is
    a TRIANGLE (its emission rides the tri table), and NEE samples the
    lamp by area: both cotangent routes (tri table + light table) must
    agree with FD."""
    scene, cam = cornell_scene(aspect_ratio=1.0)
    pix = jnp.asarray([6 * W + 5, 6 * W + 6, 5 * W + 6], dtype=jnp.int32)
    target = jnp.zeros((pix.shape[0], 3))

    def loss(s):
        img = render_pixels_kernel(s, cam, KEY, pix, width=W, height=H,
                                   spp=8, max_depth=3, seed=SEED,
                                   jitter=False, nee=True)
        return jnp.mean((img - target) ** 2)

    lamp_mat = int(np.argmax(np.asarray(scene.materials.albedo).sum(1)))
    with pltpu.force_tpu_interpret_mode():
        l0, grads = jax.value_and_grad(loss, allow_int=True)(scene)
        assert np.isfinite(float(l0))
        ad = float(grads.materials.albedo[lamp_mat, 0])

        def f(v):
            a = scene.materials.albedo.at[lamp_mat, 0].add(v)
            return float(loss(dataclasses.replace(
                scene,
                materials=dataclasses.replace(scene.materials, albedo=a))))

        eps = 1e-1
        fd = (f(eps) - f(-eps)) / (2 * eps)
    assert fd != 0.0, "FD gate is degenerate (no lamp light reaches)"
    denom = max(abs(fd), abs(ad), 1e-6)
    assert abs(ad - fd) / denom < 0.05, f"AD {ad} vs FD {fd}"
