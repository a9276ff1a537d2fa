"""Constant-density media gradients through the Pallas kernels
(interpret mode) — VERDICT r3 #4, the last production-physics hole in
"inverse rendering at kernel speed".

The backward kernel replays the free-flight event from the counter RNG
(the scatter-vs-pass bit is piecewise-constant, same convention as the
NEE shadow-visibility bit) and vjp's the reparameterized free-flight
distance, medium albedo, and shadow transmittance from the volume rows
packed behind the light rows.  These tests gate that path the way
tests/test_pallas_grad_nee.py gates NEE: forward parity with the jnp
estimator, central finite differences under common random numbers for
density / medium albedo / boundary geometry, and finiteness on a
mostly-missing fog ball.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rtow_tpu.models.camera import make_camera
from rtow_tpu.models.scene import SceneBuilder
from rtow_tpu.ops.pallas_grad import render_pixels_kernel

W = H = 10
SPP = 8
DEPTH = 3
KEY = jax.random.key(13)
SEED = 6


@pytest.fixture(scope="module")
def fog_setup():
    """Sky-lit fog ball over a gray ground (volume-only table rows)."""
    cam = make_camera(lookfrom=(0.0, 0.5, 1.8), lookat=(0.0, 0.3, -1.0),
                      fov_degrees=55.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=1.0, t0=0.0, t1=0.0)
    b = SceneBuilder()
    g = b.add_lambertian((0.5, 0.5, 0.5))
    b.add_sphere((0.0, -100.5, -1.0), 100.0, g)
    b.add_fog_sphere((0.0, 0.4, -1.0), 0.6, density=2.0,
                     albedo=(0.8, 0.7, 0.6))
    scene = b.build()
    rows, cols = np.meshgrid(range(3, 7), range(3, 7), indexing="ij")
    pix = jnp.asarray((rows * W + cols).ravel(), dtype=jnp.int32)
    target = jnp.zeros((pix.shape[0], 3))
    return scene, cam, pix, target


@pytest.fixture(scope="module")
def fog_light_setup():
    """Fog ball + sphere light, black background: NEE fires from volume
    events and shadow rays carry medium transmittance — the combined
    light+volume row table."""
    cam = make_camera(lookfrom=(0.0, 0.5, 1.8), lookat=(0.0, 0.3, -1.0),
                      fov_degrees=55.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=1.0, t0=0.0, t1=0.0)
    b = SceneBuilder()
    g = b.add_lambertian((0.5, 0.5, 0.5))
    lamp = b.add_light((6.0, 5.0, 4.0))
    b.add_sphere((0.0, -100.5, -1.0), 100.0, g)
    b.add_sphere((0.8, 2.2, -0.6), 0.35, lamp)
    b.add_fog_sphere((0.0, 0.4, -1.0), 0.6, density=2.0,
                     albedo=(0.8, 0.7, 0.6))
    scene = b.build(background=(0.0, 0.0, 0.0))
    rows, cols = np.meshgrid(range(3, 7), range(3, 7), indexing="ij")
    pix = jnp.asarray((rows * W + cols).ravel(), dtype=jnp.int32)
    target = jnp.zeros((pix.shape[0], 3))
    return scene, cam, pix, target


def _loss(scene, cam, pix, target, nee=False):
    img = render_pixels_kernel(scene, cam, KEY, pix, width=W, height=H,
                               spp=SPP, max_depth=DEPTH, seed=SEED,
                               jitter=False, nee=nee)
    return jnp.mean((img - target) ** 2)


def _shift_vol(scene, which, v):
    vol = scene.volumes
    if which == "density":
        vol = dataclasses.replace(vol, density=vol.density.at[0].add(v))
    elif which == "valbedo":
        vol = dataclasses.replace(vol, albedo=vol.albedo.at[0, 0].add(v))
    elif which == "vradius":
        vol = dataclasses.replace(vol, p1=vol.p1.at[0, 0].add(v))
    else:  # vcenter_y
        vol = dataclasses.replace(vol, p0=vol.p0.at[0, 1].add(v))
    return dataclasses.replace(scene, volumes=vol)


def _ad_of(grads, which):
    if which == "density":
        return float(grads.volumes.density[0])
    if which == "valbedo":
        return float(grads.volumes.albedo[0, 0])
    if which == "vradius":
        return float(grads.volumes.p1[0, 0])
    return float(grads.volumes.p0[0, 1])


def test_kernel_volume_forward_matches_jnp(fog_setup):
    """The kernel forward with media must agree statistically with the
    jnp volume estimator (different RNG streams)."""
    from rtow_tpu.diff import render_pixels

    scene, cam, _, _ = fog_setup
    pix = jnp.arange(W * H, dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        img_k = np.asarray(render_pixels_kernel(
            scene, cam, KEY, pix, width=W, height=H, spp=32,
            max_depth=DEPTH, seed=SEED))
    img_j = np.asarray(render_pixels(
        scene, cam, KEY, pix, width=W, height=H, spp=32,
        max_depth=DEPTH))
    img_j2 = np.asarray(render_pixels(
        scene, cam, jax.random.key(77), pix, width=W, height=H, spp=32,
        max_depth=DEPTH))
    noise = np.abs(img_j2 - img_j).mean()
    assert float(img_k.mean()) > 0.05  # fog + sky actually render
    assert np.abs(img_k - img_j).mean() < max(3 * noise, 0.03)


@pytest.mark.parametrize("which,eps", [
    ("valbedo", 1e-2),
])
def test_kernel_volume_grad_matches_fd(fog_setup, which, eps):
    """AD == central FD through the volume kernels under common random
    numbers: the medium albedo multiplies throughput directly.

    Boundary geometry and density are gated on the NEE scene below —
    in a sky-lit scene an isotropic scatter point's position barely
    changes downstream radiance, so their interior derivatives are
    ~0 there (measured: FD is exactly 0.0 at eps<=1e-3, AD ~1e-8 —
    they agree, but the gate would be vacuous)."""
    scene, cam, pix, target = fog_setup
    with pltpu.force_tpu_interpret_mode():
        loss, grads = jax.value_and_grad(_loss, allow_int=True)(
            scene, cam, pix, target)
        assert np.isfinite(float(loss))
        ad = _ad_of(grads, which)
        fd = (float(_loss(_shift_vol(scene, which, eps), cam, pix, target))
              - float(_loss(_shift_vol(scene, which, -eps), cam, pix,
                            target))) / (2 * eps)
    assert fd != 0.0, f"{which}: FD gate is degenerate"
    denom = max(abs(fd), abs(ad), 1e-6)
    assert abs(ad - fd) / denom < 0.05, f"{which}: AD {ad} vs FD {fd}"


def test_kernel_density_grad_consistent_with_fd(fog_setup):
    """Density in a sky-lit scene: the survival-sampling estimator's
    density dependence rides the scatter-vs-pass EVENT probability —
    piecewise-constant under common random numbers (no flips within
    +-eps), the same convention as the jnp path and the NEE visibility
    bit.  AD must match FD exactly where FD sees no flip: both are the
    (tiny) interior derivative through the scatter position.  The
    NONZERO density gate is the NEE test below, where the shadow-ray
    transmittance exp(-sigma*overlap) is an explicit continuous term."""
    scene, cam, pix, target = fog_setup
    eps = 1e-2
    with pltpu.force_tpu_interpret_mode():
        _, grads = jax.value_and_grad(_loss, allow_int=True)(
            scene, cam, pix, target)
        ad = _ad_of(grads, "density")
        fd = (float(_loss(_shift_vol(scene, "density", eps), cam, pix,
                          target))
              - float(_loss(_shift_vol(scene, "density", -eps), cam, pix,
                            target))) / (2 * eps)
    assert abs(ad - fd) < 1e-4, f"AD {ad} vs FD {fd}"


@pytest.mark.parametrize("which,eps", [
    ("density", 1e-2), ("valbedo", 1e-2), ("vradius", 1e-3),
    ("vcenter_y", 1e-3),
])
def test_kernel_volume_nee_grad_matches_fd(fog_light_setup, which, eps):
    """Media + NEE: volume events sample the light (phase factor 1/4,
    1/d^2 falloff — so the scatter POSITION matters and the boundary
    geometry carries a real interior derivative) and shadow rays carry
    exp(-sigma*overlap) — the density cotangent must include the
    transmittance term."""
    scene, cam, pix, target = fog_light_setup
    with pltpu.force_tpu_interpret_mode():
        loss, grads = jax.value_and_grad(_loss, allow_int=True)(
            scene, cam, pix, target, nee=True)
        assert np.isfinite(float(loss))
        ad = _ad_of(grads, which)
        fd = (float(_loss(_shift_vol(scene, which, eps), cam, pix, target,
                          nee=True))
              - float(_loss(_shift_vol(scene, which, -eps), cam, pix,
                            target, nee=True))) / (2 * eps)
    assert fd != 0.0, f"{which}: FD gate is degenerate"
    denom = max(abs(fd), abs(ad), 1e-6)
    assert abs(ad - fd) / denom < 0.05, f"{which}: AD {ad} vs FD {fd}"


def test_kernel_fog_miss_grads_finite(fog_setup):
    """Most lanes MISS a small off-axis fog ball: the clamped boundary
    discriminant must not poison gradients (double-where guards,
    ops/volumes._interval) — kernel-path twin of
    test_volumes.test_fog_miss_grads_finite."""
    cam = make_camera(lookfrom=(0.0, 0.0, 1.5), lookat=(0.0, 0.0, -1.0),
                      fov_degrees=60.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=1.0, t0=0.0, t1=0.0)
    b = SceneBuilder()
    g = b.add_lambertian((0.5, 0.5, 0.5))
    b.add_sphere((0.0, -100.5, -1.0), 100.0, g)
    b.add_fog_sphere((0.3, 0.1, -1.0), 0.3, density=2.0,
                     albedo=(0.8, 0.8, 0.8))
    scene = b.build()
    pix = jnp.arange(W * H, dtype=jnp.int32)
    target = jnp.zeros((pix.shape[0], 3))
    with pltpu.force_tpu_interpret_mode():
        loss, grads = jax.value_and_grad(_loss, allow_int=True)(
            scene, cam, pix, target)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        if hasattr(leaf, "dtype") and leaf.dtype != jax.dtypes.float0:
            assert np.isfinite(np.asarray(leaf)).all()
