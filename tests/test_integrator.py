"""Wavefront integrator semantics (reference ray_color, src/render.cpp:112-129)."""
import jax
import jax.numpy as jnp
import numpy as np

from rtow_tpu.models.camera import Rays
from rtow_tpu.models.materials import sky_color
from rtow_tpu.models.scene import SceneBuilder
from rtow_tpu.ops import integrator


def _scene_one_sphere(albedo=(0.5, 0.5, 0.5)):
    b = SceneBuilder()
    m = b.add_lambertian(albedo)
    b.add_sphere((0, 0, -2), 1.0, m)
    return b.build()


def _rays(o, d, n=1):
    return Rays(
        origin=jnp.tile(jnp.asarray(o, jnp.float32), (n, 1)),
        direction=jnp.tile(jnp.asarray(d, jnp.float32), (n, 1)),
        time=jnp.zeros((n,), jnp.float32),
    )


def test_miss_returns_sky_exactly():
    scene = _scene_one_sphere()
    rays = _rays((0, 0, 0), (0.3, 0.5, 0.2))
    rad = integrator.trace(scene, rays, jax.random.key(0), max_depth=5)
    expected = sky_color(rays.direction)
    np.testing.assert_allclose(np.asarray(rad), np.asarray(expected), atol=1e-6)


def test_depth_zero_hit_is_black_miss_is_sky():
    # Reference checks depth AFTER the hit test (src/render.cpp:113-115):
    # with budget 0, a hit returns black but a miss still returns sky.
    scene = _scene_one_sphere()
    hit_rays = _rays((0, 0, 0), (0, 0, -1))
    rad = integrator.trace(scene, hit_rays, jax.random.key(0), max_depth=0)
    np.testing.assert_allclose(np.asarray(rad), 0.0, atol=1e-7)

    miss_rays = _rays((0, 0, 0), (0, 1, 0))
    rad = integrator.trace(scene, miss_rays, jax.random.key(0), max_depth=0)
    np.testing.assert_allclose(np.asarray(rad), [[0.5, 0.7, 1.0]], atol=1e-6)


def test_single_bounce_attenuates_by_albedo():
    # With depth 1: hit -> lambertian scatter -> (statistically) sky.
    # Radiance = albedo * sky(scatter_dir) <= albedo componentwise.
    scene = _scene_one_sphere(albedo=(0.5, 0.5, 0.5))
    rays = _rays((0, 0, 0), (0, 0, -1), n=4096)
    rad = np.asarray(integrator.trace(scene, rays, jax.random.key(1), max_depth=1))
    assert np.all(rad <= 0.5 + 1e-6)
    assert rad.mean() > 0.2  # scattered rays mostly escape to the sky


def test_energy_bounded_by_one():
    scene = _scene_one_sphere(albedo=(0.9, 0.9, 0.9))
    rays = _rays((0, 0, 0), (0, 0, -1), n=1024)
    rad = np.asarray(integrator.trace(scene, rays, jax.random.key(2), max_depth=16))
    assert np.all(rad <= 1.0 + 1e-5)
    assert np.all(rad >= 0.0)


def test_dead_lanes_stay_dead():
    # A lane that missed must not pick up radiance from later bounces:
    # radiance of an all-miss wavefront equals sky exactly even at depth 50.
    scene = _scene_one_sphere()
    rays = _rays((0, 0, 5), (0, 0, 1), n=8)
    rad = integrator.trace(scene, rays, jax.random.key(3), max_depth=50)
    expected = sky_color(rays.direction)
    np.testing.assert_allclose(np.asarray(rad), np.asarray(expected), atol=1e-6)


def test_deterministic_given_key():
    scene = _scene_one_sphere()
    rays = _rays((0, 0, 0), (0, 0, -1), n=64)
    a = integrator.trace(scene, rays, jax.random.key(7), max_depth=8)
    b = integrator.trace(scene, rays, jax.random.key(7), max_depth=8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
