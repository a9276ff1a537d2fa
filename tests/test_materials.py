"""Material scatter rules vs the reference semantics
(src/common-model.cpp:13-62)."""
import jax
import jax.numpy as jnp
import numpy as np

from rtow_tpu.models.materials import HitRecord, schlick, scatter, sky_color
from rtow_tpu.models.scene import DIELECTRIC, LAMBERTIAN, METAL


def _rec(n_lanes, kind, normal=(0, 0, 1), front=True, albedo=(0.8, 0.6, 0.2),
         fuzz=0.0, ir=1.5):
    ones = jnp.ones((n_lanes,), jnp.float32)
    return HitRecord(
        t=ones,
        hit=ones.astype(bool),
        point=jnp.zeros((n_lanes, 3), jnp.float32),
        normal=jnp.tile(jnp.asarray(normal, jnp.float32), (n_lanes, 1)),
        front=jnp.full((n_lanes,), front, bool),
        mat_kind=jnp.full((n_lanes,), kind, jnp.int32),
        albedo=jnp.tile(jnp.asarray(albedo, jnp.float32), (n_lanes, 1)),
        fuzz=ones * fuzz,
        ir=ones * ir,
    )


def test_schlick_known_values():
    # normal incidence: r0 = ((1-1.5)/(2.5))^2 = 0.04
    np.testing.assert_allclose(float(schlick(jnp.asarray(1.0), jnp.asarray(1.5))),
                               0.04, rtol=1e-6)
    # grazing incidence -> 1
    np.testing.assert_allclose(float(schlick(jnp.asarray(0.0), jnp.asarray(1.5))),
                               1.0, rtol=1e-6)


def test_metal_mirror_reflection_no_fuzz():
    rec = _rec(4, METAL, normal=(0, 1, 0), fuzz=0.0)
    d_in = jnp.tile(jnp.asarray([1.0, -2.0, 0.0]), (4, 1))
    out = scatter(jax.random.key(0), d_in, rec)
    np.testing.assert_allclose(out.direction, np.tile([1.0, 2.0, 0.0], (4, 1)),
                               atol=1e-6)
    np.testing.assert_allclose(out.attenuation, np.tile([0.8, 0.6, 0.2], (4, 1)),
                               atol=1e-7)


def test_metal_fuzz_perturbs_within_radius():
    rec = _rec(512, METAL, normal=(0, 1, 0), fuzz=0.3)
    d_in = jnp.tile(jnp.asarray([0.0, -1.0, 0.0]), (512, 1))
    out = np.asarray(scatter(jax.random.key(1), d_in, rec).direction)
    mirror = np.array([0.0, 1.0, 0.0])
    dev = out - mirror
    # fuzz * unit_vector: displacement magnitude is exactly the fuzz...
    np.testing.assert_allclose(np.linalg.norm(dev, axis=-1), 0.3, atol=1e-5)
    # ...but its direction varies lane to lane.
    assert dev.std(axis=0).max() > 0.05


def test_lambertian_cosine_ish_distribution():
    rec = _rec(20000, LAMBERTIAN, normal=(0, 0, 1))
    d_in = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (20000, 1))
    out = np.asarray(scatter(jax.random.key(2), d_in, rec).direction)
    # normal + unit vector: mean direction = normal, |dir| <= 2
    assert np.all(np.linalg.norm(out, axis=-1) <= 2.0 + 1e-5)
    mean = out.mean(0)
    np.testing.assert_allclose(mean, [0, 0, 1], atol=0.02)
    # never points below the surface by more than the unit ball allows
    assert out[:, 2].min() > -1e-5


def test_dielectric_total_internal_reflection():
    # Inside glass (front=False -> eta=1.5), grazing: must reflect.
    rec = _rec(8, DIELECTRIC, normal=(0, 1, 0), front=False, ir=1.5)
    d_in = jnp.tile(jnp.asarray([0.9, -0.2, 0.0]), (8, 1))
    out = np.asarray(scatter(jax.random.key(3), d_in, rec).direction)
    unit_in = np.array([0.9, -0.2, 0.0]) / np.linalg.norm([0.9, -0.2, 0.0])
    refl = unit_in - 2 * np.dot(unit_in, [0, 1, 0]) * np.array([0, 1, 0.0])
    np.testing.assert_allclose(out, np.tile(refl, (8, 1)), atol=1e-6)


def test_dielectric_attenuation_is_white():
    rec = _rec(16, DIELECTRIC, albedo=(0.9, 0.1, 0.1))
    d_in = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (16, 1))
    out = scatter(jax.random.key(4), d_in, rec)
    np.testing.assert_allclose(out.attenuation, 1.0, atol=1e-7)


def test_dielectric_refracts_at_normal_incidence_mostly():
    # At normal incidence schlick = 0.04: ~96% of lanes refract straight.
    rec = _rec(4096, DIELECTRIC, normal=(0, 0, 1), front=True, ir=1.5)
    d_in = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (4096, 1))
    out = np.asarray(scatter(jax.random.key(5), d_in, rec).direction)
    refracted = out[:, 2] < 0  # continues through the surface
    frac = refracted.mean()
    assert 0.93 < frac < 0.99


def test_sky_gradient_endpoints():
    up = jnp.asarray([[0.0, 1.0, 0.0]])
    down = jnp.asarray([[0.0, -1.0, 0.0]])
    np.testing.assert_allclose(sky_color(up), [[0.5, 0.7, 1.0]], atol=1e-6)
    np.testing.assert_allclose(sky_color(down), [[1.0, 1.0, 1.0]], atol=1e-6)
