"""Vector-math ops vs numpy/glm oracles."""
import jax.numpy as jnp
import numpy as np

from rtow_tpu.ops import vec


def test_dot_cross_normalize(rng):
    a = rng.normal(size=(32, 3)).astype(np.float32)
    b = rng.normal(size=(32, 3)).astype(np.float32)
    np.testing.assert_allclose(vec.dot(a, b), np.sum(a * b, -1), rtol=1e-5)
    np.testing.assert_allclose(vec.cross(a, b), np.cross(a, b), rtol=1e-4, atol=1e-6)
    n = np.asarray(vec.normalize(a))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)


def test_reflect_matches_glm_semantics():
    # glm::reflect(I, N) = I - 2 dot(N, I) N, I need not be unit.
    i = jnp.asarray([[1.0, -2.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    out = vec.reflect(i, n)
    np.testing.assert_allclose(out, [[1.0, 2.0, 0.0]], atol=1e-7)


def test_refract_snell():
    # 45-degree incidence air->glass (eta = 1/1.5).
    theta_i = np.pi / 4
    i = jnp.asarray([[np.sin(theta_i), -np.cos(theta_i), 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    eta = 1.0 / 1.5
    out = np.asarray(vec.refract(i, n, eta))[0]
    # Snell: sin_t = eta * sin_i
    sin_t = eta * np.sin(theta_i)
    assert np.isclose(out[0], sin_t, atol=1e-6)
    assert np.isclose(np.linalg.norm(out), 1.0, atol=1e-6)
    assert out[1] < 0  # still travelling into the surface


def test_refract_normal_incidence_unchanged():
    i = jnp.asarray([[0.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    out = np.asarray(vec.refract(i, n, 0.75))
    np.testing.assert_allclose(out, [[0.0, -1.0, 0.0]], atol=1e-6)
