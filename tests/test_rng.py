"""Counter-based sampling distributions (race-free mt19937 replacement)."""
import jax
import numpy as np

from rtow_tpu.utils import rng


def test_unit_vectors_are_unit_and_uniform():
    v = np.asarray(rng.unit_vectors(jax.random.key(0), (20000,)))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    # Uniform on the sphere: component means ~0, second moments ~1/3.
    assert np.all(np.abs(v.mean(0)) < 0.02)
    np.testing.assert_allclose((v**2).mean(0), 1.0 / 3.0, atol=0.01)
    # NOT the reference's positive-octant bug (src/random-utils.cpp:23-33):
    assert (v < 0).any(axis=0).all()


def test_in_unit_disk():
    p = np.asarray(rng.in_unit_disk(jax.random.key(1), (20000,)))
    r2 = p[:, 0] ** 2 + p[:, 1] ** 2
    assert np.all(r2 <= 1.0 + 1e-6)
    assert np.all(p[:, 2] == 0.0)
    # Uniform in the disk: E[r^2] = 1/2.
    np.testing.assert_allclose(r2.mean(), 0.5, atol=0.01)


def test_determinism_and_stream_separation():
    """fold_in-derived streams are deterministic and independent — the
    race-free replacement for the reference's shared mt19937."""
    k = jax.random.key(42)
    a = rng.uniform(jax.random.fold_in(k, 3), (8,))
    b = rng.uniform(jax.random.fold_in(k, 3), (8,))
    c = rng.uniform(jax.random.fold_in(k, 4), (8,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
