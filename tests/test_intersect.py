"""Intersection ops vs analytic oracles (reference semantics:
src/common-model.cpp:64-134)."""
import jax.numpy as jnp
import numpy as np

from rtow_tpu.models.scene import SceneBuilder
from rtow_tpu.ops import intersect


def _ray(o, d, t=0.0):
    return (
        jnp.asarray([o], dtype=jnp.float32),
        jnp.asarray([d], dtype=jnp.float32),
        jnp.asarray([t], dtype=jnp.float32),
    )


def _simple_scene(**spheres_and_tris):
    b = SceneBuilder()
    m = b.add_lambertian((0.5, 0.5, 0.5))
    return b, m


def test_sphere_hit_analytic():
    b = SceneBuilder()
    m = b.add_lambertian((0.5, 0.5, 0.5))
    b.add_sphere((0, 0, -2), 1.0, m)
    scene = b.build()
    o, d, tm = _ray((0, 0, 0), (0, 0, -1))
    rec = intersect.nearest_hit_bruteforce(scene, o, d, tm)
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(rec.point[0], [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(rec.normal[0], [0, 0, 1], atol=1e-6)
    assert bool(rec.front[0])


def test_sphere_inside_hit_back_face():
    b = SceneBuilder()
    m = b.add_dielectric(1.5)
    b.add_sphere((0, 0, 0), 1.0, m)
    scene = b.build()
    o, d, tm = _ray((0, 0, 0), (0, 0, -1))
    rec = intersect.nearest_hit_bruteforce(scene, o, d, tm)
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 1.0, rtol=1e-6)
    # inside: normal flipped toward ray origin, back face
    np.testing.assert_allclose(rec.normal[0], [0, 0, 1], atol=1e-6)
    assert not bool(rec.front[0])


def test_negative_radius_flips_front_facing():
    # hollow-glass trick (reference src/common-model.cpp:88)
    b = SceneBuilder()
    m = b.add_dielectric(1.5)
    b.add_sphere((0, 0, -2), -1.0, m)
    scene = b.build()
    o, d, tm = _ray((0, 0, 0), (0, 0, -1))
    rec = intersect.nearest_hit_bruteforce(scene, o, d, tm)
    assert bool(rec.hit[0])
    # outward geometric normal faces the ray, but radius<0 XOR flips.
    assert not bool(rec.front[0])
    np.testing.assert_allclose(rec.normal[0], [0, 0, -1], atol=1e-6)


def test_moving_sphere_center_lerp():
    b = SceneBuilder()
    m = b.add_lambertian((0.5, 0.5, 0.5))
    b.add_moving_sphere((0, 0, -2), (2, 0, -2), 0.5, m)
    scene = b.build()
    # At time 0.5 the center is at (1, 0, -2).
    o, d, tm = _ray((1, 0, 0), (0, 0, -1), t=0.5)
    rec = intersect.nearest_hit_bruteforce(scene, o, d, tm)
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 1.5, rtol=1e-5)
    # At time 0 it is not on the ray's axis.
    o, d, tm = _ray((1, 0, 0), (0, 0, -1), t=0.0)
    rec0 = intersect.nearest_hit_bruteforce(scene, o, d, tm)
    assert not bool(rec0.hit[0])


def test_tmin_skips_self_intersection():
    b = SceneBuilder()
    m = b.add_lambertian((0.5, 0.5, 0.5))
    b.add_sphere((0, 0, 0), 1.0, m)
    scene = b.build()
    # Origin exactly on the surface shooting outward: no hit.
    o, d, tm = _ray((0, 0, 1), (0, 0, 1))
    rec = intersect.nearest_hit_bruteforce(scene, o, d, tm)
    assert not bool(rec.hit[0])


def test_triangle_hit_and_backface_cull():
    b = SceneBuilder()
    m = b.add_lambertian((0.5, 0.5, 0.5))
    # CCW triangle in z=-1 plane, normal +z (toward origin).
    b.add_triangle((-1, -1, -1), (1, -1, -1), (0, 1, -1), m)
    scene = b.build()
    o, d, tm = _ray((0, 0, 0), (0, 0, -1))
    rec = intersect.nearest_hit_bruteforce(scene, o, d, tm)
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(rec.normal[0], [0, 0, 1], atol=1e-6)
    assert bool(rec.front[0])

    # From behind: culled (reference det >= 1e-6, src/common-model.cpp:116).
    o, d, tm = _ray((0, 0, -2), (0, 0, 1))
    rec = intersect.nearest_hit_bruteforce(scene, o, d, tm)
    assert not bool(rec.hit[0])
    # ... unless culling is off.
    rec = intersect.nearest_hit_bruteforce(scene, o, d, tm, cull_backfaces=False)
    assert bool(rec.hit[0])
    np.testing.assert_allclose(rec.normal[0], [0, 0, -1], atol=1e-6)


def test_triangle_miss_outside_barycentric():
    b = SceneBuilder()
    m = b.add_lambertian((0.5, 0.5, 0.5))
    b.add_triangle((-1, -1, -1), (1, -1, -1), (0, 1, -1), m)
    scene = b.build()
    o, d, tm = _ray((5, 5, 0), (0, 0, -1))
    rec = intersect.nearest_hit_bruteforce(scene, o, d, tm)
    assert not bool(rec.hit[0])


def test_nearest_of_mixed_primitives():
    b = SceneBuilder()
    m = b.add_lambertian((0.5, 0.5, 0.5))
    b.add_sphere((0, 0, -5), 1.0, m)  # hit at t=4
    b.add_triangle((-1, -1, -2), (1, -1, -2), (0, 1, -2), m)  # hit at t=2
    b.add_sphere((0, 0, -10), 1.0, m)  # behind everything
    scene = b.build()
    o, d, tm = _ray((0, 0, 0), (0, 0, -1))
    rec = intersect.nearest_hit_bruteforce(scene, o, d, tm)
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 2.0, rtol=1e-6)

    # Move the triangle behind: sphere wins.
    b2 = SceneBuilder()
    m2 = b2.add_lambertian((0.5, 0.5, 0.5))
    b2.add_sphere((0, 0, -5), 1.0, m2)
    b2.add_triangle((-1, -1, -20), (1, -1, -20), (0, 1, -20), m2)
    scene2 = b2.build()
    rec2 = intersect.nearest_hit_bruteforce(scene2, o, d, tm)
    np.testing.assert_allclose(float(rec2.t[0]), 4.0, rtol=1e-6)


def test_unnormalized_direction_t_parameterization():
    # t is in units of |d|: d = (0,0,-2) hits the z=-2 sphere front at t=0.5.
    b = SceneBuilder()
    m = b.add_lambertian((0.5, 0.5, 0.5))
    b.add_sphere((0, 0, -2), 1.0, m)
    scene = b.build()
    o, d, tm = _ray((0, 0, 0), (0, 0, -2))
    rec = intersect.nearest_hit_bruteforce(scene, o, d, tm)
    np.testing.assert_allclose(float(rec.t[0]), 0.5, rtol=1e-6)
