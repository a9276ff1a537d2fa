"""Camera basis and ray generation vs the reference formulas
(reference src/common-model.cpp:136-167)."""
import jax
import jax.numpy as jnp
import numpy as np

from rtow_tpu.models.camera import camera_rays, make_camera, pixel_coords


def _reference_basis(lookfrom, lookat, vup, fov, aspect, focus_dist):
    lookfrom, lookat, vup = map(np.asarray, (lookfrom, lookat, vup))
    w = lookfrom - lookat
    w = w / np.linalg.norm(w)
    u = np.cross(vup, w)
    u = u / np.linalg.norm(u)
    v = np.cross(w, u)
    h = 2.0 * np.tan(np.radians(fov) / 2)
    wid = aspect * h
    fd = focus_dist if focus_dist is not None else np.linalg.norm(lookfrom - lookat)
    horizontal = fd * wid * u
    vertical = fd * h * v
    lower_left = lookfrom - horizontal / 2 - vertical / 2 - fd * w
    return u, v, w, horizontal, vertical, lower_left


def test_cover_camera_basis():
    cam = make_camera((13, 2, 3), (0, 0, 0), (0, 1, 0), 20.0, 1.5, 0.1, 10.0, 0, 1)
    u, v, w, hor, ver, ll = _reference_basis((13, 2, 3), (0, 0, 0), (0, 1, 0), 20.0, 1.5, 10.0)
    np.testing.assert_allclose(cam.u, u, atol=1e-6)
    np.testing.assert_allclose(cam.v, v, atol=1e-6)
    np.testing.assert_allclose(cam.w, w, atol=1e-6)
    np.testing.assert_allclose(cam.horizontal, hor, atol=1e-5)
    np.testing.assert_allclose(cam.vertical, ver, atol=1e-5)
    np.testing.assert_allclose(cam.lower_left, ll, atol=1e-5)


def test_default_focus_distance_is_look_distance():
    cam = make_camera((1, 0, -1), (0, 0, 0), fov_degrees=35.0, aspect_ratio=1.5,
                      aperture=0.01, focus_dist=None)
    # |lookfrom - lookat| = sqrt(2); lower_left distance along -w from
    # origin should embed fd = sqrt(2).
    fd = np.linalg.norm(
        np.asarray(cam.origin) - np.asarray(cam.lower_left)
        - np.asarray(cam.horizontal) / -2 * 0  # just check projection below
    )
    proj = -np.dot(np.asarray(cam.lower_left) +
                   np.asarray(cam.horizontal) / 2 +
                   np.asarray(cam.vertical) / 2 -
                   np.asarray(cam.origin), np.asarray(cam.w))
    np.testing.assert_allclose(proj, np.sqrt(2.0), rtol=1e-6)


def test_center_ray_no_aperture_points_at_lookat():
    cam = make_camera((13, 2, 3), (0, 0, 0), (0, 1, 0), 20.0, 1.5, 0.0, 10.0)
    s = jnp.asarray([0.5])
    t = jnp.asarray([0.5])
    rays = camera_rays(cam, jax.random.key(0), s, t)
    d = np.asarray(rays.direction)[0]
    np.testing.assert_allclose(rays.origin[0], [13, 2, 3], atol=1e-6)
    # center of focus plane lies along the view direction
    view = -np.asarray(cam.w)
    np.testing.assert_allclose(d / np.linalg.norm(d), view, atol=1e-6)


def test_lens_jitter_within_aperture_and_time_in_shutter():
    cam = make_camera((0, 0, 0), (0, 0, -1), fov_degrees=90.0, aspect_ratio=1.0,
                      aperture=0.5, focus_dist=1.0, t0=0.25, t1=0.75)
    s = jnp.full((2048,), 0.5)
    rays = camera_rays(cam, jax.random.key(3), s, s)
    o = np.asarray(rays.origin)
    assert np.all(np.linalg.norm(o, axis=-1) <= 0.25 + 1e-6)  # lens_radius
    tm = np.asarray(rays.time)
    assert np.all((tm >= 0.25) & (tm <= 0.75))
    assert tm.std() > 0.1  # actually jittered


def test_pixel_coords_convention():
    # row 0 = top scanline => t near 1; col 0 => s near 0
    # (reference src/render.cpp:152-166).
    key = jax.random.key(0)
    pids = jnp.asarray([0, 99, 100 * 50 - 1], dtype=jnp.int32)  # W=100,H=50
    s, t = pixel_coords(100, 50, key, pids)
    s, t = np.asarray(s), np.asarray(t)
    assert 0.0 <= s[0] < 1.5 / 99
    assert t[0] > 48.9 / 49
    assert s[1] > 98.9 / 99 and s[1] <= 100 / 99
    assert t[2] < 1.5 / 49
