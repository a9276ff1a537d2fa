"""End-to-end render tests (scheduler semantics, reference render.cpp:135-191)."""
import numpy as np

from rtow_tpu import Config, one_sphere_scene, render, three_sphere_scene


def _cfg(**kw):
    base = dict(image_width=64, aspect_ratio=16 / 9, samples_per_pixel=4,
                max_child_rays=8, rays_per_batch=4096)
    base.update(kw)
    return Config(**base)


def test_render_shapes_and_range():
    scene, cam = one_sphere_scene()
    img = render(scene, cam, _cfg())
    assert img.shape == (36, 64, 3)
    assert np.all(img >= 0.0) and np.all(img <= 1.0 + 1e-4)


def test_sky_on_top_sphere_in_middle():
    scene, cam = one_sphere_scene()
    img = render(scene, cam, _cfg(samples_per_pixel=8))
    h, w, _ = img.shape
    # Top rows see sky (blue-ish: b > r), center sees the gray sphere.
    top = img[0].mean(axis=0)
    assert top[2] > top[0]
    center = img[h // 2, w // 2]
    sky_ref = img[0, w // 2]
    assert center.sum() < sky_ref.sum()  # darker than the sky


def test_deterministic_same_seed():
    scene, cam = one_sphere_scene()
    a = render(scene, cam, _cfg(seed=3))
    b = render(scene, cam, _cfg(seed=3))
    np.testing.assert_array_equal(a, b)
    c = render(scene, cam, _cfg(seed=4))
    assert not np.array_equal(a, c)


def test_chunking_covers_all_lanes():
    # Tiny chunks must yield the same number of accumulated samples:
    # means with different chunk sizes agree statistically.
    scene, cam = one_sphere_scene()
    img_a = render(scene, cam, _cfg(samples_per_pixel=16, rays_per_batch=1 << 14))
    img_b = render(scene, cam, _cfg(samples_per_pixel=16, rays_per_batch=777))
    # Different chunking -> different RNG assignment, but same estimator:
    # the two images agree within Monte-Carlo noise.
    assert np.abs(img_a - img_b).mean() < 0.06
    np.testing.assert_allclose(img_a.mean(), img_b.mean(), atol=0.01)


def test_three_sphere_scene_renders():
    scene, cam = three_sphere_scene()
    img = render(scene, cam, _cfg(samples_per_pixel=8, max_child_rays=12))
    assert np.all(np.isfinite(img))
    assert img.mean() > 0.05
