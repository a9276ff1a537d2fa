"""Drain-balanced work pool (RTOW_POOL) gates — the round-4 persistent
kernel scheduler (pallas_megakernel._kernel pool mode).

The pool shares each row's 128 pixels x spp samples as a queue of
(column, chunk) items; these tests pin its two invariants:

1. EXACT sample accounting — a constant-background scene turns radiance
   sums into sample counts, so every pixel must read exactly spp
   (including chunk remainders and off-image columns);
2. estimator equivalence — pool and classic layouts are the same Monte
   Carlo estimator, so their images agree within seed-to-seed noise.

Run in interpret mode on tiny shapes; the production-scale audit
(1200x675/spp128 exact) and golden parity vs the C++ reference ran on
hardware before the default flipped (BASELINE.md round-4 section).
"""
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rtow_tpu.models.builders import three_sphere_scene
from rtow_tpu.models.camera import make_camera
from rtow_tpu.models.scene import SceneBuilder

W = H = 24


def _render(monkeypatch, scene, cam, *, pool, spp, seed=0, depth=4,
            roulette=False):
    # RTOW_POOL is read at TRACE time and render_blocks_pallas traces
    # eagerly on every call, so setting the env suffices — no module
    # reload (reloading a module with live jitted state segfaulted the
    # long suite runs).  test_pool_matches_classic_estimator asserts
    # the two modes really produce different images.
    monkeypatch.setenv("RTOW_POOL", "1" if pool else "0")
    import rtow_tpu.ops.pallas_megakernel as mk

    with pltpu.force_tpu_interpret_mode():
        r, g, b = mk.render_blocks_pallas(
            scene, cam, seed, width=W, height=H, spp=spp,
            max_depth=depth, roulette=roulette)
        img = mk.unblock_image(r, g, b, width=W, height=H)
    return np.asarray(img)


@pytest.fixture(scope="module")
def const_bg():
    """Empty scene + white background: radiance sums == sample counts."""
    cam = make_camera(lookfrom=(0.0, 0.0, 1.0), lookat=(0.0, 0.0, 0.0),
                      fov_degrees=60.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=1.0)
    b = SceneBuilder()
    m = b.add_lambertian((0.5, 0.5, 0.5))
    b.add_sphere((0.0, 0.0, -99999.0), 1.0, m)  # never hit
    return b.build(background=(1.0, 1.0, 1.0)), cam


@pytest.mark.parametrize("spp", [24, 17])  # 17 exercises chunk remainder
def test_pool_exact_sample_accounting(monkeypatch, const_bg, spp):
    scene, cam = const_bg
    img = _render(monkeypatch, scene, cam, pool=True, spp=spp)
    np.testing.assert_array_equal(img, float(spp))


def test_pool_matches_classic_estimator(monkeypatch):
    """Pool-vs-classic difference must be bounded by classic
    seed-to-seed noise (same estimator, different jitter streams)."""
    scene, cam = three_sphere_scene(aspect_ratio=1.0)
    c0 = _render(monkeypatch, scene, cam, pool=False, spp=24, seed=0)
    c1 = _render(monkeypatch, scene, cam, pool=False, spp=24, seed=123)
    p0 = _render(monkeypatch, scene, cam, pool=True, spp=24, seed=0)
    assert np.abs(c0 - p0).max() > 0.0, "env toggle had no effect"
    noise = np.abs(c0 - c1).mean()
    assert np.abs(c0 - p0).mean() < 1.5 * noise
    assert abs(c0.mean() - p0.mean()) / 24.0 < 0.01


def test_pool_roulette_smoke(monkeypatch, const_bg):
    """Russian roulette + pool: the kill path zeroes rem-budget lanes
    without stranding pool items (the loop must still terminate and
    counts stay exact on a surface-free scene where RR never fires)."""
    scene, cam = const_bg
    img = _render(monkeypatch, scene, cam, pool=True, spp=8,
                  roulette=True)
    np.testing.assert_array_equal(img, 8.0)


# ---------------------------------------------------------------------------
# Pool x kernel-feature gates (VERDICT r4 #5): the production-default
# scheduler must be suite-gated against every feature the persistent
# kernel supports, not just constant-background accounting.  Each gate
# uses the estimator-equivalence pattern of
# test_pool_matches_classic_estimator (pool-vs-classic difference
# bounded by classic seed-to-seed noise + mean agreement) on a tiny
# interpret-mode frame.


def _assert_pool_equiv(monkeypatch, scene, cam, *, spp=24, depth=4,
                       rel_mean_tol=0.02):
    c0 = _render(monkeypatch, scene, cam, pool=False, spp=spp, seed=0,
                 depth=depth)
    c1 = _render(monkeypatch, scene, cam, pool=False, spp=spp, seed=123,
                 depth=depth)
    p0 = _render(monkeypatch, scene, cam, pool=True, spp=spp, seed=0,
                 depth=depth)
    assert np.abs(c0 - p0).max() > 0.0, "env toggle had no effect"
    noise = np.abs(c0 - c1).mean()
    assert np.abs(c0 - p0).mean() < 1.5 * noise
    assert abs(c0.mean() - p0.mean()) <= rel_mean_tol * abs(c0.mean()) + 1e-6


@pytest.mark.parametrize("spp", [24, 17])
def test_pool_emergency_take_exact(monkeypatch, const_bg, spp):
    """RTOW_POOL_EMERGENCY (round-5 mid-K handout experiment) must keep
    the exact-accounting invariant: firing take_items off the K
    boundary is semantically a no-op."""
    monkeypatch.setenv("RTOW_POOL_EMERGENCY", "1")
    scene, cam = const_bg
    img = _render(monkeypatch, scene, cam, pool=True, spp=spp)
    np.testing.assert_array_equal(img, float(spp))


def test_pool_matches_jnp_oracle(monkeypatch):
    """Absolute anchor (ADVICE r4): the pool scheduler vs the jnp
    renderer (itself golden-gated vs the C++ oracle in test_golden.py),
    not just vs the classic kernel layout."""
    from rtow_tpu.config import Config
    from rtow_tpu.render import render

    scene, cam = three_sphere_scene(aspect_ratio=1.0)
    img_p = _render(monkeypatch, scene, cam, pool=True, spp=48,
                    depth=5) / 48.0
    img_p = img_p.reshape(H, W, 3)
    cfg = Config(image_width=W, aspect_ratio=1.0, samples_per_pixel=48,
                 max_child_rays=5)
    img_j = np.asarray(render(scene, cam, cfg))
    cfg2 = Config(image_width=W, aspect_ratio=1.0, samples_per_pixel=48,
                  max_child_rays=5, seed=77)
    noise = np.abs(np.asarray(render(scene, cam, cfg2)) - img_j).mean()
    assert np.abs(img_p - img_j).mean() < max(3 * noise, 0.03)


def test_pool_direct_light_hit_exact(monkeypatch):
    """Emissive: a camera staring straight at a sphere light reads the
    EXACT emitted radiance per sample regardless of jitter stream, so
    the pool's accounting must reproduce emit * spp exactly."""
    emit = (2.0, 3.0, 4.0)
    cam = make_camera(lookfrom=(0.0, 0.0, 2.0), lookat=(0.0, 0.0, 0.0),
                      fov_degrees=20.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=2.0)
    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, 0.0), 1.5, b.add_light(emit))
    scene = b.build(background=(0.0, 0.0, 0.0))
    img = _render(monkeypatch, scene, cam, pool=True, spp=8)
    np.testing.assert_allclose(
        img, np.broadcast_to(np.array(emit) * 8.0, img.shape), rtol=1e-5)


def test_pool_emissive_nee_equivalent(monkeypatch):
    """Emissive + NEE shadow sweeps under the pool scheduler: same
    estimator as classic (light_scene fires NEE at every diffuse hit)."""
    from rtow_tpu.models.builders import light_scene

    scene, cam = light_scene(aspect_ratio=1.0)
    _assert_pool_equiv(monkeypatch, scene, cam, depth=6)


def test_pool_volumes_equivalent(monkeypatch):
    """Constant-density media (free-flight sampling + phase scatter +
    NEE-from-volume-events) under the pool scheduler."""
    cam = make_camera(lookfrom=(0.0, 0.5, 3.0), lookat=(0.0, 0.5, 0.0),
                      fov_degrees=40.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=3.0)
    b = SceneBuilder()
    b.add_sphere((0.0, -100.0, 0.0), 100.0, b.add_lambertian((0.6, 0.6, 0.6)))
    b.add_fog_sphere((0.0, 0.8, 0.0), 0.8, 2.5, albedo=(0.9, 0.9, 0.9))
    scene = b.build(background=(0.8, 0.8, 1.0))
    _assert_pool_equiv(monkeypatch, scene, cam, depth=6)


def test_pool_checker_equivalent(monkeypatch):
    """Procedural checker texture lookups under the pool scheduler (the
    hit-point -> texel evaluation must follow the pooled lane's pixel,
    not the lane's original column)."""
    cam = make_camera(lookfrom=(0.0, 1.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      fov_degrees=50.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=3.0)
    b = SceneBuilder()
    check = b.add_checker((0.9, 0.1, 0.1), (0.1, 0.1, 0.9), scale=4.0)
    b.add_sphere((0.0, -100.5, 0.0), 100.0, check)
    b.add_sphere((0.0, 0.3, 0.0), 0.8, b.add_metal((0.8, 0.8, 0.8), 0.05))
    scene = b.build()
    _assert_pool_equiv(monkeypatch, scene, cam)
