"""Constant-density media (book 2 ch. 9 smoke/fog) — beyond the
reference's surface-only scope.  Covered paths: jnp integrator (scan
and persistent-progressive) and the megakernels (shared _bounce_core).

Oracles: analytic transmittance through an absorbing slab (the
free-flight sampler IS the transmittance estimator, so the mean must be
exp(-sigma * L) exactly), kernel-vs-jnp statistical parity, and
NEE-with-volumes unbiasedness against the plain estimator.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rtow_tpu.config import Config
from rtow_tpu.models.camera import make_camera
from rtow_tpu.models.scene import SceneBuilder
from rtow_tpu.render import render


def _slab_scene(sigma=0.7, L=2.0, albedo=(0.0, 0.0, 0.0),
                emit=(2.0, 2.0, 2.0)):
    """Camera stares through a fog slab at an emissive wall."""
    cam = make_camera(lookfrom=(0.0, 0.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      fov_degrees=30.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=3.0)
    b = SceneBuilder()
    lamp = b.add_light(emit)
    b.add_triangle((-9, -9, -1.0), (9, -9, -1.0), (9, 9, -1.0), lamp)
    b.add_triangle((-9, -9, -1.0), (9, 9, -1.0), (-9, 9, -1.0), lamp)
    b.add_sphere((0, 0, 50.0), 0.5, b.add_lambertian((0.5,) * 3))
    b.add_fog_box((-20, -20, 0.0), (20, 20, L), sigma, albedo=albedo)
    return b.build(background=(0.0, 0.0, 0.0)), cam


def test_builder_volume_fields():
    scene, _ = _slab_scene()
    assert scene.volume_kinds == ("b",)
    assert scene.volumes.density.shape == (1,)
    b = SceneBuilder()
    m = b.add_lambertian((0.5,) * 3)
    b.add_sphere((0, 0, 0), 1.0, m)
    for i in range(9):
        b.add_fog_sphere((i, 0, 0), 0.5, 1.0)
    with pytest.raises(ValueError, match="at most 8 volumes"):
        b.build()


def test_absorbing_slab_transmittance_jnp():
    """Pixel = exp(-sigma * path) * emit for a purely absorbing medium
    (albedo 0): the exponential free-flight sampler is the unbiased
    transmittance estimator."""
    sigma, L = 0.7, 2.0
    scene, cam = _slab_scene(sigma, L)
    cfg = Config(image_width=8, aspect_ratio=1.0, samples_per_pixel=4096,
                 max_child_rays=4, backend="jnp", seed=3)
    img = np.asarray(render(scene, cam, cfg))
    want = np.exp(-sigma * L) * 2.0
    # Central pixels: near-axial rays (path ~ L); 4096 spp -> SE ~ 0.016.
    assert abs(img[3:5, 3:5, 0].mean() - want) < 0.05
    # Corner rays travel further -> strictly darker in expectation.
    assert img.mean() < want + 0.05


def test_absorbing_slab_transmittance_kernel():
    """Same analytic gate through the persistent megakernel (interpret
    mode; independent in-kernel hash RNG)."""
    from rtow_tpu.ops.pallas_megakernel import render_spheres_pallas

    sigma, L = 0.7, 2.0
    scene, cam = _slab_scene(sigma, L)
    W = H = 8
    spp = 1024
    with pltpu.force_tpu_interpret_mode():
        sums = render_spheres_pallas(scene, cam, 5, width=W, height=H,
                                     spp=spp, max_depth=4)
    img = np.asarray(sums).reshape(H, W, 3) / spp
    want = np.exp(-sigma * L) * 2.0
    assert abs(img[3:5, 3:5, 0].mean() - want) < 0.08


def _fog_ball_scene():
    """Sky-lit scene: a white scattering fog ball over a red ground."""
    cam = make_camera(lookfrom=(0.0, 1.0, 4.0), lookat=(0.0, 0.6, 0.0),
                      fov_degrees=45.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=4.0)
    b = SceneBuilder()
    ground = b.add_lambertian((0.7, 0.2, 0.2))
    b.add_sphere((0.0, -100.0, 0.0), 100.0, ground)
    b.add_fog_sphere((0.0, 0.8, 0.0), 0.8, 2.5, albedo=(0.9, 0.9, 0.9))
    return b.build(), cam


def test_fog_kernel_matches_jnp():
    """Scattering fog ball: persistent megakernel vs jnp integrator
    statistical agreement, and the fog visibly occludes the ground."""
    from rtow_tpu.ops.pallas_megakernel import render_spheres_pallas

    scene, cam = _fog_ball_scene()
    W = H = 16
    spp, depth = 64, 6
    cfg = Config(image_width=W, aspect_ratio=1.0, samples_per_pixel=spp,
                 max_child_rays=depth, backend="jnp", seed=4)
    img_jnp = np.asarray(render(scene, cam, cfg))
    with pltpu.force_tpu_interpret_mode():
        sums = render_spheres_pallas(scene, cam, 4, width=W, height=H,
                                     spp=spp, max_depth=depth)
    img_k = np.asarray(sums).reshape(H, W, 3) / spp
    assert abs(img_jnp.mean() - img_k.mean()) < 0.03
    assert np.abs(img_jnp - img_k).mean() < 0.08
    # The fog ball sits center-frame: those pixels are whitish (fog
    # scatters sky), not the ground's red.
    center = img_jnp[6:10, 6:10]
    assert center[..., 2].mean() > 0.3  # blue channel present (not red)


def test_sorted_wavefront_volumes():
    """The flat bounce kernel (sorted-wavefront path) applies media:
    absorbing slab through trace_wavefront_sorted matches analytic."""
    from rtow_tpu.ops.wavefront_sorted import trace_wavefront_sorted

    sigma, L = 0.7, 2.0
    scene, cam = _slab_scene(sigma, L)
    w = h = 8
    spp = 512
    pix = jnp.arange(w * h, dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        sums = trace_wavefront_sorted(
            scene, cam, jax.random.key(2), pix, 7, spp=spp, max_depth=4,
            width=w, height=h,
        )
    img = np.asarray(sums).reshape(h, w, 3) / spp
    want = np.exp(-sigma * L) * 2.0
    assert abs(img[3:5, 3:5, 0].mean() - want) < 0.1


def test_volume_nee_unbiased():
    """Fog ball lit by one area light: the NEE+MIS estimator (volume
    events sample the light with the 1/(4 pi) phase) agrees with the
    plain estimator in expectation and cuts the per-sample std."""
    from rtow_tpu.models.camera import camera_rays, pixel_coords
    from rtow_tpu.ops.integrator import trace

    cam = make_camera(lookfrom=(0.0, 1.0, 4.0), lookat=(0.0, 0.6, 0.0),
                      fov_degrees=45.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=4.0)
    b = SceneBuilder()
    ground = b.add_lambertian((0.6, 0.6, 0.6))
    lamp = b.add_light((6.0, 6.0, 6.0))
    b.add_sphere((0.0, -100.0, 0.0), 100.0, ground)
    b.add_sphere((1.5, 3.0, 1.0), 1.0, lamp)
    b.add_fog_sphere((0.0, 0.8, 0.0), 0.8, 2.0, albedo=(0.9, 0.9, 0.9))
    scene = b.build(background=(0.0, 0.0, 0.0))
    W = H = 8
    spp, depth = 512, 5

    def samples(nee, seed):
        pix = jnp.arange(W * H, dtype=jnp.int32)
        lane_pix = jnp.repeat(pix, spp)
        k_pix, k_cam, k_tr = jax.random.split(jax.random.key(seed), 3)
        s, t = pixel_coords(W, H, k_pix, lane_pix, dtype=jnp.float32)
        rays = camera_rays(cam, k_cam, s, t)
        rad = trace(scene, rays, k_tr, depth, nee=nee)
        return np.asarray(rad.reshape(W * H, spp, 3))

    sp = samples(False, 0)
    sn = samples(True, 1)
    assert abs(sp.mean() - sn.mean()) < 0.03, (sp.mean(), sn.mean())
    assert np.abs(sp.mean(axis=1) - sn.mean(axis=1)).mean() < 0.06
    assert sn.std(axis=1).mean() < sp.std(axis=1).mean()


def test_rotated_fog_box():
    """Rotated fog boxes ("r" kind): rays are inverse-rotated into the
    box frame.  Oracles: a vertical ray through the rotation axis sees
    the same overlap at any angle (y is preserved); transmittance along
    a horizontal ray matches the chord length computed with plain
    numpy trigonometry."""
    from rtow_tpu.ops.volumes import build_volume_table, volume_transmittance

    sigma = 0.9

    def box(rot):
        b = SceneBuilder()
        b.add_sphere((0, 0, 0), 0.1, b.add_lambertian((0.5,) * 3))
        b.add_fog_box((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0), sigma,
                      rotate_y=rot, translate=(0.0, 5.0, 0.0))
        return b.build()

    def T(scene, o, d, tmax=100.0):
        table, _ = build_volume_table(scene)
        o = jnp.asarray(o, jnp.float32)[:, None]
        d = jnp.asarray(d, jnp.float32)[:, None]
        return float(volume_transmittance(
            table, scene.volume_kinds, o[0], o[1], o[2],
            d[0], d[1], d[2], jnp.full((1,), tmax, jnp.float32))[0])

    assert box(37.0).volume_kinds == ("r",)
    # Vertical ray through the translated center: overlap 2 always.
    for rot in (0.001, 20.0, 37.0, 90.0):
        assert T(box(rot), (0, 0, 0), (0, 1, 0)) == pytest.approx(
            np.exp(-2.0 * sigma), rel=1e-4)
    # Horizontal +x ray through the center at height of the box: the
    # chord of a unit half-width square rotated by theta is
    # 2/cos(theta) for theta < 45 deg (enters/exits the rotated +-z
    # faces... of the +-x faces); check against numpy geometry.
    th = np.radians(30.0)
    chord = 2.0 / np.cos(th)
    assert T(box(30.0), (-10, 5.0, 0), (1, 0, 0)) == pytest.approx(
        np.exp(-chord * sigma), rel=1e-3)
    # 90-degree rotation of a cube == no rotation.
    assert T(box(90.0), (-10, 5.0, 0.3), (1, 0, 0)) == pytest.approx(
        T(box(0.001), (-10, 5.0, 0.3), (1, 0, 0)), rel=1e-3)


def test_sharded_volumes_match_single():
    """Volume scenes through the sharded jnp path (8 virtual devices):
    the Volumes leaves ride the Scene pytree through shard_map, and the
    sharded image agrees with the single-device render."""
    import jax as _jax

    from rtow_tpu.parallel.mesh import make_mesh
    from rtow_tpu.parallel.sharded import render_sharded

    if len(_jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU mesh")
    scene, cam = _fog_ball_scene()
    cfg = Config(image_width=16, aspect_ratio=1.0, samples_per_pixel=32,
                 max_child_rays=4, n_devices=len(_jax.devices()), seed=6)
    img_single = np.asarray(render(scene, cam, cfg))
    img_shard = np.asarray(render_sharded(
        scene, cam, cfg, mesh=make_mesh(len(_jax.devices()), 32)))
    assert np.isfinite(img_shard).all()
    assert abs(img_shard.mean() - img_single.mean()) < 0.03
    assert np.abs(img_shard - img_single).mean() < 0.08


def test_fog_miss_grads_finite():
    """Regression: a ray MISSING a fog sphere used to poison the whole
    scene gradient with NaN (sqrt'(0) x zero-cotangent at the clamped
    boundary discriminant, ops/volumes._interval) — the small off-axis
    fog ball here guarantees most lanes miss it."""
    from rtow_tpu.diff import image_mse

    cam = make_camera(lookfrom=(0.0, 0.0, 1.5), lookat=(0.0, 0.0, -1.0),
                      fov_degrees=60.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=1.0)
    b = SceneBuilder()
    g = b.add_lambertian((0.5, 0.5, 0.5))
    b.add_sphere((0.0, -100.5, -1.0), 100.0, g)
    b.add_fog_sphere((0.3, 0.1, -1.0), 0.3, density=2.0,
                     albedo=(0.8, 0.8, 0.8))
    scene = b.build()
    pix = jnp.arange(64, dtype=jnp.int32)
    target = jnp.zeros((64, 3))
    loss, grads = jax.value_and_grad(
        lambda s: image_mse(s, cam, jax.random.key(2), target, pix,
                            width=8, height=8, spp=4, max_depth=3),
        allow_int=True)(scene)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        if hasattr(leaf, "dtype") and leaf.dtype != jax.dtypes.float0:
            assert np.isfinite(np.asarray(leaf)).all()
