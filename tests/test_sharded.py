"""Mesh-sharded rendering tests on the 8-virtual-device CPU backend.

Validates the TPU-native replacement for the reference's std::async
fan-out (reference src/render.cpp:172-180): sharded output must agree
with the single-device renderer statistically, spp accounting must be
exact (no silent floor-division loss, src/render.cpp:174,185), and any
(tile, spp) mesh factorisation must produce the same image structure.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtow_tpu.config import Config
from rtow_tpu.models.builders import three_sphere_scene
from rtow_tpu.parallel.mesh import choose_split, make_mesh
from rtow_tpu.parallel.sharded import render_sharded
from rtow_tpu.render import render


@pytest.fixture(scope="module")
def scene_cam():
    return three_sphere_scene(aspect_ratio=1.0)


def _cfg(**kw):
    base = dict(image_width=48, aspect_ratio=1.0, samples_per_pixel=16,
                max_child_rays=5, n_devices=8)
    base.update(kw)
    return Config(**base)


def test_choose_split_prefers_spp():
    assert choose_split(8, 32) == (1, 8)
    assert choose_split(8, 8) == (4, 2)
    assert choose_split(4, 64) == (1, 4)
    # odd spp cannot shard the sample axis evenly -> all tiles
    assert choose_split(8, 7) == (8, 1)


def test_sharded_matches_single_device(scene_cam):
    scene, cam = scene_cam
    cfg = _cfg(samples_per_pixel=64)
    img_ref = render(scene, cam, cfg)
    mesh = make_mesh(8, cfg.samples_per_pixel)
    img_sh = render_sharded(scene, cam, cfg, mesh=mesh)
    assert img_sh.shape == img_ref.shape
    # Different RNG partitioning -> statistical agreement only.
    assert abs(img_sh.mean() - img_ref.mean()) < 0.02
    assert np.mean(np.abs(img_sh - img_ref)) < 0.08


@pytest.mark.parametrize("tile,spp_sh", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_mesh_factorizations_agree(scene_cam, tile, spp_sh):
    scene, cam = scene_cam
    cfg = _cfg(samples_per_pixel=32)
    mesh = make_mesh(8, cfg.samples_per_pixel, tile_shards=tile,
                     spp_shards=spp_sh)
    img = render_sharded(scene, cam, cfg, mesh=mesh)
    assert np.isfinite(img).all()
    assert 0.05 < img.mean() < 1.0


def test_exact_spp_with_remainder(scene_cam):
    """spp=13 over 8 devices: the reference would silently drop samples
    (13/8 = 1 per thread -> 8 effective); we must trace exactly 13."""
    scene, cam = scene_cam
    cfg = _cfg(samples_per_pixel=13)
    mesh = make_mesh(8, cfg.samples_per_pixel)  # -> (8, 1) tiles
    img13 = render_sharded(scene, cam, cfg, mesh=mesh)
    # Also exercise an spp-sharded mesh with remainder masking.
    mesh2 = make_mesh(8, cfg.samples_per_pixel, tile_shards=2, spp_shards=4)
    img13b = render_sharded(scene, cam, cfg, mesh=mesh2)
    assert np.isfinite(img13).all() and np.isfinite(img13b).all()
    assert abs(img13.mean() - img13b.mean()) < 0.03


def test_pixel_padding():
    """Pixel count not divisible by tile shards must still render."""
    scene, cam = three_sphere_scene(aspect_ratio=1.0)
    cfg = Config(image_width=10, aspect_ratio=1.0, samples_per_pixel=8,
                 max_child_rays=4, n_devices=8)  # 100 px over 8 tiles
    mesh = make_mesh(8, cfg.samples_per_pixel, tile_shards=8, spp_shards=1)
    img = render_sharded(scene, cam, cfg, mesh=mesh)
    assert img.shape == (10, 10, 3)
    assert np.isfinite(img).all()


def test_sharded_pallas_interpret(scene_cam):
    """Tile-range sharded megakernel over the virtual mesh (interpret)."""
    from jax.experimental.pallas import tpu as pltpu

    from rtow_tpu.parallel.sharded import render_sharded_pallas

    scene, cam = scene_cam
    cfg = _cfg(image_width=48, samples_per_pixel=16, max_child_rays=5)
    with pltpu.force_tpu_interpret_mode():
        img = render_sharded_pallas(scene, cam, cfg, mesh=make_mesh(8, 16))
    ref = render(scene, cam, cfg)
    assert img.shape == ref.shape
    assert np.isfinite(img).all()
    assert abs(img.mean() - ref.mean()) < 0.03


def test_render_auto_multidevice_takes_pallas(scene_cam, monkeypatch):
    """n_devices>1 with a pallas-supported scene must dispatch to the
    sharded megakernel, not silently fall back to the jnp path
    (parallel-by-default, reference src/render.cpp:172-175)."""
    from jax.experimental.pallas import tpu as pltpu

    import rtow_tpu.parallel.sharded as sharded_mod
    from rtow_tpu.pipeline import render_auto

    scene, cam = scene_cam
    cfg = _cfg(samples_per_pixel=8, max_child_rays=3, backend="pallas")

    def _boom(*a, **kw):
        raise AssertionError("jnp sharded path taken for a pallas scene")

    monkeypatch.setattr(sharded_mod, "render_sharded", _boom)
    with pltpu.force_tpu_interpret_mode():
        img = render_auto(scene, cam, cfg)
    assert img.shape == (cfg.image_height, cfg.image_width, 3)
    assert np.isfinite(img).all()


def test_distributed_initialize_single_host_noop():
    from rtow_tpu.parallel import distributed

    distributed.initialize()  # no env, single host -> returns without init
    assert distributed.is_primary()


def test_overlap_grad_allreduce_parity(scene_cam):
    """Overlapped (per-bounce, DDP-style) gradient all-reduce must be
    numerically identical to the monolithic post-backward psum (sum of
    per-bounce psums == psum of the per-bounce sum), and its lowered
    HLO must carry gradient all-reduces inside the backward scan loop
    where the latency-hiding scheduler can overlap them."""
    from rtow_tpu.diff import build_train_step

    scene, cam = scene_cam
    width, height, spp = 8, 4, 16
    mesh = make_mesh(8, spp, tile_shards=4, spp_shards=2)
    kw = dict(width=width, height=height, spp=spp, max_depth=3, lr=1e-2)
    base = build_train_step(mesh, cam, **kw)
    over = build_train_step(mesh, cam, overlap_grad_allreduce=True, **kw)
    target = jnp.zeros((width * height, 3), jnp.float32)
    key = jax.random.key(0)
    s0, l0 = base(scene, key, target)
    s1, l1 = over(scene, key, target)
    assert float(l0) == pytest.approx(float(l1), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s0), jax.tree_util.tree_leaves(s1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    # Structure: the overlap build moves the gradient all-reduces out of
    # @main (where base emits them once, after the whole backward) into
    # the per-bounce backward function called from the backward scan —
    # the position where the latency-hiding scheduler can overlap them.
    def _ar_outside_main(txt):
        main_end = txt.index("func.func private")
        return txt.count("all_reduce", main_end)

    assert _ar_outside_main(base.lower(scene, key, target).as_text()) == 0
    assert _ar_outside_main(over.lower(scene, key, target).as_text()) > 0
