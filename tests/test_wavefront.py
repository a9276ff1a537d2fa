"""Sorted-wavefront mesh path tests (interpret mode — no TPU required).

The sorted path must agree with the jnp renderer statistically, be
deterministic for a fixed seed regardless of the (internal) sort
schedule, and be the dispatch target for large meshes.
"""
import sys

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rtow_tpu.config import Config
from rtow_tpu.models.camera import make_camera
from rtow_tpu.models.scene import SceneBuilder
from rtow_tpu.ops.wavefront_sorted import (
    WAVEFRONT_MIN_TRIS, render_wavefront, sort_keys,
)
from rtow_tpu.render import render

sys.path.insert(0, "/root/repo/tools")


@pytest.fixture(scope="module")
def knot_scene():
    from make_mesh import make_knot

    verts, faces = make_knot(16, 12)  # 384 triangles -> 3 blocks
    b = SceneBuilder()
    m = b.add_lambertian((0.6, 0.5, 0.4))
    b.add_mesh(verts[faces], m)
    scene = b.build()
    cam = make_camera(lookfrom=(0.0, 0.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      fov_degrees=45.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=3.0)
    return scene, cam


def test_matches_jnp(knot_scene):
    scene, cam = knot_scene
    W = H = 24
    cfg = Config(image_width=W, aspect_ratio=1.0, samples_per_pixel=24,
                 max_child_rays=3, backend="jnp")
    with pltpu.force_tpu_interpret_mode():
        img_w = render_wavefront(scene, cam, cfg)
    img_j = render(scene, cam, cfg)
    assert img_w.shape == img_j.shape
    assert abs(img_w.mean() - img_j.mean()) < 0.02
    assert np.abs(img_w - img_j).mean() < 0.04


def test_mixed_sphere_triangle(knot_scene):
    """Spheres + mesh through the sorted path (ground + knot)."""
    from make_mesh import make_knot

    verts, faces = make_knot(16, 12)
    b = SceneBuilder()
    m = b.add_lambertian((0.6, 0.5, 0.4))
    gray = b.add_lambertian((0.5, 0.5, 0.5))
    b.add_mesh(verts[faces], m)
    b.add_sphere((0.0, -101.0, 0.0), 100.0, gray)
    scene = b.build()
    cam = knot_scene[1]
    W = H = 24
    cfg = Config(image_width=W, aspect_ratio=1.0, samples_per_pixel=16,
                 max_child_rays=3, backend="jnp")
    with pltpu.force_tpu_interpret_mode():
        img_w = render_wavefront(scene, cam, cfg)
    img_j = render(scene, cam, cfg)
    assert abs(img_w.mean() - img_j.mean()) < 0.03
    assert np.abs(img_w - img_j).mean() < 0.05


def test_deterministic_and_seed_sensitive(knot_scene):
    scene, cam = knot_scene
    cfg1 = Config(image_width=16, aspect_ratio=1.0, samples_per_pixel=4,
                  max_child_rays=3, seed=1)
    cfg2 = Config(image_width=16, aspect_ratio=1.0, samples_per_pixel=4,
                  max_child_rays=3, seed=2)
    with pltpu.force_tpu_interpret_mode():
        a = render_wavefront(scene, cam, cfg1)
        b = render_wavefront(scene, cam, cfg1)
        c = render_wavefront(scene, cam, cfg2)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0.0


def test_chunked_matches_unchunked(knot_scene):
    """rays_per_batch smaller than the frame -> multiple chunks (and a
    persistent lanes-per-pixel layout), same image statistics."""
    scene, cam = knot_scene
    base = dict(image_width=40, aspect_ratio=1.0, samples_per_pixel=8,
                max_child_rays=3)
    with pltpu.force_tpu_interpret_mode():
        img1 = render_wavefront(scene, cam, Config(**base))
        img2 = render_wavefront(
            scene, cam, Config(**base, rays_per_batch=1024)
        )
    assert abs(img1.mean() - img2.mean()) < 0.03


def test_sharded_wavefront_matches_single(knot_scene):
    """2-virtual-device sharded wavefront vs single-device (interpret
    mode is ~Nx serial over shard_map programs — 2 devices keeps this
    test tractable; the mesh layout logic is device-count agnostic)."""
    from rtow_tpu.parallel.mesh import make_mesh
    from rtow_tpu.parallel.sharded import render_sharded_wavefront

    scene, cam = knot_scene
    cfg = Config(image_width=16, aspect_ratio=1.0, samples_per_pixel=8,
                 max_child_rays=2, n_devices=2)
    with pltpu.force_tpu_interpret_mode():
        img_sh = render_sharded_wavefront(
            scene, cam, cfg, mesh=make_mesh(2, 8, tile_shards=2,
                                            spp_shards=1))
        img_1 = render_wavefront(scene, cam, cfg)
    assert img_sh.shape == img_1.shape
    assert abs(img_sh.mean() - img_1.mean()) < 0.04
    assert np.abs(img_sh - img_1).mean() < 0.08


def test_hbm_dma_mode_matches_jnp(monkeypatch):
    """Forced HBM triangle mode (table in HBM, descended blocks DMA'd
    into scratch — the >128k-triangle path) vs the jnp oracle."""
    from make_mesh import make_knot

    monkeypatch.setenv("RTOW_TRI_HBM", "1")
    verts, faces = make_knot(32, 64)  # 4096 tris = 32 blocks = 2 supers
    b = SceneBuilder()
    m = b.add_lambertian((0.6, 0.5, 0.4))
    b.add_mesh(verts[faces], m)
    scene = b.build()
    cam = make_camera(lookfrom=(0.0, 0.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      fov_degrees=45.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=3.0)
    cfg = Config(image_width=16, aspect_ratio=1.0, samples_per_pixel=8,
                 max_child_rays=2, backend="jnp")
    with pltpu.force_tpu_interpret_mode():
        img_h = render_wavefront(scene, cam, cfg)
    img_j = render(scene, cam, cfg)
    assert abs(img_h.mean() - img_j.mean()) < 0.03
    assert np.abs(img_h - img_j).mean() < 0.06


def test_transposed_vmem_table_matches_row_major(monkeypatch):
    """The (NB, 16, TRI_BLOCK) transposed VMEM table (default; 64 B/tri
    instead of 512) must be bit-identical to the (Mpad, 16) row-major
    layout on a mesh deep enough to take the super-descend path."""
    from make_mesh import make_knot

    verts, faces = make_knot(32, 64)  # 4096 tris = 32 blocks = 2 supers
    b = SceneBuilder()
    m = b.add_lambertian((0.6, 0.5, 0.4))
    b.add_mesh(verts[faces], m)
    scene = b.build()
    cam = make_camera(lookfrom=(0.0, 0.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      fov_degrees=45.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=3.0)
    cfg = Config(image_width=16, aspect_ratio=1.0, samples_per_pixel=8,
                 max_child_rays=2, backend="jnp")
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("RTOW_TRI_T", "1")
        img_t = render_wavefront(scene, cam, cfg)
        monkeypatch.setenv("RTOW_TRI_T", "0")
        img_r = render_wavefront(scene, cam, cfg)
    np.testing.assert_array_equal(np.asarray(img_t), np.asarray(img_r))


def test_deferred_winner_fetch_matches_eager(monkeypatch):
    """Deferred post-sweep winner fetch (default; one fetch per
    distinct winner block) must be bit-identical to the eager
    per-block fused fetch, through the super-descend path."""
    from make_mesh import make_knot

    verts, faces = make_knot(32, 64)  # 4096 tris = 32 blocks = 2 supers
    b = SceneBuilder()
    m = b.add_lambertian((0.6, 0.5, 0.4))
    gray = b.add_lambertian((0.5, 0.5, 0.5))
    b.add_mesh(verts[faces], m)
    b.add_sphere((0.0, -101.0, 0.0), 100.0, gray)  # mixed winner tables
    scene = b.build()
    cam = make_camera(lookfrom=(0.0, 0.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      fov_degrees=45.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=3.0)
    cfg = Config(image_width=16, aspect_ratio=1.0, samples_per_pixel=8,
                 max_child_rays=3, backend="jnp")
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("RTOW_DEFER_FETCH", "1")
        img_d = render_wavefront(scene, cam, cfg)
        monkeypatch.setenv("RTOW_DEFER_FETCH", "0")
        img_e = render_wavefront(scene, cam, cfg)
    np.testing.assert_array_equal(np.asarray(img_d), np.asarray(img_e))


def test_dispatch_prefers_wavefront_for_large_meshes():
    """pipeline routing: > WAVEFRONT_MIN_TRIS goes to the sorted path."""
    from rtow_tpu.pipeline import pallas_supported, wavefront_supported

    class FakeScene:
        n_triangles = WAVEFRONT_MIN_TRIS + 1
        n_spheres = 0
        n_primitives = WAVEFRONT_MIN_TRIS + 1

    class SmallScene:
        n_triangles = 968
        n_spheres = 1
        n_primitives = 969

    cfg = Config(backend="pallas")
    assert wavefront_supported(FakeScene(), cfg)
    assert not pallas_supported(FakeScene(), cfg)
    assert pallas_supported(SmallScene(), cfg)
    assert not wavefront_supported(SmallScene(), cfg)


def test_sort_keys_dead_lanes_last():
    import jax.numpy as jnp

    from rtow_tpu.ops.wavefront_sorted import DEAD_KEY

    n = 8
    ox = oy = oz = jnp.linspace(0.0, 1.0, n)
    dx = dy = dz = jnp.ones(n)
    alive = jnp.array([1, 0, 1, 0, 1, 1, 0, 1], jnp.int32)
    keys = sort_keys(ox, oy, oz, dx, dy, dz, alive,
                     jnp.zeros(3), jnp.ones(3))
    keys = np.asarray(keys)
    assert (keys[alive == 0] == DEAD_KEY).all()
    assert (keys[alive == 1] < DEAD_KEY).all()


def test_banded_dispatch_bit_identical(knot_scene, monkeypatch):
    """Splitting the frame into per-band dispatches must be BIT-identical
    to the single-dispatch render: chunk RNG folds in the global chunk
    index, so banding only changes host scheduling (the fix for the
    remote tunnel dropping multi-minute single dispatches)."""
    scene, cam = knot_scene
    base = dict(image_width=40, aspect_ratio=1.0, samples_per_pixel=8,
                max_child_rays=3, rays_per_batch=1024)  # 2 chunks
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("RTOW_WF_CHUNKS_PER_DISPATCH", "0")  # single
        img1 = render_wavefront(scene, cam, Config(**base))
        monkeypatch.setenv("RTOW_WF_CHUNKS_PER_DISPATCH", "1")  # per-chunk
        img2 = render_wavefront(scene, cam, Config(**base))
        monkeypatch.setenv("RTOW_WF_CHUNKS_PER_DISPATCH", "2")  # uneven tail
        img3 = render_wavefront(scene, cam, Config(**base))
    np.testing.assert_array_equal(img1, img2)
    np.testing.assert_array_equal(img1, img3)


def test_tri_table_pads_supers_to_whole_hypers():
    """Regression (round 4): meshes whose super count was not a SUPER
    multiple (e.g. ~200k tris -> 98 supers) reproducibly ABORTED on
    device once the hyper level activated — every exact-super mesh
    worked.  build_tri_table must pad the table so supers divide into
    whole hypers whenever the hyper level will be active."""
    from rtow_tpu.ops.pallas_megakernel import (
        SUPER, TRI_BLOCK, build_tri_table,
    )

    # 70,000 tris -> 547 blocks -> 35 supers pre-fix (not a multiple of
    # 16) with the hyper level active (>= 32 supers).
    rng = np.random.default_rng(0)
    verts = rng.standard_normal((70_000, 3, 3)).astype(np.float32) * 0.01
    verts += rng.standard_normal((70_000, 1, 3)).astype(np.float32)
    b = SceneBuilder()
    m = b.add_lambertian((0.5, 0.5, 0.5))
    b.add_mesh(verts, m)
    scene = b.build()
    tbl, boxes, sup, hyp = build_tri_table(scene)
    nb = tbl.shape[0] // TRI_BLOCK
    assert nb % SUPER == 0
    nsb = nb // SUPER
    assert nsb >= 2 * SUPER  # hyper level active for this size
    assert nsb % SUPER == 0, (
        f"{nsb} supers do not divide into whole hypers — the padded-"
        "super kernel path aborts on device"
    )
    # Padding rows are degenerate: inverted boxes (never descended).
    assert float(boxes[-1, 0]) > float(boxes[-1, 3])


def test_tri_block_auto_pick():
    """Round-5 per-scene TRI_BLOCK: 256 at <= ~160k tris (the round-4
    bisect's winning width there), 128 past the crossover; the context
    manager must pin the global for table build + trace and restore it."""
    from rtow_tpu.ops import pallas_megakernel as mk

    assert mk.pick_tri_block(65_536) == 256
    assert mk.pick_tri_block(131_072) == 256
    assert mk.pick_tri_block(360_000) == 128
    before = mk.TRI_BLOCK
    with mk.tri_block_for(65_536) as tb:
        assert tb == 256
        assert mk.TRI_BLOCK == 256
        # A table built inside the context uses the pinned width.
        rng = np.random.default_rng(0)
        verts = rng.standard_normal((3000, 3, 3)).astype(np.float32) * 0.01
        verts += rng.standard_normal((3000, 1, 3)).astype(np.float32)
        b = SceneBuilder()
        b.add_mesh(verts, b.add_lambertian((0.5, 0.5, 0.5)))
        tbl = mk.build_tri_table(b.build())[0]
        assert tbl.shape[0] % 256 == 0
    assert mk.TRI_BLOCK == before
