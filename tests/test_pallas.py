"""Pallas megakernel tests (interpret mode — no TPU required).

The kernel must agree with the jnp renderer statistically (different
RNG streams; tolerance calibrated to seed-to-seed noise) and reproduce
exact reference semantics on deterministic sub-paths.
"""
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from rtow_tpu.config import Config
from rtow_tpu.models.builders import one_sphere_scene, three_sphere_scene
from rtow_tpu.ops.pallas_megakernel import (
    build_sphere_table, render_spheres_pallas,
)
from rtow_tpu.render import render


def _kernel_img(scene, cam, W, H, spp, depth, seed=0):
    with pltpu.force_tpu_interpret_mode():
        rad = render_spheres_pallas(
            scene, cam, seed, width=W, height=H, spp=spp, max_depth=depth
        )
    return np.asarray(rad).reshape(H, W, 3) / spp


def test_matches_jnp_one_sphere():
    scene, cam = one_sphere_scene(aspect_ratio=1.0)
    W = H = 24
    img_k = _kernel_img(scene, cam, W, H, spp=32, depth=4)
    cfg = Config(image_width=W, aspect_ratio=1.0, samples_per_pixel=32,
                 max_child_rays=4)
    img_j = render(scene, cam, cfg)
    assert abs(img_k.mean() - img_j.mean()) < 0.02
    assert np.abs(img_k - img_j).mean() < 0.03


def test_matches_jnp_three_sphere():
    """Metal + dielectric (incl. hollow glass) against the jnp oracle."""
    scene, cam = three_sphere_scene(aspect_ratio=1.0)
    W = H = 32
    img_k = _kernel_img(scene, cam, W, H, spp=48, depth=5)
    cfg = Config(image_width=W, aspect_ratio=1.0, samples_per_pixel=48,
                 max_child_rays=5)
    img_j = render(scene, cam, cfg)
    cfg2 = Config(image_width=W, aspect_ratio=1.0, samples_per_pixel=48,
                  max_child_rays=5, seed=77)
    noise = np.abs(render(scene, cam, cfg2) - img_j).mean()
    assert np.abs(img_k - img_j).mean() < max(3 * noise, 0.03)


def test_deterministic_and_seed_sensitive():
    scene, cam = one_sphere_scene(aspect_ratio=1.0)
    a = _kernel_img(scene, cam, 16, 16, spp=4, depth=3, seed=1)
    b = _kernel_img(scene, cam, 16, 16, spp=4, depth=3, seed=1)
    c = _kernel_img(scene, cam, 16, 16, spp=4, depth=3, seed=2)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0.0


def test_sphere_table_layout():
    scene, _ = three_sphere_scene()
    tbl, boxes = build_sphere_table(scene)
    tbl = np.asarray(tbl)
    # (Npad spheres, 16 params) — spheres on the sublane axis, Morton order.
    assert tbl.shape == (128, 16)
    n = scene.n_spheres
    np.testing.assert_allclose(
        np.sort(tbl[:n, 6]), np.sort(np.asarray(scene.spheres.radius))
    )
    # Padding spheres live far away with r=0 (never hittable).
    assert (tbl[n:, 6] == 0).all() and (tbl[n:, 0] == 1e9).all()
    # Block box covers every sphere incl. |r| extent and motion.
    b = np.asarray(boxes)[0]
    assert (tbl[:n, 0] - np.abs(tbl[:n, 6]) >= b[0] - 1e-3).all()
    assert (tbl[:n, 0] + np.abs(tbl[:n, 6]) <= b[3] + 1e-3).all()


def test_matches_jnp_triangles():
    """Mixed sphere+triangle scene through the kernel's triangle block
    sweep vs the jnp oracle."""
    from rtow_tpu.models.camera import make_camera
    from rtow_tpu.models.scene import SceneBuilder

    b = SceneBuilder()
    red = b.add_lambertian((0.7, 0.2, 0.2))
    gray = b.add_lambertian((0.5, 0.5, 0.5))
    # A quad (two triangles) standing in front of the camera + ground.
    b.add_triangle((-0.6, -0.4, -1.2), (0.6, -0.4, -1.2), (0.6, 0.6, -1.2), red)
    b.add_triangle((-0.6, -0.4, -1.2), (0.6, 0.6, -1.2), (-0.6, 0.6, -1.2), red)
    b.add_sphere((0.0, -100.5, -1.0), 100.0, gray)
    scene = b.build()
    cam = make_camera(lookfrom=(0.0, 0.0, 0.0), lookat=(0.0, 0.0, -1.0),
                      fov_degrees=70.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=1.0)
    W = H = 24
    img_k = _kernel_img(scene, cam, W, H, spp=48, depth=4)
    cfg = Config(image_width=W, aspect_ratio=1.0, samples_per_pixel=48,
                 max_child_rays=4, backend="jnp")
    img_j = render(scene, cam, cfg)
    assert abs(img_k.mean() - img_j.mean()) < 0.02
    assert np.abs(img_k - img_j).mean() < 0.035


def test_matches_jnp_multiblock_mesh():
    """Morton-sorted multi-block mesh (3 blocks) vs the jnp oracle —
    exercises the block-cull slab test and cross-block winner selection."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from make_mesh import make_knot

    from rtow_tpu.models.camera import make_camera
    from rtow_tpu.models.scene import SceneBuilder

    verts, faces = make_knot(16, 12)  # 384 triangles -> 3 blocks
    b = SceneBuilder()
    m = b.add_lambertian((0.6, 0.5, 0.4))
    b.add_mesh(verts[faces], m)
    scene = b.build()
    cam = make_camera(lookfrom=(0.0, 0.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      fov_degrees=45.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=3.0)
    W = H = 24
    img_k = _kernel_img(scene, cam, W, H, spp=24, depth=3)
    cfg = Config(image_width=W, aspect_ratio=1.0, samples_per_pixel=24,
                 max_child_rays=3, backend="jnp")
    img_j = render(scene, cam, cfg)
    assert abs(img_k.mean() - img_j.mean()) < 0.02
    assert np.abs(img_k - img_j).mean() < 0.04


def test_persistent_kernel_traces_with_super_sized_mesh():
    """Meshes between 4,096 (first super level) and WAVEFRONT_MIN_TRIS
    route to the persistent kernel, which sweeps blocks FLAT — the
    hierarchical descent needs DMA scratch only the flat bounce kernel
    allocates.  Regression: n_super > 0 here crashed at trace
    ("DMA source/destination/semaphore arguments must be Refs")."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import jax
    from make_mesh import make_knot

    from rtow_tpu.models.camera import make_camera
    from rtow_tpu.models.scene import SceneBuilder
    from rtow_tpu.ops.pallas_megakernel import render_spheres_pallas

    verts, faces = make_knot(50, 50)  # 5,000 tris -> 48 blocks, 3 supers
    b = SceneBuilder()
    b.add_mesh(verts[faces], b.add_lambertian((0.6, 0.5, 0.4)))
    scene = b.build()
    cam = make_camera(lookfrom=(0.0, 0.0, 3.0), lookat=(0.0, 0.0, 0.0),
                      fov_degrees=45.0, aspect_ratio=1.0, aperture=0.0,
                      focus_dist=3.0)
    out = jax.eval_shape(
        lambda s, c: render_spheres_pallas(
            s, c, 1, width=32, height=8, spp=1, max_depth=3),
        scene, cam,
    )
    assert out.shape == (32 * 8, 3)
