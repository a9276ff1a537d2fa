"""Scene builders: cover-scene distribution, OBJ ingestion, config ladder."""
import os
import textwrap

import numpy as np
import pytest

from rtow_tpu.config import Config
from rtow_tpu.models.builders import cover_scene, mesh_scene, one_sphere_scene, three_sphere_scene
from rtow_tpu.models.scene import DIELECTRIC, LAMBERTIAN, METAL
from rtow_tpu.utils.obj import ObjError, load_obj

SUZANNE = "/root/reference/suzanne.obj"


def test_cover_scene_statistics():
    cfg = Config(number_of_balls_sqrt=11, moving_spheres=True, seed=0)
    scene, cam = cover_scene(cfg)
    # Grid is 22x22 = 484 candidates; a few are skipped near (4, 0.2, 0);
    # plus ground + three heroes.
    n = scene.n_spheres
    assert 470 <= n <= 488
    kinds = np.asarray(scene.materials.kind)
    # Material mix ~ 80/15/5 over the grid.
    frac_lam = (kinds == LAMBERTIAN).mean()
    frac_met = (kinds == METAL).mean()
    frac_die = (kinds == DIELECTRIC).mean()
    assert 0.70 < frac_lam < 0.90
    assert 0.08 < frac_met < 0.22
    assert 0.02 < frac_die < 0.12
    # Moving spheres have nonzero dcenter, upward only, <= 0.5
    dc = np.asarray(scene.spheres.dcenter)
    moving = np.abs(dc).sum(-1) > 0
    assert moving.sum() > 200
    assert np.all(dc[moving][:, 1] > 0)
    assert np.all(dc[moving][:, 1] <= 0.5)
    # Hero spheres present: radius-1000 ground and three radius-1 spheres.
    r = np.asarray(scene.spheres.radius)
    assert (r == 1000.0).sum() == 1
    assert (r == 1.0).sum() == 3


def test_cover_scene_static_mode():
    cfg = Config(moving_spheres=False, seed=0)
    scene, _ = cover_scene(cfg)
    assert np.all(np.asarray(scene.spheres.dcenter) == 0.0)


def test_cover_scene_seed_reproducible():
    cfg = Config(seed=5)
    s1, _ = cover_scene(cfg)
    s2, _ = cover_scene(cfg)
    np.testing.assert_array_equal(np.asarray(s1.spheres.center0),
                                  np.asarray(s2.spheres.center0))


def test_obj_loader_tetrahedron(tmp_path):
    p = tmp_path / "tet.obj"
    p.write_text(textwrap.dedent("""\
        # tetrahedron
        v 0 0 0
        v 1 0 0
        v 0 1 0
        v 0 0 1
        f 1 2 3
        f 1 2 4
        f 1/1/1 3/2/2 4//3
        f -4 -3 -2
    """))
    tris = load_obj(str(p))
    assert tris.shape == (4, 3, 3)
    np.testing.assert_array_equal(tris[0], [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    np.testing.assert_array_equal(tris[3], tris[0])  # negative indices


def test_multi_shape_loads_all_shapes(tmp_path):
    """Documented deviation from the reference (src/main.cpp:115): the
    reference keeps shapes[0] only; we ingest EVERY shape in the file —
    both the Python and the native loader (they must agree)."""
    p = tmp_path / "two.obj"
    p.write_text(textwrap.dedent("""\
        o first
        v 0 0 0
        v 1 0 0
        v 0 1 0
        f 1 2 3
        o second
        g also_a_group_marker
        v 5 0 0
        v 6 0 0
        v 5 1 0
        f 4 5 6
        f 4 6 5
    """))
    for use_native in (False, True):
        tris = load_obj(str(p), use_native=use_native)
        # All 3 faces across both shapes load (the reference would
        # keep only the first shape's single face).
        assert tris.shape == (3, 3, 3)
        np.testing.assert_array_equal(
            tris[1], [[5, 0, 0], [6, 0, 0], [5, 1, 0]])


def test_obj_loader_rejects_quads(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    with pytest.raises(ObjError, match="isn't a triangle"):
        load_obj(str(p))


@pytest.mark.skipif(not os.path.exists(SUZANNE), reason="reference asset absent")
def test_suzanne_triangle_count():
    # Reference prints "Scene has 968 triangles" (src/main.cpp:134).
    tris = load_obj(SUZANNE)
    assert tris.shape == (968, 3, 3)
    cfg = Config(model=SUZANNE)
    scene, cam = mesh_scene(cfg)
    assert scene.n_triangles == 968
    assert scene.n_spheres == 0


def test_ladder_scenes_build():
    s1, c1 = one_sphere_scene()
    assert s1.n_spheres == 2
    s3, c3 = three_sphere_scene()
    assert s3.n_spheres == 5  # includes the hollow-glass inner sphere


def test_add_mesh_bulk_block():
    """Bulk mesh blocks concatenate with per-triangle appends."""
    import numpy as np

    from rtow_tpu.models.scene import SceneBuilder

    b = SceneBuilder()
    m = b.add_lambertian((0.5, 0.5, 0.5))
    b.add_triangle((0, 0, 0), (1, 0, 0), (0, 1, 0), m)
    block = np.arange(2 * 3 * 3, dtype=np.float64).reshape(2, 3, 3)
    b.add_mesh(block, m)
    scene = b.build()
    assert scene.n_triangles == 3
    np.testing.assert_allclose(np.asarray(scene.triangles.verts)[1:], block)
    assert (np.asarray(scene.triangles.material) == m).all()


def test_add_quad_and_box_geometry():
    """add_quad splits into two triangles sharing the diagonal; add_box
    emits 12 outward-wound triangles (the kernel backface-culls, so
    winding is load-bearing)."""
    from rtow_tpu.models.scene import SceneBuilder

    b = SceneBuilder()
    m = b.add_lambertian((0.5, 0.5, 0.5))
    b.add_quad((0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0), m)
    b.add_box((0, 0, 0), (2, 3, 4), m)
    scene = b.build()
    assert scene.n_triangles == 2 + 12
    v = np.asarray(scene.triangles.verts, dtype=np.float64)
    # Quad normal: cross(e1, e2) -> +z for both triangles.
    for tri in v[:2]:
        n = np.cross(tri[1] - tri[0], tri[2] - tri[0])
        assert n[2] > 0 and abs(n[0]) < 1e-12 and abs(n[1]) < 1e-12
    # Box: every face normal points OUT of the box center.
    center = np.array([1.0, 1.5, 2.0])
    for tri in v[2:]:
        n = np.cross(tri[1] - tri[0], tri[2] - tri[0])
        assert np.dot(n, tri.mean(0) - center) > 0
    # Box vertices span exactly the requested extent.
    assert np.allclose(v[2:].reshape(-1, 3).min(0), 0.0)
    assert np.allclose(v[2:].reshape(-1, 3).max(0), (2, 3, 4))


def test_instance_transforms_bake():
    """rotate_y/translate bake into vertices: +15 deg takes +z toward
    +x (the book's rotate_y convention, RTW book 2 ch. 8), translation
    adds, y is preserved; add_mesh applies scale -> rotate -> translate."""
    from rtow_tpu.models.scene import SceneBuilder

    b = SceneBuilder()
    m = b.add_lambertian((0.5, 0.5, 0.5))
    b.add_box((0, 0, 0), (1, 1, 1), m, rotate_y=90.0,
              translate=(10.0, 20.0, 30.0))
    v = np.asarray(b.build().triangles.verts, np.float64).reshape(-1, 3)
    # Unit cube corners under 90 deg: (x, z) -> (z, -x); then translate.
    assert np.allclose(v[:, 1].min(), 20.0) and np.allclose(v[:, 1].max(), 21.0)
    assert np.allclose(sorted({round(x, 6) for x in v[:, 0]}), [10.0, 11.0])
    assert np.allclose(sorted({round(z, 6) for z in v[:, 2]}), [29.0, 30.0])

    b2 = SceneBuilder()
    m2 = b2.add_lambertian((0.5, 0.5, 0.5))
    tri = np.array([[[1.0, 0, 0], [0, 1, 0], [0, 0, 1]]])
    b2.add_mesh(tri, m2, scale=2.0, rotate_y=90.0, translate=(0, 0, -5))
    got = np.asarray(b2.build().triangles.verts, np.float64)[0]
    #  scale: (2,0,0),(0,2,0),(0,0,2); rotate 90: (x,z)->(z,-x); translate.
    np.testing.assert_allclose(
        got, [[0, 0, -7], [0, 2, -5], [2, 0, -5]], atol=1e-12)


def test_cornell_scene_has_tall_box():
    from rtow_tpu.models.builders import cornell_scene

    scene, _ = cornell_scene()
    # 5 walls + light = 12 tris, tall box = 12 more.
    assert scene.n_triangles == 24
    assert scene.n_spheres == 1  # the mirror
    v = np.asarray(scene.triangles.verts, np.float64).reshape(-1, 3)
    box = v[36:]  # the box's 12 triangles come last
    assert np.allclose(box[:, 1].min(), 0.0)
    assert np.allclose(box[:, 1].max(), 330.0)
    assert box[:, 0].min() > 200.0 and box[:, 2].min() > 250.0
