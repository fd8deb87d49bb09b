"""Scene I/O (SURVEY.md T7 / R7): OBJ + MTL parsing, fan triangulation,
negative indices, material switching, and save/load round-trip."""
import numpy as np

from tracer.scene.io import load_obj, save_obj

OBJ = """\
# tiny test scene
mtllib test.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
usemtl red
f 1 2 3 4
v 0 0 1
v 1 0 1
v 1 1 1
usemtl glow
f -3 -2 -1
"""

MTL = """\
newmtl red
Kd 0.8 0.1 0.1
newmtl glow
Kd 0.2 0.2 0.2
Ke 3.0 2.0 1.0
Ks 0.5 0.5 0.5
"""


def _write(tmp_path):
    (tmp_path / "test.obj").write_text(OBJ)
    (tmp_path / "test.mtl").write_text(MTL)
    return str(tmp_path / "test.obj")


def test_load_obj_geometry_and_materials(tmp_path):
    scene = load_obj(_write(tmp_path))
    assert scene.verts.shape == (7, 3)
    # Quad fan-triangulates to 2 tris + 1 explicit tri.
    assert scene.num_tris == 3
    tris = np.asarray(scene.tris)
    np.testing.assert_array_equal(tris[0], [0, 1, 2])
    np.testing.assert_array_equal(tris[1], [0, 2, 3])
    np.testing.assert_array_equal(tris[2], [4, 5, 6])  # negative indices
    mat_id = np.asarray(scene.mat_id)
    mats = scene.materials
    np.testing.assert_allclose(np.asarray(mats.albedo)[mat_id[0]],
                               [0.8, 0.1, 0.1])
    np.testing.assert_allclose(np.asarray(mats.emission)[mat_id[2]],
                               [3.0, 2.0, 1.0])
    assert float(np.asarray(mats.mirror)[mat_id[2]]) == 0.5
    # Default light + unit normals.
    assert scene.lights.count == 1
    n = np.linalg.norm(np.asarray(scene.normals), axis=-1)
    np.testing.assert_allclose(n, 1.0, rtol=1e-5)


def test_save_load_roundtrip(tmp_path):
    scene = load_obj(_write(tmp_path))
    out = str(tmp_path / "round.obj")
    save_obj(out, np.asarray(scene.verts), np.asarray(scene.tris))
    scene2 = load_obj(out)
    np.testing.assert_allclose(np.asarray(scene2.verts),
                               np.asarray(scene.verts), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(scene2.tris),
                                  np.asarray(scene.tris))


def test_loaded_scene_renders(tmp_path):
    from tracer.core.camera import Camera
    from tracer.render.whitted import WhittedConfig, render_image

    scene = load_obj(_write(tmp_path))
    cam = Camera.make(position=(0.5, 0.5, 3.0), look_at=(0.5, 0.5, 0.0))
    img = np.asarray(render_image(scene, cam, 16, 16,
                                  WhittedConfig(max_bounces=1)))
    assert np.isfinite(img).all()
    assert img.max() > 0.0  # the emissive triangle alone guarantees signal


def test_native_loader_matches_python(tmp_path):
    """The C++ parser tier (cpp/objloader.cpp, built on demand) produces a
    Scene identical to the Python definition of record — including fan
    triangulation, negative indices, and usemtl index assignment. Skipped
    only if g++ is unavailable."""
    import pytest

    from tracer.scene.cpp_loader import available

    if not available():
        pytest.skip("native objloader did not build")
    path = _write(tmp_path)
    s_py = load_obj(path, native=False)
    s_cpp = load_obj(path, native=True)
    np.testing.assert_array_equal(np.asarray(s_cpp.verts),
                                  np.asarray(s_py.verts))
    np.testing.assert_array_equal(np.asarray(s_cpp.tris),
                                  np.asarray(s_py.tris))
    np.testing.assert_array_equal(np.asarray(s_cpp.mat_id),
                                  np.asarray(s_py.mat_id))
    np.testing.assert_array_equal(np.asarray(s_cpp.materials.albedo),
                                  np.asarray(s_py.materials.albedo))
    np.testing.assert_array_equal(np.asarray(s_cpp.materials.emission),
                                  np.asarray(s_py.materials.emission))
    np.testing.assert_array_equal(np.asarray(s_cpp.materials.mirror),
                                  np.asarray(s_py.materials.mirror))


def test_native_loader_large_roundtrip(tmp_path):
    """Exported geometry (save_obj) reloads identically through the native
    parser at a non-trivial size."""
    import pytest

    from tracer.scene.cpp_loader import available

    if not available():
        pytest.skip("native objloader did not build")
    rng = np.random.default_rng(0)
    verts = rng.normal(size=(5000, 3)).astype(np.float32)
    tris = rng.integers(0, 5000, size=(9000, 3)).astype(np.int32)
    path = str(tmp_path / "big.obj")
    save_obj(path, verts, tris)
    s_cpp = load_obj(path, native=True)
    s_py = load_obj(path, native=False)
    np.testing.assert_array_equal(np.asarray(s_cpp.tris),
                                  np.asarray(s_py.tris))
    np.testing.assert_allclose(np.asarray(s_cpp.verts),
                               np.asarray(s_py.verts), rtol=1e-6)


def test_multi_mtllib_line(tmp_path):
    """OBJ allows several library files on one mtllib line; both parsers
    must load all of them (an r5 review catch: the native parser joined
    the rest of the line into one nonexistent path)."""
    import pytest

    (tmp_path / "a.mtl").write_text("newmtl red\nKd 0.8 0.1 0.1\n")
    (tmp_path / "b.mtl").write_text("newmtl glow\nKd 0.2 0.2 0.2\nKe 3 2 1\n")
    (tmp_path / "m.obj").write_text(
        "mtllib a.mtl b.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "usemtl red\nf 1 2 3\nusemtl glow\nf 1 3 4\n")
    path = str(tmp_path / "m.obj")
    s_py = load_obj(path, native=False)
    np.testing.assert_allclose(
        np.asarray(s_py.materials.albedo)[np.asarray(s_py.mat_id)[0]],
        [0.8, 0.1, 0.1])
    np.testing.assert_allclose(
        np.asarray(s_py.materials.emission)[np.asarray(s_py.mat_id)[1]],
        [3.0, 2.0, 1.0])

    from tracer.scene.cpp_loader import available

    if not available():
        pytest.skip("native objloader did not build")
    s_cpp = load_obj(path, native=True)
    np.testing.assert_array_equal(np.asarray(s_cpp.materials.albedo),
                                  np.asarray(s_py.materials.albedo))
    np.testing.assert_array_equal(np.asarray(s_cpp.materials.emission),
                                  np.asarray(s_py.materials.emission))
    np.testing.assert_array_equal(np.asarray(s_cpp.mat_id),
                                  np.asarray(s_py.mat_id))
