import numpy as np

from pathtrace_tpu import meshes


def test_knot_mesh_budget_and_closed():
    verts, faces = meshes.knot_mesh(n_tris=5000)
    assert abs(faces.shape[0] - 5000) / 5000 < 0.25
    assert faces.max() < verts.shape[0]
    # closed wrap: every vertex referenced
    assert np.unique(faces).size == verts.shape[0]
    # normalized into a ~unit box
    span = verts.max(0) - verts.min(0)
    assert span.max() <= 2.5


def test_icosphere():
    verts, faces = meshes.icosphere(2, radius=2.0)
    assert faces.shape[0] == 20 * 4 ** 2
    np.testing.assert_allclose(np.linalg.norm(verts, axis=1), 2.0, rtol=1e-6)


def test_obj_roundtrip_native_and_python(tmp_path):
    verts, faces = meshes.icosphere(1)
    p = str(tmp_path / "m.obj")
    meshes.save_obj(p, verts, faces)

    v2, f2 = meshes.load_obj(p)  # native if buildable, else python
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    np.testing.assert_array_equal(f2, faces)

    v3, f3 = meshes._load_obj_py(p)
    np.testing.assert_allclose(v3, v2, atol=1e-12)
    np.testing.assert_array_equal(f3, f2)


def test_obj_quads_and_negative_indices(tmp_path):
    p = str(tmp_path / "q.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n")
        f.write("f 1 2 3 4\n")       # quad → 2 tris
        f.write("f -4 -3 -2\n")      # negative indices
    v, fc = meshes.load_obj(p)
    assert v.shape == (4, 3)
    assert fc.shape == (3, 3)
    np.testing.assert_array_equal(fc[0], [0, 1, 2])
    np.testing.assert_array_equal(fc[1], [0, 2, 3])
    np.testing.assert_array_equal(fc[2], [0, 1, 2])
