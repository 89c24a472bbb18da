"""HTML/WebGL viewer export (viz/html_export.py): file structure, data
embedding, and the decimation path. Browser-side rendering is verified
manually (the page exposes ``window.__frames`` as a liveness hook); these
tests pin everything that can break from Python."""

import base64
import json
import re

import numpy as np
import pytest

from azurekinect3dreconstruction_tpu.core.types import (
    PointCloudHost,
    TriangleMeshHost,
)
from azurekinect3dreconstruction_tpu.viz.html_export import save_html_viewer


@pytest.fixture()
def quad_mesh():
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    cols = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]], np.float32)
    return TriangleMeshHost(vertices=verts, triangles=tris, vertex_colors=cols)


def _extract(html, key):
    m = re.search(rf'{key}: "([A-Za-z0-9+/=]*)"', html)
    assert m, key
    return m.group(1)


def _meta(html):
    m = re.search(r"const META = (\{.*?\});", html)
    return json.loads(m.group(1))


def test_mesh_export_embeds_geometry(tmp_path, quad_mesh):
    out = save_html_viewer(str(tmp_path / "v.html"), quad_mesh, title="quad")
    html = open(out).read()
    meta = _meta(html)
    assert meta["n_vertices"] == 4 and meta["n_indices"] == 6
    assert meta["title"] == "quad"
    pos = np.frombuffer(base64.b64decode(_extract(html, "pos")), "<f4")
    np.testing.assert_array_equal(pos.reshape(4, 3), quad_mesh.vertices)
    idx = np.frombuffer(base64.b64decode(_extract(html, "idx")), "<u4")
    np.testing.assert_array_equal(idx.reshape(2, 3), quad_mesh.triangles)
    col = np.frombuffer(base64.b64decode(_extract(html, "col")), "u1")
    assert col.reshape(4, 3)[0].tolist() == [255, 0, 0]
    # normals were auto-computed for the flat quad: all +z
    nrm = np.frombuffer(base64.b64decode(_extract(html, "nrm")), "<f4")
    np.testing.assert_allclose(nrm.reshape(4, 3)[:, 2], 1.0, atol=1e-6)
    # self-contained: no external fetches of any kind
    assert "http://" not in html and "https://" not in html


def test_cloud_export(tmp_path, rng):
    pts = rng.rand(100, 3).astype(np.float32)
    out = save_html_viewer(str(tmp_path / "c.html"),
                           PointCloudHost(points=pts))
    html = open(out).read()
    meta = _meta(html)
    assert meta["n_vertices"] == 100 and meta["n_indices"] == 0
    assert _extract(html, "idx") == ""  # no faces -> points mode
    assert meta["radius"] > 0


def test_mesh_decimation_keeps_whole_triangles(tmp_path, rng):
    n = 400
    verts = rng.rand(n, 3).astype(np.float32)
    tris = rng.randint(0, n, size=(500, 3)).astype(np.int32)
    mesh = TriangleMeshHost(vertices=verts, triangles=tris)
    out = save_html_viewer(str(tmp_path / "d.html"), mesh, max_vertices=150)
    html = open(out).read()
    meta = _meta(html)
    assert meta["n_vertices"] <= 3 * 150  # strided faces, compacted verts
    idx = np.frombuffer(base64.b64decode(_extract(html, "idx")), "<u4")
    assert idx.size == meta["n_indices"] and idx.size % 3 == 0
    assert idx.max() < meta["n_vertices"]  # indices stay in range
    pos = np.frombuffer(base64.b64decode(_extract(html, "pos")), "<f4")
    assert pos.size == meta["n_vertices"] * 3


def test_read_obj_round_trip(tmp_path, quad_mesh):
    """read_obj/read_geometry load what write_obj_mesh wrote — the --html
    path must handle .obj results (DualCameraFusion saves meshes as OBJ)."""
    from azurekinect3dreconstruction_tpu.viz.savers import (
        read_geometry,
        write_obj_mesh,
    )

    p = str(tmp_path / "m.obj")
    write_obj_mesh(p, quad_mesh)
    v, c, f = read_geometry(p)
    np.testing.assert_allclose(v, quad_mesh.vertices, atol=1e-6)
    np.testing.assert_allclose(c, quad_mesh.vertex_colors, atol=1e-6)
    np.testing.assert_array_equal(f, quad_mesh.triangles)
    with pytest.raises(ValueError):
        read_geometry(str(tmp_path / "m.stl"))


def test_cloud_decimation(tmp_path, rng):
    pts = rng.rand(1000, 3).astype(np.float32)
    out = save_html_viewer(str(tmp_path / "s.html"),
                           PointCloudHost(points=pts), max_vertices=100)
    assert _meta(open(out).read())["n_vertices"] <= 500


def test_soup_export_is_indexless_mode2(tmp_path):
    """A triangle soup's index buffer carries zero information (~a third of
    the file after base64): the exporter must ship it as mode 2 with no
    idx payload, same as the live server's wire packer (shared
    soup_arrays)."""
    nt = 10
    verts = np.random.default_rng(0).random((3 * nt, 3)).astype(np.float32)
    soup = TriangleMeshHost(
        vertices=verts,
        triangles=np.arange(3 * nt, dtype=np.int32).reshape(-1, 3))
    out = save_html_viewer(str(tmp_path / "s.html"), soup)
    html = open(out).read()
    meta = _meta(html)
    assert meta["mode"] == 2
    assert meta["n_indices"] == 0
    assert _extract(html, "idx") == ""
    pos = np.frombuffer(base64.b64decode(_extract(html, "pos")), "<f4")
    np.testing.assert_array_equal(pos.reshape(-1, 3), verts)


def test_read_obj_negative_relative_indices(tmp_path):
    """OBJ negative refs are relative to the vertices parsed SO FAR (legal
    per spec, emitted by several exporters) — they must resolve against the
    running vertex count, not wrap from the end of the final array."""
    from azurekinect3dreconstruction_tpu.viz.savers import read_obj

    p = str(tmp_path / "rel.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\n"
                "f -3 -2 -1\n"        # first triangle: verts 0,1,2
                "v 2 0 0\n"
                "f -3 -2 -1\n")       # second: verts 1,2,3 (count is now 4)
    v, c, t = read_obj(p)
    assert v.shape == (4, 3)
    np.testing.assert_array_equal(t, [[0, 1, 2], [1, 2, 3]])
