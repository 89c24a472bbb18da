"""Live browser viewer (viz/live_server.py): HTTP endpoints, wire format,
revision/polling semantics, key forwarding, and the viewer-protocol adapter.
Browser-side rendering shares viz/webgl_core.py with the offline export and
is driven manually (window.__frames / window.__polls liveness hooks)."""

import json
import struct
import urllib.error
import urllib.request

import numpy as np
import pytest

from azurekinect3dreconstruction_tpu.core.types import (
    PointCloudHost,
    TriangleMeshHost,
)
from azurekinect3dreconstruction_tpu.viz.live_server import (
    MAGIC,
    BrowserLiveViewer,
    LiveViewerServer,
    pack_geometry,
)


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:  # urllib raises on 4xx; normalize
        return e.code, e.read()


@pytest.fixture()
def quad_mesh():
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    cols = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]], np.float32)
    return TriangleMeshHost(vertices=verts, triangles=tris, vertex_colors=cols)


def _parse(blob):
    hdr = struct.unpack_from("<8I", blob, 0)
    assert hdr[0] == MAGIC and hdr[1] == 1
    rev, mode, nv, ni, flags = hdr[2:7]
    center = struct.unpack_from("<3f", blob, 32)
    (radius,) = struct.unpack_from("<f", blob, 44)
    off = 48
    pos = np.frombuffer(blob, "<f4", 3 * nv, off).reshape(nv, 3)
    off += 12 * nv
    col = nrm = idx = None
    if flags & 1:
        col = np.frombuffer(blob, "u1", 3 * nv, off).reshape(nv, 3)
        off += (3 * nv + 3) & ~3
    if flags & 2:
        nrm = np.frombuffer(blob, "<f4", 3 * nv, off).reshape(nv, 3)
        off += 12 * nv
    if mode == 1 and ni:
        idx = np.frombuffer(blob, "<u4", ni, off)
        off += 4 * ni
    assert off == len(blob)  # no trailing garbage; offsets exactly consumed
    return dict(rev=rev, mode=mode, nv=nv, ni=ni, center=center,
                radius=radius, pos=pos, col=col, nrm=nrm, idx=idx)


def test_pack_indexed_mesh_roundtrip(quad_mesh):
    g = _parse(pack_geometry(quad_mesh, rev=7))
    assert g["rev"] == 7 and g["mode"] == 1
    assert g["nv"] == 4 and g["ni"] == 6
    np.testing.assert_array_equal(g["pos"], quad_mesh.vertices)
    np.testing.assert_array_equal(g["idx"].reshape(2, 3), quad_mesh.triangles)
    assert g["col"][0].tolist() == [255, 0, 0]
    assert g["nrm"] is not None  # auto-computed for the indexed mesh


def test_pack_cloud_and_soup(rng):
    pts = rng.rand(50, 3).astype(np.float32)
    g = _parse(pack_geometry(PointCloudHost(points=pts), rev=1))
    assert g["mode"] == 0 and g["nv"] == 50 and g["ni"] == 0
    np.testing.assert_array_equal(g["pos"], pts)

    # triangle soup (arange indices): sent WITHOUT an index buffer
    sv = rng.rand(12 * 3, 3).astype(np.float32)
    soup = TriangleMeshHost(
        vertices=sv, triangles=np.arange(36, dtype=np.int32).reshape(-1, 3),
        vertex_colors=np.zeros((36, 3), np.float32))
    g = _parse(pack_geometry(soup, rev=2))
    assert g["mode"] == 2 and g["nv"] == 36 and g["ni"] == 0
    np.testing.assert_array_equal(g["pos"], sv)


def test_pack_soup_decimation_keeps_triangles(rng):
    sv = rng.rand(300, 3).astype(np.float32)
    soup = TriangleMeshHost(
        vertices=sv, triangles=np.arange(300, dtype=np.int32).reshape(-1, 3))
    g = _parse(pack_geometry(soup, rev=1, max_vertices=100))
    assert g["mode"] == 2 and g["nv"] % 3 == 0 and g["nv"] <= 150
    np.testing.assert_array_equal(g["pos"][:3], sv[:3])  # whole first tri


def test_server_endpoints_and_revisions(quad_mesh):
    srv = LiveViewerServer(title="t")
    try:
        status, page = _get(srv.url)
        assert status == 200 and b"makeViewer" in page and b"t" in page

        _, body = _get(srv.url + "meta.json")
        meta = json.loads(body)
        assert meta["objects"] == {} and meta["title"] == "t"

        srv.update("surface", quad_mesh)
        srv.set_status("frame 3 | 31.0 fps")
        _, body = _get(srv.url + "meta.json")
        meta = json.loads(body)
        assert meta["objects"]["surface"]["n_vertices"] == 4
        assert meta["status"] == "frame 3 | 31.0 fps"
        rev0 = meta["objects"]["surface"]["rev"]

        _, blob = _get(srv.url + "geometry.bin?name=surface")
        g = _parse(blob)
        assert g["rev"] == rev0
        np.testing.assert_array_equal(g["pos"], quad_mesh.vertices)

        srv.update("surface", quad_mesh)  # rev must bump on re-update
        _, body = _get(srv.url + "meta.json")
        assert json.loads(body)["objects"]["surface"]["rev"] > rev0

        status, _ = _get(srv.url + "geometry.bin?name=nope")
        assert status == 404

        # /snapshot.ply: download the current geometry as binary PLY (the
        # reference's abandoned web-API intent — empty FastAPI placeholder)
        status, ply = _get(srv.url + "snapshot.ply?name=surface")
        assert status == 200 and ply.startswith(b"ply")
        assert b"element vertex 4" in ply and b"element face 2" in ply
        status, _ = _get(srv.url + "snapshot.ply?name=nope")
        assert status == 404
    finally:
        srv.close()


def test_browser_viewer_adapter_key_dispatch(quad_mesh):
    v = BrowserLiveViewer(window_name="adapter")
    try:
        hits = []
        v.register_key("C", lambda: hits.append("reset"), "reset volume")
        v.register_key("S", lambda: hits.append("save"), "save")
        v.update_mesh("surface", quad_mesh)
        v.update_cloud("traj", PointCloudHost(
            points=np.zeros((3, 3), np.float32)))

        _, body = _get(v.server.url + "meta.json")
        meta = json.loads(body)
        assert set(meta["objects"]) == {"surface", "traj"}
        assert meta["keys"] == {"c": "reset volume", "s": "save"}

        # the page forwards keys via /key; tick() drains them on our thread
        _get(v.server.url + "key?c=c")
        _get(v.server.url + "key?c=s")
        _get(v.server.url + "key?c=x")  # unregistered: ignored
        assert v.tick() is True
        assert hits == ["reset", "save"]

        v.remove("traj")
        _, body = _get(v.server.url + "meta.json")
        assert set(json.loads(body)["objects"]) == {"surface"}
        assert not v.headless
    finally:
        v.close()
    assert v.tick() is False  # closed viewer ends the loop
