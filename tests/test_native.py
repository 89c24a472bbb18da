"""Native C++ runtime (framelog / ring / PLY) vs pure-Python behavior."""

import os
import threading
import time

import numpy as np
import pytest

from azurekinect3dreconstruction_tpu.io import native
from azurekinect3dreconstruction_tpu.viz.savers import read_ply

pytestmark = pytest.mark.skipif(not native.is_available(),
                                reason="native toolchain unavailable")


def test_framelog_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    frames = [
        (rng.randint(0, 4000, (144, 160)).astype(np.uint16),
         rng.randint(0, 255, (144, 160, 3)).astype(np.uint8))
        for _ in range(5)
    ]
    path = str(tmp_path / "log.kinlog")
    with native.NativeFrameLogWriter(path) as w:
        for d, c in frames:
            w.write(d, c)
    assert w.count == 5
    r = native.NativeFrameLogReader(path)
    out = list(r)
    r.close()
    assert len(out) == 5
    for (d0, c0), (d1, c1) in zip(frames, out):
        np.testing.assert_array_equal(d0, d1)
        np.testing.assert_array_equal(c0, c1)


def test_framelog_smaller_than_npz(tmp_path):
    rng = np.random.RandomState(1)
    # realistic depth: smooth surface + invalid zeros (compresses well)
    v, u = np.mgrid[0:288, 0:320]
    depth = (1500 + 0.5 * u + 0.3 * v + rng.randint(0, 3, (288, 320))).astype(np.uint16)
    depth[:40] = 0
    color = np.clip(rng.randint(0, 30, (288, 320, 3)).cumsum(1) % 255, 0, 255).astype(np.uint8)
    klog = str(tmp_path / "a.kinlog")
    with native.NativeFrameLogWriter(klog) as w:
        for _ in range(10):
            w.write(depth, color)
    npz_total = 0
    for i in range(10):
        p = str(tmp_path / f"frame_{i:06d}.npz")
        np.savez(p, color=color, depth=depth)
        npz_total += os.path.getsize(p)
    assert os.path.getsize(klog) < npz_total


def test_ring_latest_wins_threaded():
    slot = np.zeros((100,), np.float32)
    ring = native.NativeFrameRing(capacity=4, slot_bytes=slot.nbytes)
    stop = threading.Event()
    pushed = {"n": 0}

    def producer():
        i = 0
        while not stop.is_set():
            buf = np.full((100,), i, np.float32)
            ring.push(buf)
            pushed["n"] = i
            i += 1
    t = threading.Thread(target=producer, daemon=True)
    t.start()
    time.sleep(0.05)
    out = np.zeros((100,), np.float32)
    got = []
    for _ in range(50):
        if ring.pop_latest(out):
            got.append(int(out[0]))
        time.sleep(0.001)
    stop.set()
    t.join()
    ring.destroy()
    assert len(got) > 5
    assert got == sorted(got), "consumer must see monotonically newer frames"
    assert got[-1] > got[0]


def test_ring_never_tears_under_overwrite_pressure():
    """The producer laps the ring constantly (tiny capacity, no throttling);
    every popped frame must still be internally consistent — all lanes carry
    the same frame id (the per-slot seqlock's whole job)."""
    slot = np.zeros((256,), np.float32)
    ring = native.NativeFrameRing(capacity=2, slot_bytes=slot.nbytes)
    stop = threading.Event()

    def producer():
        i = 0
        buf = np.empty((256,), np.float32)
        while not stop.is_set():
            buf[:] = i
            ring.push(buf)
            i += 1
    t = threading.Thread(target=producer, daemon=True)
    t.start()
    out = np.zeros((256,), np.float32)
    pops = 0
    deadline = time.time() + 2.0
    while time.time() < deadline:
        if ring.pop_latest(out):
            pops += 1
            assert (out == out[0]).all(), f"torn frame at pop {pops}: " \
                f"{np.unique(out)[:4]}..."
    stop.set()
    t.join()
    assert ring.dropped > 0, "test must actually exercise overwrite"
    ring.destroy()
    assert pops > 100


def test_native_ply_points_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (500, 3)).astype(np.float32)
    nrm = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    path = str(tmp_path / "pts.ply")
    assert native.write_ply_points_native(path, pts, cols, nrm)
    v, c, _ = read_ply(path)
    np.testing.assert_allclose(v, pts, atol=1e-6)
    np.testing.assert_allclose(c, cols, atol=1.0 / 255)


def test_native_ply_mesh_roundtrip(tmp_path):
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    path = str(tmp_path / "mesh.ply")
    assert native.write_ply_mesh_native(path, pts, tris)
    v, _, f = read_ply(path)
    np.testing.assert_allclose(v, pts)
    np.testing.assert_array_equal(f, tris)
