"""ctypes bindings for the native host runtime (native/kinrt.cpp).

Provides the C++ framelog (compressed RGB-D record/replay), the lock-free
SPSC frame ring, and fast binary PLY writers. The library auto-builds from
source on first use when a toolchain is available; every consumer has a
pure-Python fallback (io.replay npz logs, io.streams queues, viz.savers), so
the framework never hard-requires the extension.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

from azurekinect3dreconstruction_tpu.utils.telemetry import log_info, log_warning

_LIB = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_native_dir(), "libkinrt.so")
    src = os.path.join(_native_dir(), "kinrt.cpp")
    # rebuild when missing OR stale (a prebuilt .so from another arch/glibc
    # or older than the source must never be silently loaded)
    stale = (not os.path.exists(so)
             or (os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(so)))
    if stale:
        try:
            subprocess.run(["make", "-C", _native_dir()], check=True,
                           capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError) as e:
            log_warning(f"native runtime unavailable (build failed: {e}); "
                        "using pure-Python fallbacks")
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError as e:
        log_warning(f"native runtime unavailable ({e}); using fallbacks")
        return None

    lib.framelog_open_write.restype = ctypes.c_void_p
    lib.framelog_open_write.argtypes = [ctypes.c_char_p]
    lib.framelog_write.restype = ctypes.c_int
    lib.framelog_write.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_uint32, ctypes.c_uint32,
                                   ctypes.c_void_p, ctypes.c_uint32,
                                   ctypes.c_uint32, ctypes.c_uint32]
    lib.framelog_close_write.argtypes = [ctypes.c_void_p]
    lib.framelog_open_read.restype = ctypes.c_void_p
    lib.framelog_open_read.argtypes = [ctypes.c_char_p]
    lib.framelog_next_header.restype = ctypes.c_int
    lib.framelog_next_header.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.framelog_read.restype = ctypes.c_int
    lib.framelog_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.framelog_close_read.argtypes = [ctypes.c_void_p]
    lib.ring_create.restype = ctypes.c_void_p
    lib.ring_create.argtypes = [ctypes.c_uint32, ctypes.c_uint64]
    lib.ring_push.restype = ctypes.c_int
    lib.ring_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.ring_pop_latest.restype = ctypes.c_int
    lib.ring_pop_latest.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.ring_dropped.restype = ctypes.c_uint64
    lib.ring_dropped.argtypes = [ctypes.c_void_p]
    lib.ring_destroy.argtypes = [ctypes.c_void_p]
    lib.ply_write_points.restype = ctypes.c_int
    lib.ply_write_points.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                     ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_uint64]
    lib.ply_write_mesh.restype = ctypes.c_int
    lib.ply_write_mesh.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                   ctypes.c_void_p, ctypes.c_uint64,
                                   ctypes.c_void_p, ctypes.c_uint64]
    _LIB = lib
    return lib


def is_available() -> bool:
    return _load() is not None


class NativeFrameLogWriter:
    """Compressed binary frame log (.kinlog)."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = lib.framelog_open_write(path.encode())
        if not self._h:
            raise IOError(f"cannot open {path}")
        self.count = 0

    def write(self, depth: np.ndarray, color: np.ndarray) -> None:
        d = np.ascontiguousarray(depth, np.uint16)
        c = np.ascontiguousarray(color, np.uint8)
        cc = 1 if c.ndim == 2 else c.shape[2]
        rc = self._lib.framelog_write(
            self._h, d.ctypes.data, d.shape[1], d.shape[0],
            c.ctypes.data, c.shape[1], c.shape[0], cc)
        if rc != 0:
            raise IOError(f"framelog_write failed ({rc})")
        self.count += 1

    def close(self) -> None:
        if self._h:
            self._lib.framelog_close_write(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class NativeFrameLogReader:
    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = lib.framelog_open_read(path.encode())
        if not self._h:
            raise IOError(f"cannot open {path} (missing or bad magic)")

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        dims = np.zeros(5, np.uint32)
        while True:
            rc = self._lib.framelog_next_header(self._h, dims.ctypes.data)
            if rc == 1:
                return
            if rc != 0:
                raise IOError(f"framelog_next_header failed ({rc})")
            dw, dh, cw, ch, cc = (int(x) for x in dims)
            depth = np.empty((dh, dw), np.uint16)
            color = np.empty((ch, cw, cc) if cc > 1 else (ch, cw), np.uint8)
            rc = self._lib.framelog_read(self._h, depth.ctypes.data,
                                         color.ctypes.data)
            if rc == 1:
                return
            if rc != 0:
                raise IOError(f"framelog_read failed ({rc})")
            yield depth, color

    def close(self) -> None:
        if self._h:
            self._lib.framelog_close_read(self._h)
            self._h = None


class NativeFrameRing:
    """Lock-free SPSC latest-wins channel for fixed-size frame slots."""

    def __init__(self, capacity: int, slot_bytes: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self.slot_bytes = slot_bytes
        self._h = lib.ring_create(capacity, slot_bytes)
        if not self._h:
            raise MemoryError("ring_create failed")

    def push(self, arr: np.ndarray) -> None:
        a = np.ascontiguousarray(arr)
        assert a.nbytes == self.slot_bytes
        self._lib.ring_push(self._h, a.ctypes.data)

    def pop_latest(self, out: np.ndarray) -> bool:
        assert out.nbytes == self.slot_bytes and out.flags["C_CONTIGUOUS"]
        return bool(self._lib.ring_pop_latest(self._h, out.ctypes.data))

    @property
    def dropped(self) -> int:
        return int(self._lib.ring_dropped(self._h))

    def destroy(self) -> None:
        if self._h:
            self._lib.ring_destroy(self._h)
            self._h = None


def write_ply_points_native(path: str, points: np.ndarray,
                            colors: Optional[np.ndarray] = None,
                            normals: Optional[np.ndarray] = None) -> bool:
    lib = _load()
    if lib is None:
        return False
    xyz = np.ascontiguousarray(points, np.float32)
    rgb = None
    if colors is not None:
        rgb = np.ascontiguousarray(
            np.clip(np.asarray(colors) * 255.0, 0, 255), np.uint8)
    nrm = None if normals is None else np.ascontiguousarray(normals, np.float32)
    rc = lib.ply_write_points(
        path.encode(), xyz.ctypes.data,
        rgb.ctypes.data if rgb is not None else None,
        nrm.ctypes.data if nrm is not None else None, xyz.shape[0])
    return rc == 0


def write_ply_mesh_native(path: str, vertices: np.ndarray, triangles: np.ndarray,
                          colors: Optional[np.ndarray] = None) -> bool:
    lib = _load()
    if lib is None:
        return False
    v = np.ascontiguousarray(vertices, np.float32)
    t = np.ascontiguousarray(triangles, np.int32)
    rgb = None
    if colors is not None:
        rgb = np.ascontiguousarray(
            np.clip(np.asarray(colors) * 255.0, 0, 255), np.uint8)
    rc = lib.ply_write_mesh(path.encode(), v.ctypes.data,
                            rgb.ctypes.data if rgb is not None else None,
                            v.shape[0], t.ctypes.data, t.shape[0])
    return rc == 0
