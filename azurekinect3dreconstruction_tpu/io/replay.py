"""Recorded-frame (.npz) record & replay — the first-class headless backend.

Format-compatible with the reference's frame logs:
``np.savez(path, color=..., depth=...)`` under ``frames/frame_%06d.npz``
(reference CodeThatWorks/bundlefusionattemps/bundlefusion_reconstruction.py:219-220,
CodeThatKindaWorks/Depth2PC.py:190-192) and the richer per-frame dumps of
CodeThatKindaWorks/capture_frames.py:67-71. Replay is the de-facto fixture
mechanism of the reference (Depth2PC.py:224-303); here it is a proper
FrameSource so every pipeline runs identically from disk or live capture.
"""

from __future__ import annotations

import os
import re
from typing import Iterator, List, Optional, Tuple

import numpy as np

from azurekinect3dreconstruction_tpu.core.camera import CameraCalibration

_FRAME_RE = re.compile(r"frame_(\d+)\.npz$")


class FrameSource:
    """Interface: iterate (depth_u16, color_u8) raw frames + calibration."""

    calibration: Optional[CameraCalibration] = None

    def frames(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        raise NotImplementedError

    def __iter__(self):
        return self.frames()


class NpzReplaySource(FrameSource):
    """Replays a directory of frame_%06d.npz dumps (sorted by index)."""

    def __init__(self, directory: str, calibration: Optional[CameraCalibration] = None,
                 limit: Optional[int] = None):
        self.directory = directory
        self.calibration = calibration
        names: List[Tuple[int, str]] = []
        for f in os.listdir(directory):
            m = _FRAME_RE.search(f)
            if m:
                names.append((int(m.group(1)), f))
        names.sort()
        self._files = [os.path.join(directory, f) for _, f in names]
        if limit is not None:
            self._files = self._files[:limit]
        calib_path = os.path.join(directory, "calibration.json")
        if calibration is None and os.path.exists(calib_path):
            with open(calib_path) as fh:
                self.calibration = CameraCalibration.from_json(fh.read())

    def __len__(self) -> int:
        return len(self._files)

    def frames(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        for path in self._files:
            with np.load(path) as data:
                depth = np.asarray(data["depth"])
                color = np.asarray(data["color"])
            if color.ndim == 3 and color.shape[2] == 4:  # BGRA from raw k4a capture
                color = color[..., 2::-1]  # BGRA -> RGB, alpha dropped
            yield depth, color


class FrameRecorder:
    """Writes the reference-compatible npz frame log (+ optional calibration).

    The frame log *is* the checkpoint: the offline bundle pipeline re-reads it
    to reintegrate with optimized poses (reference
    bundlefusion_reconstruction.py:307-315).
    """

    def __init__(self, directory: str, calibration: Optional[CameraCalibration] = None):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        self.count = 0
        if calibration is not None:
            with open(os.path.join(directory, "calibration.json"), "w") as fh:
                fh.write(calibration.to_json())

    def write(self, depth: np.ndarray, color: np.ndarray, index: Optional[int] = None) -> str:
        i = self.count if index is None else index
        path = os.path.join(self.directory, f"frame_{i:06d}.npz")
        np.savez(path, color=np.asarray(color), depth=np.asarray(depth))
        self.count = max(self.count, i + 1)
        return path


class SyntheticSource(FrameSource):
    """Wraps :class:`..io.synthetic.SyntheticCamera` + a pose trajectory."""

    def __init__(self, camera, poses):
        self.camera = camera
        self.poses = list(poses)
        from azurekinect3dreconstruction_tpu.core.camera import CameraCalibration, Intrinsics

        self.calibration = CameraCalibration(
            depth=camera.intrinsics, color=camera.intrinsics, serial="synthetic"
        )

    def __len__(self):
        return len(self.poses)

    def frames(self):
        for T in self.poses:
            yield self.camera.capture(T)

    def frames_with_poses(self):
        for T in self.poses:
            d, c = self.camera.capture(T)
            yield d, c, T
