"""Rig extrinsics persistence: JSON with serial validation + newest autoload.

Parity: reference InitialReconstruction-CUDA-2cam:542-623 — calibration JSON
written per rig with the device serials, loading validates the serials still
match and auto-picks the newest file in the calibration directory.
"""

from __future__ import annotations

import datetime
import glob
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from azurekinect3dreconstruction_tpu.utils.telemetry import log_info, log_warning


class RigCalibration:
    """extrinsics[i] = 4x4 mapping camera-i coords into camera-0 (rig) coords."""

    def __init__(self, serials: Sequence[str], extrinsics: Sequence[np.ndarray],
                 meta: Optional[Dict] = None):
        assert len(serials) == len(extrinsics)
        self.serials = list(serials)
        self.extrinsics = [np.asarray(e, np.float64) for e in extrinsics]
        self.meta = meta or {}

    def to_json(self) -> str:
        return json.dumps({
            "serials": self.serials,
            "extrinsics": [e.tolist() for e in self.extrinsics],
            "created": datetime.datetime.now().isoformat(),
            "meta": self.meta,
        }, indent=2)

    def save(self, directory: str = "calibration") -> str:
        os.makedirs(directory, exist_ok=True)
        ts = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        path = os.path.join(directory, f"rig_calibration_{ts}.json")
        with open(path, "w") as f:
            f.write(self.to_json())
        log_info(f"saved rig calibration -> {path}")
        return path

    @staticmethod
    def from_json(s: str) -> "RigCalibration":
        d = json.loads(s)
        return RigCalibration(d["serials"], [np.asarray(e) for e in d["extrinsics"]],
                              d.get("meta"))

    @staticmethod
    def load_newest(directory: str = "calibration",
                    expected_serials: Optional[Sequence[str]] = None
                    ) -> Optional["RigCalibration"]:
        """Newest calibration file whose serials match the attached rig
        (reference newest-file autoload + serial validation :542-623)."""
        files = sorted(glob.glob(os.path.join(directory, "rig_calibration_*.json")),
                       key=os.path.getmtime, reverse=True)
        for path in files:
            try:
                with open(path) as f:
                    cal = RigCalibration.from_json(f.read())
            except (json.JSONDecodeError, KeyError) as e:
                log_warning(f"skipping unreadable calibration {path}: {e}")
                continue
            if expected_serials is not None and list(expected_serials) != cal.serials:
                log_warning(f"calibration {os.path.basename(path)} is for a "
                            f"different rig (serials {cal.serials}); skipping")
                continue
            log_info(f"loaded rig calibration {os.path.basename(path)}")
            return cal
        return None
