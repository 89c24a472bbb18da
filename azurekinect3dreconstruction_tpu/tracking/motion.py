"""Constant-velocity motion prediction for tracking seeds.

Replaces the reference's trajectory extrapolation
(GoodColorReconstruction.py:238-244: predict next pose from the last two
trajectory entries and seed colored-ICP with it).

Prediction happens in the SE(3) tangent space: given world-from-camera poses
T[k-1], T[k], the relative motion is M = T[k-1]^-1 @ T[k] and the prediction
is T[k] @ exp(damp * log(M)) — damping < 1 keeps seeds conservative.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from azurekinect3dreconstruction_tpu.core import se3


class MotionModel:
    """Tiny host-side helper tracking the recent trajectory."""

    def __init__(self, damping: float = 0.9, max_history: int = 100):
        self.damping = damping
        self.poses: List[np.ndarray] = []
        self.max_history = max_history

    def update(self, T_world_cam) -> None:
        self.poses.append(np.asarray(T_world_cam, np.float64))
        if len(self.poses) > self.max_history:
            self.poses.pop(0)

    def predict(self) -> np.ndarray:
        """Predicted next world-from-camera pose (identity-motion fallback)."""
        if len(self.poses) == 0:
            return np.eye(4)
        if len(self.poses) == 1:
            return self.poses[-1].copy()
        M = np.linalg.inv(self.poses[-2]) @ self.poses[-1]
        xi = np.asarray(se3.se3_log(jnp.asarray(M, jnp.float32)), np.float64)
        step = np.asarray(se3.se3_exp(jnp.asarray(xi * self.damping, jnp.float32)),
                          np.float64)
        return self.poses[-1] @ step

    def predict_relative(self) -> np.ndarray:
        """Predicted frame-to-frame motion (target<-source seed for odometry)."""
        if len(self.poses) < 2:
            return np.eye(4)
        M = np.linalg.inv(self.poses[-2]) @ self.poses[-1]
        xi = np.asarray(se3.se3_log(jnp.asarray(M, jnp.float32)), np.float64)
        return np.asarray(
            se3.se3_exp(jnp.asarray(xi * self.damping, jnp.float32)), np.float64
        )

    def reset(self) -> None:
        self.poses.clear()
