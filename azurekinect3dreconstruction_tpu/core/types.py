"""Core data containers (registered JAX pytrees, fixed-capacity + masks).

XLA requires static shapes, so where Open3D geometry grows dynamically
(point clouds, meshes — e.g. reference CreateMesh.py:581-607 builds a fresh
``o3d.geometry.PointCloud`` per frame), our containers are fixed-capacity
arrays with validity masks. ``compact()`` gathers valid entries to the front
on host when a dense numpy view is needed (saving, viz).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RGBDFrame:
    """One registered RGB-D frame in the depth camera's geometry.

    depth: (H, W) float32 meters, 0 where invalid (matches depth_trunc
    masking the reference applies via RGBDImage.create_from_color_and_depth,
    CodeThatWorks/1camera-detectsSceneChanges.py:224-231).
    color: (H, W, 3) float32 in [0, 1], aligned to the depth image.
    intensity: (H, W) float32 grayscale (cached for odometry).
    """

    depth: jax.Array
    color: jax.Array
    intensity: jax.Array

    @staticmethod
    def from_raw(depth_raw, color, depth_scale: float = 1000.0, depth_trunc: float = 3.0,
                 depth_min: float = 0.1) -> "RGBDFrame":
        """Build from raw sensor arrays: u16 depth (native units) + u8 RGB.

        Scaling uses a precomputed f32 reciprocal MULTIPLY, not a division:
        inside jit XLA rewrites division-by-constant to reciprocal-multiply
        anyway (measured, 1-ulp difference), so the multiply is the only form
        that is bit-identical between this eager decode and its traced twin
        ``pipelines.mono_odometry_tsdf.decode_raw_frame``."""
        d = jnp.asarray(depth_raw).astype(jnp.float32) * np.float32(1.0 / depth_scale)
        d = jnp.where((d > depth_min) & (d < depth_trunc), d, 0.0)
        c_in = jnp.asarray(color)
        c = c_in.astype(jnp.float32)
        if c_in.dtype == jnp.uint8:  # dtype is metadata: no device sync
            c = c * np.float32(1.0 / 255.0)
            # luma via EXACT integer arithmetic (sums < 2^24, f32-exact) +
            # one f32 scale: float mul/add chains get FMA-contracted
            # differently inside vs outside jit (1-ulp divergence), integers
            # cannot — keeps this decode bit-identical to the traced twin
            ci = c_in.astype(jnp.int32)
            luma = (299 * ci[..., 0] + 587 * ci[..., 1] + 114 * ci[..., 2])
            intensity = luma.astype(jnp.float32) * np.float32(1.0 / 255000.0)
        else:
            # clip BEFORE the luma so out-of-range float input (e.g. [0,255]
            # handed in un-normalized) yields intensity consistent with the
            # stored clipped color instead of a silently mis-scaled
            # photometric signal
            c = jnp.clip(c, 0.0, 1.0)
            intensity = (0.299 * c[..., 0] + 0.587 * c[..., 1]
                         + 0.114 * c[..., 2])
        c = jnp.clip(c, 0.0, 1.0)
        return RGBDFrame(depth=d, color=c, intensity=intensity)

    @property
    def valid(self) -> jax.Array:
        return self.depth > 0.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PointCloud:
    """Fixed-capacity point cloud. points (N,3) f32; mask (N,) bool;
    colors/normals (N,3) f32 or None."""

    points: jax.Array
    mask: jax.Array
    colors: Optional[jax.Array] = None
    normals: Optional[jax.Array] = None

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    def count(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32))

    def compact(self) -> "PointCloudHost":
        """Host-side dense copy with invalid entries dropped."""
        m = np.asarray(self.mask).astype(bool)
        return PointCloudHost(
            points=np.asarray(self.points)[m],
            colors=None if self.colors is None else np.asarray(self.colors)[m],
            normals=None if self.normals is None else np.asarray(self.normals)[m],
        )

    @staticmethod
    def from_numpy(points, colors=None, normals=None, capacity: Optional[int] = None) -> "PointCloud":
        points = np.asarray(points, dtype=np.float32)
        n = points.shape[0]
        cap = capacity or n
        if cap < n:
            raise ValueError(f"capacity {cap} < point count {n}")

        def pad(a):
            if a is None:
                return None
            a = np.asarray(a, dtype=np.float32)
            out = np.zeros((cap, a.shape[1]), dtype=np.float32)
            out[:n] = a
            return jnp.asarray(out)

        mask = np.zeros((cap,), dtype=bool)
        mask[:n] = True
        return PointCloud(points=pad(points), mask=jnp.asarray(mask),
                          colors=pad(colors), normals=pad(normals))


@dataclasses.dataclass
class PointCloudHost:
    """Plain-numpy compacted cloud for IO/viz."""

    points: np.ndarray
    colors: Optional[np.ndarray] = None
    normals: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return int(self.points.shape[0])


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TriangleMesh:
    """Fixed-capacity triangle soup from marching cubes.

    vertices: (V, 3) f32; vertex_colors: (V, 3) f32; triangles: (T, 3) i32;
    num_vertices / num_triangles: scalar i32 live counts.
    """

    vertices: jax.Array
    triangles: jax.Array
    num_vertices: jax.Array
    num_triangles: jax.Array
    vertex_colors: Optional[jax.Array] = None
    vertex_normals: Optional[jax.Array] = None

    def compact(self) -> "TriangleMeshHost":
        nv = int(self.num_vertices)
        nt = int(self.num_triangles)
        return TriangleMeshHost(
            vertices=np.asarray(self.vertices)[:nv],
            triangles=np.asarray(self.triangles)[:nt],
            vertex_colors=None if self.vertex_colors is None else np.asarray(self.vertex_colors)[:nv],
            vertex_normals=None if self.vertex_normals is None else np.asarray(self.vertex_normals)[:nv],
        )


@dataclasses.dataclass
class TriangleMeshHost:
    vertices: np.ndarray
    triangles: np.ndarray
    vertex_colors: Optional[np.ndarray] = None
    vertex_normals: Optional[np.ndarray] = None

    def compact(self) -> "TriangleMeshHost":
        """Already compact — lets callers treat device ``TriangleMesh`` and
        host meshes uniformly (e.g. the streaming-volume extraction returns
        a host soup where the plain pipeline returns a padded device mesh)."""
        return self

    def compute_vertex_normals(self) -> "TriangleMeshHost":
        v, t = self.vertices, self.triangles
        fn = np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])
        vn = np.zeros_like(v)
        for k in range(3):
            np.add.at(vn, t[:, k], fn)
        norm = np.linalg.norm(vn, axis=1, keepdims=True)
        self.vertex_normals = vn / np.maximum(norm, 1e-12)
        return self
