"""Synthetic RGB-D scene renderer (analytic ray casting) — the hardware-free
test and benchmark backend.

The reference could only be exercised against a live Azure Kinect (its one
hardware-free runnable is the bundled Redwood odometry demo, reference
CodeThatWorks/RGBD_Odometry.py:9-35, plus npz replay at
CodeThatKindaWorks/Depth2PC.py:224-303). Here, synthetic scenes with
closed-form geometry give every pipeline a deterministic camera: depth images
come from exact ray-primitive intersections, so reconstructed surfaces can be
scored against analytic ground truth (mesh RMSE < 1 voxel per BASELINE.md).

Scenes are unions of spheres, axis-aligned boxes (as rooms: intersect from
inside) and planes, each with an albedo; rendering returns (depth, color)
matching the Azure Kinect raw formats (u16 mm depth, u8 RGB).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from azurekinect3dreconstruction_tpu.core.camera import Intrinsics, pixel_rays
from azurekinect3dreconstruction_tpu.core import se3

_BIG = 1e9


@dataclasses.dataclass(frozen=True)
class Sphere:
    center: Tuple[float, float, float]
    radius: float
    albedo: Tuple[float, float, float] = (0.8, 0.3, 0.2)


@dataclasses.dataclass(frozen=True)
class Plane:
    # point-normal form; visible from the normal side
    point: Tuple[float, float, float]
    normal: Tuple[float, float, float]
    albedo: Tuple[float, float, float] = (0.5, 0.5, 0.55)
    checker: float = 0.0  # if >0, checkerboard albedo with this period (meters)


@dataclasses.dataclass(frozen=True)
class Box:
    """Axis-aligned box viewed from OUTSIDE (slab-method entry hit)."""

    center: Tuple[float, float, float]
    half_extents: Tuple[float, float, float]
    albedo: Tuple[float, float, float] = (0.7, 0.6, 0.3)


@dataclasses.dataclass(frozen=True)
class Scene:
    spheres: Tuple[Sphere, ...] = ()
    planes: Tuple[Plane, ...] = ()
    boxes: Tuple[Box, ...] = ()

    @staticmethod
    def default() -> "Scene":
        """Sphere on a checkered floor inside a simple 'room' — enough visual
        and geometric texture for odometry, ICP and TSDF tests."""
        return Scene(
            spheres=(
                Sphere((0.0, 0.1, 1.2), 0.3, (0.85, 0.25, 0.2)),
                Sphere((-0.45, 0.25, 1.6), 0.2, (0.2, 0.55, 0.85)),
                Sphere((0.5, 0.3, 1.9), 0.25, (0.25, 0.8, 0.3)),
            ),
            planes=(
                Plane((0.0, 0.5, 0.0), (0.0, -1.0, 0.0), (0.6, 0.6, 0.6), checker=0.25),
                Plane((0.0, 0.0, 2.6), (0.0, 0.0, -1.0), (0.75, 0.7, 0.6), checker=0.4),
            ),
        )

    @staticmethod
    def cluttered() -> "Scene":
        """Boxes of distinct sizes among the default props: edges and
        corners make GEOMETRIC features (FPFH) informative — the default
        scene's spheres/planes are feature-degenerate by construction
        (every sphere point looks alike), which starves feature-based
        global registration no matter how good the matcher is. Use for
        FPFH/RANSAC-dependent tests (recorder fallback, relocalization,
        cloud accumulation)."""
        return Scene(
            spheres=(
                Sphere((0.45, 0.28, 1.75), 0.22, (0.25, 0.8, 0.3)),
            ),
            planes=(
                Plane((0.0, 0.5, 0.0), (0.0, -1.0, 0.0), (0.6, 0.6, 0.6), checker=0.25),
                Plane((0.0, 0.0, 2.6), (0.0, 0.0, -1.0), (0.75, 0.7, 0.6), checker=0.4),
            ),
            boxes=(
                Box((-0.05, 0.32, 1.25), (0.22, 0.18, 0.16), (0.85, 0.3, 0.2)),
                Box((-0.5, 0.38, 1.6), (0.1, 0.12, 0.3), (0.2, 0.5, 0.85)),
                Box((0.18, 0.44, 1.05), (0.09, 0.06, 0.07), (0.9, 0.75, 0.25)),
                Box((-0.28, 0.12, 1.85), (0.16, 0.38, 0.1), (0.55, 0.35, 0.75)),
            ),
        )


def _intersect_sphere(origin, dirs, sphere: Sphere):
    c = jnp.asarray(sphere.center, dtype=dirs.dtype)
    oc = origin - c
    b = jnp.sum(dirs * oc, axis=-1)
    cc = jnp.sum(oc * oc) - sphere.radius**2
    disc = b * b - cc * jnp.sum(dirs * dirs, axis=-1)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a2 = jnp.sum(dirs * dirs, axis=-1)
    t = (-b - sq) / a2
    t2 = (-b + sq) / a2
    t = jnp.where(t > 1e-4, t, t2)
    return jnp.where((disc > 0.0) & (t > 1e-4), t, _BIG)


def _intersect_box(origin, dirs, box: Box):
    """Slab-method entry intersection; returns (t, normal). The entry face
    is the slab whose tmin dominates; its outward normal opposes the ray's
    sign on that axis."""
    c = jnp.asarray(box.center, dtype=dirs.dtype)
    h = jnp.asarray(box.half_extents, dtype=dirs.dtype)
    safe = jnp.where(jnp.abs(dirs) > 1e-9, dirs, 1e-9)
    inv = 1.0 / safe
    t0 = (c - h - origin) * inv
    t1 = (c + h - origin) * inv
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    t_near = jnp.max(tmin, axis=-1)
    t_far = jnp.min(tmax, axis=-1)
    hit = (t_near <= t_far) & (t_near > 1e-4)
    axis = jnp.argmax(tmin, axis=-1)
    onehot = jax.nn.one_hot(axis, 3, dtype=dirs.dtype)
    sgn = jnp.sign(jnp.sum(onehot * safe, axis=-1, keepdims=True))
    n = -sgn * onehot
    return jnp.where(hit, t_near, _BIG), n


def _intersect_plane(origin, dirs, plane: Plane):
    n = jnp.asarray(plane.normal, dtype=dirs.dtype)
    p = jnp.asarray(plane.point, dtype=dirs.dtype)
    denom = jnp.sum(dirs * n, axis=-1)
    t = jnp.sum((p - origin) * n) / jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
    return jnp.where((jnp.abs(denom) > 1e-9) & (t > 1e-4), t, _BIG)


@partial(jax.jit, static_argnums=(0, 1))
def _render(scene: Scene, intr: Intrinsics, T_world_cam, max_depth):
    rays = pixel_rays(intr)  # (H, W, 2)
    dirs_cam = jnp.concatenate([rays, jnp.ones_like(rays[..., :1])], axis=-1)
    R = jnp.asarray(T_world_cam)[:3, :3]
    origin = jnp.asarray(T_world_cam)[:3, 3]
    dirs = dirs_cam @ R.T  # world-frame ray directions (z-scaled: |dz_cam|=1)

    best_t = jnp.full(dirs.shape[:2], _BIG, dtype=jnp.float32)
    albedo = jnp.zeros(dirs.shape[:2] + (3,), dtype=jnp.float32)
    normal = jnp.zeros_like(albedo)

    for s in scene.spheres:
        t = _intersect_sphere(origin, dirs, s)
        hit = t < best_t
        pt = origin + t[..., None] * dirs
        n = (pt - jnp.asarray(s.center)) / s.radius
        best_t = jnp.where(hit, t, best_t)
        albedo = jnp.where(hit[..., None], jnp.asarray(s.albedo), albedo)
        normal = jnp.where(hit[..., None], n, normal)

    for b in scene.boxes:
        t, n = _intersect_box(origin, dirs, b)
        hit = t < best_t
        best_t = jnp.where(hit, t, best_t)
        albedo = jnp.where(hit[..., None], jnp.asarray(b.albedo), albedo)
        normal = jnp.where(hit[..., None], n, normal)

    for p in scene.planes:
        t = _intersect_plane(origin, dirs, p)
        hit = t < best_t
        pt = origin + t[..., None] * dirs
        a = jnp.asarray(p.albedo) * jnp.ones_like(albedo)
        if p.checker > 0.0:
            n_np = np.asarray(p.normal, dtype=np.float64)
            u_ax = np.eye(3)[int(np.argmin(np.abs(n_np)))]
            u_ax = u_ax - n_np * (u_ax @ n_np)
            u_ax /= np.linalg.norm(u_ax)
            v_ax = np.cross(n_np, u_ax)
            uu = pt @ jnp.asarray(u_ax, dtype=jnp.float32)
            vv = pt @ jnp.asarray(v_ax, dtype=jnp.float32)
            par = (jnp.floor(uu / p.checker) + jnp.floor(vv / p.checker)) % 2.0
            a = a * (0.55 + 0.45 * par[..., None])
        best_t = jnp.where(hit, t, best_t)
        albedo = jnp.where(hit[..., None], a, albedo)
        normal = jnp.where(
            hit[..., None], jnp.asarray(p.normal) * jnp.ones_like(normal), normal
        )

    # Depth along camera z: dirs has unit camera-z, so z_cam = t.
    z = best_t
    valid = z < max_depth
    z = jnp.where(valid, z, 0.0)
    # Fixed-world-light lambertian shading: view-INdependent intensity, so
    # photometric odometry terms see a consistent scene across frames (real
    # diffuse surfaces behave this way; a headlight model would bias them).
    light = jnp.asarray([0.35, -0.6, -0.72], dtype=jnp.float32)
    light = light / jnp.linalg.norm(light)
    lam = jnp.clip(jnp.abs(jnp.sum(normal * light, axis=-1)), 0.0, 1.0)
    color = jnp.clip(albedo * (0.25 + 0.75 * lam[..., None]), 0.0, 1.0)
    color = jnp.where(valid[..., None], color, 0.0)
    return z, color


class SyntheticCamera:
    """Renders the scene from arbitrary poses; mimics a k4a device's raw output.

    ``capture(T_world_cam)`` returns (depth_u16_mm, color_u8_rgb) like pyk4a's
    ``capture.transformed_depth`` / ``capture.color`` pair after BGRA->RGB
    (reference CodeThatWorks/bundlefusionattemps/bundlefusion_reconstruction.py:67-101).
    """

    def __init__(self, scene: Optional[Scene] = None,
                 intrinsics: Optional[Intrinsics] = None, max_depth: float = 5.0,
                 depth_noise: float = 0.0, seed: int = 0):
        self.scene = scene or Scene.default()
        self.intrinsics = intrinsics or Intrinsics.azure_kinect_depth_nfov()
        self.max_depth = max_depth
        self.depth_noise = depth_noise
        self._key = jax.random.PRNGKey(seed)

    def render(self, T_world_cam=None):
        """Float render: (depth_m f32 (H,W), color f32 (H,W,3))."""
        T = np.eye(4, dtype=np.float32) if T_world_cam is None else np.asarray(
            T_world_cam, dtype=np.float32)
        z, color = _render(self.scene, self.intrinsics, T, self.max_depth)
        if self.depth_noise > 0.0:
            self._key, sub = jax.random.split(self._key)
            z = jnp.where(
                z > 0, z + self.depth_noise * jax.random.normal(sub, z.shape) * z, 0.0
            )
        return z, color

    def capture(self, T_world_cam=None):
        """Raw-format render: (u16 depth in mm, u8 RGB)."""
        z, color = self.render(T_world_cam)
        depth_mm = np.asarray(jnp.round(z * 1000.0)).astype(np.uint16)
        rgb = np.asarray(jnp.round(color * 255.0)).astype(np.uint8)
        return depth_mm, rgb


def orbit_trajectory(n: int, radius: float = 0.4, center=(0.0, 0.1, 1.4),
                     angle_span: float = 0.8, height_wobble: float = 0.05):
    """Camera poses orbiting + looking at ``center`` — a plausible handheld scan.

    Returns a list of 4x4 float64 camera-to-world matrices.
    """
    center = np.asarray(center, dtype=np.float64)
    poses = []
    for i in range(n):
        a = (i / max(n - 1, 1) - 0.5) * angle_span
        eye = center + np.array(
            [radius * np.sin(a), height_wobble * np.sin(2.5 * a) - 0.05,
             -radius * np.cos(a) - 0.9]
        )
        z_axis = center - eye
        z_axis = z_axis / np.linalg.norm(z_axis)
        up = np.array([0.0, -1.0, 0.0])
        x_axis = np.cross(up, z_axis)
        x_axis /= np.linalg.norm(x_axis)
        y_axis = np.cross(z_axis, x_axis)
        T = np.eye(4)
        T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = x_axis, y_axis, z_axis, eye
        poses.append(T)
    return poses


def small_motion(i: int, scale: float = 1.0):
    """A small SE(3) perturbation for frame-to-frame odometry tests."""
    rng = np.random.RandomState(100 + i)
    xi = np.concatenate([
        rng.uniform(-0.01, 0.01, 3) * scale,
        rng.uniform(-0.01, 0.01, 3) * scale,
    ])
    return np.asarray(se3.se3_exp(jnp.asarray(xi, dtype=jnp.float64)))
