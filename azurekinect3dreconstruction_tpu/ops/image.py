"""Image-space ops: color conversion, flips, pyramids, gradients.

Replaces the reference's OpenCV calls — ``cv2.cvtColor(BGRA->RGB)`` and
``cv2.flip`` (reference CodeThatWorks/GoodColorReconstruction.py:127-128,
bundlefusionattemps/bundlefusion_reconstruction.py:67-101) — with trivially
fusable jnp ops, plus the Gaussian pyramid / Scharr gradients the RGB-D
odometry needs (Open3D builds these inside compute_rgbd_odometry; here they
are explicit and jit-compiled once per resolution).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


def bgra_to_rgb(img):
    """uint8 BGRA (H, W, 4) -> float32 RGB in [0, 1]."""
    img = jnp.asarray(img)
    return img[..., 2::-1].astype(jnp.float32) / 255.0


def flip_ud(img):
    """Vertical flip — the reference's cv2.flip(-1)/flip transform family."""
    return jnp.asarray(img)[::-1]


def rgb_to_intensity(rgb):
    rgb = jnp.asarray(rgb)
    return 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]


# 5-tap binomial (1 4 6 4 1)/16 as a 2D conv weight, built once. Conv form:
# a strided conv is ONE native op on the TPU conv unit, where the older
# shifted-slice + [::2, ::2] chain compiled to many pad/concat/strided-slice
# kernels (the measured 6+ ms of per-frame odometry "glue").
# NUMPY constants on purpose: a module-level jnp array would initialize the
# JAX backend at import time, before scripts' --cpu override can run.
import numpy as _np

_BINOMIAL5 = _np.outer([1.0, 4.0, 6.0, 4.0, 1.0],
                       [1.0, 4.0, 6.0, 4.0, 1.0]) / 256.0
_K_BLUR = _BINOMIAL5.reshape(5, 5, 1, 1).astype(_np.float32)
# Sobel/8 x- and y-gradients as a single 2-output-channel 3x3 conv
_SOBEL_X = _np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]]) / 8.0
_SOBEL_Y = _SOBEL_X.T
_K_SOBEL = _np.stack([_SOBEL_X, _SOBEL_Y],
                     axis=-1).reshape(3, 3, 1, 2).astype(_np.float32)

_DIMS = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                       ("NHWC", "HWIO", "NHWC"))


def _conv2d(img, kernel, stride: int = 1):
    """Edge-clamped 2D conv of a (H, W) image; kernel (kh, kw, 1, C)."""
    kh = kernel.shape[0]
    p = kh // 2
    x = jnp.pad(img, ((p, p), (p, p)), mode="edge")
    out = jax.lax.conv_general_dilated(
        x[None, :, :, None], kernel, (stride, stride), "VALID",
        dimension_numbers=_DIMS,
        # full-f32 accumulation: DEFAULT would run the MXU at bf16 inputs on
        # TPU, injecting ~1e-2 m error into depth gradients that feed the
        # GN odometry jacobians (the slice form this replaced was exact f32)
        precision=jax.lax.Precision.HIGHEST)
    return out[0]


def _gauss_blur(img):
    """5-tap binomial blur (1 4 6 4 1)/16 in both axes, edge-clamped."""
    if img.ndim != 2:  # color stacks: blur channels independently
        return jnp.stack([_gauss_blur(img[..., c])
                          for c in range(img.shape[-1])], axis=-1)
    return _conv2d(jnp.asarray(img), _K_BLUR)[..., 0]


def downsample2(img):
    """Blur + 2x decimation (intensity images) — one strided conv."""
    return _conv2d(jnp.asarray(img), _K_BLUR, stride=2)[..., 0]


def downsample2_depth(depth):
    """Depth-aware 2x decimation: plain subsampling (no blending across
    depth discontinuities — blurring depth invents phantom surfaces)."""
    d = jnp.asarray(depth)
    h, w = d.shape
    if h % 2 or w % 2:  # odd extents: keep the strided form (trace-time branch)
        return d[::2, ::2]
    # even extents (every sensor mode): reshape + unit-stride slice instead of
    # a 2-strided gather — the reshape is a free layout change on TPU
    return d.reshape(h // 2, 2, w // 2, 2)[:, 0, :, 0]


def build_pyramid(intensity, depth, levels: int) -> List[Tuple[jax.Array, jax.Array]]:
    """[(intensity, depth)] from finest (level 0) to coarsest."""
    out = [(intensity, depth)]
    for _ in range(levels - 1):
        intensity = downsample2(intensity)
        depth = downsample2_depth(depth)
        out.append((intensity, depth))
    return out


def sobel_gradients(img):
    """(dI/du, dI/dv) with Sobel/8 (matches Open3D's odometry gradient scale).

    Edge pixels are zero (gradient undefined there); invalid regions are the
    caller's concern via masks.
    """
    g = _conv2d(jnp.asarray(img), _K_SOBEL)
    return g[..., 0], g[..., 1]


def depth_gradient_colors(depth, near=0.5, far=3.0, mode: str = "turbo"):
    """Depth -> RGB gradient coloring, the reference's depth-visualization
    modes (apply_depth_colors, reference CreateMesh.py:685-721; cv2 JET/TURBO
    colormaps at azure-kinect-DK/Reconstruction/3Dreconstruction.py:178-215).
    """
    d = jnp.asarray(depth)
    t = jnp.clip((d - near) / (far - near), 0.0, 1.0)
    if mode == "gray":
        return jnp.stack([1.0 - t] * 3, axis=-1)
    # compact turbo-like ramp: blue -> cyan -> green -> yellow -> red
    r = jnp.clip(1.5 - jnp.abs(4.0 * t - 3.0), 0.0, 1.0)
    g = jnp.clip(1.5 - jnp.abs(4.0 * t - 2.0), 0.0, 1.0)
    b = jnp.clip(1.5 - jnp.abs(4.0 * t - 1.0), 0.0, 1.0)
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.where((d > 0)[..., None], rgb, 0.0)
