"""In-graph image resizing as precomputed-matrix matmuls (MXU-friendly).

The reference does several in-graph resizes with ``torch.nn.functional
.interpolate``:
  * ``parse_crnn_data`` / ``parse_moran_data``: bicubic to 32x100
    (interfaces/base.py:806-829, 608-632)
  * ``parse_aster_data``: bicubic to 32x128 (interfaces/base.py:844-864)
  * text-prior upsampling: bilinear align_corners=True to the LR feature size
    (model/tsrn.py:196, srcnn.py:96, srresnet.py:152, rdn.py:195, vdsr.py:205)
  * bicubic baseline model: align_corners=True x2 (model/bicubic.py:6-13)

On TPU, a separable resize is two small dense matmuls (out = R_h @ img @ R_w^T)
— exact, differentiable, and it keeps the op on the MXU instead of emitting
gathers.  Matrices are built host-side from static shapes and baked into the
jit graph as constants.

The weight formulas replicate torch's upsampling kernels exactly:
cubic convolution with a=-0.75, index clamping at borders, and the
half-pixel (align_corners=False) or endpoint (align_corners=True) mapping.
A PIL-convention builder (a=-0.5, antialias on downscale, weight
normalization) is also provided for dataset-equivalent resizes in-graph.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_weights_torch(t: np.ndarray) -> np.ndarray:
    """4-tap cubic convolution weights, torch convention (A=-0.75).

    t is the fractional offset in [0,1); returns weights for taps at
    floor(x)-1, floor(x), floor(x)+1, floor(x)+2.
    """
    A = -0.75

    def k1(x):  # |x| <= 1
        return ((A + 2) * x - (A + 3)) * x * x + 1

    def k2(x):  # 1 < |x| < 2
        return ((A * x - 5 * A) * x + 8 * A) * x - 4 * A

    w0 = k2(t + 1.0)
    w1 = k1(t)
    w2 = k1(1.0 - t)
    w3 = 1.0 - w0 - w1 - w2
    return np.stack([w0, w1, w2, w3], axis=-1)


def _source_index(out_size: int, in_size: int, align_corners: bool) -> np.ndarray:
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            return np.zeros(1)
        return i * (in_size - 1) / (out_size - 1)
    scale = in_size / out_size
    return (i + 0.5) * scale - 0.5


@lru_cache(maxsize=None)
def resize_matrix_torch(
    in_size: int, out_size: int, mode: str = "bicubic", align_corners: bool = False
) -> np.ndarray:
    """Row-stochastic ``[out_size, in_size]`` matrix replicating
    ``F.interpolate(mode=mode, align_corners=align_corners)`` along one axis.
    """
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    src = _source_index(out_size, in_size, align_corners)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    if mode == "bicubic":
        x0 = np.floor(src).astype(np.int64)
        t = src - x0
        w = _cubic_weights_torch(t)  # [out, 4]
        for tap in range(4):
            idx = np.clip(x0 - 1 + tap, 0, in_size - 1)
            np.add.at(mat, (np.arange(out_size), idx), w[:, tap])
    elif mode == "bilinear":
        x0 = np.floor(src).astype(np.int64)
        t = src - x0
        # torch clamps src to >= 0 for align_corners=False (negative src -> t
        # effectively 0 at index 0)
        neg = src < 0
        x0 = np.where(neg, 0, x0)
        t = np.where(neg, 0.0, t)
        i0 = np.clip(x0, 0, in_size - 1)
        i1 = np.clip(x0 + 1, 0, in_size - 1)
        np.add.at(mat, (np.arange(out_size), i0), 1.0 - t)
        np.add.at(mat, (np.arange(out_size), i1), t)
    elif mode == "nearest":
        idx = np.clip(np.floor(np.arange(out_size) * in_size / out_size), 0, in_size - 1).astype(
            np.int64
        )
        mat[np.arange(out_size), idx] = 1.0
    else:
        raise ValueError(f"unsupported mode {mode!r}")
    return mat.astype(np.float32)


def _pil_filter(x: np.ndarray, mode: str) -> np.ndarray:
    ax = np.abs(x)
    if mode == "bicubic":  # PIL convention a = -0.5
        a = -0.5
        w = np.where(
            ax < 1,
            ((a + 2) * ax - (a + 3)) * ax * ax + 1,
            np.where(ax < 2, (((ax - 5) * ax + 8) * ax - 4) * a, 0.0),
        )
        return w
    if mode == "bilinear":
        return np.clip(1 - ax, 0, None)
    raise ValueError(mode)


_PIL_SUPPORT = {"bicubic": 2.0, "bilinear": 1.0}


@lru_cache(maxsize=None)
def resize_matrix_pil(in_size: int, out_size: int, mode: str = "bicubic") -> np.ndarray:
    """Row matrix replicating ``PIL.Image.resize`` along one axis (with the
    antialiasing support-widening PIL applies when downscaling)."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = _PIL_SUPPORT[mode] * filterscale
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        k = np.arange(xmin, xmax)
        w = _pil_filter((k + 0.5 - center) / filterscale, mode)
        s = w.sum()
        if s != 0:
            w = w / s
        mat[i, xmin:xmax] = w
    return mat.astype(np.float32)


def _apply_separable(x: jax.Array, rh: np.ndarray, rw: np.ndarray) -> jax.Array:
    """Apply row/col resize matrices to an NHWC array."""
    rh = jnp.asarray(rh, x.dtype)
    rw = jnp.asarray(rw, x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", rh, x)
    x = jnp.einsum("pw,bowc->bopc", rw, x)
    return x


def interpolate_bicubic(
    x: jax.Array, size: tuple, align_corners: bool = False
) -> jax.Array:
    """``F.interpolate(x, size, mode='bicubic')`` parity for NHWC arrays."""
    h, w = size
    return _apply_separable(
        x,
        resize_matrix_torch(x.shape[1], h, "bicubic", align_corners),
        resize_matrix_torch(x.shape[2], w, "bicubic", align_corners),
    )


def interpolate_bilinear(
    x: jax.Array, size: tuple, align_corners: bool = False
) -> jax.Array:
    """``F.interpolate(x, size, mode='bilinear')`` parity for NHWC arrays."""
    h, w = size
    return _apply_separable(
        x,
        resize_matrix_torch(x.shape[1], h, "bilinear", align_corners),
        resize_matrix_torch(x.shape[2], w, "bilinear", align_corners),
    )


def resize_pil_equivalent(
    x: jax.Array, size: tuple, mode: str = "bicubic", quantize: bool = True
) -> jax.Array:
    """PIL ``Image.resize`` equivalent for NHWC arrays in [0,1] (antialiased).

    PIL resizes 8-bit images in two passes (horizontal then vertical) and
    clips+rounds the intermediate image to uint8; ``quantize=True`` emulates
    that so outputs match PIL within 1/255 (disable for a smooth/differentiable
    variant).
    """
    h, w = size
    rw = jnp.asarray(resize_matrix_pil(x.shape[2], w, mode), x.dtype)
    rh = jnp.asarray(resize_matrix_pil(x.shape[1], h, mode), x.dtype)
    y = jnp.einsum("pw,bhwc->bhpc", rw, x)
    if quantize:
        y = jnp.round(jnp.clip(y, 0.0, 1.0) * 255.0) / 255.0
    y = jnp.einsum("oh,bhwc->bowc", rh, y)
    if quantize:
        y = jnp.round(jnp.clip(y, 0.0, 1.0) * 255.0) / 255.0
    return y
