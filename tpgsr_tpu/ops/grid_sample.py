"""Differentiable bilinear grid sampling (torch ``F.grid_sample`` parity).

Used by the TPS rectifier (model/tps_spatial_transformer.py:97-112), MORAN's
MORN offset grids (model/moran/morn.py), and the OPT TPG's TPS
(model/crnn/modules/transformation.py).

Semantics: grid values in [-1, 1], (x, y) order in the last axis, bilinear
interpolation, ``padding_mode='zeros'`` (out-of-bounds taps contribute 0) or
``'border'`` (indices clamped).  ``align_corners`` selects the torch
coordinate mapping (modern torch defaults to False; the flag is explicit
everywhere here).

Implemented with XLA gathers over NHWC; flattened one-hot matmul variants
lose to gather at these sizes, and the op is differentiable as written
(gather has a scatter-add VJP).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(
    x: jax.Array,
    grid: jax.Array,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> jax.Array:
    """Bilinear sample.  x: [B,H,W,C]; grid: [B,Hg,Wg,2] (x,y) in [-1,1].

    Returns [B,Hg,Wg,C].
    """
    b, h, w, c = x.shape
    gx = grid[..., 0]
    gy = grid[..., 1]

    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((gx + 1.0) * w - 1.0) * 0.5
        iy = ((gy + 1.0) * h - 1.0) * 0.5

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    tx = ix - ix0
    ty = iy - iy0
    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)
    ix1 = ix0 + 1
    iy1 = iy0 + 1

    def tap(iy_, ix_):
        if padding_mode == "border":
            iyc = jnp.clip(iy_, 0, h - 1)
            ixc = jnp.clip(ix_, 0, w - 1)
            valid = None
        else:  # zeros
            valid = (iy_ >= 0) & (iy_ < h) & (ix_ >= 0) & (ix_ < w)
            iyc = jnp.clip(iy_, 0, h - 1)
            ixc = jnp.clip(ix_, 0, w - 1)
        # gather per batch: x[b, iyc[b,...], ixc[b,...], :]
        v = jax.vmap(lambda img, yy, xx: img[yy, xx, :])(x, iyc, ixc)
        if valid is not None:
            v = v * valid[..., None].astype(x.dtype)
        return v

    w00 = ((1 - tx) * (1 - ty))[..., None].astype(x.dtype)
    w01 = (tx * (1 - ty))[..., None].astype(x.dtype)
    w10 = ((1 - tx) * ty)[..., None].astype(x.dtype)
    w11 = (tx * ty)[..., None].astype(x.dtype)

    out = (
        tap(iy0, ix0) * w00
        + tap(iy0, ix1) * w01
        + tap(iy1, ix0) * w10
        + tap(iy1, ix1) * w11
    )
    return out
