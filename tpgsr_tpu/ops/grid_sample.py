"""Differentiable bilinear grid sampling (torch ``F.grid_sample`` parity).

Used by the TPS rectifier (model/tps_spatial_transformer.py:97-112), MORAN's
MORN offset grids (model/moran/morn.py), and the OPT TPG's TPS
(model/crnn/modules/transformation.py).

Semantics: grid values in [-1, 1], (x, y) order in the last axis, bilinear
interpolation, ``padding_mode='zeros'`` (out-of-bounds taps contribute 0) or
``'border'`` (indices clamped).  ``align_corners`` selects the torch
coordinate mapping (modern torch defaults to False; the flag is explicit
everywhere here).

Two implementations:

* ``method='contraction'`` (DEFAULT) — separable dense-weight contraction:
  the bilinear kernel factors per axis (w[y,x] = wy[y]*wx[x], tent weights
  ``max(0, 1-|coord-index|)``), so sampling is one batched matmul over the
  x-axis (``einsum('bpw,bhwc->bphc')``, rides the MXU) followed by a cheap
  weighted reduce over y — no gather forward, no scatter-add backward.
  Numerically equal to gather for all in/out-of-range taps in both padding
  modes (see test_grid_sample.py): out-of-range taps get zero tent weight
  (== 'zeros'), and clamping the *float* coordinate reproduces torch's
  per-tap index clamp (== 'border').  Measured on TPU v5e at the STN train
  shape [48,16,64,4] (tools/bench_grid_sample.py, 2026-08-17): fwd 4 us vs
  1369 us gather; fwd+bwd 100 us vs 3458 us — TPU gathers are element-wise
  slow and their scatter-add VJP worse.  MORAN's [48,32,100,1]: 100x.
* ``method='gather'`` — XLA gathers over NHWC (scatter-add VJP).  Kept for
  very large images: the dense weights cost O(B*P*(H+W)) memory, fine for
  text-SR shapes but quadratic-ish for megapixel inputs.  (A *flattened*
  one-hot matmul over a [P, H*W] weight matrix was also measured and loses
  to gather — only the separable factorization wins.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _src_coords(grid, h, w, align_corners):
    """Grid [-1,1] -> float source pixel coordinates (ix, iy), fp32."""
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((gx + 1.0) * w - 1.0) * 0.5
        iy = ((gy + 1.0) * h - 1.0) * 0.5
    return ix, iy


def grid_sample(
    x: jax.Array,
    grid: jax.Array,
    align_corners: bool = False,
    padding_mode: str = "zeros",
    method: str = "contraction",
) -> jax.Array:
    """Bilinear sample.  x: [B,H,W,C]; grid: [B,Hg,Wg,2] (x,y) in [-1,1].

    Returns [B,Hg,Wg,C].
    """
    if method == "contraction":
        return _grid_sample_contraction(x, grid, align_corners, padding_mode)
    b, h, w, c = x.shape
    ix, iy = _src_coords(grid, h, w, align_corners)

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


def _grid_sample_contraction(
    x: jax.Array, grid: jax.Array, align_corners: bool, padding_mode: str
) -> jax.Array:
    """MXU-friendly bilinear sample via separable dense tent weights.

    wx[b,p,j] = max(0, 1-|ix[b,p]-j|) puts the two bilinear x-taps' weights
    at their columns (and nothing elsewhere), so

        out[b,p,c] = sum_y wy[b,p,y] * sum_x wx[b,p,x] * img[b,y,x,c]

    is exactly bilinear sampling.  The inner sum is a batched matmul
    [B,P,W] @ [B,W,H*C]; the outer one an elementwise multiply-reduce over
    H.  Cost is W/2 (resp. H/2) extra MACs per tap — trivial on the MXU —
    in exchange for no gather (fwd) and no scatter-add (bwd).
    """
    b, h, w, c = x.shape
    _, gh, gw, _ = grid.shape
    p = gh * gw
    ix, iy = _src_coords(grid, h, w, align_corners)
    if padding_mode == "border":
        # clamping the float coordinate == torch's per-tap index clamp
        ix = jnp.clip(ix, 0.0, w - 1.0)
        iy = jnp.clip(iy, 0.0, h - 1.0)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(ix.reshape(b, p)[..., None] - jnp.arange(w, dtype=jnp.float32)))
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(iy.reshape(b, p)[..., None] - jnp.arange(h, dtype=jnp.float32)))
    # fp32 x keeps fp32 accumulation through the MXU (the tent weights are
    # exact and the taps must match the gather path to ~1e-6); bf16 inputs
    # use the default single-pass bf16 path like the rest of the model
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    tmp = jnp.einsum(
        "bpw,bhwc->bphc", wx.astype(x.dtype), x, precision=prec
    )
    out = jnp.einsum(
        "bph,bphc->bpc", wy.astype(x.dtype), tmp, precision=prec
    )
    return out.reshape(b, gh, gw, c)
