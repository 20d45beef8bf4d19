"""Flax building blocks with torch-compatible semantics and initialization.

All modules are NHWC (TPU-native layout).  Initializers replicate torch
defaults (kaiming-uniform a=sqrt(5) == U(±1/sqrt(fan_in)) for conv/linear,
U(±1/sqrt(hidden)) for RNNs, BN weight=1/bias=0, PReLU 0.25) so training
dynamics match the reference; weight layouts are chosen so torch checkpoints
import with simple transposes (see tpgsr_tpu.interop.torch_import).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpgsr_tpu.ops.rnn import bigru_fused, bigru_nhwc_vertical, bilstm_fused


def torch_uniform_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchConv(nn.Module):
    """Conv2D with torch nn.Conv2d defaults (init + explicit zero padding).

    kernel layout: HWIO.  ``padding`` is the symmetric torch padding int/pair.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1] // self.feature_group_count
        fan_in = in_ch * kh * kw
        kernel = self.param("kernel", torch_uniform_init(fan_in), (kh, kw, in_ch, self.features))
        ph, pw = self.padding
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=self.strides,
            padding=((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
        )
        if self.use_bias:
            bias = self.param("bias", torch_uniform_init(fan_in), (self.features,))
            y = y + bias.astype(x.dtype)
        return y


class TorchConvTranspose(nn.Module):
    """ConvTranspose2D matching torch nn.ConvTranspose2d semantics exactly:
    out = (in-1)*stride - 2*padding + kernel + output_padding.

    Implemented as an input-dilated convolution with a spatially-flipped
    kernel (the mathematical transpose), which XLA lowers efficiently.
    Kernel param layout: HWIO of the *equivalent forward conv* — i.e.
    [kh, kw, in_ch, out_ch]; torch's [in, out, kh, kw] imports via
    flip(2,3).transpose(2,3,0,1).
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    output_padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        # torch convT fan_in = out_ch * kh * kw (weight shape [in,out,kh,kw])
        fan_in = self.features * kh * kw
        kernel = self.param("kernel", torch_uniform_init(fan_in), (kh, kw, in_ch, self.features))
        ph, pw = self.padding
        oph, opw = self.output_padding
        sh, sw = self.strides
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1, 1),
            padding=((kh - 1 - ph, kh - 1 - ph + oph), (kw - 1 - pw, kw - 1 - pw + opw)),
            lhs_dilation=(sh, sw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", torch_uniform_init(fan_in), (self.features,))
            y = y + bias.astype(x.dtype)
        return y


class TorchLinear(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_uniform_init(fan_in), (fan_in, self.features))
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", torch_uniform_init(fan_in), (self.features,))
            y = y + bias.astype(x.dtype)
        return y


class TorchBatchNorm(nn.Module):
    """torch ``nn.BatchNorm{1,2}d``-exact batch norm.

    flax ``nn.BatchNorm`` stores the *biased* batch variance in its running
    average; torch stores the *unbiased* (Bessel-corrected, n/(n-1)) one
    while still normalizing with the biased variance in train mode.  Over a
    training run the flax running_var converges to (n-1)/n of torch's, so
    eval-mode outputs drift from a torch-trained reference.  This module
    mirrors torch exactly: eps 1e-5, EMA momentum 0.1 (= flax-convention
    0.9), Bessel-corrected running_var, stats computed in fp32.

    Variable layout matches flax nn.BatchNorm (params scale/bias,
    batch_stats mean/var) so checkpoints and the torch importers are
    unaffected; callers pass ``name="BatchNorm_0"`` where this replaces an
    auto-named flax BatchNorm.
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        if ura:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf - mean), axes)
            if not self.is_initializing():
                n = x.size // feat  # elements per channel (static)
                bessel = float(n) / float(n - 1) if n > 1 else 1.0
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var * bessel
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return (
            (x.astype(jnp.float32) - mean) * inv + bias
        ).astype(x.dtype)


class BatchNorm(nn.Module):
    """BatchNorm2d with torch defaults (momentum 0.1 -> flax 0.9, eps 1e-5)."""

    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param("use_running_average", self.use_running_average, use_running_average)
        # named BatchNorm_0 to keep the pre-existing variable paths (this
        # slot used to hold a flax nn.BatchNorm)
        return TorchBatchNorm(use_running_average=ura, name="BatchNorm_0")(x)


class PReLU(nn.Module):
    """torch nn.PReLU: single learnable slope, init 0.25."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", lambda k, s: jnp.full(s, 0.25, jnp.float32), (1,))
        a = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


def mish(x: jax.Array) -> jax.Array:
    """x * tanh(softplus(x)) (model/tsrn.py:480-488)."""
    return x * jnp.tanh(jax.nn.softplus(x))


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """NHWC PixelShuffle with torch channel ordering.

    in [B,H,W,C*r*r] with channel index c*r*r + r1*r + r2 ->
    out[B, H*r, W*r, C].
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))  # b h r1 w r2 c
    return x.reshape(b, h * r, w * r, c)


class BiGRU(nn.Module):
    """Bidirectional GRU over axis 1 of a [B, T, C] array -> [B, T, 2*hidden].

    Weight layout matches torch nn.GRU (w_ih [3H,C] in r,z,n order).
    """

    hidden: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        init = torch_uniform_init(self.hidden)

        def p(name, shape):
            return self.param(name, init, shape).astype(x.dtype)

        fw = {
            "w_ih": p("w_ih_l0", (3 * self.hidden, c)),
            "w_hh": p("w_hh_l0", (3 * self.hidden, self.hidden)),
            "b_ih": p("b_ih_l0", (3 * self.hidden,)),
            "b_hh": p("b_hh_l0", (3 * self.hidden,)),
        }
        bw = {
            "w_ih": p("w_ih_l0_reverse", (3 * self.hidden, c)),
            "w_hh": p("w_hh_l0_reverse", (3 * self.hidden, self.hidden)),
            "b_ih": p("b_ih_l0_reverse", (3 * self.hidden,)),
            "b_hh": p("b_hh_l0_reverse", (3 * self.hidden,)),
        }
        return bigru_fused(x, fw, bw)


class BiLSTM(nn.Module):
    """Bidirectional LSTM over axis 1 of [B, T, C] -> [B, T, 2*hidden]."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        init = torch_uniform_init(self.hidden)

        def p(name, shape):
            return self.param(name, init, shape).astype(x.dtype)

        fw = {
            "w_ih": p("w_ih_l0", (4 * self.hidden, c)),
            "w_hh": p("w_hh_l0", (4 * self.hidden, self.hidden)),
            "b_ih": p("b_ih_l0", (4 * self.hidden,)),
            "b_hh": p("b_hh_l0", (4 * self.hidden,)),
        }
        bw = {
            "w_ih": p("w_ih_l0_reverse", (4 * self.hidden, c)),
            "w_hh": p("w_hh_l0_reverse", (4 * self.hidden, self.hidden)),
            "b_ih": p("b_ih_l0_reverse", (4 * self.hidden,)),
            "b_hh": p("b_hh_l0_reverse", (4 * self.hidden,)),
        }
        return bilstm_fused(x, fw, bw)


class GruBlock(nn.Module):
    """1x1 conv -> bidirectional GRU over one spatial axis
    (model/tsrn.py:491-508).

    Input [B,H,W,C_in]; with ``axis=2`` (default) the GRU runs over W for
    each of the B*H rows; with ``axis=1`` it runs over H (the SRB's vertical
    sweep) via the transpose-free NHWC kernel.  Hidden size out_channels//2,
    output [B,H,W,out_channels].  Params are identical either way (a 1x1
    conv is orientation-invariant), so torch checkpoints import unchanged.
    """

    out_channels: int
    axis: int = 2

    @nn.compact
    def __call__(self, x):
        # NB: folding the 1x1 conv into the GRU input projections (a
        # weight-space matmul, mathematically exact) was tried and measured
        # ~25% SLOWER end-to-end — XLA schedules the standalone conv +
        # in-scan projections better than the pre-stacked batched einsum.
        assert self.out_channels % 2 == 0
        x = TorchConv(self.out_channels, (1, 1), name="conv1")(x)
        if self.axis == 1:
            return _VerticalBiGRUParams(self.out_channels // 2, name="gru")(x)
        b, h, w, c = x.shape
        x = x.reshape(b * h, w, c)
        x = BiGRU(hidden=self.out_channels // 2, name="gru")(x)
        return x.reshape(b, h, w, self.out_channels)


class _VerticalBiGRUParams(nn.Module):
    """BiGRU params (same names as BiGRU) bound to the vertical NHWC kernel."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        init = torch_uniform_init(self.hidden)

        def p(name, shape):
            return self.param(name, init, shape).astype(x.dtype)

        fw = {
            "w_ih": p("w_ih_l0", (3 * self.hidden, c)),
            "w_hh": p("w_hh_l0", (3 * self.hidden, self.hidden)),
            "b_ih": p("b_ih_l0", (3 * self.hidden,)),
            "b_hh": p("b_hh_l0", (3 * self.hidden,)),
        }
        bw = {
            "w_ih": p("w_ih_l0_reverse", (3 * self.hidden, c)),
            "w_hh": p("w_hh_l0_reverse", (3 * self.hidden, self.hidden)),
            "b_ih": p("b_ih_l0_reverse", (3 * self.hidden,)),
            "b_hh": p("b_hh_l0_reverse", (3 * self.hidden,)),
        }
        return bigru_nhwc_vertical(x, fw, bw)


class UpsampleBlock(nn.Module):
    """conv -> PixelShuffle -> mish (model/tsrn.py:464-477).

    ``apply_shuffle=False`` returns the pre-shuffle conv output for the
    fused head (fused_sr_head folds shuffle+mish+out-conv into one LR conv);
    the parameter tree is identical either way."""

    in_channels: int
    up_scale: int
    apply_shuffle: bool = True

    @nn.compact
    def __call__(self, x):
        x = TorchConv(self.in_channels * self.up_scale**2, (3, 3), padding=(1, 1), name="conv")(x)
        if not self.apply_shuffle:
            return x
        x = pixel_shuffle(x, self.up_scale)
        return mish(x)


def _phase_decomp_indices(k: int = 9, up: int = 2):
    """Static index maps folding a k x k conv AFTER PixelShuffle(2) into an
    equivalent ceil((k+1)/2) x ... conv BEFORE the shuffle (see fused_sr_head)."""
    import numpy as np

    half = (k // 2 + 1) // 1  # 9 -> taps dp in [-2, 2]
    taps = np.arange(-(k // 4), k // 4 + 1)  # [-2..2] for k=9
    nt = len(taps)
    u_idx = np.zeros((nt, 2, 2), np.int64)  # [dp, r, a]
    valid_u = np.zeros((nt, 2, 2), bool)
    for i, dp in enumerate(taps):
        for r in range(2):
            for a in range(2):
                u = 2 * dp + r - a + k // 2
                u_idx[i, r, a] = np.clip(u, 0, k - 1)
                valid_u[i, r, a] = 0 <= u < k
    return u_idx, valid_u, nt


def fused_sr_head(
    g: jax.Array,
    up_kernel_out: jax.Array,
    k9: jax.Array,
    bias9: Optional[jax.Array],
) -> jax.Array:
    """[UpsampleBlock's shuffle+mish] + [9x9 out conv at HR] computed as an
    exactly-equivalent 5x5 conv at LR + shuffle — ~20x faster on TPU, where
    the post-shuffle layout made the HR 9x9 conv the hottest op in the model.

    Math: out = conv9(mish(shuffle(G))) and mish commutes with the shuffle
    permutation, so out(2i+a, 2j+b, c) = sum over LR taps (dp, dq) and
    pre-shuffle channels (m, r, s) of K[2dp+r-a+4, 2dq+s-b+4, m, c] *
    mish(G)(i+dp, j+dq, m*4+r*2+s) — i.e. a 5x5 conv producing the 4 output
    phases as channels (order c*4+a*2+b), then PixelShuffle(2).

    Args:
      g: pre-shuffle features [B, H, W, 4*ch] (the UpsampleBlock conv output).
      up_kernel_out: unused placeholder for symmetry (kernel already applied).
      k9: the HR conv kernel [9, 9, ch, out_c].
      bias9: [out_c] or None.
    """
    k9 = jnp.asarray(k9)  # numpy params would route k9[u] through np indexing
    kk, _, ch, out_c = k9.shape
    u_idx, valid_u, nt = _phase_decomp_indices(kk, 2)
    u = jnp.asarray(u_idx)  # [5,2,2]
    vu = jnp.asarray(valid_u, k9.dtype)
    # gather k5[dp,dq,r,s,a,b,m,c] = K[u(dp,r,a), u(dq,s,b), m, c] * valid
    ka = k9[u][:, :, :, u]  # [5,2,2, 5,2,2, ch, out_c] (dp,r,a, dq,s,b, m, c)
    va = vu[:, :, :, None, None, None] * vu[None, None, None, :, :, :]
    ka = ka * va[..., None, None]
    # -> [dp, dq, m, r, s, c, a, b] -> [5, 5, ch*4, out_c*4]
    ka = jnp.transpose(ka, (0, 3, 6, 1, 4, 7, 2, 5))
    k5 = ka.reshape(nt, nt, ch * 4, out_c * 4)
    pad = nt // 2
    y = jax.lax.conv_general_dilated(
        mish(g), k5.astype(g.dtype), (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias9 is not None:
        y = y + jnp.repeat(bias9, 4).astype(g.dtype)
    return pixel_shuffle(y, 2)


class ConvParams(nn.Module):
    """Parameter-only holder matching TorchConv's tree ({kernel, bias}) so a
    conv's weights can be consumed by a fused kernel (fused_sr_head) without
    changing checkpoint structure."""

    features: int
    kernel_size: Tuple[int, int]
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel_size
        fan_in = self.in_features * kh * kw
        kernel = self.param(
            "kernel", torch_uniform_init(fan_in), (kh, kw, self.in_features, self.features)
        )
        bias = self.param("bias", torch_uniform_init(fan_in), (self.features,)) \
            if self.use_bias else None
        return kernel, bias

