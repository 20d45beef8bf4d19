"""Pallas TPU kernel: fused bidirectional GRU over a full sequence.

The TSRN hot loop is 10 bidirectional GRU sweeps per forward
(model/tsrn.py:491-508 via our GruBlock): B*H row sequences of length W=64
(or B*W of length H=16) with hidden 32.  As ``lax.scan`` this costs one tiny
dispatch-bound HLO loop iteration per timestep (~1280 sequential micro-ops
per forward).  This kernel runs BOTH directions of the whole sequence inside
one Pallas program: the input projections (the big [N*T, C] x [C, 3H]
matmuls) stay outside in XLA where the MXU runs them at full tilt, and the
kernel only iterates the latency-bound recurrence with the hidden state held
in VMEM.

Layout: inputs are time-major [T, N_tile, 3H] blocks; the grid tiles the row
dimension N so each program's working set fits VMEM.  The backward direction
consumes a pre-flipped projection, so both directions advance with the same
loop index and one batched [2*N_tile, H] x [H, 3H] matmul per step.

Numerics match ops.rnn.bigru exactly (same gate math/order); the public
``bigru_pallas`` falls back to the XLA scan on non-TPU backends.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from tpgsr_tpu.ops.rnn import bigru_fused


def _gru_seq_kernel(xp_ref, w_hh_ref, b_hh_ref, out_ref, *, T: int, H: int):
    """One grid program: both directions for a tile of rows.

    xp_ref:  [T, 2*N_t, 3H]  precomputed input projections (fw rows then bw
             rows; bw already time-flipped)
    w_hh_ref: [2*H, 3H] block-stacked recurrent weights (fw on top)
    b_hh_ref: [2, 3H]
    out_ref: [T, 2*N_t, H] hidden states (bw half still time-flipped)
    """
    n2 = xp_ref.shape[1]
    n_t = n2 // 2
    w_f = w_hh_ref[:H, :]  # [H, 3H]
    w_b = w_hh_ref[H:, :]
    b_f = b_hh_ref[0, :]
    b_b = b_hh_ref[1, :]

    def step(t, h):
        # h: [2*N_t, H] (fw rows then bw rows)
        hp_f = jnp.dot(h[:n_t, :], w_f, preferred_element_type=jnp.float32) + b_f
        hp_b = jnp.dot(h[n_t:, :], w_b, preferred_element_type=jnp.float32) + b_b
        hp = jnp.concatenate([hp_f, hp_b], axis=0)  # [2*N_t, 3H]
        xp = xp_ref[t]  # [2*N_t, 3H]
        xr, xz, xn = xp[:, :H], xp[:, H : 2 * H], xp[:, 2 * H :]
        hr, hz, hn = hp[:, :H], hp[:, H : 2 * H], hp[:, 2 * H :]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        out_ref[t] = h_new
        return h_new

    h0 = jnp.zeros((n2, H), jnp.float32)
    jax.lax.fori_loop(0, T, step, h0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bigru_pallas_impl(x_btc, fw, bw, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, t, c = x_btc.shape
    h = fw["w_hh"].shape[-1]

    # input projections: big MXU matmuls outside the kernel
    xp_f = jnp.einsum("btc,gc->tbg", x_btc, fw["w_ih"]) + fw["b_ih"]
    xp_b = jnp.einsum("btc,gc->tbg", x_btc[:, ::-1, :], bw["w_ih"]) + bw["b_ih"]
    xp = jnp.concatenate([xp_f, xp_b], axis=1)  # [T, 2N, 3H]

    w_hh = jnp.concatenate([fw["w_hh"].T, bw["w_hh"].T], axis=0)  # [2H, 3H]
    b_hh = jnp.stack([fw["b_hh"], bw["b_hh"]])  # [2, 3H]

    # tile rows so xp tile + out tile fit VMEM; the pipeline double-buffers
    # blocks, so budget ~2.5MB per block set (~10MB scoped with buffers)
    tile = n
    per_row_bytes = t * (3 * h + h) * 4 * 2
    while tile > 32 and tile * per_row_bytes > int(2.5 * 1024 * 1024):
        tile //= 2
    while n % tile:
        tile //= 2
    grid = n // tile

    out = pl.pallas_call(
        functools.partial(_gru_seq_kernel, T=t, H=h),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (t, 2 * tile, 3 * h),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((2 * h, 3 * h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3 * h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (t, 2 * tile, h), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t, 2 * n, h), jnp.float32),
        interpret=interpret,
    )(_interleave_tiles(xp, grid, tile), w_hh, b_hh)
    out = _deinterleave_tiles(out, grid, tile)  # [T, 2N, H]
    y_f = jnp.swapaxes(out[:, :n, :], 0, 1)  # [N, T, H]
    y_b = jnp.swapaxes(out[:, n:, :], 0, 1)[:, ::-1, :]
    return jnp.concatenate([y_f, y_b], axis=-1)


def _interleave_tiles(xp, grid, tile):
    """[T, 2N, G] -> [T, grid, 2*tile, G] -> [T, 2N', G] such that block i of
    the row axis holds (fw tile i, bw tile i)."""
    t, n2, g = xp.shape
    n = n2 // 2
    f = xp[:, :n, :].reshape(t, grid, tile, g)
    b = xp[:, n:, :].reshape(t, grid, tile, g)
    return jnp.concatenate([f, b], axis=2).reshape(t, 2 * n, g)


def _deinterleave_tiles(out, grid, tile):
    """Inverse of _interleave_tiles."""
    t, n2, g = out.shape
    n = n2 // 2
    o = out.reshape(t, grid, 2 * tile, g)
    f = o[:, :, :tile, :].reshape(t, n, g)
    b = o[:, :, tile:, :].reshape(t, n, g)
    return jnp.concatenate([f, b], axis=1)


def bigru_pallas(x_btc, fw: Dict, bw: Dict, interpret: bool = False):
    """Bidirectional GRU [N, T, C] -> [N, T, 2H] via the fused TPU kernel.

    Falls back to the XLA scan off-TPU (CPU tests run the kernel with
    interpret=True via the _impl entry instead).
    """
    try:
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        on_tpu = False
    if not (on_tpu or interpret):
        return bigru_fused(x_btc, fw, bw)
    return _bigru_pallas_impl(x_btc, fw, bw, interpret=interpret)
