"""Batch tiling: run a per-sample function over large batches in tiles.

Why: at large batch (the YAML default TRAIN.batch_size=512) XLA's TPU conv
emitter switches to batch-in-lanes layouts
(``EmitOutputBatchInLanesKernelOutputFeatureInLanes``; seen in the compiled
HLO for every SRB conv at batch 512), which turns every GRU-adjacent
reshape into a physical relayout copy — measured flagship inference drops
from 12.3k img/s at batch 48 to 6.8k at batch 512 (docs/perf_notes.md).
Running the same forward per batch-tile inside one dispatch keeps each
tile's program at the small-batch layouts XLA handles well: measured 11.0k
img/s at batch 512 / tile 64 (1.62x the flat large batch, one compile, one
dispatch).

Numerics: every op in the wrapped functions is per-sample in eval mode (no
cross-batch coupling), so the tiled result is bit-identical to the flat one
(asserted in tests/test_train.py::test_eval_step_tiled_equivalence).
"""

from __future__ import annotations

from typing import Any, Callable

import jax

# Tile 64: measured best of {32: 11.2k, 64: 11.0k, 128: 10.3k} img/s at
# batch 512 within noise, and 64 divides every power-of-two batch >= 64.
DEFAULT_TILE = 64


def _leading_dim(tree: Any) -> int:
    leaves = jax.tree_util.tree_leaves(tree)
    return leaves[0].shape[0] if leaves else 0


def tiled_apply(fn: Callable, tree: Any, tile: int = DEFAULT_TILE) -> Any:
    """``fn(tree)`` over batch tiles of ``tile`` rows via one ``lax.map``.

    ``tree``: pytree whose every leaf has the same leading batch dim B.
    ``fn``: maps such a pytree to a pytree of leaves with leading dim B
    (per-sample outputs).  Falls back to a single flat call when B <= tile,
    tile is falsy, or tile does not divide B (shapes are static under jit,
    so the choice costs nothing at runtime).
    """
    b = _leading_dim(tree)
    if not tile or b <= tile or b % tile:
        return fn(tree)
    shaped = jax.tree_util.tree_map(
        lambda x: x.reshape(b // tile, tile, *x.shape[1:]), tree
    )
    out = jax.lax.map(fn, shaped)
    return jax.tree_util.tree_map(lambda x: x.reshape(b, *x.shape[2:]), out)
