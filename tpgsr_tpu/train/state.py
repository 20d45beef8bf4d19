"""Functional training state.

Replaces the reference's mutable module lists + joint Adam optimizer
(interfaces/base.py:427-486, super_resolution.py:90-163):

* ``sr_params``/``sr_stats``: tuple of per-stage SR model variables
  (length 1 when ``--sr_share``, else ``stu_iter``) — model_list.
* ``stu_params``/``stu_stats``: tuple of trainable student TPG variables
  (length 1 when ``--tpg_share``) — aster_student.
* ``teacher_params``/``teacher_stats``: the frozen teacher TPG (CRNN);
  excluded from the optimizer, mirroring ``aster.eval()`` + ``.detach()``.
* One Adam over SR + student params (lr, beta1 from YAML); SR grads are
  clipped per-model at global-norm 0.25 (super_resolution.py:419-423 clips
  only model_list, not the students).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    step: jax.Array
    sr_params: Tuple[Any, ...]
    sr_stats: Tuple[Any, ...]
    stu_params: Tuple[Any, ...]
    stu_stats: Tuple[Any, ...]
    teacher_params: Optional[Any]
    teacher_stats: Optional[Any]
    opt_state: Any

    @property
    def trainable(self):
        return {"sr": self.sr_params, "stu": self.stu_params}


def make_optimizer(lr: float = 1e-3, beta1: float = 0.5) -> optax.GradientTransformation:
    """Adam(lr, betas=(beta1, 0.999)) (base.py:447-449)."""
    return optax.adam(lr, b1=beta1, b2=0.999)


def clip_sr_grads(grads: dict, max_norm: float = 0.25) -> dict:
    """Global-norm clip each SR stage's grads at 0.25; students unclipped
    (super_resolution.py:419-423)."""
    def clip_tree(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        norm = jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves))
        scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
        return jax.tree_util.tree_map(lambda l: l * scale, tree)

    return {"sr": tuple(clip_tree(t) for t in grads["sr"]), "stu": grads["stu"]}


def _split_variables(variables: FrozenDict) -> Tuple[Any, Any]:
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})
    return params, stats


def create_train_state(
    rng: jax.Array,
    sr_model,
    sr_example_inputs: Tuple[Any, ...],
    n_sr: int = 1,
    stu_model=None,
    stu_example_inputs: Tuple[Any, ...] = (),
    n_stu: int = 0,
    teacher_variables: Optional[FrozenDict] = None,
    stu_init_variables: Optional[FrozenDict] = None,
    lr: float = 1e-3,
    beta1: float = 0.5,
    sr_init_variables: Optional[FrozenDict] = None,
) -> TrainState:
    """Initialize state.  Example inputs must have the real static shapes.

    Per-stage models start from identical inits only if ``*_init_variables``
    is given (e.g. a resumed/pretrained checkpoint); otherwise each stage gets
    its own random init (matching the reference, which constructs separate
    modules per stage unless shared).
    """
    keys = jax.random.split(rng, n_sr + max(n_stu, 1))
    sr_params, sr_stats = [], []
    for i in range(n_sr):
        if sr_init_variables is not None:
            v = sr_init_variables
        else:
            v = sr_model.init(keys[i], *sr_example_inputs, train=True)
        p, s = _split_variables(v)
        sr_params.append(p)
        sr_stats.append(s)

    stu_params, stu_stats = [], []
    for i in range(n_stu):
        if stu_init_variables is not None:
            v = stu_init_variables
        elif teacher_variables is not None:
            # reference inits students from the pretrained CRNN ckpt
            # (super_resolution.py:147-163 CRNN_init per student); copy the
            # buffers so students and the frozen teacher never alias (the
            # donated train step would otherwise donate one buffer twice)
            v = jax.tree_util.tree_map(jnp.array, teacher_variables)
        else:
            v = stu_model.init(keys[n_sr + i], *stu_example_inputs, train=True)
        p, s = _split_variables(v)
        stu_params.append(p)
        stu_stats.append(s)

    teacher_params = teacher_stats = None
    if teacher_variables is not None:
        teacher_params, teacher_stats = _split_variables(teacher_variables)

    tx = make_optimizer(lr, beta1)
    trainable = {"sr": tuple(sr_params), "stu": tuple(stu_params)}
    opt_state = tx.init(trainable)

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        sr_params=tuple(sr_params),
        sr_stats=tuple(sr_stats),
        stu_params=tuple(stu_params),
        stu_stats=tuple(stu_stats),
        teacher_params=teacher_params,
        teacher_stats=teacher_stats,
        opt_state=opt_state,
    )
