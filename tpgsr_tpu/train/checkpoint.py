"""Checkpoint save/restore.

Parity target: interfaces/base.py:546-585 ``save_checkpoint`` — per-stage
``model_best_<i>`` / ``checkpoint`` files plus ``recognizer_best_<i>`` for
student TPGs, with a metadata dict {arch, iters, epochs, batch_size,
voc_type, up_scale_factor, best_history_res, best_model_info, param_num,
converge}.  Resume: base.py:402-424 (file or best-dir) and
super_resolution.py:140-163 (student TPGs from sibling files).

TPU-native differences: params are flax pytrees serialized with
``flax.serialization`` (msgpack) + a JSON sidecar for metadata, and —
unlike the reference, which silently drops optimizer state — the Adam state
IS checkpointed so resume is exact.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from tpgsr_tpu.train.state import TrainState


def is_primary_host() -> bool:
    """True on the process that owns file writes (process 0).

    Multi-host data parallelism replicates params on every host, so every
    process reaches ``save_checkpoint`` with identical state; only one may
    write or the hosts race on shared storage.  Read the id from
    ``jax.distributed``'s global state (set by ``initialize()``, default 0)
    rather than ``jax.process_index()`` — the latter forces backend
    initialization, which dials the TPU tunnel.
    """
    try:
        from jax._src import distributed

        return (getattr(distributed.global_state, "process_id", 0) or 0) == 0
    except Exception:
        # jax._src layout is private and has moved across releases; fall back
        # to the public API, but only when a backend already exists (calling
        # it cold would dial the TPU tunnel)
        from jax._src import xla_bridge

        if xla_bridge.backends_are_initialized():
            return jax.process_index() == 0
        return True


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


def _dump(path: str, tree: Any) -> None:
    # to_state_dict turns tuples (opt-state chains) into msgpack-able dicts
    state_dict = serialization.to_state_dict(_to_host(tree))
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(state_dict))


def _load(path: str) -> Any:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def param_count(tree: Any) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))


def save_checkpoint(
    ckpt_dir: str,
    state: TrainState,
    info: Dict[str, Any],
    is_best: bool,
    converge_list: Optional[list] = None,
    prefix: str = "checkpoint",
) -> None:
    """Write per-stage SR ('model') and student TPG ('recognizer') files.

    Layout (mirrors base.py:570-585):
      <ckpt_dir>/checkpoint_<i>.msgpack          every saveInterval
      <ckpt_dir>/model_best_<i>.msgpack          when is_best
      <ckpt_dir>/recognizer_best_<i>.msgpack     when is_best (students)
      <ckpt_dir>/opt_state.msgpack, info.json

    Multi-host: only process 0 writes (state is replicated on every host).
    """
    if not is_primary_host():
        return
    os.makedirs(ckpt_dir, exist_ok=True)
    for i, (p, s) in enumerate(zip(state.sr_params, state.sr_stats)):
        tree = {"params": p, "batch_stats": s}
        _dump(os.path.join(ckpt_dir, f"{prefix}_{i}.msgpack"), tree)
        if is_best:
            _dump(os.path.join(ckpt_dir, f"model_best_{i}.msgpack"), tree)
    for i, (p, s) in enumerate(zip(state.stu_params, state.stu_stats)):
        tree = {"params": p, "batch_stats": s}
        _dump(os.path.join(ckpt_dir, f"recognizer_{i}.msgpack"), tree)
        if is_best:
            _dump(os.path.join(ckpt_dir, f"recognizer_best_{i}.msgpack"), tree)
    _dump(os.path.join(ckpt_dir, "opt_state.msgpack"), state.opt_state)
    meta = dict(info)
    meta["step"] = int(np.asarray(state.step))
    meta["param_num"] = [param_count(p) for p in state.sr_params]
    if converge_list is not None:
        meta["converge"] = converge_list
    with open(os.path.join(ckpt_dir, "info.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)


def load_variables(path: str) -> Dict[str, Any]:
    """Load one serialized {'params', 'batch_stats'} tree."""
    return _load(path)


def restore_checkpoint(
    ckpt_dir_or_file: str,
    state: TrainState,
    prefix: str = "checkpoint",
    restore_opt: bool = True,
    prefer_best: bool = False,
) -> TrainState:
    """Restore SR/student params into an existing state (shapes must match).

    Accepts a directory or a single stage-0 file.  Two directory modes:

    * ``prefer_best=False`` (training continuation, the default): load the
      ``checkpoint_<i>`` / ``recognizer_<i>`` files — written on EVERY save,
      so they are always the newest and always mutually consistent with
      ``opt_state.msgpack`` and info.json's ``step``.  (Loading
      ``model_best_*`` here would silently rewind the params to an older
      val-best save while keeping the newest Adam moments/step counter.)
    * ``prefer_best=True`` (eval-only --go_test/--test/--demo; the
      reference's resume semantics, base.py:405-412): prefer
      ``model_best_<i>``, and skip the opt/step restore — those belong to
      the latest save, not necessarily the best one.
    """
    if os.path.isdir(ckpt_dir_or_file):
        d = ckpt_dir_or_file

        def pick(primary, fallback):
            p = os.path.join(d, primary)
            return p if os.path.exists(p) else os.path.join(d, fallback)

        def stage_file(i):
            best, periodic = f"model_best_{i}.msgpack", f"{prefix}_{i}.msgpack"
            return pick(best, periodic) if prefer_best else pick(periodic, best)

        def stu_file(i):
            best, periodic = f"recognizer_best_{i}.msgpack", f"recognizer_{i}.msgpack"
            return pick(best, periodic) if prefer_best else pick(periodic, best)

        sr = []
        for i in range(len(state.sr_params)):
            f = stage_file(i)
            sr.append(_load(f) if os.path.exists(f) else None)
        stu = []
        for i in range(len(state.stu_params)):
            f = stu_file(i)
            stu.append(_load(f) if os.path.exists(f) else None)
        opt_path = "" if prefer_best else os.path.join(d, "opt_state.msgpack")
    else:
        sr = [_load(ckpt_dir_or_file)] + [None] * (len(state.sr_params) - 1)
        stu = [None] * len(state.stu_params)
        opt_path = ""

    def merge(olds, news):
        out = []
        for old_p, old_s, new in zip(olds[0], olds[1], news):
            if new is None:
                out.append((old_p, old_s))
            else:
                p = serialization.from_state_dict(old_p, new["params"])
                s = serialization.from_state_dict(old_s, new.get("batch_stats", old_s))
                out.append((p, s))
        return tuple(x[0] for x in out), tuple(x[1] for x in out)

    sr_params, sr_stats = merge((state.sr_params, state.sr_stats), sr)
    stu_params, stu_stats = merge((state.stu_params, state.stu_stats), stu)
    state = state.replace(
        sr_params=sr_params, sr_stats=sr_stats,
        stu_params=stu_params, stu_stats=stu_stats,
    )
    if restore_opt and opt_path and os.path.exists(opt_path):
        raw = _load(opt_path)
        opt_state = serialization.from_state_dict(state.opt_state, raw)
        state = state.replace(opt_state=opt_state)
    if os.path.isdir(ckpt_dir_or_file) and not prefer_best:
        # continue the iteration counter (info.json 'step'); like the Adam
        # state this goes beyond the reference, which restarts counters
        info_path = os.path.join(ckpt_dir_or_file, "info.json")
        if os.path.exists(info_path):
            with open(info_path) as f:
                step = json.load(f).get("step")
            if step is not None:
                state = state.replace(step=jnp.asarray(int(step), jnp.int32))
    return state
