"""Mesh construction and sharding helpers.

The models here are small (TSRN_TL + InfoGen ~= 3-4 M params,
SURVEY.md §2.9), so the right parallelism is pure data parallelism:

* 1-D ``Mesh(devices, ('data',))`` over all chips — collectives ride ICI.
* Params/opt-state replicated (``NamedSharding(mesh, P())``).
* Batches sharded on axis 0 (``P('data')``); ``jit``'s in_shardings +
  XLA's SPMD partitioner insert the gradient ``psum`` automatically.

No hand-written collectives: the train step is an ordinary jitted function
whose gradient all-reduce XLA derives from the shardings (scaling-book
recipe: pick a mesh, annotate shardings, let XLA insert collectives).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: int = 0, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over ``n_devices`` (0 = all visible)."""
    if devices is None:
        devices = jax.devices()
    if n_devices and n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) across the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, opt state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """device_put a collated batch dict; arrays go batch-sharded, non-array
    entries (label string lists) stay on host."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out


def shard_params(mesh: Mesh, tree: Any) -> Any:
    """Replicate a parameter/opt-state pytree onto every device in the mesh."""
    return jax.device_put(tree, replicated(mesh))


def pad_to_multiple(batch: Dict[str, Any], multiple: int) -> Dict[str, Any]:
    """Pad a batch's arrays along axis 0 to a multiple of the mesh size so the
    batch divides evenly across devices; records the true count in '_valid'."""
    sizes = [v.shape[0] for v in batch.values() if isinstance(v, np.ndarray)]
    if not sizes:
        return batch
    n = sizes[0]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        out = dict(batch)
        out.setdefault("_valid", n)
        return out
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            reps = np.repeat(v[-1:], target - n, axis=0)
            out[k] = np.concatenate([v, reps], axis=0)
        else:
            out[k] = v
    out["_valid"] = n
    return out


def multihost_data_mesh() -> Mesh:
    """Data-parallel mesh spanning all hosts (multi-host DCN scaling).

    On a multi-host deployment (``jax.distributed.initialize()`` already
    called by the launcher), ``jax.devices()`` enumerates every chip in the
    slice; a 1-D 'data' mesh over them keeps the gradient psum on ICI within
    each host and crosses DCN only for the final reduction — the standard
    layout for pure data parallelism (the only parallelism these few-M-param
    models warrant, SURVEY.md §2.9).  Each host feeds its own shard of the
    global batch via ``jax.make_array_from_process_local_data``.

    Single-host (this environment) it is identical to ``data_mesh()``.
    """
    return Mesh(np.asarray(jax.devices()), ("data",))


def process_shard_info() -> tuple:
    """``(process_index, process_count)`` WITHOUT forcing backend init.

    ``jax.process_index()`` initializes the backend, which dials the TPU
    tunnel (slow, and wrong from a data-loader constructor).  Reads the
    distributed service state directly: a process that never called
    ``jax.distributed.initialize`` is by definition a single-process run.
    Falls back to the public API if the private layout ever moves.
    """
    try:
        from jax._src import distributed

        st = distributed.global_state
        if getattr(st, "coordinator_address", None) is None:
            return 0, 1
        return int(st.process_id or 0), int(st.num_processes or 1)
    except Exception:
        from jax._src import xla_bridge

        if xla_bridge.backends_are_initialized():
            return jax.process_index(), jax.process_count()
        return 0, 1


def host_local_batch_to_global(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Assemble per-host batch shards into global sharded arrays.

    Multi-host: each process passes its local shard (global_batch /
    process_count rows); single-host this is ``shard_batch``.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, batch)
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            global_shape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
            out[k] = jax.make_array_from_process_local_data(sh, v, global_shape)
        else:
            out[k] = v
    return out


def gather_global_to_host(mesh: Mesh, tree: Any) -> Any:
    """Materialize global (possibly non-fully-addressable) arrays as FULL
    numpy arrays on every host.

    Multi-host eval needs the per-sample outputs (logits, mse, ssim) of the
    whole global batch on every host so each one decodes/scores identically
    (and the best-checkpoint decision agrees everywhere).  Single-process
    arrays are fully addressable and come back via a plain device_get; in a
    multi-process run the batch-sharded output is allgathered by resharding
    to replicated (``global_array_to_host_local_array`` with ``P()`` — the
    inverse of how ``host_local_batch_to_global`` assembled the inputs).
    """
    from jax.experimental import multihost_utils

    def one(v):
        if not isinstance(v, jax.Array):
            return v
        if v.is_fully_addressable:
            return np.asarray(v)
        return np.asarray(
            multihost_utils.global_array_to_host_local_array(v, mesh, P())
        )

    return jax.tree_util.tree_map(one, tree)
