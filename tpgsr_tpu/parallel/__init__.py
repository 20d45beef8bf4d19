"""Device-mesh data parallelism (the TPU-native replacement for the
reference's ``torch.nn.DataParallel``, interfaces/base.py:390-400).

Single-controller JAX: params replicated, batches sharded over a 1-D
``Mesh('data')`` riding ICI, gradients all-reduced by XLA-inserted ``psum``.
"""

from tpgsr_tpu.parallel.mesh import (
    batch_sharding,
    data_mesh,
    gather_global_to_host,
    host_local_batch_to_global,
    multihost_data_mesh,
    pad_to_multiple,
    process_shard_info,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "data_mesh",
    "batch_sharding",
    "gather_global_to_host",
    "host_local_batch_to_global",
    "multihost_data_mesh",
    "pad_to_multiple",
    "process_shard_info",
    "replicated",
    "shard_batch",
    "shard_params",
]
