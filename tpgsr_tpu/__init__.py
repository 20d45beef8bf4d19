"""tpgsr_tpu — a TPU-native JAX/Flax/Pallas framework for text-prior-guided
scene text image super-resolution.

Re-implements (from scratch, TPU-first) the complete capability surface of the
PyTorch research codebase `mjq11302010044/TPGSR` (TIP 2023, arXiv:2106.15368):

* LMDB TextZoom paired LR/HR data pipeline (own LMDB reader; no libldmb dep)
* SR backbone zoo with text-prior (TL) fusion: TSRN, SRCNN, SRResNet, RDN,
  VDSR, EDSR, LapSRN, RRDBNet, bicubic baseline
* Recognizer zoo: CRNN (TP generator + eval), "OPT" (None-ResNet-None-CTC),
  ASTER, MORAN
* STN/TPS rectification with an in-graph differentiable grid sampler
* Multi-loss cascade training (image MSE + gradient prior + TP distillation +
  CTC label loss + SSIM), PSNR/SSIM/word-accuracy eval, checkpointing.

Everything under `jit` uses static shapes and XLA-friendly control flow;
recurrences are `lax.scan`, resizes are precomputed-matrix matmuls, and
parallelism is `jax.sharding.Mesh` + NamedSharding data parallelism.
"""

__version__ = "0.1.0"

__all__ = ["TextSR", "load_config", "default_args", "tpg_opt"]


def __getattr__(name):
    """Lazy top-level API (importing the trainer pulls in jax/flax)."""
    if name == "TextSR":
        from tpgsr_tpu.train.trainer import TextSR

        return TextSR
    if name in ("load_config", "default_args", "tpg_opt"):
        import tpgsr_tpu.config as _c

        return getattr(_c, name)
    raise AttributeError(name)
