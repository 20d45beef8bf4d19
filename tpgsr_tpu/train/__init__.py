"""Training/eval orchestration (the TPU-native re-design of the reference's
``interfaces/`` layer: one jit-compiled train step containing TPG forward,
InfoGen, SR backbone and all losses; functional params; mesh data
parallelism; msgpack checkpoints)."""

from tpgsr_tpu.train.state import TrainState, create_train_state
from tpgsr_tpu.train.step import make_eval_step, make_train_step

__all__ = ["TrainState", "create_train_state", "make_train_step", "make_eval_step"]
