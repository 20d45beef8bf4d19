"""Shape/finite smoke tests for every arch in the registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpgsr_tpu.models.registry import ARCHS, build_model

ARGS = {"STN": False, "mask": True, "srb": 2, "hd_u": 8}
CFG = {"scale_factor": 2, "width": 64, "height": 16}  # small for test speed
# note: width/height are the HR geometry; LR input is /2


@pytest.mark.parametrize("arch", sorted(ARCHS.keys()))
def test_arch_forward(arch, rng):
    model, spec = build_model(arch, ARGS, CFG)
    c = spec.in_channels
    x = jnp.asarray(rng.random((2, 8, 32, c), dtype=np.float32))
    prior = jnp.asarray(rng.random((2, 1, 26, 37), dtype=np.float32))
    if not spec.trainable:
        y = model(x)
        assert y.shape == (2, 16, 64, c)
        return
    kwargs = {"train": False}
    inputs = (x, prior) if spec.uses_prior else (x,)
    variables = model.init(jax.random.PRNGKey(0), *inputs, **kwargs)
    y = model.apply(variables, *inputs, **kwargs)
    assert y.shape == (2, 16, 64, c), f"{arch}: {y.shape}"
    assert np.isfinite(np.asarray(y)).all(), arch
