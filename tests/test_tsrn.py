import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpgsr_tpu.models.tsrn import TSRN, TSRN_TL


def test_tsrn_forward_shapes(rng):
    model = TSRN(scale_factor=2, mask=True, srb_nums=5, hidden_units=32)
    x = jnp.asarray(rng.random((2, 16, 64, 4), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 32, 128, 4)
    assert np.isfinite(np.asarray(y)).all()


def test_tsrn_tl_forward_and_zero_prior(rng):
    model = TSRN_TL(scale_factor=2, mask=True, srb_nums=5, hidden_units=32)
    x = jnp.asarray(rng.random((2, 16, 64, 4), dtype=np.float32))
    prior = jnp.asarray(rng.random((2, 1, 26, 37), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, prior, train=False)
    y = model.apply(variables, x, prior, train=False)
    assert y.shape == (2, 32, 128, 4)
    # zero-prior fallback path (text_emb=None)
    y0 = model.apply(variables, x, None, train=False)
    assert y0.shape == (2, 32, 128, 4)


def test_tsrn_tl_train_mode_with_stn(rng):
    model = TSRN_TL(scale_factor=2, mask=True, srb_nums=2, hidden_units=8, stn=True)
    x = jnp.asarray(rng.random((2, 16, 64, 4), dtype=np.float32))
    prior = jnp.asarray(rng.random((2, 1, 26, 37), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, prior, train=True)
    y, mutated = model.apply(
        variables, x, prior, train=True, mutable=["batch_stats"]
    )
    assert y.shape == (2, 32, 128, 4)
    assert "batch_stats" in mutated
    # STN params exist only in train path modules
    assert "stn_head" in variables["params"]


def test_tsrn_tl_grads(rng):
    model = TSRN_TL(scale_factor=2, mask=True, srb_nums=2, hidden_units=8)
    x = jnp.asarray(rng.random((2, 16, 64, 4), dtype=np.float32))
    prior = jnp.asarray(rng.random((2, 1, 26, 37), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, prior, train=True)

    def loss_fn(params):
        y, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, prior, train=True, mutable=["batch_stats"],
        )
        return jnp.mean(y**2)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # the prior pathway must receive gradient
    ig = grads["infoGen"]
    assert any(float(jnp.abs(v).sum()) > 0 for v in jax.tree_util.tree_leaves(ig))
