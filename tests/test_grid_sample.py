import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tpgsr_tpu.ops.grid_sample import grid_sample


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_matches_torch(rng, align_corners, padding_mode):
    x = rng.random((2, 16, 64, 3), dtype=np.float32)
    # grid partly out of bounds to exercise padding
    grid = (rng.random((2, 8, 20, 2), dtype=np.float32) * 2.4 - 1.2).astype(np.float32)
    ours = np.asarray(grid_sample(x, grid, align_corners=align_corners, padding_mode=padding_mode))
    ref = F.grid_sample(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode=padding_mode,
        align_corners=align_corners,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_contraction_matches_torch(rng, align_corners, padding_mode):
    """The MXU contraction variant is numerically equal to torch (and hence
    the gather path) including far-out-of-range and exactly-on-edge taps."""
    x = rng.random((2, 16, 64, 3), dtype=np.float32)
    grid = (rng.random((2, 8, 20, 2), dtype=np.float32) * 2.4 - 1.2).astype(np.float32)
    # pin some exact corner/edge coordinates
    grid[0, 0, 0] = [-1.0, -1.0]
    grid[0, 0, 1] = [1.0, 1.0]
    grid[0, 0, 2] = [3.0, -3.0]  # far out of range
    ours = np.asarray(
        grid_sample(
            x, grid, align_corners=align_corners, padding_mode=padding_mode,
            method="contraction",
        )
    )
    ref = F.grid_sample(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode=padding_mode,
        align_corners=align_corners,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_contraction_grad_matches_gather(rng):
    """Same gradients (both wrt input image and grid) as the gather path."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(rng.random((2, 8, 12, 3), dtype=np.float32))
    grid = jnp.asarray(rng.random((2, 5, 7, 2), dtype=np.float32) * 2.2 - 1.1)

    def loss(method):
        def f(xx, gg):
            return jnp.sum(grid_sample(xx, gg, method=method) ** 2)
        return f

    gx_g, gg_g = jax.grad(loss("gather"), argnums=(0, 1))(x, grid)
    gx_c, gg_c = jax.grad(loss("contraction"), argnums=(0, 1))(x, grid)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_g), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gg_c), np.asarray(gg_g), atol=1e-4)


def test_grid_sample_grad_flows(rng):
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(rng.random((1, 8, 8, 1), dtype=np.float32))
    grid = jnp.asarray(rng.random((1, 4, 4, 2), dtype=np.float32) * 1.6 - 0.8)

    def loss(g):
        return jnp.sum(grid_sample(x, g) ** 2)

    g = jax.grad(loss)(grid)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
