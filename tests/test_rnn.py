"""GRU/LSTM scan parity vs torch.nn.GRU / torch.nn.LSTM."""

import numpy as np
import torch

from tpgsr_tpu.ops.rnn import bigru, bilstm, gru_scan, lstm_scan


def _torch_gru_params(gru, suffix=""):
    return {
        "w_ih": getattr(gru, f"weight_ih_l0{suffix}").detach().numpy(),
        "w_hh": getattr(gru, f"weight_hh_l0{suffix}").detach().numpy(),
        "b_ih": getattr(gru, f"bias_ih_l0{suffix}").detach().numpy(),
        "b_hh": getattr(gru, f"bias_hh_l0{suffix}").detach().numpy(),
    }


def test_gru_matches_torch(rng):
    b, t, c, h = 3, 11, 8, 5
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    gru = torch.nn.GRU(c, h, batch_first=True)
    ref, _ = gru(torch.from_numpy(x))
    ours = np.asarray(gru_scan(x, _torch_gru_params(gru)))
    np.testing.assert_allclose(ours, ref.detach().numpy(), atol=1e-5)


def test_bigru_matches_torch(rng):
    b, t, c = 4, 7, 6
    h = 3
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    gru = torch.nn.GRU(c, h, batch_first=True, bidirectional=True)
    ref, _ = gru(torch.from_numpy(x))
    ours = np.asarray(bigru(x, _torch_gru_params(gru), _torch_gru_params(gru, "_reverse")))
    np.testing.assert_allclose(ours, ref.detach().numpy(), atol=1e-5)


def test_bilstm_matches_torch(rng):
    b, t, c, h = 2, 26, 512 // 8, 32
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    lstm = torch.nn.LSTM(c, h, bidirectional=True, batch_first=True)
    ref, _ = lstm(torch.from_numpy(x))
    fw = {
        "w_ih": lstm.weight_ih_l0.detach().numpy(),
        "w_hh": lstm.weight_hh_l0.detach().numpy(),
        "b_ih": lstm.bias_ih_l0.detach().numpy(),
        "b_hh": lstm.bias_hh_l0.detach().numpy(),
    }
    bw = {
        "w_ih": lstm.weight_ih_l0_reverse.detach().numpy(),
        "w_hh": lstm.weight_hh_l0_reverse.detach().numpy(),
        "b_ih": lstm.bias_ih_l0_reverse.detach().numpy(),
        "b_hh": lstm.bias_hh_l0_reverse.detach().numpy(),
    }
    ours = np.asarray(bilstm(x, fw, bw))
    np.testing.assert_allclose(ours, ref.detach().numpy(), atol=1e-5)


def test_lstm_reverse_is_time_flip(rng):
    b, t, c, h = 2, 5, 4, 3
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    lstm = torch.nn.LSTM(c, h, batch_first=True)
    p = {
        "w_ih": lstm.weight_ih_l0.detach().numpy(),
        "w_hh": lstm.weight_hh_l0.detach().numpy(),
        "b_ih": lstm.bias_ih_l0.detach().numpy(),
        "b_hh": lstm.bias_hh_l0.detach().numpy(),
    }
    a = np.asarray(lstm_scan(x, p, reverse=True))
    bref = np.asarray(lstm_scan(x[:, ::-1], p))[:, ::-1]
    np.testing.assert_allclose(a, bref, atol=1e-6)


def test_bigru_fused_matches_naive(rng):
    from tpgsr_tpu.ops.rnn import bigru, bigru_fused

    x = rng.random((3, 7, 8), dtype=np.float32)
    mk = lambda g, c, h: {
        "w_ih": rng.standard_normal((g * h, c)).astype(np.float32) * 0.2,
        "w_hh": rng.standard_normal((g * h, h)).astype(np.float32) * 0.2,
        "b_ih": rng.standard_normal((g * h,)).astype(np.float32) * 0.2,
        "b_hh": rng.standard_normal((g * h,)).astype(np.float32) * 0.2,
    }
    fw, bw = mk(3, 8, 4), mk(3, 8, 4)
    np.testing.assert_allclose(
        np.asarray(bigru(x, fw, bw)), np.asarray(bigru_fused(x, fw, bw)), atol=1e-6
    )


def test_bilstm_fused_matches_naive(rng):
    from tpgsr_tpu.ops.rnn import bilstm, bilstm_fused

    x = rng.random((3, 7, 8), dtype=np.float32)
    mk = lambda g, c, h: {
        "w_ih": rng.standard_normal((g * h, c)).astype(np.float32) * 0.2,
        "w_hh": rng.standard_normal((g * h, h)).astype(np.float32) * 0.2,
        "b_ih": rng.standard_normal((g * h,)).astype(np.float32) * 0.2,
        "b_hh": rng.standard_normal((g * h,)).astype(np.float32) * 0.2,
    }
    fw, bw = mk(4, 8, 4), mk(4, 8, 4)
    np.testing.assert_allclose(
        np.asarray(bilstm(x, fw, bw)), np.asarray(bilstm_fused(x, fw, bw)), atol=1e-6
    )


def test_pallas_bigru_interpret_matches(rng):
    """The fused-sequence Pallas kernel (interpret mode on CPU)."""
    from tpgsr_tpu.ops.pallas_gru import _bigru_pallas_impl
    from tpgsr_tpu.ops.rnn import bigru

    x = rng.random((24, 16, 12), dtype=np.float32)
    mk = lambda c, h: {
        "w_ih": rng.standard_normal((3 * h, c)).astype(np.float32) * 0.2,
        "w_hh": rng.standard_normal((3 * h, h)).astype(np.float32) * 0.2,
        "b_ih": rng.standard_normal((3 * h,)).astype(np.float32) * 0.2,
        "b_hh": rng.standard_normal((3 * h,)).astype(np.float32) * 0.2,
    }
    fw, bw = mk(12, 8), mk(12, 8)
    ref = np.asarray(bigru(x, fw, bw))
    got = np.asarray(_bigru_pallas_impl(x, fw, bw, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_bigru_nhwc_vertical_matches_transpose_path(rng):
    from tpgsr_tpu.ops.rnn import bigru_fused, bigru_nhwc_vertical

    B, H, W, C, Hd = 2, 6, 10, 8, 4
    x = rng.random((B, H, W, C), dtype=np.float32)
    mk = lambda: {
        "w_ih": rng.standard_normal((3 * Hd, C)).astype(np.float32) * 0.2,
        "w_hh": rng.standard_normal((3 * Hd, Hd)).astype(np.float32) * 0.2,
        "b_ih": rng.standard_normal((3 * Hd,)).astype(np.float32) * 0.2,
        "b_hh": rng.standard_normal((3 * Hd,)).astype(np.float32) * 0.2,
    }
    fw, bw = mk(), mk()
    xt = np.transpose(x, (0, 2, 1, 3)).reshape(B * W, H, C)
    ref = np.asarray(bigru_fused(xt, fw, bw)).reshape(B, W, H, 2 * Hd).transpose(0, 2, 1, 3)
    got = np.asarray(bigru_nhwc_vertical(x, fw, bw))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_grublock_axis1_matches_axis2_transposed(rng):
    import jax

    from tpgsr_tpu.models.layers import GruBlock

    x = rng.random((2, 6, 10, 8), dtype=np.float32)
    g1 = GruBlock(8, axis=1)
    v = g1.init(jax.random.PRNGKey(0), x)
    got = np.asarray(g1.apply(v, x))
    g2 = GruBlock(8, axis=2)
    xt = np.transpose(x, (0, 2, 1, 3))
    ref = np.transpose(np.asarray(g2.apply(v, xt)), (0, 2, 1, 3))
    np.testing.assert_allclose(got, ref, atol=1e-6)
