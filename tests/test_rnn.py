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
