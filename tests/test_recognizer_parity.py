"""Numerical parity of the recognizer zoo vs torch golden mirrors, with
weights converted through tpgsr_tpu.interop.torch_import (proving the real
pretrained checkpoints — aster_demo.pth.tar / moran_demo.pth /
None-ResNet-None-CTC.pth — will import correctly)."""

import numpy as np
import pytest
import torch

from tests.torch_mirror import build_torch_aster, build_torch_moran, build_torch_opt
from tpgsr_tpu.interop import torch_import as ti


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


class TestAsterParity:
    @pytest.fixture(scope="class")
    def pair(self):
        from tpgsr_tpu.models.aster import RecognizerBuilder

        tm = build_torch_aster(num_classes=97).eval()
        variables = ti.import_aster(_sd(tm))
        ours = RecognizerBuilder(rec_num_classes=97, eos_id=0, max_len_labels=8)
        return tm, ours, variables

    def test_encoder_parity(self, pair, rng):
        tm, ours, variables = pair
        x = rng.random((2, 32, 100, 3), dtype=np.float32) * 2 - 1
        with torch.no_grad():
            ref = tm.encoder(_nchw(x)).numpy()
        got = np.asarray(
            ours.apply(variables, x, False,
                       method=lambda m, v, t: m.encoder(v, train=t))
        )
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_decoder_teacher_forced_parity(self, pair, rng):
        tm, ours, variables = pair
        feats = rng.random((2, 25, 512), dtype=np.float32)
        targets = np.array([[5, 9, 3, 0, 0], [1, 2, 3, 4, 0]], np.int32)
        # torch: step manually with teacher forcing
        with torch.no_grad():
            ft = torch.from_numpy(feats)
            state = torch.zeros(1, 2, 512)
            y = torch.full((2,), 97, dtype=torch.long)
            ref = []
            for i in range(targets.shape[1]):
                logits, state = tm.decoder.decoder(ft, state, y)
                ref.append(logits.numpy())
                y = torch.from_numpy(targets[:, i].astype(np.int64))
            ref = np.stack(ref, 1)
        got = np.asarray(
            ours.apply(variables, feats, targets,
                       method=lambda m, f, t: m.decoder(f, t))
        )
        np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_stn_ctrl_points_parity(self, pair, rng):
        tm, ours, variables = pair
        x = rng.random((2, 32, 64, 3), dtype=np.float32)
        with torch.no_grad():
            _, ref = tm.stn_head(_nchw(x))
        got = np.asarray(
            ours.apply(variables, x, False,
                       method=lambda m, v, t: m.stn_head(v, train=t))[1]
        )
        np.testing.assert_allclose(got, ref.numpy(), atol=2e-4)

    def test_greedy_sample_parity(self, pair, rng):
        tm, ours, variables = pair
        feats = rng.random((2, 25, 512), dtype=np.float32)
        with torch.no_grad():
            ref_ids, _ = tm.decoder.sample(torch.from_numpy(feats), 8)
        got_ids, _ = ours.apply(
            variables, feats, method=lambda m, f: m.decoder.sample(f)
        )
        np.testing.assert_array_equal(np.asarray(got_ids), ref_ids.numpy())


class TestMoranParity:
    @pytest.fixture(scope="class")
    def pair(self):
        from tpgsr_tpu.models.moran import MORAN

        tm = build_torch_moran().eval()
        variables = ti.import_moran(_sd(tm))
        return tm, MORAN(), variables

    def test_morn_parity(self, pair, rng):
        from tpgsr_tpu.models.moran import MORN

        tm, ours, variables = pair
        x = rng.random((2, 16, 64, 1), dtype=np.float32)
        with torch.no_grad():
            ref = tm.MORN(_nchw(x)).numpy().transpose(0, 2, 3, 1)
        morn_vars = {
            "params": variables["params"]["MORN"],
            "batch_stats": variables["batch_stats"]["MORN"],
        }
        got = np.asarray(MORN().apply(morn_vars, x, train=False))
        np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_full_forward_first_steps(self, pair, rng):
        tm, ours, variables = pair
        x = rng.random((2, 32, 100, 1), dtype=np.float32)
        with torch.no_grad():
            ref_l2r, ref_r2l = tm(_nchw(x))
        got_l2r, got_r2l = ours.apply(variables, x, train=False)
        # argmax feedback can diverge once logits ~tie; first steps are robust
        np.testing.assert_allclose(
            np.asarray(got_l2r)[:, :3], ref_l2r.numpy()[:, :3], atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(got_r2l)[:, :3], ref_r2l.numpy()[:, :3], atol=5e-3
        )


class TestOptParity:
    def test_forward_parity(self, rng):
        from tpgsr_tpu.models.opt_tpg import OPTModel

        tm = build_torch_opt().eval()
        variables = ti.import_opt(_sd(tm))
        x = rng.random((2, 32, 100, 1), dtype=np.float32)
        with torch.no_grad():
            ref = tm(_nchw(x)).numpy()
        got = np.asarray(OPTModel(nclass=37).apply(variables, x, train=False))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-4)
