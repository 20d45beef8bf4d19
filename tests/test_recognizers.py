"""Recognizer zoo shape/behavior tests: ASTER, MORAN, OPT TPG."""

import jax
import numpy as np
import pytest

from tpgsr_tpu.charset import AsterInfo


@pytest.fixture(scope="module")
def aster_info():
    return AsterInfo("all")


class TestAster:
    @pytest.fixture(scope="class")
    def built(self, aster_info=None):
        from tpgsr_tpu.charset import AsterInfo
        from tpgsr_tpu.models.aster import RecognizerBuilder

        info = AsterInfo("all")
        model = RecognizerBuilder(
            rec_num_classes=info.rec_num_classes,
            eos_id=info.char2id[info.EOS],
            max_len_labels=20,  # short decode for test speed
        )
        x = np.random.default_rng(0).random((2, 32, 128, 3)).astype(np.float32) * 2 - 1
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        return model, variables, x, info

    def test_encoder_shape(self, built):
        from tpgsr_tpu.models.aster import ResNetAster

        enc = ResNetAster(with_lstm=True)
        x = np.zeros((2, 32, 100, 3), np.float32)
        v = enc.init(jax.random.PRNGKey(0), x, train=False)
        feats = enc.apply(v, x, train=False)
        assert feats.shape == (2, 25, 512)

    def test_beam_search_output(self, built):
        model, variables, x, info = built
        out = model.apply(variables, x, train=False)
        ids = out["output"]["pred_rec"]
        assert ids.shape == (2, 20)
        assert (np.asarray(ids) >= 0).all() and (np.asarray(ids) < info.rec_num_classes).all()

    def test_greedy_matches_beam_start(self, built):
        """Greedy and beam produce valid (decodable) sequences."""
        from tpgsr_tpu.models.aster import decode_aster_ids

        model, variables, x, info = built
        ids, scores = model.apply(variables, x, train=False, method=model.sample)
        assert ids.shape == (2, 20)
        strs = decode_aster_ids(np.asarray(ids), info)
        assert all(isinstance(s, str) for s in strs)

    def test_teacher_forced_logits(self, built):
        model, variables, x, info = built
        targets = np.ones((2, 7), np.int32)
        feats = model.apply(variables, x, train=False, method=model.rectify)
        enc = model.apply(variables, feats, train=False,
                          method=lambda m, v, train: m.encoder(v, train=train))
        logits = model.apply(variables, enc, targets,
                             method=lambda m, f, t: m.decoder(f, t))
        assert logits.shape == (2, 7, info.rec_num_classes)


class TestMoran:
    @pytest.fixture(scope="class")
    def built(self):
        from tpgsr_tpu.models.moran import MORAN

        model = MORAN()
        x = np.random.default_rng(0).random((2, 32, 100, 1)).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        return model, variables, x

    def test_output_shapes(self, built):
        from tpgsr_tpu.models.moran import MORAN_MAX_ITER, MORAN_NCLASS

        model, variables, x = built
        l2r, r2l = model.apply(variables, x, train=False)
        assert l2r.shape == (2, MORAN_MAX_ITER, MORAN_NCLASS)
        assert r2l.shape == (2, MORAN_MAX_ITER, MORAN_NCLASS)

    def test_decode(self, built):
        from tpgsr_tpu.models.moran import decode_moran_ids

        model, variables, x = built
        l2r, _ = model.apply(variables, x, train=False)
        strs = decode_moran_ids(np.asarray(l2r))
        assert len(strs) == 2
        assert all("$" not in s for s in strs)

    def test_morn_rectifies(self, built):
        from tpgsr_tpu.models.moran import MORN

        m = MORN()
        x = np.random.default_rng(1).random((2, 16, 64, 1)).astype(np.float32)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(v, x, train=False)
        assert out.shape == (2, 32, 100, 1)


class TestOptTPG:
    def test_crnn_interface(self):
        from tpgsr_tpu.models.opt_tpg import OPTModel

        model = OPTModel(nclass=37)
        x = np.random.default_rng(0).random((2, 32, 100, 1)).astype(np.float32)
        v = model.init(jax.random.PRNGKey(0), x, train=False)
        logits = model.apply(v, x, train=False)
        # FAN resnet on W=100: 100/2/2 -> (2,1) pool pad1 -> 26 -> conv4_1 pad1 -> 27 -> k2 -> 26
        assert logits.shape[1] == 2 and logits.shape[2] == 37
        assert logits.shape[0] == 26


class TestEvalRecIntegration:
    """make_eval_step with ASTER/MORAN eval recognizers (test_bible dispatch)."""

    def _setup(self):
        from tests.test_train import _tiny_setup

        return _tiny_setup(stu_iter=1, sr_share=True, tpg_share=True)

    def test_aster_eval_step(self):
        from tests.test_train import B, H, W, _batch
        from tpgsr_tpu.charset import AsterInfo
        from tpgsr_tpu.models.aster import RecognizerBuilder
        from tpgsr_tpu.models.registry import ARCHS
        from tpgsr_tpu.train.step import make_eval_step

        args, config, sr_model, stu_model, state = self._setup()
        info = AsterInfo("all")
        rec = RecognizerBuilder(rec_num_classes=info.rec_num_classes,
                                eos_id=info.char2id[info.EOS], max_len_labels=6)
        rv = rec.init(jax.random.PRNGKey(0), np.zeros((1, 32, 128, 3), np.float32),
                      train=False)
        estep = make_eval_step("tsrn_tl_cascade", ARCHS["tsrn_tl_cascade"], sr_model,
                               stu_model, args, config, eval_rec=("ASTER", rec, rv))
        sr, outs = estep(state, _batch())
        assert outs["logits_sr"].shape == (B, 6)  # beam ids

    def test_moran_eval_step(self):
        from tests.test_train import B, _batch
        from tpgsr_tpu.models.moran import MORAN, MORAN_MAX_ITER, MORAN_NCLASS
        from tpgsr_tpu.models.registry import ARCHS
        from tpgsr_tpu.train.step import make_eval_step

        args, config, sr_model, stu_model, state = self._setup()
        rec = MORAN()
        rv = rec.init(jax.random.PRNGKey(0), np.zeros((1, 32, 100, 1), np.float32),
                      train=False)
        estep = make_eval_step("tsrn_tl_cascade", ARCHS["tsrn_tl_cascade"], sr_model,
                               stu_model, args, config, eval_rec=("MORAN", rec, rv))
        sr, outs = estep(state, _batch())
        assert outs["logits_sr"].shape == (B, MORAN_MAX_ITER, MORAN_NCLASS)


class TestSeed:
    def test_seed_beam_and_embed(self):
        from tpgsr_tpu.charset import AsterInfo
        from tpgsr_tpu.models.seed import SEEDModelBuilder, parse_seed_data

        info = AsterInfo("all")
        m = SEEDModelBuilder(rec_num_classes=info.rec_num_classes,
                             eos_id=info.char2id[info.EOS], max_len_labels=6)
        raw = np.random.default_rng(0).random((2, 16, 64, 4)).astype(np.float32)
        x = np.asarray(parse_seed_data(raw))
        # bicubic overshoots on noise (no clamping, like torch interpolate)
        assert x.shape == (2, 32, 100, 3) and -1.6 < x.min() and x.max() < 1.6
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(v, x, train=False)
        assert out["output"]["pred_rec"].shape == (2, 6)
        assert out["output"]["pred_embed"].shape == (2, 300)

    def test_embedding_regression_loss(self):
        from tpgsr_tpu.models.seed import embedding_regression_loss

        a = np.random.default_rng(0).standard_normal((4, 300)).astype(np.float32)
        assert float(embedding_regression_loss(a, a)) < 1e-6
        assert float(embedding_regression_loss(a, -a)) > 1.9

    def test_seed_eval_step(self):
        from tests.test_train import B, _batch, _tiny_setup
        from tpgsr_tpu.charset import AsterInfo
        from tpgsr_tpu.models.registry import ARCHS
        from tpgsr_tpu.models.seed import SEEDModelBuilder
        from tpgsr_tpu.train.step import make_eval_step

        args, config, sr_model, stu_model, state = _tiny_setup(
            stu_iter=1, sr_share=True, tpg_share=True
        )
        info = AsterInfo("all")
        rec = SEEDModelBuilder(rec_num_classes=info.rec_num_classes,
                               eos_id=info.char2id[info.EOS], max_len_labels=5)
        rv = rec.init(jax.random.PRNGKey(0), np.zeros((1, 32, 100, 3), np.float32),
                      train=False)
        estep = make_eval_step("tsrn_tl_cascade", ARCHS["tsrn_tl_cascade"], sr_model,
                               stu_model, args, config, eval_rec=("SEED", rec, rv))
        sr, outs = estep(state, _batch())
        assert outs["logits_sr"].shape == (B, 5)


class TestLongTailComponents:
    def test_attention_label_converter(self):
        from tpgsr_tpu.charset import AttentionLabelConverter

        c = AttentionLabelConverter()
        ids, lengths = c.encode(["ab", "xyz"])
        assert lengths.tolist() == [3, 4]  # +1 for '$'
        assert c.decode(ids, lengths) == ["ab", "xyz"]

    def test_sequence_cross_entropy_loss(self):
        import jax

        from tpgsr_tpu.models.aster import sequence_cross_entropy_loss

        logits = np.zeros((2, 4, 5), np.float32)
        logits[:, :, 2] = 10.0  # confident class 2
        targets = np.full((2, 4), 2, np.int32)
        lengths = np.array([4, 2], np.int32)
        l_good = float(sequence_cross_entropy_loss(logits, targets, lengths))
        targets_bad = np.full((2, 4), 1, np.int32)
        l_bad = float(sequence_cross_entropy_loss(logits, targets_bad, lengths))
        assert l_good < 0.01 < l_bad

    def test_frac_pickup_preserves_mass(self):
        import jax

        from tpgsr_tpu.models.moran import frac_pickup

        alpha = np.random.default_rng(0).random((2, 1, 1, 25)).astype(np.float32)
        out = np.asarray(frac_pickup(jax.random.PRNGKey(3), alpha))
        assert out.shape == alpha.shape
        # interpolation moves at most two adjacent columns
        assert np.abs(out - alpha).sum() < alpha.sum()

    def test_random_sequential_sampler(self):
        from tpgsr_tpu.data.loader import RandomSequentialSampler

        class DS:
            def __len__(self):
                return 20

        s = RandomSequentialSampler(DS(), batch_size=4, seed=0)
        idx = list(iter(s))
        assert len(idx) == 20
        for i in range(0, 20, 4):
            chunk = idx[i : i + 4]
            assert chunk == list(range(chunk[0], chunk[0] + len(chunk)))

    def test_w2v_dataset(self, tmp_path):
        from tests.fixtures import make_textzoom_lmdb
        from tpgsr_tpu.data.datasets import TextZoomWithW2V

        make_textzoom_lmdb(str(tmp_path / "tz"), n=2)
        ds = TextZoomWithW2V(str(tmp_path / "tz"), voc_type="lower")
        hr, lr, label, w2v = ds[0]
        assert w2v.shape == (300,)

    def test_parse_adapters(self):
        from tpgsr_tpu.train.priors import parse_aster_data, parse_moran_data

        x = np.random.default_rng(0).random((2, 16, 64, 4)).astype(np.float32)
        a = np.asarray(parse_aster_data(x))
        assert a.shape == (2, 32, 128, 3)
        m = np.asarray(parse_moran_data(x))
        assert m.shape == (2, 32, 100, 1)

    @pytest.mark.parametrize("cfg", [
        {"transformation": "TPS"},
        {"feature_extraction": "VGG"},
        {"sequence_modeling": "BiLSTM"},
        {"prediction": "Attn"},
    ])
    def test_opt_full_pipeline(self, cfg):
        from tpgsr_tpu.models.opt_tpg import OPTModelFull

        m = OPTModelFull(nclass=37, **cfg)
        x = np.random.default_rng(0).random((2, 32, 100, 1)).astype(np.float32)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        out = np.asarray(m.apply(v, x, train=False))
        assert out.shape[-1] == 37 and np.isfinite(out).all()

    def test_srgan_discriminator(self):
        from tpgsr_tpu.models.srresnet import Discriminator

        d = Discriminator()
        x = np.random.default_rng(0).random((2, 32, 128, 3)).astype(np.float32)
        v = d.init(jax.random.PRNGKey(0), x, train=False)
        out = np.asarray(d.apply(v, x, train=False))
        assert out.shape == (2,) and (0 <= out).all() and (out <= 1).all()


def test_aster_beam_width1_equals_greedy():
    """Beam search with width 1 must reduce exactly to greedy decoding, and
    finished (<EOS>) beams stay frozen rather than being evicted."""
    from tpgsr_tpu.charset import AsterInfo
    from tpgsr_tpu.models.aster import RecognizerBuilder

    info = AsterInfo("all")
    x = np.random.default_rng(0).random((3, 32, 128, 3)).astype(np.float32) * 2 - 1
    m5 = RecognizerBuilder(rec_num_classes=info.rec_num_classes,
                           eos_id=info.char2id[info.EOS], max_len_labels=10, beam_width=5)
    v = m5.init(jax.random.PRNGKey(0), x, train=False)
    m1 = RecognizerBuilder(rec_num_classes=info.rec_num_classes,
                           eos_id=info.char2id[info.EOS], max_len_labels=10, beam_width=1)
    ids_b1 = np.asarray(m1.apply(v, x, train=False)["output"]["pred_rec"])
    ids_greedy, _ = m5.apply(v, x, train=False, method=m5.sample)
    np.testing.assert_array_equal(ids_b1, np.asarray(ids_greedy))
