"""Tests for utils (metrics/meters/visualize/cost) and the data long tail
(degradation, edge masks, dataset variants, LMDB builders)."""

import os

import numpy as np
import pytest
from PIL import Image

from tests.fixtures import make_textzoom_lmdb, render_word


class TestMetrics:
    def test_levenshtein(self):
        from tpgsr_tpu.utils.metrics import levenshtein

        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein("", "abc") == 3
        assert levenshtein("abc", "abc") == 0

    def test_accuracy_and_ed(self):
        from tpgsr_tpu.utils.metrics import accuracy, edit_distance

        preds, targs = ["hello", "wrld"], ["hello", "world"]
        assert accuracy(preds, targs) == 0.5
        assert edit_distance(preds, targs) == 1

    def test_lexicon_search(self):
        from tpgsr_tpu.utils.metrics import accuracy_with_lexicon

        lex = {"f1": ["hello", "world"]}
        accs = accuracy_with_lexicon(
            ["helo"], ["hello"], lexicons50=lex, file_names=["f1"]
        )
        assert accs[0] == 0.0 and accs[1] == 1.0  # lexicon fixes the typo

    def test_rec_post_process(self):
        from tpgsr_tpu.utils.metrics import rec_post_process

        scores = np.array([[0.9, 0.8, 0.5]])
        out = rec_post_process(["ab"], scores, 3)
        np.testing.assert_allclose(out[0], 0.9 * 0.8 * 0.5, rtol=1e-6)

    def test_average_meter(self):
        from tpgsr_tpu.utils import AverageMeter

        m = AverageMeter()
        m.update(1.0, 2)
        m.update(4.0, 1)
        assert m.avg == pytest.approx(2.0)


class TestVisualize:
    def test_tripple_and_test_display(self, tmp_path, rng):
        from tpgsr_tpu.charset import str_filt
        from tpgsr_tpu.utils.visualize import test_display, tripple_display

        lr = rng.random((2, 16, 64, 3)).astype(np.float32)
        sr = rng.random((2, 32, 128, 3)).astype(np.float32)
        hr = rng.random((2, 32, 128, 3)).astype(np.float32)
        tripple_display(lr, sr, hr, ["a", "b"], ["x", "y"], ["gt1", "gt2"],
                        index=1, vis_dir="v", n_vis=2, out_root=str(tmp_path / "demo"))
        files = os.listdir(tmp_path / "demo" / "v" / "1")
        assert len(files) == 2
        n = test_display(lr, sr, hr, ["bad", "gt2"], ["gt1", "gt2"], ["gt1", "gt2"],
                         str_filt, "v", out_root=str(tmp_path / "disp"))
        assert n == 1  # only sample 0 was fixed by SR

    def test_cost_report(self):
        import jax

        from tpgsr_tpu.models.srcnn import SRCNN
        from tpgsr_tpu.utils.cost import model_cost_report, param_count

        m = SRCNN(2, 3, False, 32, 64)
        x = np.zeros((1, 16, 32, 3), np.float32)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        rep = model_cost_report(m, v, (x,), "srcnn")
        assert rep["params"] == param_count(v["params"])


class TestDegradation:
    def test_fspecial_gaussian(self):
        from tpgsr_tpu.data.degradation import fspecial_gaussian

        k = fspecial_gaussian(15, 1.0)
        assert k.shape == (15, 15)
        np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-12)
        assert k[7, 7] == k.max()

    def test_convolve_wrap_matches_direct(self, rng):
        from tpgsr_tpu.data.degradation import _convolve_wrap

        x = rng.random((8, 10))
        k = rng.random((3, 3))
        got = _convolve_wrap(x, k)
        # direct wrap convolution
        ref = np.zeros_like(x)
        for i in range(8):
            for j in range(10):
                acc = 0.0
                for di in range(-1, 2):
                    for dj in range(-1, 2):
                        acc += k[di + 1, dj + 1] * x[(i - di) % 8, (j - dj) % 10]
                ref[i, j] = acc
        np.testing.assert_allclose(got, ref, atol=1e-10)

    def test_degrade_image(self):
        from tpgsr_tpu.data.degradation import DEFAULT_BLUR_KERNEL, degrade_image

        img = render_word("blur", (64, 32))
        out = degrade_image(img, DEFAULT_BLUR_KERNEL)
        assert out.size == img.size
        # blur reduces variance
        assert np.asarray(out, np.float64).var() < np.asarray(img, np.float64).var()


class TestEdges:
    def test_edge_weight_mask_range_and_edges(self):
        from tpgsr_tpu.data.edges import edge_weight_mask

        img = Image.new("L", (64, 32), 0)
        arr = np.array(img)
        arr[:, 30:34] = 255  # vertical bar -> two strong edges
        mask = edge_weight_mask(Image.fromarray(arr).convert("RGB"))
        assert mask.shape == (32, 64)
        assert mask.min() >= 0.4 - 1e-9 and mask.max() <= 0.9 + 1e-9
        assert mask[:, 28:36].max() > 0.6  # edge region upweighted
        assert mask[:, :20].max() < 0.45  # flat region stays at baseline


class TestDatasetsAndBuilders:
    def test_create_dataset_roundtrip(self, tmp_path):
        from tpgsr_tpu.data.create_lmdb import create_dataset
        from tpgsr_tpu.data.datasets import SingleImageLMDBIC15

        imgs = [render_word(w, (64, 32)) for w in ("one", "two")]
        n = create_dataset(str(tmp_path / "db"), imgs, ["one", "two"])
        assert n == 2
        ds = SingleImageLMDBIC15(str(tmp_path / "db"), voc_type="lower")
        hr, lr, label = ds[0]
        assert label == "one" and hr.size == (64, 32) and lr is hr

    def test_create_paired_dataset_roundtrip(self, tmp_path):
        from tpgsr_tpu.data.create_lmdb import create_paired_dataset
        from tpgsr_tpu.data.datasets import TextZoomDataset

        imgs = [render_word(w, (128, 32)) for w in ("abc", "def")]
        n = create_paired_dataset(str(tmp_path / "db"), imgs, ["abc", "def"])
        assert n == 2
        ds = TextZoomDataset(str(tmp_path / "db"), voc_type="lower")
        hr, lr, label = ds[1]
        assert hr.size == (128, 32) and lr.size == (64, 16) and label == "def"

    def test_crop_word_boxes(self):
        from tpgsr_tpu.data.create_lmdb import crop_word_boxes

        img = render_word("crop", (100, 50))
        quads = np.zeros((2, 4, 2))
        quads[:, :, 0] = [[10, 40, 40, 10], [5, 5, 25, 25]]  # x row, y row
        quads[:, :, 1] = [[50, 90, 90, 50], [10, 10, 30, 30]]
        crops = crop_word_boxes(img, quads, ["aa", "bb"])
        assert len(crops) == 2
        assert crops[0][0].size == (30, 20)

    def test_voc_annotations(self, tmp_path):
        from tpgsr_tpu.data.create_lmdb import read_voc_annotations

        xml = """<annotation><object><name>text</name>
        <bndbox><xmin>1</xmin><ymin>2</ymin><xmax>30</xmax><ymax>20</ymax></bndbox>
        </object></annotation>"""
        p = tmp_path / "a.xml"
        p.write_text(xml)
        out = read_voc_annotations(str(p))
        assert out == [("text", (1, 2, 30, 20))]

    def test_svt_dataset(self, tmp_path):
        from tpgsr_tpu.data.datasets import SVTDataset

        d = tmp_path / "svt_train"
        (d / "IMG").mkdir(parents=True)
        (d / "label").mkdir()
        render_word("svt", (64, 32)).save(d / "IMG" / "w1.jpg")
        (d / "label" / "w1.txt").write_text("svt\n")
        ds = SVTDataset(str(tmp_path), voc_type="lower")
        hr, lr, label = ds[0]
        assert label == "svt"

    def test_ic15_textsr_dataset(self, tmp_path):
        from tpgsr_tpu.data.datasets import IC15TextSRDataset

        for sub in ("HRx2/train", "LRx2/train"):
            (tmp_path / sub).mkdir(parents=True)
        render_word("pgm", (64, 32)).convert("L").save(tmp_path / "HRx2/train/s1.pgm")
        render_word("pgm", (32, 16)).convert("L").save(tmp_path / "LRx2/train/s1.pgm")
        (tmp_path / "train_GT.txt").write_text('s1, "pgm"\n')
        ds = IC15TextSRDataset(str(tmp_path), voc_type="lower")
        hr, lr, label = ds[0]
        assert label == "pgm" and hr.size == (64, 32) and lr.size == (32, 16)


class TestRandomReso:
    def test_laplacian_var(self):
        from tpgsr_tpu.train.random_reso import laplacian_var

        flat = np.full((16, 32, 3), 0.5, np.float32)
        assert laplacian_var(flat) == 0.0
        noisy = np.random.default_rng(0).random((16, 32, 3)).astype(np.float32)
        assert laplacian_var(noisy) > 100.0

    def test_eval_random_reso_gating(self):
        import jax

        from tpgsr_tpu.charset import CTC_NUM_CLASSES
        from tpgsr_tpu.models.crnn import CRNN
        from tpgsr_tpu.models.tsrn import TSRN_TL
        from tpgsr_tpu.train.priors import parse_crnn_data
        from tpgsr_tpu.train.random_reso import eval_random_reso

        stu = CRNN(nclass=CTC_NUM_CLASSES)
        tv = stu.init(jax.random.PRNGKey(0), np.zeros((1, 32, 100, 1), np.float32),
                      train=False)
        crnn_apply = jax.jit(
            lambda x: stu.apply(tv, parse_crnn_data(x), train=False)
        )
        sr_model = TSRN_TL(scale_factor=2, width=64, height=32, stn=False, mask=False,
                           srb_nums=1, hidden_units=8)
        lr0 = np.zeros((1, 16, 32, 3), np.float32)
        pr0 = np.zeros((1, 1, 26, CTC_NUM_CLASSES), np.float32)
        sv = sr_model.init(jax.random.PRNGKey(1), lr0, pr0, train=False)
        sr_apply = lambda lr, prior: sr_model.apply(sv, lr, prior, train=False)

        rng = np.random.default_rng(0)
        imgs = [rng.random((16, 32, 3)).astype(np.float32),
                rng.random((16, 48, 3)).astype(np.float32)]
        out, stat = eval_random_reso(imgs, crnn_apply, sr_apply, stu_iter=1,
                                     conf_threshold=0.0, min_height=8)
        # threshold 0 would skip SR only if conf > 0; random weights give conf>0
        # so both skip -> shapes unchanged
        assert all(s in ("LR", "SR") for s in stat)
        out2, stat2 = eval_random_reso(imgs, crnn_apply, sr_apply, stu_iter=1,
                                       conf_threshold=2.0)  # never skip
        assert stat2 == ["SR", "SR"]
        assert out2[0].shape == (32, 64, 3) and out2[1].shape == (32, 96, 3)


class TestVGGPerceptual:
    def test_generator_loss(self):
        import jax

        from tpgsr_tpu.models.vgg import VGG16Features, generator_loss, tv_loss

        x = np.random.default_rng(0).random((1, 32, 64, 3)).astype(np.float32)
        net = VGG16Features()
        v = net.init(jax.random.PRNGKey(0), x)
        feats = net.apply(v, x)
        assert feats.shape == (1, 2, 4, 512)  # 32/16, 64/16 after 4 pools
        l_same = float(generator_loss(v, x, x))
        y = x + 0.1
        l_diff = float(generator_loss(v, y, x))
        assert l_diff > l_same >= 0.0
        assert float(tv_loss(np.ones((1, 8, 8, 3), np.float32))) == 0.0

    def test_import_vgg16_layout(self):
        """Importer consumes a torchvision-shaped state_dict."""
        import jax

        from tpgsr_tpu.models.vgg import VGG16Features, import_vgg16_features

        rng = np.random.default_rng(0)
        cfg = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
               (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
               (512, 512), (512, 512)]
        idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        sd = {}
        for n, (cin, cout) in zip(idx, cfg):
            sd[f"features.{n}.weight"] = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32) * 0.02
            sd[f"features.{n}.bias"] = np.zeros(cout, np.float32)
        variables = import_vgg16_features(sd)
        x = np.zeros((1, 32, 32, 3), np.float32)
        out = VGG16Features().apply(variables, x)
        assert out.shape == (1, 2, 2, 512)
