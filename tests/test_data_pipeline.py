import functools

import numpy as np
import pytest

from tests.fixtures import make_textzoom_lmdb
from tpgsr_tpu.charset import CTC_CHAR_TO_ID
from tpgsr_tpu.data.collate import (
    CollateConfig,
    collate_real,
    collate_real_wtl,
    collate_real_wtl_amask,
)
from tpgsr_tpu.data.datasets import ConcatDataset, TextZoomDataset
from tpgsr_tpu.data.loader import DataLoader


@pytest.fixture(scope="module")
def tz_root(tmp_path_factory):
    p = tmp_path_factory.mktemp("tz")
    return make_textzoom_lmdb(str(p), n=10)


def test_dataset_reads(tz_root):
    ds = TextZoomDataset(tz_root, voc_type="upper")
    assert len(ds) == 10
    hr, lr, label = ds[0]
    assert hr.size == (128, 32) and lr.size == (64, 16)
    assert label == "hello"


def test_concat(tz_root):
    ds = TextZoomDataset(tz_root)
    cat = ConcatDataset([ds, ds])
    assert len(cat) == 20
    assert cat[15][2] == ds[5][2]


def test_collate_real_shapes(tz_root):
    ds = TextZoomDataset(tz_root)
    cfg = CollateConfig(mask=True)
    batch = collate_real([ds[i] for i in range(4)], cfg)
    assert batch["hr"].shape == (4, 32, 128, 4)
    assert batch["lr"].shape == (4, 16, 64, 4)
    assert batch["hr"].dtype == np.float32
    assert 0.0 <= batch["hr"].min() and batch["hr"].max() <= 1.0
    # mask channel is binary
    m = batch["hr"][..., 3]
    assert set(np.unique(m)).issubset({0.0, 1.0})


def test_collate_wtl_quirk(tz_root):
    ds = TextZoomDataset(tz_root)
    cfg = CollateConfig(mask=False)
    batch = collate_real_wtl([ds[i] for i in range(2)], cfg)  # 'hello', 'world'
    v = batch["label_vecs"]
    assert v.shape == (2, 1, 26, 37)
    # 'hello' -> 'heelo' after the reference's word[2]='e' corruption
    ids = v[0, 0].argmax(-1)[:5]
    expect = [CTC_CHAR_TO_ID[c] for c in "heelo"]
    assert ids.tolist() == expect


def test_collate_wtl_amask(tz_root):
    ds = TextZoomDataset(tz_root)
    cfg = CollateConfig(mask=True)
    batch = collate_real_wtl_amask([ds[i] for i in range(4)], cfg)
    assert batch["label_vecs"].shape == (4, 1, 26, 37)
    assert batch["ctc_labels"].shape == (4, 15)
    assert batch["weighted_tics"].tolist() == [1.0] * 4
    # no corruption in the train collate
    ids = batch["label_vecs"][0, 0].argmax(-1)[:5]
    assert ids.tolist() == [CTC_CHAR_TO_ID[c] for c in "hello"]
    assert batch["ctc_lengths"][0] == 5


def test_collate_transform_cache_value_identical(tz_root):
    """cache_transformed stores each image's resize+convert+mask output on
    the (RAM-cached) PIL object; batches must be BYTE-equal to a cache-off
    run, across repeat epochs, both wire formats, and mixed mask configs."""
    ds = TextZoomDataset(tz_root, cache_images=True)
    items = [ds[i] for i in range(6)]
    for wire in ("float32", "uint8"):
        for mask in (True, False):
            on = CollateConfig(mask=mask, wire_dtype=wire, cache_transformed=True)
            off = CollateConfig(mask=mask, wire_dtype=wire, cache_transformed=False)
            first = collate_real_wtl_amask(items, on)  # populates the cache
            second = collate_real_wtl_amask(items, on)  # epoch-2: pure hits
            want = collate_real_wtl_amask(items, off)
            for k in ("hr", "lr", "label_vecs", "ctc_labels", "weighted_tics"):
                np.testing.assert_array_equal(first[k], want[k], err_msg=k)
                np.testing.assert_array_equal(second[k], want[k], err_msg=k)
            assert second["hr"].flags.writeable  # np.stack copies: safe out
    # cached entries are frozen against accidental in-place mutation
    store = getattr(items[0][0], "_tpgsr_xform", {})
    assert store and all(not a.flags.writeable for a in store.values())


def test_device_mask_wire_bit_identical(tz_root):
    """device_mask ships 3-channel RGB; ops.image.append_contour_mask_u8 on
    device must reproduce the host collate's 4-channel uint8 wire BYTE-equal
    (PIL 'L' integer formula + exact integer mean-threshold)."""
    from tpgsr_tpu.ops.image import append_contour_mask_u8

    ds = TextZoomDataset(tz_root, cache_images=False)
    items = [ds[i] for i in range(6)]
    host = CollateConfig(mask=True, wire_dtype="uint8", device_mask=False)
    dev = CollateConfig(mask=True, wire_dtype="uint8", device_mask=True)
    want = collate_real_wtl_amask(items, host)
    got = collate_real_wtl_amask(items, dev)
    for k in ("hr", "lr"):
        assert got[k].shape[-1] == 3 and got[k].dtype == np.uint8
        on_dev = np.asarray(append_contour_mask_u8(got[k]))
        np.testing.assert_array_equal(on_dev, want[k], err_msg=k)
    # float wire / mask-off: device_mask must be inert
    f_host = CollateConfig(mask=True, wire_dtype="float32", device_mask=False)
    f_dev = CollateConfig(mask=True, wire_dtype="float32", device_mask=True)
    np.testing.assert_array_equal(
        collate_real_wtl_amask(items, f_dev)["hr"],
        collate_real_wtl_amask(items, f_host)["hr"],
    )


def test_loader_epoch(tz_root):
    ds = TextZoomDataset(tz_root)
    cfg = CollateConfig(mask=True)
    dl = DataLoader(ds, 4, lambda b: collate_real(b, cfg), shuffle=True, drop_last=True)
    batches = list(dl)
    assert len(batches) == 2 == len(dl)
    assert all(b["hr"].shape == (4, 32, 128, 4) for b in batches)
    # different epoch order (shuffle advances)
    b2 = list(dl)
    assert len(b2) == 2


def test_same_size_bicubic_resize_is_identity():
    """PIL bicubic at scale 1 is bit-exact identity -> resize_normalize's
    same-size fast path (transforms.py) is safe on the canonical TextZoom
    geometry."""
    from PIL import Image

    from tpgsr_tpu.data.transforms import resize_normalize

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (16, 64, 3), np.uint8)
    img = Image.fromarray(arr)
    resized = np.asarray(img.resize((64, 16), Image.BICUBIC))
    assert np.array_equal(resized, arr)
    out = resize_normalize(img, (64, 16), mask=True)
    assert out.shape == (16, 64, 4)
    assert np.allclose(out[..., :3], arr.astype(np.float32) / 255.0)


def test_dataset_decode_cache_identical_items(tz_root):
    ds0 = TextZoomDataset(tz_root, voc_type="upper")
    ds1 = TextZoomDataset(tz_root, voc_type="upper", cache_images=True)
    for i in range(len(ds0)):
        a, b = ds0[i], ds1[i]
        c = ds1[i]  # cache hit
        assert b is not a and c is b
        assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
        assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))
        assert a[2] == b[2]


def test_mixed_lmdb_random_above_cache(tz_root):
    """MixedLMDB's HR-as-LR coin flip stays fresh on top of the decode
    cache (the cache sits in TextZoomDataset.__getitem__, below it)."""
    from tpgsr_tpu.data.datasets import MixedLMDB

    ds = MixedLMDB(tz_root, voc_type="upper", cache_images=True)
    sizes = {ds[0][1].size for _ in range(20)}
    assert sizes == {(128, 32), (64, 16)}  # both branches seen


def test_process_loader_matches_threaded(tz_root):
    ds = TextZoomDataset(tz_root)
    cfg = CollateConfig(mask=True)
    fn = lambda b: collate_real_wtl_amask(b, cfg)
    dl_t = DataLoader(ds, 4, fn, shuffle=True, drop_last=True, seed=3)
    # process workers need a picklable collate (forkserver/spawn context)
    fn_p = functools.partial(collate_real_wtl_amask, cfg=cfg)
    dl_p = DataLoader(ds, 4, fn_p, shuffle=True, drop_last=True, seed=3, num_workers=2)
    bt, bp = list(dl_t), list(dl_p)
    assert len(bt) == len(bp)
    for a, b in zip(bt, bp):
        assert np.array_equal(a["hr"], b["hr"])
        assert np.array_equal(a["ctc_labels"], b["ctc_labels"])
        assert a["labels"] == b["labels"]


def test_lmdb_reader_picklable(tz_root):
    import pickle

    from tpgsr_tpu.data.lmdb import LMDBReader

    env = LMDBReader(tz_root)
    env2 = pickle.loads(pickle.dumps(env))
    assert int(env2.get(b"num-samples")) == int(env.get(b"num-samples"))
    assert env2.get(b"label-%09d" % 1) == env.get(b"label-%09d" % 1)


def test_uint8_wire_format_bit_exact(tz_root):
    """uint8 collate output / 255 == the float collate output exactly (PIL
    decodes to uint8 either way; only the division site moves)."""
    ds = TextZoomDataset(tz_root)
    items = [ds[i] for i in range(4)]
    cfg_f = CollateConfig(mask=True)
    cfg_u = CollateConfig(mask=True, wire_dtype="uint8")
    bf = collate_real_wtl_amask(items, cfg_f)
    bu = collate_real_wtl_amask(items, cfg_u)
    assert bu["hr"].dtype == np.uint8 and bu["lr"].dtype == np.uint8
    for k in ("hr", "lr"):
        assert np.array_equal(bu[k].astype(np.float32) / 255.0, bf[k])
    # non-image fields unchanged
    assert np.array_equal(bu["ctc_labels"], bf["ctc_labels"])
    assert np.array_equal(bu["label_vecs"], bf["label_vecs"])


def test_train_step_same_loss_for_both_wire_formats(tz_root):
    """The jitted train step normalizes uint8 batches on device; losses are
    bit-identical to float batches."""
    import jax

    from tpgsr_tpu.charset import CTC_NUM_CLASSES
    from tpgsr_tpu.config import default_args, load_config
    from tpgsr_tpu.models.crnn import CRNN
    from tpgsr_tpu.models.registry import ARCHS
    from tpgsr_tpu.models.tsrn import TSRN_TL
    from tpgsr_tpu.train.state import create_train_state
    from tpgsr_tpu.train.step import make_train_step

    ds = TextZoomDataset(tz_root)
    items = [ds[i] for i in range(4)]
    cfg_f = CollateConfig(mask=True)
    cfg_u = CollateConfig(mask=True, wire_dtype="uint8")
    bf = collate_real_wtl_amask(items, cfg_f)
    bu = collate_real_wtl_amask(items, cfg_u)

    args = default_args(arch="tsrn_tl_cascade", STN=False, mask=True,
                        use_distill=True, use_label=True, gradient=True,
                        sr_share=True, stu_iter=1)
    config = load_config()
    sr_model = TSRN_TL(scale_factor=2, width=128, height=32, stn=False,
                       mask=True, srb_nums=2, hidden_units=8)
    stu_model = CRNN(nclass=CTC_NUM_CLASSES)
    b = 4
    state = create_train_state(
        jax.random.PRNGKey(0), sr_model,
        (np.zeros((b, 16, 64, 4), np.float32),
         np.zeros((b, 1, 26, CTC_NUM_CLASSES), np.float32)),
        n_sr=1, stu_model=stu_model,
        stu_example_inputs=(np.zeros((b, 32, 100, 1), np.float32),),
        n_stu=1,
        teacher_variables=stu_model.init(
            jax.random.PRNGKey(1), np.zeros((b, 32, 100, 1), np.float32),
            train=False),
    )
    step = make_train_step("tsrn_tl_cascade", ARCHS["tsrn_tl_cascade"],
                           sr_model, stu_model, args, config, donate=False)

    def arrays(batch):
        return {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}

    _, mf = step(state, arrays(bf))
    _, mu = step(state, arrays(bu))
    assert float(np.asarray(mf["loss_total"])) == float(np.asarray(mu["loss_total"]))


def test_process_loader_persistent_pool_and_per_epoch_reseed(tz_root):
    """ADVICE r1: the worker pool persists across epochs (decode caches keep
    warming, PIDs stable) and each epoch reseeds the workers' dataset RNGs
    (MixedLMDB's HR-as-LR flips change between epochs but are deterministic
    for a given seed)."""
    from tpgsr_tpu.data.datasets import MixedLMDB

    cfg = CollateConfig(mask=True)
    fn = functools.partial(collate_real, cfg=cfg)

    def fresh():
        ds = MixedLMDB(tz_root, voc_type="upper")
        return DataLoader(ds, 4, fn, shuffle=False, drop_last=True, seed=7,
                          num_workers=2)

    dl = fresh()
    e1 = [b["lr"].copy() for b in dl]
    pids1 = sorted(p.pid for p in dl._procs)
    e2 = [b["lr"].copy() for b in dl]
    pids2 = sorted(p.pid for p in dl._procs)
    assert pids1 == pids2, "pool was torn down between epochs"
    # per-epoch reseed: the augmentation coin flips differ between epochs
    assert not all(np.array_equal(a, b) for a, b in zip(e1, e2))

    # determinism: a fresh loader with the same seed replays epoch 1 exactly
    dl2 = fresh()
    r1 = [b["lr"].copy() for b in dl2]
    assert all(np.array_equal(a, b) for a, b in zip(e1, r1))
    dl.shutdown()
    dl2.shutdown()


def test_process_loader_abandoned_epoch_recovers(tz_root):
    """Early consumer exit mid-epoch must not clog the persistent pool."""
    ds = TextZoomDataset(tz_root)
    cfg = CollateConfig(mask=True)
    fn = functools.partial(collate_real_wtl_amask, cfg=cfg)
    dl = DataLoader(ds, 4, fn, shuffle=True, drop_last=True, seed=3, num_workers=2)
    it = iter(dl)
    next(it)
    it.close()  # abandon mid-epoch
    full = list(dl)  # next epoch drains stale results and works
    assert len(full) == len(dl)
    dl.shutdown()
