"""Train-step / state / checkpoint / parallel tests (CPU, 8 virtual devices)."""

import os

import jax
import numpy as np
import pytest

from tpgsr_tpu.charset import CTC_NUM_CLASSES
from tpgsr_tpu.config import default_args, load_config
from tpgsr_tpu.models.crnn import CRNN
from tpgsr_tpu.models.registry import ARCHS
from tpgsr_tpu.models.tsrn import TSRN, TSRN_TL
from tpgsr_tpu.parallel import data_mesh, shard_batch, shard_params
from tpgsr_tpu.train import checkpoint as ckpt
from tpgsr_tpu.train.state import create_train_state
from tpgsr_tpu.train.step import make_eval_step, make_train_step

B, H, W = 8, 16, 32  # tiny LR geometry (HR 32x64)


def _tiny_setup(arch="tsrn_tl_cascade", stu_iter=2, sr_share=False, tpg_share=True,
                **arg_over):
    args = default_args(
        arch=arch, STN=False, mask=True, use_distill=True, use_label=True,
        gradient=True, stu_iter=stu_iter, sr_share=sr_share, tpg_share=tpg_share,
        srb=2, hd_u=8, **arg_over,
    )
    config = load_config()
    config.TRAIN.width, config.TRAIN.height = W * 2, H * 2
    config.TRAIN.batch_size = B
    sr_model = TSRN_TL(scale_factor=2, width=W * 2, height=H * 2, stn=False,
                       mask=True, srb_nums=2, hidden_units=8)
    stu_model = CRNN(nclass=CTC_NUM_CLASSES)
    lr_img = np.zeros((B, H, W, 4), np.float32)
    prior = np.zeros((B, 1, 26, CTC_NUM_CLASSES), np.float32)
    n_sr = 1 if sr_share else stu_iter
    n_stu = 1 if tpg_share else stu_iter
    state = create_train_state(
        jax.random.PRNGKey(0), sr_model, (lr_img, prior), n_sr=n_sr,
        stu_model=stu_model,
        stu_example_inputs=(np.zeros((B, 32, W * 2, 1), np.float32),),
        n_stu=n_stu,
        teacher_variables=stu_model.init(
            jax.random.PRNGKey(1), np.zeros((B, 32, W * 2, 1), np.float32), train=False
        ),
    )
    return args, config, sr_model, stu_model, state


def _batch(rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    return {
        "hr": rng.random((B, H * 2, W * 2, 4)).astype(np.float32),
        "lr": rng.random((B, H, W, 4)).astype(np.float32),
        "ctc_labels": np.tile(np.array([[1, 2, 3] + [0] * 12], np.int32), (B, 1)),
        "ctc_lengths": np.full((B,), 3, np.int32),
        "weighted_tics": np.ones((B,), np.float32),
    }


def test_cascade_train_step_decreases_loss():
    args, config, sr_model, stu_model, state = _tiny_setup()
    spec = ARCHS["tsrn_tl_cascade"]
    step = make_train_step("tsrn_tl_cascade", spec, sr_model, stu_model, args, config,
                           donate=False)
    batch = _batch()
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(np.asarray(metrics["loss_total"])))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_cascade_step_count_and_stats_update():
    args, config, sr_model, stu_model, state = _tiny_setup()
    spec = ARCHS["tsrn_tl_cascade"]
    step = make_train_step("tsrn_tl_cascade", spec, sr_model, stu_model, args, config,
                           donate=False)
    s0 = jax.tree_util.tree_leaves(state.sr_stats)[0].copy()
    state2, _ = step(state, _batch())
    assert int(np.asarray(state2.step)) == 1
    s1 = jax.tree_util.tree_leaves(state2.sr_stats)[0]
    assert not np.allclose(np.asarray(s0), np.asarray(s1))  # BN stats moved


def test_teacher_params_frozen():
    args, config, sr_model, stu_model, state = _tiny_setup()
    spec = ARCHS["tsrn_tl_cascade"]
    step = make_train_step("tsrn_tl_cascade", spec, sr_model, stu_model, args, config,
                           donate=False)
    t0 = jax.tree_util.tree_leaves(state.teacher_params)[0].copy()
    state2, _ = step(state, _batch())
    t1 = jax.tree_util.tree_leaves(state2.teacher_params)[0]
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    # but student params must move
    p0 = jax.tree_util.tree_leaves(state.stu_params)[0]
    p1 = jax.tree_util.tree_leaves(state2.stu_params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_train_step_device_mask_wire_equal():
    """The 3-channel device_mask uint8 wire must produce the SAME loss as
    the 4-channel host-mask uint8 wire: the on-device contour mask is
    byte-equal (ops.image.append_contour_mask_u8), so the tensors entering
    the model are bit-identical."""
    args, config, sr_model, stu_model, state = _tiny_setup()
    spec = ARCHS["tsrn_tl_cascade"]
    step = make_train_step("tsrn_tl_cascade", spec, sr_model, stu_model,
                           args, config, donate=False)

    from PIL import Image

    from tpgsr_tpu.data.transforms import resize_normalize

    rng = np.random.default_rng(3)
    def wire(mask_on_host):
        hrs, lrs = [], []
        for i in range(B):
            img = Image.fromarray(
                rng.integers(0, 256, (H * 2, W * 2, 3), np.uint8), "RGB")
            hrs.append(resize_normalize(img, (W * 2, H * 2), mask_on_host,
                                        as_uint8=True))
            lrs.append(resize_normalize(img.resize((W, H), Image.BICUBIC),
                                        (W, H), mask_on_host, as_uint8=True))
        b = _batch()
        b["hr"], b["lr"] = np.stack(hrs), np.stack(lrs)
        return b

    rng = np.random.default_rng(3)
    b4 = wire(True)
    rng = np.random.default_rng(3)
    b3 = wire(False)
    assert b3["hr"].shape[-1] == 3 and b4["hr"].shape[-1] == 4
    _, m4 = step(state, b4)
    _, m3 = step(state, b3)
    np.testing.assert_array_equal(
        np.asarray(m3["loss_total"]), np.asarray(m4["loss_total"]))


def test_plain_arch_train_step():
    args = default_args(arch="tsrn", STN=False, mask=True, gradient=True, srb=2, hd_u=8)
    config = load_config()
    config.TRAIN.width, config.TRAIN.height = W * 2, H * 2
    model = TSRN(scale_factor=2, width=W * 2, height=H * 2, stn=False, mask=True,
                 srb_nums=2, hidden_units=8)
    lr_img = np.zeros((B, H, W, 4), np.float32)
    state = create_train_state(jax.random.PRNGKey(0), model, (lr_img,), n_sr=1)
    spec = ARCHS["tsrn"]
    step = make_train_step("tsrn", spec, model, None, args, config, donate=False)
    state, metrics = step(state, _batch())
    assert np.isfinite(float(np.asarray(metrics["loss_total"])))
    assert float(np.asarray(metrics["loss_distill"])) == 0.0


def test_eval_step_outputs():
    args, config, sr_model, stu_model, state = _tiny_setup()
    spec = ARCHS["tsrn_tl_cascade"]
    estep = make_eval_step("tsrn_tl_cascade", spec, sr_model, stu_model, args, config)
    sr, outs = estep(state, _batch())
    assert sr.shape == (B, H * 2, W * 2, 4)
    assert outs["mse"].shape == (B,) and np.isfinite(np.asarray(outs["mse"])).all()
    assert outs["ssim"].shape == (B,)
    assert (np.asarray(outs["ssim"]) <= 1.0).all()
    assert outs["logits_sr"].shape[1] == B
    assert "logits_stage0" in outs  # 2-stage cascade exposes stage counters


def test_data_parallel_step_matches_single_device():
    """The sharded step must produce the same loss as unsharded."""
    args, config, sr_model, stu_model, state = _tiny_setup()
    spec = ARCHS["tsrn_tl_cascade"]
    step = make_train_step("tsrn_tl_cascade", spec, sr_model, stu_model, args, config,
                           donate=False)
    batch = _batch()
    _, m_single = step(state, batch)

    mesh = data_mesh()
    assert mesh.devices.size == 8
    state_sh = shard_params(mesh, state)
    batch_sh = shard_batch(mesh, batch)
    _, m_sharded = step(state_sh, batch_sh)
    np.testing.assert_allclose(
        float(np.asarray(m_single["loss_total"])),
        float(np.asarray(m_sharded["loss_total"])),
        rtol=2e-4,
    )


def test_checkpoint_roundtrip(tmp_path):
    args, config, sr_model, stu_model, state = _tiny_setup()
    spec = ARCHS["tsrn_tl_cascade"]
    step = make_train_step("tsrn_tl_cascade", spec, sr_model, stu_model, args, config,
                           donate=False)
    state, _ = step(state, _batch())
    d = str(tmp_path / "ckpt")
    ckpt.save_checkpoint(d, jax.device_get(state), {"arch": "tsrn_tl_cascade"}, is_best=True)
    assert os.path.exists(os.path.join(d, "model_best_0.msgpack"))
    assert os.path.exists(os.path.join(d, "recognizer_best_0.msgpack"))
    assert os.path.exists(os.path.join(d, "info.json"))

    _, _, _, _, fresh = _tiny_setup()
    restored = ckpt.restore_checkpoint(d, fresh)
    a = jax.tree_util.tree_leaves(state.sr_params)[0]
    b = jax.tree_util.tree_leaves(restored.sr_params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # opt state restored too
    oa = jax.tree_util.tree_leaves(state.opt_state)[0]
    ob = jax.tree_util.tree_leaves(restored.opt_state)[0]
    np.testing.assert_allclose(np.asarray(oa), np.asarray(ob))


def test_graft_entry_smoke():
    import __graft_entry__ as ge

    fn, ex = ge.entry()
    out = jax.jit(fn)(*ex)
    assert out.shape == (8, 32, 128, 4)


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_bf16_train_step_close_to_fp32():
    """compute_dtype='bf16' runs the models in bfloat16 with fp32 losses."""
    args, config, sr_model, stu_model, state = _tiny_setup()
    config.TRAIN.compute_dtype = "bf16"
    spec = ARCHS["tsrn_tl_cascade"]
    step16 = make_train_step("tsrn_tl_cascade", spec, sr_model, stu_model, args,
                             config, donate=False)
    config32 = load_config()
    config32.TRAIN.width, config32.TRAIN.height = W * 2, H * 2
    config32.TRAIN.compute_dtype = "fp32"  # default is bf16; pin the fp32 arm
    step32 = make_train_step("tsrn_tl_cascade", spec, sr_model, stu_model, args,
                             config32, donate=False)
    batch = _batch()
    _, m16 = step16(state, batch)
    _, m32 = step32(state, batch)
    l16, l32 = float(np.asarray(m16["loss_total"])), float(np.asarray(m32["loss_total"]))
    assert np.isfinite(l16)
    assert abs(l16 - l32) / abs(l32) < 0.05  # bf16 rounding only


def test_tuple_output_archs_train_and_eval():
    """tsrn_c2f (aux coarse loss, super_resolution.py:250-257) and sem_tsrn
    (image loss only; the reference's semantic term is a dead 0,
    :235-247) train and eval through the generic steps — regression for the
    tuple-output crash."""
    import jax

    from tpgsr_tpu.config import default_args
    from tpgsr_tpu.models.registry import build_model
    from tpgsr_tpu.train.step import make_eval_step

    for arch in ("tsrn_c2f", "sem_tsrn"):
        args = default_args(arch=arch, STN=False, mask=True, srb=2, hd_u=8)
        config = load_config()
        config.TRAIN.width, config.TRAIN.height = 64, 32
        model, spec = build_model(arch, args, {"scale_factor": 2, "width": 64, "height": 32})
        b = 2
        lr = np.random.rand(b, 16, 32, 4).astype(np.float32)
        hr = np.random.rand(b, 32, 64, 4).astype(np.float32)
        batch = {"hr": hr, "lr": lr}
        if arch == "tsrn_c2f":
            batch["coarse"] = np.random.rand(b, 16, 32, 4).astype(np.float32)
        else:
            batch["w2v"] = np.zeros((b, 300), np.float32)
        state = create_train_state(jax.random.PRNGKey(0), model, (lr,), n_sr=1)
        step = make_train_step(arch, spec, model, None, args, config, donate=False)
        state2, metrics = step(state, batch)
        assert np.isfinite(float(np.asarray(metrics["loss_total"])))
        if arch == "tsrn_c2f":
            # the aux coarse loss contributes (loss_total > loss_img)
            assert float(np.asarray(metrics["loss_total"])) > float(
                np.asarray(metrics["loss_img"])
            )
        estep = make_eval_step(arch, spec, model, None, args, config,
                               with_recognizer=False)
        sr, outs = estep(state2, batch)
        assert sr.shape == (b, 32, 64, 4)
        assert np.isfinite(float(np.asarray(outs["mse"]).mean()))


def test_device_prefetch_early_exit_unblocks_producer():
    """Abandoning the prefetch generator mid-epoch (early break / exception in
    the train loop) must stop the producer thread and close the underlying
    loader iterator — a blocked q.put would otherwise pin a loader iteration
    (and its worker pool) forever (ADVICE r1)."""
    import threading
    import time

    from tpgsr_tpu.train.trainer import _device_prefetch

    mesh = data_mesh(1)
    closed = threading.Event()
    n_pulled = [0]

    def loader():
        try:
            for _ in range(100):
                n_pulled[0] += 1
                yield {"lr": np.zeros((4, 8, 8, 1), np.float32), "label": ["x"] * 4}
        finally:
            closed.set()

    gen = _device_prefetch(loader(), mesh, depth=2)
    next(gen)
    gen.close()  # abandon after one batch
    assert closed.wait(timeout=10), "producer never released the loader"
    # producer stopped early: it never drained anywhere near the full epoch
    assert n_pulled[0] < 100


def test_checkpoint_restore_modes(tmp_path):
    """Training continuation loads the periodic files + opt/step; eval-only
    (prefer_best) loads model_best_* and leaves opt/step untouched.  Guards
    against silently rewinding params to an older val-best save while
    keeping the newest Adam moments."""
    args, config, sr_model, stu_model, state = _tiny_setup()
    spec = ARCHS["tsrn_tl_cascade"]
    step = make_train_step("tsrn_tl_cascade", spec, sr_model, stu_model, args, config,
                           donate=False)
    d = str(tmp_path / "ckpt")

    best, _ = step(state, _batch())          # step 1: the "val-best" save
    ckpt.save_checkpoint(d, jax.device_get(best), {"arch": "x"}, is_best=True)
    latest, _ = step(best, _batch())         # step 2: a later, non-best save
    ckpt.save_checkpoint(d, jax.device_get(latest), {"arch": "x"}, is_best=False)

    def p0(s):
        return np.asarray(jax.tree_util.tree_leaves(s.sr_params)[0])

    _, _, _, _, fresh = _tiny_setup()
    cont = ckpt.restore_checkpoint(d, fresh)
    np.testing.assert_allclose(p0(cont), p0(latest))
    assert int(np.asarray(cont.step)) == int(np.asarray(latest.step))
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(cont.opt_state)[0]),
        np.asarray(jax.tree_util.tree_leaves(latest.opt_state)[0]),
    )

    _, _, _, _, fresh2 = _tiny_setup()
    ev = ckpt.restore_checkpoint(d, fresh2, prefer_best=True)
    np.testing.assert_allclose(p0(ev), p0(best))
    assert int(np.asarray(ev.step)) == int(np.asarray(fresh2.step))  # untouched


def test_eval_step_tiled_equivalence():
    """Large-batch eval tiling (ops/tiling.py): lax.map over batch tiles
    must reproduce the flat eval step — images, per-sample metrics, and the
    time-major CRNN logits reassembly."""
    args, config, sr_model, stu_model, state = _tiny_setup()
    spec = ARCHS["tsrn_tl_cascade"]

    bb = 16  # > tile so tiling actually triggers under the 8-device mesh
    rng = np.random.default_rng(3)
    batch = {
        "hr": rng.random((bb, H * 2, W * 2, 4)).astype(np.float32),
        "lr": rng.random((bb, H, W, 4)).astype(np.float32),
    }

    config.TRAIN.eval_tile = 0
    flat = make_eval_step("tsrn_tl_cascade", spec, sr_model, stu_model, args, config)
    # eval_tile is per-device; tests run on 8 virtual devices -> tile 8
    config.TRAIN.eval_tile = 1
    tiled = make_eval_step("tsrn_tl_cascade", spec, sr_model, stu_model, args, config)
    config.TRAIN.eval_tile = 0

    sr_f, outs_f = flat(state, batch)
    sr_t, outs_t = tiled(state, batch)
    np.testing.assert_allclose(np.asarray(sr_t), np.asarray(sr_f), atol=2e-6)
    assert set(outs_t) == set(outs_f)
    for k in outs_f:
        np.testing.assert_allclose(
            np.asarray(outs_t[k]), np.asarray(outs_f[k]), atol=2e-5,
            err_msg=k,
        )


def _assert_tree_equal(a, b, msg=""):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, f"{msg}: tree structure differs"
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), err_msg=msg)


def test_reference_pth_restore(tmp_path):
    """restore_reference_checkpoint: the reference's own save layout — a
    ckpt dir with per-stage model_best_<i>.pth save_dicts plus raw
    recognizer_best_<i>.pth state_dicts (base.py:402-424,546-575) — loads
    into a TrainState.  Stage 0 is replaced (params AND batch_stats), later
    stages keep their init, the teacher and Adam state are untouched."""
    torch = pytest.importorskip("torch")
    from tests.torch_mirror import build_torch_crnn, build_torch_tsrn_tl
    from tpgsr_tpu.interop.torch_import import (
        import_crnn, import_tsrn, is_torch_checkpoint,
        restore_reference_checkpoint)

    args, config, sr_model, stu_model, state = _tiny_setup(
        sr_share=False, tpg_share=False)
    g = build_torch_tsrn_tl(srb_nums=2, hidden_units=8)
    r = build_torch_crnn()
    d = tmp_path / "ckpt"
    d.mkdir()
    torch.save({"state_dict_G": g.state_dict(), "iters": 7},
               str(d / "model_best_0.pth"))
    torch.save(r.state_dict(), str(d / "recognizer_best_0.pth"))

    assert is_torch_checkpoint(str(d))
    assert not is_torch_checkpoint(str(tmp_path))  # no model_best_0.pth
    restored = restore_reference_checkpoint(
        str(d), state, "tsrn_tl_cascade", srb_nums=2)

    g_np = {k: v.detach().numpy() for k, v in g.state_dict().items()}
    want_sr = import_tsrn(g_np, srb_nums=2)
    want_stu = import_crnn({k: v.detach().numpy()
                            for k, v in r.state_dict().items()})
    _assert_tree_equal(restored.sr_params[0], want_sr["params"], "sr params")
    _assert_tree_equal(restored.sr_stats[0], want_sr["batch_stats"], "sr stats")
    _assert_tree_equal(restored.stu_params[0], want_stu["params"], "stu params")
    _assert_tree_equal(restored.sr_params[1], state.sr_params[1], "stage1 kept")
    _assert_tree_equal(restored.stu_params[1], state.stu_params[1], "stu1 kept")
    _assert_tree_equal(restored.teacher_params, state.teacher_params, "teacher")
    _assert_tree_equal(restored.opt_state, state.opt_state, "adam untouched")

    # single-file form: the one save_dict loads into EVERY SR stage (the
    # reference's generator_init(i) loads the same resume file per stage,
    # super_resolution.py:87-94 + base.py:412) and sibling
    # recognizer_best_<i>.pth files restore the students
    # (super_resolution.py:140-163 probes dirname(resume))
    fd = tmp_path / "filedir"
    fd.mkdir()
    f = fd / "model_best_0.pth"
    torch.save({"state_dict_G": g.state_dict()}, str(f))
    torch.save(r.state_dict(), str(fd / "recognizer_best_0.pth"))
    assert is_torch_checkpoint(str(f))
    restored2 = restore_reference_checkpoint(
        str(f), state, "tsrn_tl_cascade", srb_nums=2)
    _assert_tree_equal(restored2.sr_params[0], want_sr["params"], "file sr0")
    _assert_tree_equal(restored2.sr_params[1], want_sr["params"], "file sr1 broadcast")
    _assert_tree_equal(restored2.sr_stats[1], want_sr["batch_stats"], "file stats1")
    _assert_tree_equal(restored2.stu_params[0], want_stu["params"], "file stu0 sibling")
    # stage 1 has no recognizer_best_1.pth; the recognizer_best.pth
    # fallback (tsrn_tl/_wmask save name, super_resolution.py:141-146)
    # covers it when present, else the init is kept
    _assert_tree_equal(restored2.stu_params[1], state.stu_params[1], "file stu1 kept")
    r2 = build_torch_crnn()
    torch.save(r2.state_dict(), str(fd / "recognizer_best.pth"))
    restored3 = restore_reference_checkpoint(
        str(f), state, "tsrn_tl_cascade", srb_nums=2)
    want_stu2 = import_crnn({k: v.detach().numpy()
                             for k, v in r2.state_dict().items()})
    _assert_tree_equal(restored3.stu_params[0], want_stu["params"], "stu0 prefers _0")
    _assert_tree_equal(restored3.stu_params[1], want_stu2["params"], "stu1 fallback")
