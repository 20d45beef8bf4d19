"""End-to-end smoke: TextSR.train() on a synthetic TextZoom LMDB.

Exercises config -> data pipeline -> jit train step -> eval -> checkpoint,
mirroring the reference's sanctioned flow (main.py -> TextSR.train ->
eval/save), on tiny shapes and the CPU mesh.
"""

import json
import os

import numpy as np
import pytest

from tests.fixtures import make_textzoom_lmdb
from tpgsr_tpu.config import default_args, load_config
from tpgsr_tpu.train.trainer import TextSR


@pytest.fixture(scope="module")
def lmdb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tz")
    return make_textzoom_lmdb(str(d / "train"), n=16)


def test_textsr_train_eval_checkpoint(lmdb_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    config = load_config()
    t = config.TRAIN
    t.train_data_dir = [lmdb_dir]
    t.VAL.val_data_dir = [lmdb_dir]
    t.VAL.valInterval = 4
    t.saveInterval = 4
    t.displayInterval = 2
    t.batch_size = 8
    t.epochs = 3  # 2 iters/epoch -> 6 iters: crosses the 5-iter loss log
    t.ckpt_dir = str(tmp_path / "ckpt")
    args = default_args(
        arch="tsrn_tl_cascade", STN=False, mask=True, use_distill=True,
        gradient=True, sr_share=True, tpg_share=True, stu_iter=1,
        srb=2, hd_u=8, batch_size=8, vis_dir="smoke",
    )
    mission = TextSR(config, args)
    mission.train()

    ckpt_dir = os.path.join(str(tmp_path / "ckpt"), "smoke")
    assert os.path.exists(os.path.join(ckpt_dir, "checkpoint_0.msgpack"))
    assert os.path.exists(os.path.join(ckpt_dir, "recognizer_0.msgpack"))
    info = json.load(open(os.path.join(ckpt_dir, "info.json")))
    assert info["arch"] == "tsrn_tl_cascade"
    # scalar log written
    log = os.path.join("tensorboard", "smoke", "scalars.jsonl")
    assert os.path.exists(log)
    tags = {json.loads(l)["tag"] for l in open(log)}
    assert {"loss/total", "loss/SR", "loss/distill"} <= tags
    assert any(tag.startswith("eval/accuracy") for tag in tags)


def test_textsr_go_test(lmdb_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    config = load_config()
    t = config.TRAIN
    t.train_data_dir = [lmdb_dir]
    t.VAL.val_data_dir = [lmdb_dir]
    t.batch_size = 8
    t.epochs = 1
    t.ckpt_dir = str(tmp_path / "ckpt")
    args = default_args(
        arch="tsrn", STN=False, mask=True, gradient=True,
        srb=2, hd_u=8, batch_size=8, vis_dir="gotest", go_test=True,
    )
    mission = TextSR(config, args)
    mission.train()  # go_test: single eval pass, no training


def test_textsr_test_path(lmdb_dir, tmp_path, monkeypatch):
    """--test standalone benchmark (super_resolution.py:1349-1433)."""
    monkeypatch.chdir(tmp_path)
    config = load_config()
    t = config.TRAIN
    t.train_data_dir = [lmdb_dir]
    t.VAL.val_data_dir = [lmdb_dir]
    t.batch_size = 8
    t.ckpt_dir = str(tmp_path / "ckpt")
    config.TEST.test_data_dir = lmdb_dir
    args = default_args(arch="srcnn", srb=2, hd_u=8, batch_size=8,
                        vis_dir="testpath", test=True, rec="crnn")
    md = TextSR(config, args).test()
    assert {"accuracy", "psnr_avg", "ssim_avg", "fps"} <= set(md)
    assert md["fps"] > 0


def test_textsr_demo_path(lmdb_dir, tmp_path, monkeypatch):
    """--demo folder inference (super_resolution.py:1435-1523)."""
    from tests.fixtures import render_word

    monkeypatch.chdir(tmp_path)
    demo_dir = tmp_path / "demo_imgs"
    demo_dir.mkdir()
    for w in ("abc", "xyz"):
        render_word(w, (80, 24)).save(demo_dir / f"{w}.png")
    config = load_config()
    t = config.TRAIN
    t.train_data_dir = [lmdb_dir]
    t.VAL.val_data_dir = [lmdb_dir]
    t.batch_size = 8
    t.ckpt_dir = str(tmp_path / "ckpt")
    args = default_args(arch="tsrn_tl_cascade", mask=True, sr_share=True,
                        tpg_share=True, stu_iter=1, srb=2, hd_u=8, batch_size=8,
                        vis_dir="demopath", demo=True, demo_dir=str(demo_dir))
    TextSR(config, args).demo()


def test_go_test_writes_visualizations(lmdb_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    config = load_config()
    t = config.TRAIN
    t.train_data_dir = [lmdb_dir]
    t.VAL.val_data_dir = [lmdb_dir]
    t.batch_size = 8
    t.ckpt_dir = str(tmp_path / "ckpt")
    args = default_args(arch="tsrn_tl_cascade", mask=True, sr_share=True,
                        tpg_share=True, stu_iter=1, srb=2, hd_u=8, batch_size=8,
                        vis_dir="visrun", go_test=True)
    TextSR(config, args).train()
    vis = tmp_path / "demo" / "visrun" / "1"
    assert vis.is_dir() and len(list(vis.iterdir())) > 0


def test_partial_final_batch_padded_eval(tmp_path, monkeypatch):
    """drop_last=False eval: the final partial batch is padded to the
    compiled shape and masked — metrics count only real samples."""
    from tests.fixtures import make_textzoom_lmdb

    db = make_textzoom_lmdb(str(tmp_path / "tz12"), n=12)  # batch 8 -> 8 + 4
    monkeypatch.chdir(tmp_path)
    config = load_config()
    t = config.TRAIN
    t.train_data_dir = [db]
    t.VAL.val_data_dir = [db]
    t.batch_size = 8
    t.ckpt_dir = str(tmp_path / "ckpt")
    args = default_args(arch="srcnn", srb=2, hd_u=8, batch_size=8,
                        vis_dir="partial", go_test=True)
    mission = TextSR(config, args)
    state = mission.init_state()
    mission._build_steps(with_train=False)
    from tpgsr_tpu.train.evaluate import evaluate

    md = evaluate(mission._eval_step, state, mission.get_val_data()[0])
    assert md["images"] == 12


def test_tiny_val_set_on_mesh_eval(tmp_path, monkeypatch):
    """A val set SMALLER than batch_size on a multi-device mesh: the batch
    must be padded up to a device-count multiple before shard_batch or
    device_put raises (advisor round-1 medium finding, evaluate.py:76-99)."""
    import jax

    from tests.fixtures import make_textzoom_lmdb
    from tpgsr_tpu.parallel import data_mesh

    db = make_textzoom_lmdb(str(tmp_path / "tz5"), n=5)  # 5 < batch 8, !% 8
    monkeypatch.chdir(tmp_path)
    config = load_config()
    t = config.TRAIN
    t.train_data_dir = [db]
    t.VAL.val_data_dir = [db]
    t.batch_size = 8
    t.ckpt_dir = str(tmp_path / "ckpt")
    args = default_args(arch="srcnn", srb=2, hd_u=8, batch_size=8,
                        vis_dir="tinyval", go_test=True)
    mission = TextSR(config, args)
    state = mission.init_state()
    mission._build_steps(with_train=False)
    from tpgsr_tpu.train.evaluate import evaluate

    mesh = data_mesh(len(jax.devices()))
    md = evaluate(mission._eval_step, state, mission.get_val_data()[0], mesh=mesh)
    assert md["images"] == 5
    assert np.isfinite(md["psnr_avg"]) and md["psnr_avg"] > 0


def test_textsr_multidevice_convergence_resume(lmdb_dir, tmp_path, monkeypatch):
    """VERDICT r1 #9: the FULL orchestrator proven multi-device — ~50
    TextSR.train iterations on the 8-virtual-device mesh with decreasing
    loss, checkpoint saved under sharding, resume from it, and eval."""
    import jax

    monkeypatch.chdir(tmp_path)
    assert len(jax.devices()) == 8  # conftest virtual CPU mesh

    def make(resume=""):
        config = load_config()
        t = config.TRAIN
        t.train_data_dir = [lmdb_dir]
        t.VAL.val_data_dir = [lmdb_dir]
        t.batch_size = 8
        t.epochs = 25           # 16 samples / batch 8 -> 2 iters/epoch -> 50
        t.displayInterval = 1000
        t.VAL.valInterval = 40  # one mid-run eval + ckpt
        t.saveInterval = 1000
        t.ckpt_dir = str(tmp_path / "ckpt")
        t.lr = 3e-3
        if resume:
            t.resume = resume
        args = default_args(
            arch="tsrn_tl_cascade", STN=False, mask=True, gradient=True,
            use_distill=True, stu_iter=2, tpg_share=True,
            srb=2, hd_u=8, batch_size=8, vis_dir="mdev",
        )
        return TextSR(config, args)

    mission = make()
    assert mission.mesh.devices.size == 8
    state = mission.train()
    # params stayed replicated-on-mesh through training
    shardings = {str(a.sharding) for a in jax.tree_util.tree_leaves(state.sr_params)}
    assert len(shardings) >= 1

    log = os.path.join("tensorboard", "mdev", "scalars.jsonl")
    losses = [json.loads(l)["value"] for l in open(log)
              if json.loads(l)["tag"] == "loss/total"]
    assert len(losses) >= 9
    early = sum(losses[:3]) / 3
    late = sum(losses[-3:]) / 3
    assert late < 0.8 * early, f"no convergence: {early:.2f} -> {late:.2f}"
    # eval ran mid-training
    tags = {json.loads(l)["tag"] for l in open(log)}
    assert any(tag.startswith("eval/") for tag in tags)

    # resume from the sharded-run checkpoint and keep training on the mesh
    ckpt_path = os.path.join(str(tmp_path / "ckpt"), "mdev")
    assert os.path.exists(os.path.join(ckpt_path, "checkpoint_0.msgpack"))
    mission2 = make(resume=ckpt_path)
    state2 = mission2.init_state()
    # the last checkpoint write happened at the valInterval=40 eval
    assert int(np.asarray(state2.step)) == 40
    mission2.config.TRAIN.epochs = 1
    state2 = mission2.train()
    assert int(np.asarray(state2.step)) == 42


def test_eval_step_rebuilt_when_recognizer_changes(lmdb_dir, tmp_path, monkeypatch):
    """test() switches the eval recognizer via --rec (--test_model); the
    cached eval step must be rebuilt for the new recognizer, not silently
    reused — otherwise mission.train(); mission.test(--rec moran) reports
    accuracy from the wrong recognizer."""
    monkeypatch.chdir(tmp_path)
    config = load_config()
    t = config.TRAIN
    t.train_data_dir = [lmdb_dir]
    t.VAL.val_data_dir = [lmdb_dir]
    t.batch_size = 8
    t.ckpt_dir = str(tmp_path / "ckpt")
    args = default_args(arch="srcnn", srb=2, hd_u=8, batch_size=8, vis_dir="rk")
    mission = TextSR(config, args)

    mission._build_steps(with_train=False)       # default: CRNN teacher
    step_crnn = mission._eval_step
    assert mission._decoder is None              # CRNN decodes in evaluate()

    mission.args["test_model"] = "MORAN"
    mission._build_steps(with_train=False)
    assert mission._eval_step is not step_crnn
    from tpgsr_tpu.models.moran import decode_moran_ids
    assert mission._decoder is decode_moran_ids

    # unchanged key -> cache hit
    step_moran = mission._eval_step
    mission._build_steps(with_train=False)
    assert mission._eval_step is step_moran


def test_dispatch_chain_trajectory_matches_single_step(lmdb_dir, tmp_path, monkeypatch):
    """TRAIN.dispatch_chain > 1 (k train steps scanned inside one jit
    dispatch, the tunnel-RTT amortization of docs/perf_notes.md) must be a
    pure DISPATCH optimization: identical per-iteration loss scalars,
    val/ckpt still firing on their exact global iterations (chunks are cut
    at interval boundaries), and the same final step counter."""
    monkeypatch.chdir(tmp_path)

    def run(chain, vis):
        config = load_config()
        t = config.TRAIN
        t.train_data_dir = [lmdb_dir]
        t.VAL.val_data_dir = [lmdb_dir]
        t.batch_size = 8
        t.epochs = 3            # 2 iters/epoch -> 6 iters
        t.displayInterval = 1000
        t.VAL.valInterval = 3   # forces a mid-epoch chunk cut (3 % 2 != 0)
        t.saveInterval = 1000
        t.dispatch_chain = chain
        t.ckpt_dir = str(tmp_path / f"ckpt_{vis}")
        args = default_args(arch="srcnn", srb=2, hd_u=8, batch_size=8,
                            vis_dir=vis)
        state = TextSR(config, args).train()
        log = os.path.join("tensorboard", vis, "scalars.jsonl")
        recs = [json.loads(l) for l in open(log)]
        return state, recs

    s1, r1 = run(1, "chain1")
    s4, r4 = run(4, "chain4")
    assert int(np.asarray(s1.step)) == int(np.asarray(s4.step)) == 6

    def stream(recs, prefix):
        return sorted((r["tag"], r["step"], r["value"]) for r in recs
                      if r["tag"].startswith(prefix))

    # the loss scalar stream (every 5th iter) is identical
    l1, l4 = stream(r1, "loss/"), stream(r4, "loss/")
    assert [(t_, s_) for t_, s_, _ in l1] == [(t_, s_) for t_, s_, _ in l4]
    np.testing.assert_allclose([v for *_, v in l1], [v for *_, v in l4],
                               rtol=1e-5)
    # eval fired at the exact global iterations 3 and 6 in BOTH modes
    for recs in (r1, r4):
        evals = {r["step"] for r in recs if r["tag"].startswith("eval/")}
        assert evals == {3, 6}
    # and the eval metrics agree (the states at iter 3/6 match)
    e1, e4 = stream(r1, "eval/"), stream(r4, "eval/")
    assert [(t_, s_) for t_, s_, _ in e1] == [(t_, s_) for t_, s_, _ in e4]
    np.testing.assert_allclose([v for *_, v in e1], [v for *_, v in e4],
                               rtol=1e-5, atol=1e-7)


def test_chunked_train_calls_continue_globally(lmdb_dir, tmp_path, monkeypatch):
    """Repeated train() calls (epochs=1 per call, the resumable-chunk
    pattern of examples/train_synthetic.py) must continue GLOBAL epoch and
    iteration numbering: each slice gets a fresh shuffle/augmentation
    stream and val/save intervals fire on global iters — not restart at
    iteration 1 every call (where intervals larger than one epoch would
    never fire and every slice would replay epoch 1's batch order)."""
    monkeypatch.chdir(tmp_path)
    config = load_config()
    t = config.TRAIN
    t.train_data_dir = [lmdb_dir]
    t.VAL.val_data_dir = [lmdb_dir]
    t.batch_size = 8
    t.epochs = 1
    t.displayInterval = 1000
    t.VAL.valInterval = 4   # > one 2-iter epoch: fires only with global iters
    t.saveInterval = 1000
    t.ckpt_dir = str(tmp_path / "ckpt")
    args = default_args(arch="srcnn", srb=2, hd_u=8, batch_size=8, vis_dir="chunk")
    mission = TextSR(config, args)
    state = None
    for _ in range(3):  # 3 calls x 2 iters/epoch = global iters 1..6
        state = mission.train()
    assert int(np.asarray(state.step)) == 6
    log = os.path.join("tensorboard", "chunk", "scalars.jsonl")
    recs = [json.loads(l) for l in open(log)]
    # loss logged at global iters%5==0 -> iteration 5 exists
    assert any(r["tag"] == "loss/total" and r["step"] == 5 for r in recs)
    # the valInterval=4 eval fired (impossible with per-call iters 1..2)
    assert any(r["tag"].startswith("eval/") and r["step"] == 4 for r in recs)


def test_train_with_syn_dataset(lmdb_dir, tmp_path, monkeypatch):
    """--syn: SingleImageLMDB (HR-only records) + the syn collate
    (alignCollate_syn semantics: LR = PIL-bicubic downsample of HR,
    dataset.py:901-992) drive the SAME jitted train step end-to-end
    (interfaces/base.py:72-101's syn dispatch, exercised nowhere else in
    the suite)."""
    monkeypatch.chdir(tmp_path)
    config = load_config()
    t = config.TRAIN
    t.train_data_dir = [lmdb_dir]
    t.VAL.val_data_dir = [lmdb_dir]
    t.VAL.valInterval = 4
    t.saveInterval = 1000
    t.displayInterval = 1000
    t.batch_size = 8
    t.epochs = 3  # 2 iters/epoch -> 6 iters: crosses the 5-iter loss log
    t.ckpt_dir = str(tmp_path / "ckpt")
    args = default_args(
        arch="tsrn_tl_cascade", STN=False, mask=True, use_distill=True,
        gradient=True, sr_share=True, tpg_share=True, stu_iter=1,
        srb=2, hd_u=8, batch_size=8, syn=True, vis_dir="syn_e2e",
    )
    state = TextSR(config, args).train()
    assert int(np.asarray(state.step)) == 6
    log = os.path.join("tensorboard", "syn_e2e", "scalars.jsonl")
    recs = [json.loads(l) for l in open(log)]
    losses = [r["value"] for r in recs if r["tag"] == "loss/total"]
    assert losses and all(np.isfinite(losses))
    assert any(r["tag"].startswith("eval/") for r in recs)


def test_train_with_mixed_dataset(lmdb_dir, tmp_path, monkeypatch):
    """--mixed: MixedLMDB's HR-as-LR coin flip (lmdbDataset_mix,
    dataset.py:766-813) through the full train loop."""
    monkeypatch.chdir(tmp_path)
    config = load_config()
    t = config.TRAIN
    t.train_data_dir = [lmdb_dir]
    t.VAL.val_data_dir = [lmdb_dir]
    t.VAL.valInterval = 1000
    t.saveInterval = 1000
    t.displayInterval = 1000
    t.batch_size = 8
    t.epochs = 3  # 2 iters/epoch -> 6 iters: crosses the 5-iter loss log
    t.ckpt_dir = str(tmp_path / "ckpt")
    args = default_args(
        arch="tsrn_tl_cascade", STN=False, mask=True, use_distill=True,
        gradient=True, sr_share=True, tpg_share=True, stu_iter=1,
        srb=2, hd_u=8, batch_size=8, mixed=True, vis_dir="mixed_e2e",
    )
    state = TextSR(config, args).train()
    assert int(np.asarray(state.step)) == 6
    log = os.path.join("tensorboard", "mixed_e2e", "scalars.jsonl")
    recs = [json.loads(l) for l in open(log)]
    losses = [r["value"] for r in recs if r["tag"] == "loss/total"]
    assert losses and all(np.isfinite(losses))


def test_train_with_ic15sr_dataset(tmp_path, monkeypatch):
    """--ic15sr: the IC15 TextSR PGM-folder dataset (lmdbDataset_realIC15TextSR,
    dataset.py:152-238) through the full train loop + eval — the last
    dataset-selection flag without an end-to-end drive."""
    from tests.fixtures import render_word

    monkeypatch.chdir(tmp_path)
    root = tmp_path / "ic15"
    for sub in ("HRx2/train", "LRx2/train", "HRx2/test", "LRx2/test"):
        (root / sub).mkdir(parents=True)
    words = ["abc", "de", "fgh", "ij", "klm", "no", "pqr", "st"]
    for split in ("train", "test"):
        lines = []
        for i, w in enumerate(words):
            render_word(w, (128, 32)).convert("L").save(root / "HRx2" / split / f"s{i}.pgm")
            render_word(w, (64, 16)).convert("L").save(root / "LRx2" / split / f"s{i}.pgm")
            lines.append(f's{i}, "{w}"')
        (root / f"{split}_GT.txt").write_text("\n".join(lines) + "\n")

    config = load_config()
    t = config.TRAIN
    t.train_data_dir = [str(root)]
    t.VAL.val_data_dir = [str(root)]
    t.VAL.valInterval = 3  # 1 iter/epoch x 3 epochs: fires at the last iter
    t.saveInterval = 1000
    t.displayInterval = 1000
    t.batch_size = 8
    t.epochs = 3  # 8 items / batch 8, drop_last -> 1 iter/epoch
    t.ckpt_dir = str(tmp_path / "ckpt")
    args = default_args(
        arch="tsrn_tl_cascade", STN=False, mask=True, use_distill=True,
        gradient=True, sr_share=True, tpg_share=True, stu_iter=1,
        srb=2, hd_u=8, batch_size=8, ic15sr=True, vis_dir="ic15_e2e",
    )
    state = TextSR(config, args).train()
    assert int(np.asarray(state.step)) == 3
    log = os.path.join("tensorboard", "ic15_e2e", "scalars.jsonl")
    recs = [json.loads(l) for l in open(log)]
    assert any(r["tag"].startswith("eval/") for r in recs)
