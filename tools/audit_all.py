"""Exhaustive CLI-surface audit: every arch and every operation mode through
the real ``TextSR`` orchestrator on synthetic data (CPU backend).

Not part of the pytest suite (compiles ~30 programs, ~45 min on one core);
run it after changes to the trainer/step dispatch plumbing:

    python tools/audit_all.py            # everything
    python tools/audit_all.py archs      # just the 18 archs
    python tools/audit_all.py modes      # just go_test/test/demo/variants

This is the audit that caught the tsrn_c2f/sem_tsrn tuple-output crash and
the esrgan_tl init/apply channel mismatch (see git history).
"""
import os
import sys
import tempfile
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def _setup():
    root = tempfile.mkdtemp()
    os.chdir(root)
    from tests.fixtures import make_textzoom_lmdb

    dirs = {}
    for name, n in (("train", 16), ("val", 8)):
        d = os.path.join(root, name)
        os.makedirs(d)
        make_textzoom_lmdb(d, n=n)
        dirs[name] = d
    demo_d = os.path.join(root, "demo_imgs")
    os.makedirs(demo_d)
    from PIL import Image

    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (16, 64, 3), np.uint8)).save(
            os.path.join(demo_d, f"img{i}.png")
        )
    dirs["demo"] = demo_d
    dirs["ckpt"] = os.path.join(root, "ckpt")
    return dirs


def _config(dirs):
    from tpgsr_tpu.config import load_config

    config = load_config()
    config.TRAIN.train_data_dir = [dirs["train"]]
    config.TRAIN.VAL.val_data_dir = [dirs["val"]]
    config.TRAIN.batch_size = 8
    config.TRAIN.epochs = 1
    config.TRAIN.displayInterval = 1
    config.TRAIN.VAL.valInterval = 2
    config.TRAIN.saveInterval = 100
    # per-step dispatch: the audit checks arch/mode dispatch correctness,
    # and XLA-CPU compiles the scanned chain step pathologically slowly for
    # the big plain backbones (edsr: ~2 min single-step vs >15 min scanned
    # on this 1-core host).  Chunked dispatch has dedicated tests
    # (test_trainer_e2e, test_multihost) and is a TPU-tunnel optimization.
    config.TRAIN.dispatch_chain = 1
    config.TRAIN.ckpt_dir = dirs["ckpt"]
    config.TEST.test_data_dir = dirs["val"]
    return config


def _run(name, dirs, method, **extra):
    from tpgsr_tpu.config import default_args
    from tpgsr_tpu.train.trainer import TextSR

    base = dict(arch="tsrn_tl_cascade", STN=True, mask=True, srb=2, hd_u=8,
                batch_size=8, vis_dir=f"audit-{name.split()[0]}",
                gradient=True, sr_share=True, stu_iter=1)
    base.update(extra)
    try:
        m = TextSR(_config(dirs), default_args(**base))
        getattr(m, method)()
        return "OK"
    except Exception as e:
        traceback.print_exc(limit=3)
        return f"FAIL {type(e).__name__}: {str(e)[:140]}"


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    dirs = _setup()
    from tpgsr_tpu.models.registry import ARCHS

    results = {}
    if what in ("all", "archs"):
        for arch in sorted(ARCHS):
            if arch == "bicubic":
                continue  # eval-only; covered by the bicubic go_test mode
            results[arch] = _run(
                arch, dirs, "train", arch=arch,
                use_distill=(arch == "tsrn_tl_cascade"),
            )
            print(f"[{arch}] {results[arch]}", flush=True)
    if what in ("all", "modes"):
        cases = [
            ("go_test CRNN", dict(go_test=True, test_model="CRNN"), "train"),
            ("go_test ASTER", dict(go_test=True, test_model="ASTER"), "train"),
            ("go_test MORAN", dict(go_test=True, test_model="MORAN"), "train"),
            ("go_test SEED", dict(go_test=True, test_model="SEED"), "train"),
            ("go_test random_reso", dict(go_test=True, test_model="CRNN",
                                         random_reso=True, batch_size=4), "train"),
            ("bicubic go_test", dict(arch="bicubic", go_test=True,
                                     test_model="CRNN", mask=False, STN=False), "train"),
            ("tpg OPT train", dict(tpg="OPT", use_distill=True), "train"),
            ("mixed train", dict(mixed=True), "train"),
            ("test mode", dict(test=True, rec="crnn"), "test"),
            ("demo mode", dict(demo=True, demo_dir=dirs["demo"]), "demo"),
        ]
        for name, extra, method in cases:
            results[name] = _run(name, dirs, method, **extra)
            print(f"[{name}] {results[name]}", flush=True)

    bad = [a for a, r in results.items() if r != "OK"]
    print("\n=== SUMMARY ===")
    for a, r in sorted(results.items()):
        print(f"{a}: {r}")
    print("FAILURES:", bad if bad else "none")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
