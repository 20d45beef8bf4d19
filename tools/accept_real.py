#!/usr/bin/env python3
"""Turnkey real-data acceptance run: TextZoom LMDBs + published checkpoints.

First contact with real data in one command.  Given the three TextZoom test
LMDBs and the published checkpoints (the TPGSR generator .pth and the three
pretrained eval recognizers crnn.pth / aster_demo.pth.tar / moran_demo.pth,
interfaces/base.py:634-718), this script

  1. imports every checkpoint through ``tpgsr_tpu.interop.torch_import``
     (reporting per-file key-surface success/failure),
  2. runs ``--go_test`` over easy/medium/hard once per requested eval
     recognizer (the reference's test_bible flow,
     interfaces/super_resolution.py:540-1347), and
  3. prints an acceptance table next to the paper targets recorded in
     BASELINE.md (arXiv:2106.15368; CRNN rows are the canonical ones).

Usage (real data)::

    python tools/accept_real.py \
        --textzoom /data/TextZoom/test \
        --ckpt /ckpts/model_best_0.pth            # or a ckpt dir, or msgpack \
        --crnn /ckpts/crnn.pth \
        --aster /ckpts/aster_demo.pth.tar \
        --moran /ckpts/moran_demo.pth \
        --recognizers crnn,aster,moran

``--textzoom`` may point either at the directory that CONTAINS easy/medium/
hard or at the TextZoom root holding test/{easy,medium,hard}.

Dry-run (no real files needed; exercises every code path end-to-end on tiny
synthetic LMDBs with randomly initialized weights)::

    python tools/accept_real.py --dry-run
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Paper targets (BASELINE.md "Paper-sourced targets" — approximate, re-verify
# against arXiv:2106.15368 before gating releases on them).
PAPER_TARGETS_CRNN = {
    "1-stage": {"easy": 0.61, "medium": 0.50, "hard": 0.37},
    "3-stage": {"easy": 0.63, "medium": 0.52, "hard": 0.39},
}

SPLITS = ("easy", "medium", "hard")
REC_KEY = {"crnn": "CRNN", "aster": "ASTER", "moran": "MORAN"}


def _find_split_dirs(root: str):
    """Accept either .../test (holding easy/medium/hard) or the TextZoom
    root (holding test/easy ...)."""
    for base in (root, os.path.join(root, "test")):
        dirs = [os.path.join(base, s) for s in SPLITS]
        if all(os.path.isdir(d) for d in dirs):
            return dirs
    raise SystemExit(
        f"--textzoom: could not find easy/medium/hard under {root!r} "
        f"(tried {root}/<split> and {root}/test/<split>)"
    )


def _check_import(label: str, path: str, fn) -> bool:
    """Run one checkpoint importer, report, never crash the run."""
    if not path:
        print(f"  [skip] {label}: no path given")
        return False
    if not os.path.exists(path):
        print(f"  [FAIL] {label}: {path} does not exist")
        return False
    try:
        tree = fn(path)
        n = sum(x.size for x in _leaves(tree))
        print(f"  [ok]   {label}: {path} ({n:,} params)")
        return True
    except Exception as e:  # noqa: BLE001 — report and continue
        print(f"  [FAIL] {label}: {path}: {type(e).__name__}: {e}")
        return False


def _leaves(tree):
    import jax

    return [x for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "size")]


def _run_go_test(args_ns, split_dirs, rec: str):
    """One --go_test pass with eval recognizer ``rec``; returns
    {split: metric_dict}."""
    from tpgsr_tpu.config import AttrDict, load_config, tpg_opt
    from tpgsr_tpu.train.logging import ScalarLogger
    from tpgsr_tpu.train.trainer import TextSR

    args = AttrDict(
        arch=args_ns.arch,
        go_test=True,
        test=False,
        demo=False,
        mask=args_ns.mask,
        STN=args_ns.stn,
        sr_share=True,
        stu_iter=args_ns.stu_iter,
        use_distill=True,
        gradient=True,
        rec=rec,
        test_model=REC_KEY[rec],
        resume=args_ns.ckpt or None,
        srb=args_ns.srb,
        batch_size=args_ns.batch,
        vis_dir=args_ns.vis_dir,
    )
    config = load_config()
    t = config.TRAIN
    t.batch_size = args_ns.batch
    t.VAL.val_data_dir = list(split_dirs)
    t.VAL.n_vis = 0
    if args_ns.crnn:
        t.VAL.crnn_pretrained = args_ns.crnn
    if args_ns.aster:
        t.VAL.rec_pretrained = args_ns.aster
    if args_ns.moran:
        t.VAL.moran_pretrained = args_ns.moran

    mission = TextSR(config, args, tpg_opt())
    state = mission.init_state()
    mission._build_steps(with_train=False)
    loaders = mission.get_val_data()
    logger = ScalarLogger(os.path.join(tempfile.gettempdir(), "accept_tb"), clear=True)
    try:
        return mission._run_val(state, loaders, logger, iters=0)
    finally:
        logger.close()


def _print_table(results, stages_label: str):
    """results: {rec: {split: metric_dict}}"""
    tgt = PAPER_TARGETS_CRNN.get(stages_label, {})
    print("\n=== acceptance table (accuracy on SR output) ===")
    hdr = f"{'recognizer':<10}" + "".join(f"{s:>18}" for s in SPLITS) + f"{'avg':>10}"
    print(hdr)
    for rec, mds in results.items():
        cells, accs = [], []
        for s in SPLITS:
            md = mds.get(s) or mds.get(os.path.basename(s)) or {}
            a = float(md.get("accuracy", float("nan")))
            accs.append(a)
            cell = f"{a*100:6.2f}%"
            if rec == "crnn" and s in tgt:
                cell += f" (paper {tgt[s]*100:.0f}%)"
            cells.append(f"{cell:>18}")
        avg = sum(accs) / len(accs) if accs else float("nan")
        print(f"{rec:<10}" + "".join(cells) + f"{avg*100:9.2f}%")
    print("\npsnr/ssim (recognizer-independent; from the last recognizer pass):")
    last = next(reversed(results.values()))
    for s in SPLITS:
        md = last.get(s) or {}
        print(
            f"  {s:<8} psnr={float(md.get('psnr_avg', float('nan'))):6.2f} dB   "
            f"ssim={float(md.get('ssim_avg', float('nan'))):.4f}"
        )
    print(
        "\nPaper targets are approximate (BASELINE.md); PSNR ≈20–22 dB and "
        "SSIM ≈0.75–0.80 are the expected TSRN-family bands."
    )


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--textzoom", help="TextZoom test root (easy/medium/hard)")
    p.add_argument("--ckpt", default="", help="TPGSR generator checkpoint: "
                   "reference .pth file, reference ckpt dir, or our msgpack dir")
    p.add_argument("--crnn", default="", help="crnn.pth (teacher + CRNN eval)")
    p.add_argument("--aster", default="", help="aster_demo.pth.tar")
    p.add_argument("--moran", default="", help="moran_demo.pth")
    p.add_argument("--recognizers", default="crnn",
                   help="comma list from crnn,aster,moran")
    p.add_argument("--arch", default="tsrn_tl_cascade")
    p.add_argument("--stu_iter", type=int, default=1)
    p.add_argument("--srb", type=int, default=5)
    p.add_argument("--batch", type=int, default=48)
    p.add_argument("--mask", action="store_true", default=True)
    p.add_argument("--no-mask", dest="mask", action="store_false")
    p.add_argument("--stn", action="store_true", default=True)
    p.add_argument("--vis_dir", default="accept_real")
    p.add_argument("--dry-run", action="store_true",
                   help="synthetic LMDBs + random weights; plumbing only")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (sitecustomize ignores "
                        "JAX_PLATFORMS; this calls jax.config.update)")
    p.add_argument("--json", help="also write the raw metric dicts here")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    recs = [r.strip() for r in args.recognizers.split(",") if r.strip()]
    bad = [r for r in recs if r not in REC_KEY]
    if bad:
        raise SystemExit(f"unknown recognizers {bad}; pick from {sorted(REC_KEY)}")

    tmpdir = None
    if args.dry_run:
        print("[dry-run] building tiny synthetic TextZoom LMDBs ...")
        from tests.fixtures import make_textzoom_lmdb

        tmpdir = tempfile.mkdtemp(prefix="accept_dry_")
        split_dirs = []
        for i, s in enumerate(SPLITS):
            d = os.path.join(tmpdir, s)
            make_textzoom_lmdb(d, n=6, seed=i)
            split_dirs.append(d)
        args.batch = 6
    else:
        if not args.textzoom:
            raise SystemExit("--textzoom is required (or use --dry-run)")
        split_dirs = _find_split_dirs(args.textzoom)

    print("checkpoint imports:")
    from tpgsr_tpu.interop import torch_import as ti

    _check_import("crnn", args.crnn, lambda f: ti.import_crnn(ti.load_torch_state_dict(f)))
    _check_import("aster", args.aster, lambda f: ti.import_aster(ti.load_torch_state_dict(f)))
    _check_import("moran", args.moran, lambda f: ti.import_moran(ti.load_torch_state_dict(f)))
    if args.ckpt and ti.is_torch_checkpoint(args.ckpt) and not os.path.isdir(args.ckpt):
        _check_import(
            "generator", args.ckpt,
            lambda f: ti.import_sr_checkpoint(args.arch, ti._load_reference_pth(f),
                                              srb_nums=args.srb),
        )
    elif args.ckpt:
        print(f"  [info] generator: {args.ckpt} (directory; imported per stage at init)")
    else:
        print("  [info] generator: none given — random init (dry-run/plumbing mode)")

    results = {}
    for rec in recs:
        print(f"\n--- go_test with eval recognizer {rec.upper()} ---")
        t0 = time.time()
        mds = _run_go_test(args, split_dirs, rec)
        print(f"  ({time.time() - t0:.1f}s)")
        results[rec] = mds

    _print_table(results, "3-stage" if args.stu_iter >= 3 else "1-stage")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({r: {s: dict(md) for s, md in mds.items()}
                       for r, mds in results.items()}, f, indent=2, default=float)
        print(f"raw metrics -> {args.json}")


if __name__ == "__main__":
    main()
