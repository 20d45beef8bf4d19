#!/usr/bin/env python3
"""Reproduce the TPGSR paper's TextZoom eval table with this framework.

For a user coming from the reference repo with the real assets on disk:
  * TextZoom LMDBs   (train1/train2 + test/{easy,medium,hard})
  * crnn.pth         (CRNN teacher + eval recognizer)
  * aster_demo.pth.tar / moran_demo.pth (optional eval recognizers)
  * a trained checkpoint directory (this framework's, or torch TSRN_TL
    weights converted via tpgsr_tpu.interop.torch_import.import_tsrn)

this runs the sanctioned --go_test path (reference test.sh) over the three
splits and prints PSNR / SSIM / word accuracy per split — the paper's
headline table.

Usage:
  python examples/eval_textzoom.py \
      --textzoom /data/TextZoom \
      --crnn /ckpts/crnn.pth \
      [--aster /ckpts/aster_demo.pth.tar] [--moran /ckpts/moran_demo.pth] \
      [--resume ckpt/vis_TPGSR-TSRN] \
      [--test-model CRNN|ASTER|MORAN|SEED] [--stu-iter 1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpgsr_tpu.config import default_args, load_config
from tpgsr_tpu.train.trainer import TextSR


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--textzoom", required=True, help="TextZoom root (with test/{easy,medium,hard})")
    ap.add_argument("--crnn", required=True, help="crnn.pth (teacher/eval CRNN)")
    ap.add_argument("--aster", default="", help="aster_demo.pth.tar")
    ap.add_argument("--moran", default="", help="moran_demo.pth")
    ap.add_argument("--resume", default="", help="checkpoint dir or file")
    ap.add_argument("--test-model", default="CRNN", choices=["CRNN", "ASTER", "MORAN", "SEED"])
    ap.add_argument("--stu-iter", type=int, default=1)
    ap.add_argument("--batch", type=int, default=48)
    args = ap.parse_args()

    config = load_config()
    t = config.TRAIN
    t.train_data_dir = [os.path.join(args.textzoom, "train1")]
    t.VAL.val_data_dir = [
        os.path.join(args.textzoom, "test", split) for split in ("easy", "medium", "hard")
    ]
    t.VAL.crnn_pretrained = args.crnn
    t.VAL.rec_pretrained = args.aster
    t.VAL.moran_pretrained = args.moran
    t.batch_size = args.batch

    cli = default_args(
        arch="tsrn_tl_cascade", STN=True, mask=True, gradient=True, sr_share=True,
        stu_iter=args.stu_iter, batch_size=args.batch, go_test=True,
        test_model=args.test_model, resume=args.resume, vis_dir="eval_textzoom",
    )
    TextSR(config, cli).train()  # go_test: one eval pass per split, then exit


if __name__ == "__main__":
    main()
