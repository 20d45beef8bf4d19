#!/usr/bin/env python3
"""End-to-end learning demo on synthetic data (no pretrained checkpoints).

The reference's accuracy numbers depend on pretrained torch recognizers we
cannot download here; this script instead demonstrates the full TPGSR loop
*learning from scratch*:

  1. render a synthetic TextZoom-style LMDB (sharp HR / degraded LR pairs);
  2. train a CRNN recognizer on the HR crops with our CTC loss (the
     "teacher" the reference loads from crnn.pth);
  3. train TPGSR-TSRN (cascade arch, distill + CTC + gradient losses)
     against that teacher;
  4. report CRNN word accuracy on LR vs SR: SR should recover accuracy the
     degradation destroyed.

Run: python examples/train_synthetic.py [--iters N] [--teacher-iters N]

NOTE on scale: the defaults are a quick smoke (teacher CTC only reaches
~16 after 600 iters — not converged; measured trajectory: 17.7 @500,
13.9 @1000, 7.8 @1500, 3.6 @2000, 2.0 @2500, HR word accuracy 16% @2500
and still climbing).  The validated end-to-end result (teacher 97.7%,
LR 0.4% -> SR 90.2%, see git history) needs the teacher trained until its
CTC loss is well under 1 — budget several thousand teacher iters and
~1000 TPGSR iters.  Through a tunneled TPU the teacher loop is dispatch-
bound (~0.25 s/iter), so the full run is an hours-scale job.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_dataset(path: str, n: int, seed: int = 0) -> str:
    """Synthetic pairs: HR = clean rendered word; LR = blur + noise + 2x down."""
    from PIL import Image, ImageDraw, ImageFilter, ImageFont

    from tpgsr_tpu.data.lmdb import write_lmdb

    try:
        font = ImageFont.load_default(size=22)
    except TypeError:  # older PIL: no size arg
        font = ImageFont.load_default()
    rng = np.random.default_rng(seed)
    words = []
    chars = "abcdefghijklmnopqrstuvwxyz0123456789"
    items = [(b"num-samples", str(n).encode())]
    for i in range(1, n + 1):
        word = "".join(rng.choice(list(chars), size=rng.integers(3, 7)))
        words.append(word)
        img = Image.new("RGB", (128, 32), tuple(int(c) for c in rng.integers(0, 60, 3)))
        d = ImageDraw.Draw(img)
        d.text((4, 3), word, font=font,
               fill=tuple(int(c) for c in rng.integers(180, 255, 3)))
        hr = img
        lr = img.filter(ImageFilter.GaussianBlur(0.9)).resize((64, 16), Image.BICUBIC)
        lr_arr = np.asarray(lr, np.float32) + rng.normal(0, 6, (16, 64, 3))
        lr = Image.fromarray(np.clip(lr_arr, 0, 255).astype(np.uint8))

        def enc(im):
            buf = io.BytesIO()
            im.save(buf, "PNG")
            return buf.getvalue()

        items.append((b"label-%09d" % i, word.encode()))
        items.append((b"image_hr-%09d" % i, enc(hr)))
        items.append((b"image_lr-%09d" % i, enc(lr)))
    write_lmdb(path, sorted(items))
    return path


def train_teacher(ds, iters: int, batch: int, seed: int = 0,
                  resume_path: str = "", deadline: float = 0.0):
    """Train CRNN on HR crops with CTC (stands in for crnn.pth).

    Resumable: with ``resume_path`` set, progress (params, batch_stats,
    Adam state, done-iteration count) is saved there after every chunk and
    restored on the next call; with ``deadline`` (time.time() value) set,
    returns early once passed.  Needed because the TPU tunnel here only
    serves foreground processes bounded to ~10 min each.

    Returns (variables, done_iters)."""
    import jax
    import jax.numpy as jnp
    import optax

    from tpgsr_tpu.charset import CTC_NUM_CLASSES, encode_ctc_padded
    from tpgsr_tpu.data.transforms import resize_normalize
    from tpgsr_tpu.models.crnn import CRNN
    from tpgsr_tpu.ops.ctc import ctc_loss
    from tpgsr_tpu.train.priors import parse_crnn_data

    from flax import serialization

    model = CRNN(nclass=CTC_NUM_CLASSES)
    variables = model.init(jax.random.PRNGKey(seed), np.zeros((1, 32, 100, 1), np.float32),
                           train=True)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    start_iter = 0
    if resume_path and os.path.exists(resume_path):
        raw = serialization.msgpack_restore(open(resume_path, "rb").read())
        params = serialization.from_state_dict(params, raw["params"])
        stats = serialization.from_state_dict(stats, raw["batch_stats"])
        opt_state = serialization.from_state_dict(opt_state, raw["opt_state"])
        start_iter = int(raw["done"])
        print(f"  teacher resumed at iter {start_iter}")

    def save_progress(done):
        if not resume_path:
            return
        tree = serialization.to_state_dict({
            "params": jax.device_get(params),
            "batch_stats": jax.device_get(stats),
            "opt_state": jax.device_get(opt_state),
            "done": done,
        })
        tmp = resume_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.msgpack_serialize(tree))
        os.replace(tmp, resume_path)

    def loss_fn(params, stats, imgs, labels, lengths):
        out, mut = model.apply({"params": params, "batch_stats": stats},
                               parse_crnn_data(imgs), train=True,
                               mutable=["batch_stats"])
        per = ctc_loss(out, labels, lengths)
        return jnp.mean(per), mut["batch_stats"]

    # K steps per dispatch: through a tunneled TPU a single-step loop is
    # RTT-bound (~0.25 s/iter); scanning CHUNK steps inside one jit call and
    # shipping the chunk's images as uint8 makes the loop compute-bound.
    CHUNK = 25

    @jax.jit
    def run_chunk(params, stats, opt_state, imgs_u8, labels, lengths):
        def one(carry, xs):
            params, stats, opt_state = carry
            imgs_u8, labels, lengths = xs
            imgs = imgs_u8.astype(jnp.float32) / 255.0
            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, stats, imgs, labels, lengths)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), stats, opt_state), loss

        (params, stats, opt_state), losses = jax.lax.scan(
            one, (params, stats, opt_state), (imgs_u8, labels, lengths))
        return params, stats, opt_state, losses[-1]

    rng = np.random.default_rng(seed)
    n = len(ds)
    done = 0
    while done < iters:
        # deterministic data order: replay the consumed prefix of the RNG
        # stream when resuming so a chunked run equals an unchunked one
        k = min(CHUNK, iters - done)
        idx_all = [rng.integers(0, n, batch) for _ in range(k)]
        done += k
        if done <= start_iter:
            continue
        imgs_k, labels_k, lengths_k = [], [], []
        for idx in idx_all:
            imgs, words = [], []
            for j in idx:
                hr, _, label = ds[int(j)]
                imgs.append(resize_normalize(hr, (128, 32), as_uint8=True))
                words.append(label)
            labels, lengths = encode_ctc_padded(words, 15)
            imgs_k.append(np.stack(imgs))
            labels_k.append(labels)
            lengths_k.append(lengths)
        # a shorter tail chunk just triggers one extra compile
        params, stats, opt_state, loss = run_chunk(
            params, stats, opt_state,
            np.stack(imgs_k), np.stack(labels_k), np.stack(lengths_k))
        if done % 100 < CHUNK and done >= 100:
            print(f"  teacher iter {done}: ctc {float(loss):.3f}", flush=True)
        if deadline and time.time() > deadline:
            save_progress(done)
            print(f"  teacher paused at iter {done} (time budget)", flush=True)
            return {"params": params, "batch_stats": stats}, done
    save_progress(done if iters else start_iter)
    return {"params": params, "batch_stats": stats}, max(done, start_iter)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--teacher-iters", type=int, default=600)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n-train", type=int, default=1500)
    ap.add_argument("--workdir", default="")
    ap.add_argument("--compute-dtype", default="", choices=["", "fp32", "bf16"],
                    help="TRAIN.compute_dtype for the TPGSR training phase "
                         "(default: inherit the framework default from "
                         "configs/super_resolution.yaml)")
    ap.add_argument("--json-out", default="",
                    help="write a machine-readable result artifact here")
    ap.add_argument("--min-lift", type=float, default=-1.0,
                    help="fail (exit 1) unless SR accuracy - LR accuracy "
                         ">= this (e.g. 0.3 for the converged config)")
    ap.add_argument("--max-seconds", type=float, default=0.0,
                    help="pause (exit 3) when the budget runs out; rerun the "
                         "same command with --workdir to continue (the TPU "
                         "tunnel only serves bounded foreground processes)")
    ap.add_argument("--platform", default="", choices=["", "cpu"],
                    help="'cpu' forces the CPU backend (the sitecustomize "
                         "axon override ignores JAX_PLATFORMS, so this must "
                         "be a config update)")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    deadline = time.time() + args.max_seconds if args.max_seconds else 0.0
    work = args.workdir or tempfile.mkdtemp(prefix="tpgsr_syn_")
    os.makedirs(work, exist_ok=True)
    os.chdir(work)
    print(f"workdir: {work}", flush=True)

    train_dir = os.path.join(work, "train")
    val_dir = os.path.join(work, "val")
    if not os.path.exists(os.path.join(train_dir, "data.mdb")):
        make_dataset(train_dir, args.n_train, seed=0)
        make_dataset(val_dir, 256, seed=999)
    train_db, val_db = train_dir, val_dir

    from tpgsr_tpu.data.datasets import TextZoomDataset

    t0 = time.time()
    teacher_ds = TextZoomDataset(train_db, voc_type="lower")
    teacher_path = os.path.join(work, "teacher_progress.msgpack")
    teacher, teacher_done = train_teacher(
        teacher_ds, args.teacher_iters, args.batch,
        resume_path=teacher_path, deadline=deadline,
    )
    if teacher_done < args.teacher_iters:
        print(f"PAUSED teacher {teacher_done}/{args.teacher_iters}", flush=True)
        sys.exit(3)
    print(f"teacher ready ({teacher_done} iters, +{time.time() - t0:.0f}s this call)",
          flush=True)

    from flax import serialization

    # --- TPGSR training against the trained teacher -------------------------
    from tpgsr_tpu.config import default_args, load_config
    from tpgsr_tpu.train.trainer import TextSR

    iters_per_epoch = args.n_train // args.batch
    total_epochs = max(1, (args.iters * args.batch) // args.n_train)
    target_step = total_epochs * iters_per_epoch

    def make_mission(epochs: int, resume: str = ""):
        config = load_config()
        t = config.TRAIN
        t.train_data_dir = [train_db]
        t.VAL.val_data_dir = [val_db]
        t.batch_size = args.batch
        t.epochs = epochs
        t.VAL.valInterval = max(20, args.iters // 3)
        t.saveInterval = iters_per_epoch  # checkpoint at every epoch end
        t.displayInterval = 50
        t.ckpt_dir = os.path.join(work, "ckpt")
        if args.compute_dtype:
            t.compute_dtype = args.compute_dtype
        if resume:
            t.resume = resume
        cli = default_args(
            arch="tsrn_tl_cascade", STN=False, mask=True, use_distill=True,
            use_label=True, gradient=True, sr_share=True, tpg_share=True,
            stu_iter=1, batch_size=args.batch, vis_dir="syn",
        )
        mission = TextSR(config, cli)
        # inject the freshly-trained teacher in place of crnn.pth
        mission._teacher_variables = lambda: {
            "params": teacher["params"], "batch_stats": teacher["batch_stats"]}
        return mission

    ckpt_dir = os.path.join(work, "ckpt", "syn")
    resume = ckpt_dir if os.path.exists(os.path.join(ckpt_dir, "info.json")) else ""
    mission = make_mission(1, resume)
    state = mission.init_state()
    step_done = int(np.asarray(state.step))

    t1 = time.time()
    while step_done < target_step:
        if deadline and time.time() > deadline:
            print(f"PAUSED tpgsr {step_done}/{target_step}", flush=True)
            sys.exit(3)
        # one epoch per train() call keeps each slice short enough to fit
        # the remaining budget; the mission carries the live state between
        # calls (and the epoch-end checkpoint covers a mid-run kill)
        mission.config.TRAIN.epochs = 1
        state = mission.train()
        step_done = int(np.asarray(state.step))
        print(f"  tpgsr step {step_done}/{target_step}", flush=True)
    train_secs = time.time() - t1

    # --- final eval: the learning-validation artifact -----------------------
    from tpgsr_tpu.train.evaluate import evaluate

    # a rerun that restored at (or past) target_step never enters the train
    # loop, so the jitted eval step hasn't been built yet
    if getattr(mission, "_eval_step", None) is None:
        mission._build_steps(with_train=False)
    md = evaluate(mission._eval_step, state, mission.get_val_data()[0],
                  mesh=mission.mesh,
                  **({"decoder": mission._decoder} if mission._decoder else {}))
    lift = md["accuracy"] - md["accuracy_lr"]
    result = {
        "compute_dtype": str(mission.config.TRAIN.get("compute_dtype", "fp32")),
        "teacher_iters": args.teacher_iters,
        "tpgsr_iters": args.iters,
        "n_train": args.n_train,
        "accuracy_lr": round(md["accuracy_lr"], 4),
        "accuracy_sr": round(md["accuracy"], 4),
        "accuracy_hr": round(md["accuracy_hr"], 4),
        "sr_minus_lr": round(lift, 4),
        "psnr": round(md["psnr_avg"], 3),
        "ssim": round(md["ssim_avg"], 4),
        "val_images": md["images"],
        "train_secs": round(train_secs, 1),
    }
    import json

    line = json.dumps(result)
    print("RESULT", line)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line + "\n")
    if args.min_lift >= 0 and lift < args.min_lift:
        print(f"FAIL: SR-LR lift {lift:.4f} < required {args.min_lift}")
        sys.exit(1)


if __name__ == "__main__":
    main()
