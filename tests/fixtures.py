"""Synthetic TextZoom-style LMDB fixtures for tests and smoke training."""

import io
import os

import numpy as np
from PIL import Image, ImageDraw

from tpgsr_tpu.data.lmdb import write_lmdb

WORDS = ["hello", "world", "text", "zoom", "super", "res", "tpu", "jax", "scene", "prior"]


def render_word(word: str, size, seed: int = 0) -> Image.Image:
    rng = np.random.default_rng(seed)
    bg = rng.integers(0, 80, 3)
    img = Image.new("RGB", size, tuple(int(c) for c in bg))
    d = ImageDraw.Draw(img)
    d.text((2, 2), word, fill=(int(200 + rng.integers(0, 55)),) * 3)
    arr = np.asarray(img, np.float32)
    noise = rng.normal(0, 8, arr.shape)
    return Image.fromarray(np.clip(arr + noise, 0, 255).astype(np.uint8))


def _jpeg(img: Image.Image) -> bytes:
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=92)
    return buf.getvalue()


def make_textzoom_lmdb(path: str, n: int = 8, seed: int = 0) -> str:
    """Write an lmdbDataset_real-compatible LMDB with n samples."""
    items = [(b"num-samples", str(n).encode())]
    for i in range(1, n + 1):
        word = WORDS[(i - 1) % len(WORDS)]
        hr = render_word(word, (128, 32), seed=seed + i)
        lr = hr.resize((64, 16), Image.BICUBIC)
        items.append((b"label-%09d" % i, word.encode()))
        items.append((b"image_hr-%09d" % i, _jpeg(hr)))
        items.append((b"image_lr-%09d" % i, _jpeg(lr)))
    write_lmdb(path, items)
    return path
