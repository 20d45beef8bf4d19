"""Dataset readers over LMDB / directories.

Parity targets (dataset/dataset.py):
  * ``TextZoomDataset`` == ``lmdbDataset_real`` (:104-149): paired LR/HR LMDB
    with keys ``label-%09d`` / ``image_hr-%09d`` / ``image_lr-%09d`` (1-based)
    and a ``num-samples`` count; skips forward on unreadable records;
    labels filtered with str_filt.
  * ``SingleImageLMDB`` == ``lmdbDataset`` (:60-101): synthetic single-image
    LMDB (``image-%09d`` fallback key) — used with --syn.
  * ``MixedLMDB`` == ``lmdbDataset_mix`` (:766-813): HR-as-LR 50% of the time.
  * ``ImageFolderDataset`` == ``lmdbDataset_realForTest`` (:298): a directory
    of images for --demo / folder inference.
  * ``ConcatDataset`` (:1484-1524): cumsum + bisect over multiple roots.
"""

from __future__ import annotations

import bisect
import io
import os
import random
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from tpgsr_tpu.charset import str_filt
from tpgsr_tpu.data.lmdb import LMDBReader


def _buf2pil(buf: Optional[bytes], mode: str = "RGB") -> Image.Image:
    if buf is None:
        raise IOError("missing image record")
    return Image.open(io.BytesIO(buf)).convert(mode)


class TextZoomDataset:
    """Paired LR/HR TextZoom LMDB. Items: (img_hr, img_lr, label_str).

    ``cache_images=True`` keeps decoded items in RAM after first access.
    Decoding (JPEG parse + decompress per tiny crop) dominates the host
    input pipeline; TextZoom-scale sets decode to a few hundred MB, so
    epochs 2+ become memcpy-speed.  Deterministic: the cached tuple is
    exactly what __getitem__ returned on first access (random choices, e.g.
    MixedLMDB's HR-as-LR, are layered *above* this cache and stay fresh).
    """

    def __init__(self, root: str, voc_type: str = "upper", max_len: int = 100,
                 test: bool = False, cache_images: bool = False):
        self.env = LMDBReader(root)
        n = self.env.get(b"num-samples")
        if n is None:
            raise IOError(f"{root}: missing num-samples key")
        self.n_samples = int(n)
        self.voc_type = voc_type
        self.max_len = max_len
        self.test = test
        # guard: a million tiny crops ~ 15 GB — below typical TPU-host RAM,
        # above it we fall back to uncached reads
        self._cache: Optional[dict] = (
            {} if (cache_images and self.n_samples <= 1_000_000) else None
        )

    def __len__(self) -> int:
        return self.n_samples

    def __getitem__(self, index: int):
        if self._cache is not None:
            hit = self._cache.get(index)
            if hit is not None:
                return hit
        assert index <= len(self), "index range error"
        key = index
        index += 1  # reference keys are 1-based (dataset.py:134)
        for probe in range(index, min(index + 16, self.n_samples + 1)):
            label = self.env.get(b"label-%09d" % probe)
            try:
                img_hr = _buf2pil(self.env.get(b"image_hr-%09d" % probe))
                img_lr = _buf2pil(self.env.get(b"image_lr-%09d" % probe))
            except (IOError, OSError):
                continue  # skip-forward on corrupt records (dataset.py:146-147)
            word = label.decode() if label is not None else ""
            item = (img_hr, img_lr, str_filt(word, self.voc_type))
            if self._cache is not None:
                self._cache[key] = item
            return item
        raise IOError(f"no readable record at or after index {index}")


class SingleImageLMDB:
    """Synthetic single-image LMDB (HR only). Items: (img, label_str)."""

    def __init__(self, root: str, voc_type: str = "upper", max_len: int = 31, test: bool = True):
        self.env = LMDBReader(root)
        self.n_samples = int(self.env.get(b"num-samples"))
        self.voc_type = voc_type
        self.max_len = max_len

    def __len__(self) -> int:
        return self.n_samples

    def __getitem__(self, index: int):
        index += 1
        label = self.env.get(b"label-%09d" % index)
        buf = self.env.get(b"image_hr-%09d" % index)
        if buf is None:
            buf = self.env.get(b"image-%09d" % index)
        img = _buf2pil(buf)
        word = label.decode() if label is not None else ""
        return img, str_filt(word, self.voc_type)


class MixedLMDB(TextZoomDataset):
    """HR used as LR 50% of the time (lmdbDataset_mix, dataset.py:766-813)."""

    def __init__(self, *args, rng: Optional[random.Random] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.rng = rng or random.Random(0)

    def __getitem__(self, index: int):
        img_hr, img_lr, label = super().__getitem__(index)
        if not self.test and self.rng.random() > 0.5:
            img_lr = img_hr
        return img_hr, img_lr, label


class ImageFolderDataset:
    """Directory of images for demo/folder inference. Items: (img, stem)."""

    EXTS = (".png", ".jpg", ".jpeg", ".bmp")

    def __init__(self, root: str):
        self.root = root
        self.files = sorted(
            f for f in os.listdir(root) if os.path.splitext(f)[1].lower() in self.EXTS
        )

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, index: int):
        path = os.path.join(self.root, self.files[index])
        return Image.open(path).convert("RGB"), os.path.splitext(self.files[index])[0]


class ConcatDataset:
    """Concatenation via cumulative sizes + bisect (dataset.py:1484-1524)."""

    def __init__(self, datasets: Sequence):
        assert len(datasets) > 0
        self.datasets = list(datasets)
        self.cumulative_sizes = np.cumsum([len(d) for d in self.datasets]).tolist()

    def __len__(self) -> int:
        return self.cumulative_sizes[-1]

    def __getitem__(self, idx: int):
        ds_idx = bisect.bisect_right(self.cumulative_sizes, idx)
        if ds_idx > 0:
            idx = idx - self.cumulative_sizes[ds_idx - 1]
        return self.datasets[ds_idx][idx]


class TextZoomWithMask(TextZoomDataset):
    """Paired dataset + edge weight-mask of the HR image.

    == ``lmdbDatasetWithMask_real`` (dataset.py:816-871); the mask is the
    Canny->dilate->blur soft weight in [0.4, 0.9] (edges.edge_weight_mask).
    Items: (img_hr, img_lr, label_str, weighted_mask).
    """

    def __getitem__(self, index: int):
        from tpgsr_tpu.data.edges import edge_weight_mask

        img_hr, img_lr, label = super().__getitem__(index)
        return img_hr, img_lr, label, edge_weight_mask(img_hr)


class SingleImageLMDBIC15(SingleImageLMDB):
    """IC15-style LMDB: single ``image-%09d`` record, LR = HR.

    == ``lmdbDataset_realIC15`` (dataset.py:461-507).  Items mirror the
    paired interface: (img_hr, img_lr=img_hr, label_str).
    """

    def __getitem__(self, index: int):
        img, label = super().__getitem__(index)
        return img, img, label


# lmdbDataset_realCOCOText (:509) / _realIIIT (:354) / _realBadSet (:410) are
# the same single-image-LMDB shape with different key fallbacks; one class
# covers them all.
COCOTextLMDB = SingleImageLMDBIC15
IIITLMDB = SingleImageLMDBIC15
BadSetLMDB = SingleImageLMDBIC15


class SVTDataset:
    """SVT folder layout: <root>/svt_{train,test}/{IMG,label}.

    == ``lmdbDataset_realSVT`` (dataset.py:242-296).  Items:
    (img_hr, img_lr=img_hr, label_str).
    """

    def __init__(self, root: str, voc_type: str = "upper", max_len: int = 100, test: bool = False):
        split = "svt_test" if test else "svt_train"
        d = os.path.join(root, split)
        self.image_dir = os.path.join(d, "IMG")
        self.anno_dir = os.path.join(d, "label")
        self.anno_list = sorted(os.listdir(self.anno_dir))
        self.voc_type = voc_type
        self.max_len = max_len

    def __len__(self) -> int:
        return len(self.anno_list)

    def __getitem__(self, index: int):
        for probe in range(index, min(index + 16, len(self))):
            anno = self.anno_list[probe % len(self)]
            image_path = os.path.join(self.image_dir, anno.split(".")[0] + ".jpg")
            anno_path = os.path.join(self.anno_dir, anno)
            if not os.path.isfile(image_path):
                continue
            try:
                with open(anno_path) as f:
                    word = f.readlines()[0].strip()
                img = Image.open(image_path).convert("RGB")
            except (IOError, OSError, IndexError, ValueError):
                continue
            return img, img, str_filt(word, self.voc_type)
        raise IOError(f"no readable SVT record at or after index {index}")


class IC15TextSRDataset:
    """IC15 TextSR folder of PGM triples + GT file.

    == ``lmdbDataset_realIC15TextSR`` (dataset.py:152-238): reads
    <root>/{HRx2,LRx2}/<split>/<name>.pgm pairs listed in a GT text file of
    lines ``<name>, "<label>"``.  Items: (img_hr, img_lr, label_str).
    """

    def __init__(self, root: str, voc_type: str = "upper", max_len: int = 100, test: bool = False):
        split = "test" if test else "train"
        self.hr_dir = os.path.join(root, "HRx2", split)
        self.lr_dir = os.path.join(root, "LRx2", split)
        gt_file = os.path.join(root, f"{split}_GT.txt")
        self.items: List[Tuple[str, str]] = []
        with open(gt_file) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                name, _, label = line.partition(",")
                self.items.append((name.strip(), label.strip().strip('"')))
        self.voc_type = voc_type
        self.max_len = max_len

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, index: int):
        name, label = self.items[index]
        img_hr = Image.open(os.path.join(self.hr_dir, name + ".pgm")).convert("RGB")
        img_lr = Image.open(os.path.join(self.lr_dir, name + ".pgm")).convert("RGB")
        return img_hr, img_lr, str_filt(label, self.voc_type)


class TextZoomWithW2V(TextZoomDataset):
    """== ``lmdbDatasetWithW2V_real`` (dataset.py:558-611).  The reference's
    FastText hook is effectively disabled (import commented out); items carry
    a zero word-vector placeholder of the documented width."""

    w2v_dim = 300

    def __getitem__(self, index: int):
        img_hr, img_lr, label = super().__getitem__(index)
        return img_hr, img_lr, label, np.zeros(self.w2v_dim, np.float32)
