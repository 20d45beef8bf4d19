"""Character sets, label filtering, and CTC label conversion.

Parity targets in the reference repo (all paths relative to /root/reference):
  * ``utils/util.py:12-25`` (``str_filt``)
  * ``utils/labelmaps.py:6-38`` (``get_vocabulary``/``char2id``/``id2char``)
  * ``dataset/dataset.py:917-924`` (the 37-class CTC alphabet ``- + 0-9 + a-z``)
  * ``utils/utils_crnn.py:10-110`` (``strLabelConverter`` encode/decode)
"""

from __future__ import annotations

import string
from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple

import numpy as np

# The 37-class CTC alphabet used by the TP generator and CRNN decoding.
# Index 0 is the CTC blank ('-').  Reference: dataset/dataset.py:917-918.
CTC_ALPHABET = "0123456789abcdefghijklmnopqrstuvwxyz"
CTC_CHARS = "-" + CTC_ALPHABET
CTC_NUM_CLASSES = len(CTC_CHARS)  # 37
CTC_CHAR_TO_ID: Dict[str, int] = {ch: i for i, ch in enumerate(CTC_CHARS)}

_ALPHA_DICT = {
    "digit": string.digits,
    "lower": string.digits + string.ascii_lowercase,
    "upper": string.digits + string.ascii_letters,
    "all": string.digits + string.ascii_letters + string.punctuation,
}


def str_filt(s: str, voc_type: str) -> str:
    """Drop characters outside the vocabulary; lowercase for ``voc_type='lower'``.

    Mirrors utils/util.py:12-25 exactly (including the lowercase-first rule).
    """
    if voc_type == "lower":
        s = s.lower()
    allowed = _ALPHA_DICT[voc_type]
    return "".join(ch for ch in s if ch in allowed)


def get_vocabulary(
    voc_type: str, EOS: str = "EOS", PADDING: str = "PADDING", UNKNOWN: str = "UNKNOWN"
) -> List[str]:
    """Vocabulary list used by the attention recognizers (ASTER/SEED).

    Mirrors utils/labelmaps.py:6-29.
    """
    if voc_type == "digit":
        voc = list(string.digits)
    elif voc_type == "lower":
        voc = list(string.digits + string.ascii_lowercase)
    elif voc_type == "upper":
        voc = list(string.digits + string.ascii_letters)
    elif voc_type == "all":
        voc = list(string.digits + string.ascii_letters + string.punctuation)
    else:
        raise KeyError("voc_type Error")
    voc.append(EOS)
    voc.append(PADDING)
    voc.append(UNKNOWN)
    return voc


def char2id(voc: Sequence[str]) -> Dict[str, int]:
    return dict(zip(voc, range(len(voc))))


def id2char(voc: Sequence[str]) -> Dict[int, str]:
    return dict(zip(range(len(voc)), voc))


@dataclass
class AsterInfo:
    """Vocabulary metadata for attention recognizers.

    Mirrors interfaces/base.py:867-879 (``AsterInfo``).
    """

    voc_type: str
    EOS: str = "EOS"
    PADDING: str = "PADDING"
    UNKNOWN: str = "UNKNOWN"
    max_len: int = 100
    voc: List[str] = field(default_factory=list)
    char2id: Dict[str, int] = field(default_factory=dict)
    id2char: Dict[int, str] = field(default_factory=dict)
    rec_num_classes: int = 0

    def __post_init__(self):
        assert self.voc_type in ("digit", "lower", "upper", "all")
        self.voc = get_vocabulary(self.voc_type, self.EOS, self.PADDING, self.UNKNOWN)
        self.char2id = char2id(self.voc)
        self.id2char = id2char(self.voc)
        self.rec_num_classes = len(self.voc)


class CTCLabelConverter:
    """str <-> CTC label conversion with blank=0.

    Mirrors utils/utils_crnn.py:10-110 (``strLabelConverter``): characters map
    to ``index+1`` so index 0 is reserved for the CTC blank.
    """

    def __init__(self, alphabet: str = CTC_ALPHABET):
        self.alphabet = alphabet + "-"  # '-1' index convention of the reference
        self.dict = {ch: i + 1 for i, ch in enumerate(alphabet)}

    def encode(self, text) -> Tuple[np.ndarray, np.ndarray]:
        if isinstance(text, str):
            ids = [self.dict[ch] for ch in text]
            return np.asarray(ids, np.int32), np.asarray([len(ids)], np.int32)
        lengths = [len(s) for s in text]
        flat = "".join(text)
        ids = [self.dict[ch] for ch in flat]
        return np.asarray(ids, np.int32), np.asarray(lengths, np.int32)

    def decode(self, ids: Sequence[int], length: int, raw: bool = False) -> str:
        ids = list(ids)[:length]
        if raw:
            return "".join(self.alphabet[i - 1] for i in ids)
        out = []
        for i, t in enumerate(ids):
            if t != 0 and not (i > 0 and ids[i - 1] == t):
                out.append(self.alphabet[t - 1])
        return "".join(out)


def encode_ctc_padded(
    labels: Sequence[str], max_label_len: int, char_to_id: Dict[str, int] = CTC_CHAR_TO_ID
) -> Tuple[np.ndarray, np.ndarray]:
    """Encode a batch of strings to a fixed-shape ``[B, max_label_len]`` int32
    matrix (0-padded, 0 is the blank which never appears in labels) plus a
    ``[B]`` length vector.  XLA needs static shapes, so unlike the reference's
    flat concatenated label list (dataset/dataset.py:1284-1290) we pad.
    Characters not in the charset are dropped, as in the reference.
    """
    batch = np.zeros((len(labels), max_label_len), np.int32)
    lengths = np.zeros((len(labels),), np.int32)
    for b, word in enumerate(labels):
        ids = [char_to_id[ch] for ch in word.lower() if ch in char_to_id]
        ids = ids[:max_label_len]
        batch[b, : len(ids)] = ids
        lengths[b] = len(ids)
    return batch, lengths


class AttentionLabelConverter:
    """str <-> label ids for the attention decoders ('$'-terminated).

    Mirrors utils/utils_moran.py:6-150 ``strLabelConverterForAttention``
    with the '0:1:...:z:$' separated alphabet: encode returns a flat id
    array + per-sample lengths (each word gets a trailing '$'); decode cuts
    at '$'.
    """

    def __init__(self, alphabet: str = "0123456789abcdefghijklmnopqrstuvwxyz$", sep: str = ":"):
        if sep in alphabet:
            self.alphabet = alphabet.split(sep)
        else:
            self.alphabet = list(alphabet)
        self.dict = {ch: i for i, ch in enumerate(self.alphabet)}

    def encode(self, text) -> "Tuple[np.ndarray, np.ndarray]":
        if isinstance(text, str):
            text = [text]
        flat, lengths = [], []
        for word in text:
            word = word.lower() + "$"
            ids = [self.dict[ch] for ch in word if ch in self.dict]
            flat.extend(ids)
            lengths.append(len(ids))
        return np.asarray(flat, np.int64), np.asarray(lengths, np.int64)

    def decode(self, ids, lengths) -> "List[str]":
        out, start = [], 0
        for n in np.asarray(lengths):
            chars = [self.alphabet[int(i)] for i in np.asarray(ids)[start : start + int(n)]]
            word = "".join(chars)
            out.append(word.split("$")[0])
            start += int(n)
        return out


def labels2strs(labels, id2char: Dict[int, str], char2id: Dict[str, int]) -> List[str]:
    """[B, L] id matrix -> strings, cut at EOS (utils/labelmaps.py:40-62)."""
    labels = np.atleast_2d(np.asarray(labels))
    eos = char2id["EOS"]
    out = []
    for row in labels:
        chars = []
        for v in row:
            if int(v) == eos:
                break
            chars.append(id2char[int(v)])
        out.append("".join(chars))
    return out
