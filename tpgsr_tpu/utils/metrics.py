"""String-level metrics: exact-match accuracy, edit distance, lexicon
variants, and sequence-score post-processing.

Parity target: utils/metrics.py:100-206 — ``Accuracy`` /
``Accuracy_with_lexicon`` / ``EditDistance`` / ``EditDistance_with_lexicon``
/ ``RecPostProcess``.  The reference's ``editdistance.eval`` is replaced by
a pure-python Levenshtein (same value), and its lexicon search
(``_lexicon_search``: pick the lexicon word with minimum edit distance from
the prediction) is reproduced.

These operate on decoded strings (see models.aster.decode_aster_ids /
ops.ctc.ctc_ids_to_strings); decode happens once, metrics are cheap host
code.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def levenshtein(a: str, b: str) -> int:
    """Edit distance (insert/delete/substitute, all cost 1)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _lexicon_search(lexicon: Sequence[str], word: str) -> str:
    """Closest lexicon entry by edit distance (utils/metrics.py:93-97)."""
    dists = [levenshtein(word, w.lower()) for w in lexicon]
    return lexicon[int(np.argmin(dists))].lower()


def accuracy(pred_list: Sequence[str], targ_list: Sequence[str]) -> float:
    """Exact-match rate (utils/metrics.py:100-105)."""
    if not pred_list:
        return 0.0
    return sum(p == t for p, t in zip(pred_list, targ_list)) / len(pred_list)


def edit_distance(pred_list: Sequence[str], targ_list: Sequence[str]) -> int:
    """Total edit distance (utils/metrics.py:147-152)."""
    return sum(levenshtein(p, t) for p, t in zip(pred_list, targ_list))


def _with_lexicon(fn, pred_list, targ_list, lexicons_by_file, file_names):
    out = [fn(pred_list, targ_list)]
    for lex_map in lexicons_by_file:
        if not file_names or not lex_map or not lex_map.get(file_names[0]):
            out.append(0)
            continue
        refined = [
            _lexicon_search(lex_map[f], p) for f, p in zip(file_names, pred_list)
        ]
        out.append(fn(refined, targ_list))
    return out


def accuracy_with_lexicon(
    pred_list: Sequence[str],
    targ_list: Sequence[str],
    lexicons50: Optional[Dict[str, List[str]]] = None,
    lexicons1k: Optional[Dict[str, List[str]]] = None,
    lexiconsfull: Optional[Dict[str, List[str]]] = None,
    file_names: Sequence[str] = (),
) -> List[float]:
    """[no-lexicon, lex50, lex1k, lexfull] accuracies (utils/metrics.py:108-144)."""
    return _with_lexicon(
        accuracy, pred_list, targ_list,
        (lexicons50 or {}, lexicons1k or {}, lexiconsfull or {}), list(file_names),
    )


def edit_distance_with_lexicon(
    pred_list: Sequence[str],
    targ_list: Sequence[str],
    lexicons50: Optional[Dict[str, List[str]]] = None,
    lexicons1k: Optional[Dict[str, List[str]]] = None,
    lexiconsfull: Optional[Dict[str, List[str]]] = None,
    file_names: Sequence[str] = (),
) -> List[int]:
    """[no-lexicon, lex50, lex1k, lexfull] edit distances (utils/metrics.py:155-193)."""
    return _with_lexicon(
        edit_distance, pred_list, targ_list,
        (lexicons50 or {}, lexicons1k or {}, lexiconsfull or {}), list(file_names),
    )


def rec_post_process(
    pred_list: Sequence[str], scores: np.ndarray, max_len_labels: int
) -> List[float]:
    """Per-sample sequence probability: product of per-step scores over
    len(pred)+1 steps (utils/metrics.py:196-206)."""
    out = []
    scores = np.asarray(scores)
    for i, pred in enumerate(pred_list):
        n = min(max_len_labels, len(pred) + 1)
        s = scores[i, :n]
        out.append(math.exp(float(np.sum(np.log(np.maximum(s, 1e-30))))))
    return out
