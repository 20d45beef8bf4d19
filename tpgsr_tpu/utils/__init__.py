"""Shared utilities: meters, string metrics, visualization, cost reports,
profiling (the reference's ``utils/`` layer, minus the unused vendored KAIR
stack — whose two live helpers, ``fspecial``/``srmd_degradation``, live in
tpgsr_tpu.data.degradation)."""

from tpgsr_tpu.utils.meters import AverageMeter
from tpgsr_tpu.utils.metrics import (
    accuracy,
    accuracy_with_lexicon,
    edit_distance,
    edit_distance_with_lexicon,
    levenshtein,
    rec_post_process,
)

__all__ = [
    "AverageMeter",
    "accuracy",
    "accuracy_with_lexicon",
    "edit_distance",
    "edit_distance_with_lexicon",
    "levenshtein",
    "rec_post_process",
]
