"""Best-checkpoint selection parity on scripted accuracy sequences
(VERDICT r2 item 7).

Drives ``train.trainer.BestTracker`` and a re-statement of the reference's
selection logic (interfaces/super_resolution.py:505-533, cited line by
line) with the same scripted metric sequences and asserts identical
decisions and identical recorded dicts — including the reference's quirks:
per-split ``best_history_acc`` updates UNCONDITIONALLY on split improvement
(:513-516, so it can improve on evals that are NOT the overall best), and
``best_model_psnr/ssim`` record only the LAST-evaluated split (:528-529 use
the loop variable after the split loop ends).
"""

from __future__ import annotations

import copy

from tpgsr_tpu.train.trainer import BestTracker

SPLITS = ["easy", "medium", "hard"]


class _ReferenceSelection:
    """interfaces/super_resolution.py:505-533, re-stated."""

    def __init__(self, splits):
        # :178-183 — dicts zero-initialized from the val dir names
        self.best_history_acc = dict(zip(splits, [0] * len(splits)))
        self.best_model_acc = copy.deepcopy(self.best_history_acc)
        self.best_model_psnr = copy.deepcopy(self.best_history_acc)
        self.best_model_ssim = copy.deepcopy(self.best_history_acc)
        self.best_acc = 0

    def update(self, metrics_by_split, epoch):
        current_acc_dict = {}
        for data_name, metrics_dict in metrics_by_split.items():  # split loop
            acc = metrics_dict["accuracy"]
            current_acc_dict[data_name] = float(acc)
            if acc > self.best_history_acc[data_name]:  # :513-516
                self.best_history_acc[data_name] = float(acc)
                self.best_history_acc["epoch"] = epoch
        is_best = sum(current_acc_dict.values()) > self.best_acc  # :525
        if is_best:
            self.best_acc = sum(current_acc_dict.values())
            self.best_model_acc = current_acc_dict
            self.best_model_acc["epoch"] = epoch
            # :528-529 — data_name/metrics_dict still bound to the LAST split
            self.best_model_psnr[data_name] = metrics_dict["psnr_avg"]
            self.best_model_ssim[data_name] = metrics_dict["ssim_avg"]
        return is_best


def _mk(accs, psnr=20.0, ssim=0.7):
    return {
        s: {"accuracy": a, "psnr_avg": psnr + i, "ssim_avg": ssim + i / 100}
        for i, (s, a) in enumerate(zip(SPLITS, accs))
    }


SCRIPT = [
    # (epoch, accuracies easy/medium/hard) — includes: an overall best, a
    # split peaking on a NON-best eval (medium at epoch 3), a regression,
    # a tie (sum equal -> NOT best), and a late recovery
    (1, [0.50, 0.30, 0.20]),
    (2, [0.60, 0.35, 0.25]),
    (3, [0.10, 0.90, 0.10]),  # medium peaks, sum 1.10 < 1.20 -> not best
    (4, [0.55, 0.40, 0.25]),  # sum 1.20 == best 1.20 -> strictly-greater: not best
    (5, [0.58, 0.40, 0.26]),  # sum 1.24 -> best again
    (6, [0.10, 0.10, 0.10]),
]


def test_scripted_sequence_matches_reference():
    ours = BestTracker(SPLITS)
    ref = _ReferenceSelection(SPLITS)
    for epoch, accs in SCRIPT:
        mds = _mk(accs)
        o = ours.update(mds, epoch)
        r = ref.update(mds, epoch)
        assert o == r, (epoch, accs)
    assert ours.best_history_acc == {
        k: float(v) for k, v in ref.best_history_acc.items()
    }
    info = ours.best_model_info
    assert info["accuracy"] == {k: float(v) for k, v in ref.best_model_acc.items()}
    assert info["psnr"] == {k: float(v) for k, v in ref.best_model_psnr.items()}
    assert info["ssim"] == {k: float(v) for k, v in ref.best_model_ssim.items()}


def test_split_best_updates_on_non_best_eval():
    """The round-2 defect: best_history_acc must capture a split's peak even
    when that eval is not the overall best (the old code updated it only
    inside ``if is_best``)."""
    t = BestTracker(SPLITS)
    t.update(_mk([0.50, 0.30, 0.20]), epoch=1)  # best (sum 1.0)
    is_best = t.update(_mk([0.10, 0.90, 0.10]), epoch=2)  # sum 1.1 > 1.0: best
    assert is_best
    is_best = t.update(_mk([0.05, 0.95, 0.05]), epoch=3)  # sum 1.05: NOT best
    assert not is_best
    assert t.best_history_acc["medium"] == 0.95  # captured anyway
    assert t.best_history_acc["epoch"] == 3
    # the best_model_info still reflects the last OVERALL best (epoch 2)
    assert t.best_model_info["accuracy"]["medium"] == 0.90
    assert t.best_model_info["accuracy"]["epoch"] == 2


def test_last_split_psnr_quirk():
    """best_model_psnr/ssim record only the last-evaluated split (the
    reference's loop-variable quirk, :528-529)."""
    t = BestTracker(SPLITS)
    t.update(_mk([0.5, 0.5, 0.5], psnr=21.0, ssim=0.8), epoch=1)
    info = t.best_model_info
    assert info["psnr"]["hard"] == 23.0  # psnr + i for the last split
    assert info["psnr"]["easy"] == 0.0  # untouched, as in the reference
    assert abs(info["ssim"]["hard"] - 0.82) < 1e-12
