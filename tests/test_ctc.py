import numpy as np
import torch

from tpgsr_tpu.charset import CTC_NUM_CLASSES, encode_ctc_padded
from tpgsr_tpu.ops.ctc import ctc_greedy_ids, ctc_ids_to_strings, ctc_loss


def test_greedy_decode_matches_reference_semantics(rng):
    # hand-built frame sequence: 'h','h','-','h','e' -> "hhe" per the
    # reference's blank-resets-last rule (utils/metrics.py:77-88)
    from tpgsr_tpu.charset import CTC_CHAR_TO_ID

    h, e = CTC_CHAR_TO_ID["h"], CTC_CHAR_TO_ID["e"]
    frames = [h, h, 0, h, e]
    t, b, c = len(frames), 1, CTC_NUM_CLASSES
    logits = np.zeros((t, b, c), np.float32)
    for i, f in enumerate(frames):
        logits[i, 0, f] = 10.0
    ids = np.asarray(ctc_greedy_ids(logits))
    assert ctc_ids_to_strings(ids) == ["hhe"]


def test_ctc_loss_vs_torch(rng):
    t, b, c = 26, 4, CTC_NUM_CLASSES
    logits = rng.standard_normal((t, b, c)).astype(np.float32)
    words = ["hello", "ab", "supercal", "x"]
    labels, lengths = encode_ctc_padded(words, max_label_len=15)

    ours = np.asarray(ctc_loss(logits, labels, lengths))

    lt = torch.from_numpy(logits)
    flat = torch.tensor([i for row, n in zip(labels, lengths) for i in row[:n]])
    ref = torch.nn.CTCLoss(blank=0, reduction="none")(
        lt.log_softmax(2),
        flat,
        torch.full((b,), t, dtype=torch.long),
        torch.from_numpy(lengths).long(),
    )
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-4)
