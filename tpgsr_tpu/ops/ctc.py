"""CTC decoding and loss.

Parity targets:
  * greedy decode: utils/metrics.py:71-88 (``get_string_crnn`` — argmax,
    collapse repeats, drop blanks, alphabet ``-0...9a...z``; note the
    reference resets the repeat tracker after a blank).
  * loss: ``torch.nn.CTCLoss(blank=0, reduction='none')`` at
    interfaces/super_resolution.py:40,355-366 — per-sample *sum* (not
    length-normalized) negative log likelihood.

The loss uses ``optax.ctc_loss`` (a lax.scan forward algorithm) on padded
``[B, L]`` labels instead of the reference's flat concatenated label list,
because XLA needs static shapes.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpgsr_tpu.charset import CTC_CHARS


def ctc_greedy_ids(logits_tbc: jax.Array) -> jax.Array:
    """Per-frame argmax ids.  ``logits_tbc`` is [T, B, C] (reference layout)."""
    return jnp.argmax(logits_tbc, axis=-1)


def ctc_ids_to_strings(ids_tb: np.ndarray, alphabet: str = CTC_CHARS) -> List[str]:
    """Collapse repeats / drop blanks exactly like get_string_crnn.

    ``ids_tb`` is [T, B] of int frame labels.  The reference tracks the *last
    emitted character* and resets it on blank, so 'aa-aa' decodes to 'aa'.
    """
    ids_bt = np.asarray(ids_tb).T
    out = []
    for row in ids_bt:
        s = []
        last = ""
        for i in row:
            ch = alphabet[int(i)]
            if ch != last:
                if int(i) != 0:
                    s.append(ch)
                    last = ch
                else:
                    last = ""
        out.append("".join(s))
    return out


def ctc_loss(
    logits_tbc: jax.Array,
    labels_bl: jax.Array,
    label_lengths: jax.Array,
    blank_id: int = 0,
) -> jax.Array:
    """Per-sample CTC negative log likelihood, shape [B].

    Matches ``torch.nn.CTCLoss(blank=0, reduction='none')`` semantics
    (per-sample total NLL; the caller applies the ``weighted_tics`` mask and
    means, mirroring super_resolution.py:355-366).

    Args:
      logits_tbc: [T, B, C] unnormalized logits (reference layout).
      labels_bl:  [B, L] int labels, 0-padded (0 is blank; real labels are >0).
      label_lengths: [B] number of valid labels per sample.
    """
    logits_btc = jnp.transpose(logits_tbc, (1, 0, 2))
    b, t = logits_btc.shape[0], logits_btc.shape[1]
    logit_paddings = jnp.zeros((b, t), logits_btc.dtype)
    l = labels_bl.shape[1]
    pos = jnp.arange(l)[None, :]
    label_paddings = (pos >= label_lengths[:, None]).astype(logits_btc.dtype)
    per_seq = optax.ctc_loss(
        logits_btc, logit_paddings, labels_bl, label_paddings, blank_id=blank_id
    )
    # Samples with zero-length labels get loss 0 via the caller's mask; optax
    # already handles empty labels (all paddings 1) gracefully.
    return per_seq
