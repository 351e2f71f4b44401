"""FR-Spec: frequency-ranked drafting vocabulary.

Port of scripts/fr_spec/gen_fr_index.py:9-89 (token-frequency count over a
corpus -> sorted id list with EOS forced in) and cpmcu/common/utils.py:167-180
(loading ``freq_{size}.pt`` into the drafter as ``token_id_remap``).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable, Optional, Sequence

import numpy as np


def build_fr_index(
    token_streams: Iterable[Sequence[int]],
    vocab_size: int,
    fr_size: int,
    forced_ids: Sequence[int] = (),
) -> np.ndarray:
    """Count token frequencies and return the top ``fr_size`` token ids
    (descending frequency), with ``forced_ids`` (e.g. EOS) guaranteed in."""
    counts = Counter()
    for stream in token_streams:
        counts.update(int(t) for t in stream)
    ranked = [t for t, _ in counts.most_common() if 0 <= t < vocab_size]
    forced = [t for t in forced_ids if 0 <= t < vocab_size]
    out: list = list(dict.fromkeys(forced))  # forced first, deduped
    for t in ranked:
        if len(out) >= fr_size:
            break
        if t not in set(out[: len(forced)]):
            out.append(t)
    # pad with remaining vocab ids if the corpus was too small
    if len(out) < fr_size:
        seen = set(out)
        for t in range(vocab_size):
            if t not in seen:
                out.append(t)
                if len(out) >= fr_size:
                    break
    return np.asarray(out[:fr_size], np.int32)


def load_fr_index(path: str, fr_size: Optional[int] = None) -> np.ndarray:
    """Load a freq_*.pt / .npy index file (utils.py:167-180)."""
    if path.endswith(".npy"):
        arr = np.load(path)
    else:
        import torch

        arr = torch.load(path, map_location="cpu", weights_only=True)
        arr = arr.numpy() if hasattr(arr, "numpy") else np.asarray(arr)
    arr = np.asarray(arr, np.int32).reshape(-1)
    if fr_size is not None:
        if arr.size < fr_size:
            raise ValueError(
                f"FR index has {arr.size} ids < requested {fr_size}"
            )
        arr = arr[:fr_size]
    return arr
