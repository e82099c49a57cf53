"""Prefetch planning: predicted activation matrix → ordered fetch list.

Mirrors the reference ExpertPrefetcher shim
(/root/reference/moe_infinity/memory/expert_prefetcher.py:42-59): take the
predictor's [L, E] score matrix, keep positive scores, sort descending, and
emit (layer, expert) fetch orders — bounded here by a lookahead window and a
count budget so the host controller never floods the DMA queue.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import numpy as np

Key = Tuple[int, int]


def plan_prefetch(
    score_matrix: np.ndarray,  # [L, E] predicted activation scores
    current_layer: int,
    *,
    lookahead: Optional[int] = None,  # layers ahead to consider (None = all)
    budget: Optional[int] = None,  # max number of fetch orders
    is_resident: Optional[Callable[[Key], bool]] = None,
) -> List[Key]:
    """Ordered (layer, expert) prefetch list, best score first."""
    L, E = score_matrix.shape
    m = score_matrix.astype(np.float64).copy()
    m[: current_layer + 1, :] = 0.0
    if lookahead is not None:
        m[current_layer + 1 + lookahead :, :] = 0.0
    flat = m.reshape(-1)
    nz = np.flatnonzero(flat > 0)
    if nz.size == 0:
        return []
    order = nz[np.argsort(-flat[nz], kind="stable")]
    out: List[Key] = []
    for idx in order:
        key = (int(idx // E), int(idx % E))
        if is_resident is not None and is_resident(key):
            continue
        out.append(key)
        if budget is not None and len(out) >= budget:
            break
    return out
