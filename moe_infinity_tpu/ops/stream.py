"""Stream-gather grouped FFN: fetch routed experts INSIDE the program.

The offload decode paths so far kept an HBM slot arena synchronized by a
host-side residency controller (fetch threads, eviction policy,
speculative verify/replay). That machinery exists because a miss
discovered mid-step stalls the step. This module removes the possibility
of a miss instead: the decode program itself gathers exactly the routed
experts' records from the pinned-host tier — a traced-index
``dynamic_slice`` + ``device_put`` per unique routed expert, the same
mechanism the arena's tier-writer program already uses one record at a
time (runtime/arena.py _make_tier_writer) — and computes the grouped FFN
from the gathered scratch. No slots, no eviction, no replay cascade: the
weights consumed are BY CONSTRUCTION the routed ones, and the DMA cost
is proportional to the step's unique routed experts, not to a cache's
miss pattern. This is the TPU-native shape of the reference's per-miss
fetch path (/root/reference/core/prefetch/task_scheduler.cpp:143-239):
the fetch rides inside the compiled step, overlapped by XLA, instead of
a host thread racing the collective.

Static shapes: the gather is sized by ``max_unique`` (U). Routing that
touches more than U unique experts in one layer is masked to zero
contribution; callers detect this EXACTLY from the host-side trace
(unique counts per layer) and re-dispatch a larger-U variant — the
halving-chain pattern the speculative engines already use for block
sizes. Records missing from the tier (rec_row -1) are likewise
zero-masked and host-detected.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from moe_infinity_tpu.ops.moe import grouped_ffn


@dataclass
class StreamSource:
    """Per-layer view of a pinned record tier for in-program gathering.

    fields: arena-role key -> list of segment arrays ([seg_rows, *shape]
    each, last may be shorter), in record-row order.
    rec_row: [E] int32 tier row per expert id for THIS layer (-1 =
    unstaged).
    hbm: sharding of the device's default memory (gather target), or
    None to skip the memory-space move (CPU tests).
    max_unique / impl: gather width and grouped-FFN impl used when the
    source is dispatched through grouped_ffn's stream hook.

    Registered as a pytree (segments + rec_row are leaves) so engines
    pass sources as ordinary jit arguments — the multi-GB pinned
    segments stay parameters, never embedded constants.
    """

    fields: Dict[str, List[jax.Array]]
    rec_row: np.ndarray
    seg_rows: int
    hbm: Optional[jax.sharding.Sharding] = None
    max_unique: int = 32
    impl: str = "ragged"


def _ss_flatten(s: StreamSource):
    names = sorted(s.fields)
    leaves = [s.fields[n] for n in names] + [jnp.asarray(s.rec_row)]
    aux = (tuple(names), s.seg_rows, s.hbm, s.max_unique, s.impl)
    return leaves, aux


def _ss_unflatten(aux, leaves):
    names, seg_rows, hbm, max_unique, impl = aux
    *segs, rec_row = leaves
    return StreamSource(
        fields=dict(zip(names, segs)), rec_row=rec_row,
        seg_rows=seg_rows, hbm=hbm, max_unique=max_unique, impl=impl,
    )


jax.tree_util.register_pytree_node(StreamSource, _ss_flatten, _ss_unflatten)


def gffn_stream(
    x: jax.Array,  # [T, D]
    expert_ids: jax.Array,  # [T, K] router choices
    combine_weights: jax.Array,  # [T, K]
    source: StreamSource,
    activation: str,
    *,
    max_unique: int,
    impl: str = "ragged",
    bias_keys: tuple = ("gate_bias", "down_bias"),
) -> jax.Array:
    """Grouped FFN with in-program expert gathering. Returns [T, D].

    Exactness contract: contributions of experts beyond the first
    `max_unique` uniques (ascending id order) or unstaged in the tier
    are ZERO; the caller must verify from the routed-id trace that
    neither occurred (both are host-computable exactly) and re-dispatch
    a larger-U variant otherwise.
    """
    T, D = x.shape
    K = expert_ids.shape[-1]
    U = int(max_unique)
    E = source.rec_row.shape[0]
    flat = expert_ids.reshape(-1).astype(jnp.int32)  # [N]

    # ---- static-shape unique (ascending) -----------------------------
    s = jnp.sort(flat)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), s[1:] != s[:-1]]
    )
    pos = jnp.cumsum(first) - 1  # unique ordinal of each sorted element
    uniq = jnp.full((U,), E, jnp.int32).at[pos].set(s, mode="drop")

    # ---- gather the unique records into scratch ----------------------
    rec_row = jnp.asarray(source.rec_row, jnp.int32)
    rows = jnp.where(uniq < E, rec_row[jnp.clip(uniq, 0, E - 1)], -1)
    scratch: Dict[str, jax.Array] = {}
    for akey, segs in source.fields.items():
        branches = [
            (lambda local, seg=seg: jax.lax.dynamic_slice_in_dim(
                seg, local, 1, 0
            ))
            for seg in segs
        ]
        # unrolled U gathers: each is one traced-index slice out of the
        # pinned segment + a move to the compute memory — the same op
        # sequence the arena's tier-writer program runs per fetch. The
        # U copies are INDEPENDENT values concatenated at the end (the
        # first shape of this loop accumulated into one buffer via
        # dynamic_update_slice, which chained all U*fields DMAs into one
        # serial dependency — chip-measured 1.28 s/step at 24 host→HBM
        # record copies; independent copies let XLA's scheduler overlap
        # the DMA streams)
        recs = []
        for i in range(U):
            row = jnp.maximum(rows[i], 0)
            seg_i = row // source.seg_rows
            local = row % source.seg_rows
            rec = jax.lax.switch(
                jnp.clip(seg_i, 0, len(segs) - 1), branches, local
            )
            if source.hbm is not None:
                rec = jax.device_put(rec, source.hbm)
            recs.append(rec)
        scratch[akey] = jnp.concatenate(recs, axis=0)

    # ---- token -> scratch-slot mapping -------------------------------
    slots = jnp.searchsorted(uniq, flat).astype(jnp.int32)  # [N]
    slots = jnp.clip(slots, 0, U - 1)
    hit = uniq[slots] == flat  # overflowed/absent experts miss
    staged = rows[slots] >= 0
    cw = (
        combine_weights.reshape(-1)
        * (hit & staged).astype(combine_weights.dtype)
    ).reshape(T, K)

    biases = {k: scratch.pop(k) for k in list(scratch) if k in bias_keys}
    return grouped_ffn(
        x,
        slots.reshape(T, K),
        cw,
        jnp.arange(U, dtype=jnp.int32),
        scratch,
        activation,
        biases=biases or None,
        impl=impl,
    )


def stream_overflow(ids_np, max_unique: int, rec_row: np.ndarray) -> bool:
    """Host-side exactness check for one layer's routed ids: True when
    the zero-masking in gffn_stream dropped a real contribution (more
    than max_unique uniques, or an unstaged expert routed)."""
    uniq = np.unique(np.asarray(ids_np).reshape(-1))
    if uniq.size > max_unique:
        return True
    return bool((rec_row[uniq] < 0).any())
