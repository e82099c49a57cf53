"""Layered offload execution engine.

The TPU-native counterpart of the reference's OffloadEngine + forward-hook
machinery (/root/reference/moe_infinity/runtime/model_offload.py:751-991 and
SURVEY.md §3.2/§3.3), with the control flow inverted: instead of hooking a
framework-owned forward, the engine *owns* the layer loop and drives two
jitted stages per layer —

    pre_moe   attention + norm + routing           (jit, donated KV)
    apply_moe grouped expert FFN over the arena    (jit, slot-indexed)

Between the two stages the router's expert ids (a tiny int array) come back
to the host; the engine then
  1. updates the EAMC tracer and runs the predictor (activation-aware),
  2. plans + enqueues prefetch for future layers (priority queue, arena),
  3. acquires the routed experts — blocking only on true misses,
exactly the acquire/predict/prefetch protocol of the reference's
AcquireTensor/ReleaseTensor + prefetch path, but with all data movement as
async XLA device transfers instead of cudaMemcpyAsync threads.

Because every jitted stage has static shapes (the arena never changes shape,
slot maps are data), a decode step never recompiles regardless of cache
state.
"""

from __future__ import annotations

import time as _time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from moe_infinity_tpu.memory.predictor import ExpertPredictor
from moe_infinity_tpu.memory.prefetch_plan import (
    adaptive_prefetch_budget,
    plan_prefetch,
)
from moe_infinity_tpu.memory.tracer import ExpertTracer
from moe_infinity_tpu.runtime.arena import ExpertArena
from moe_infinity_tpu.utils.logger import get_logger

logger = get_logger("engine")

_BIAS_KEYS = ("gate_bias", "down_bias")


def _split_arena_tree(tree: Dict[str, jax.Array]):
    weights = {k: v for k, v in tree.items() if k not in _BIAS_KEYS}
    biases = {k: v for k, v in tree.items() if k in _BIAS_KEYS}
    return weights, (biases or None)


def is_spec_capacity_error(e: BaseException) -> bool:
    """True for run_speculative's own failures (arena too small / replays
    didn't converge) — the only errors that justify degrading to a smaller
    block or the per-layer path. Anything else (transport hiccups,
    compile errors) must RETRY or surface, not silently disable the fast
    path for the rest of the process (a round-2 relay blip cost 3x
    throughput that way)."""
    s = str(e)
    return "did not converge" in s or "arena exhausted" in s


def speculative_stats(replay_counts: Sequence[int]) -> dict:
    """The /metrics counter block every speculative executor exposes."""
    if not replay_counts:
        return {}
    return {
        "speculative_steps": len(replay_counts),
        "mean_step_executions": round(
            sum(replay_counts) / len(replay_counts), 4
        ),
    }


def split_margin_columns(ids_np, margin: int):
    """(top-k trace, margin trace) views of a widened [..., k+m] trace."""
    if margin <= 0:
        return ids_np, None
    k = ids_np.shape[-1] - margin
    return ids_np[..., :k], ids_np[..., k:]


def margin_key_fns(mlis, margin: int):
    """(key_fn, margin_fn) for run_speculative over a route_margin-widened
    trace: key_fn verifies/acquires the dispatched top-k only (exact and
    capacity-bounded), margin_fn lists the runner-up keys for SOFT
    prefetch acquisition (make_block_monitor / spec_trace_and_prefetch
    extra_orders)."""
    if margin <= 0:
        return None, None

    def key_fn(ids_np, j):
        return np.unique(ids_np[j][..., : ids_np.shape[-1] - margin])

    def margin_fn(ids_np):
        k = ids_np.shape[-1] - margin
        return sorted({
            (mlis[j], int(e))
            for j in range(ids_np.shape[0])
            for e in np.unique(ids_np[j][..., k:])
        })

    return key_fn, margin_fn


def run_speculative(arena: ExpertArena, mlis, run, limit: int,
                    key_fn=None, on_replay=None, timings=None):
    """Optimistic whole-step execution against the arena's current slots.

    `run(tree, slot_rows)` executes ONE compiled program that resolves MoE
    routing internally and returns (*outputs, trace_ids [L_moe, ...]);
    stale slot rows are in-range by construction, so a non-resident expert
    gathers a wrong-but-valid slot. The host verifies the routed ids and
    re-executes after loading misses — the accepted execution had every
    routed expert resident, so it is exact. Convergence is bounded:
    layer 0's routing depends only on the (correct) inputs, so layer l
    stabilizes by replay l+1. Requires the arena to hold one step's UNION
    of routed experts across MoE layers.

    key_fn(ids_np, j) -> iterable of expert ids for MoE layer j; defaults
    to np.unique over the whole trace row. Batched callers pass a filter
    that drops inactive batch rows / masked hole columns — their garbage
    routing must not force fetches or count against the arena's capacity
    (the discarded rows' outputs never affect active rows).

    Routing-margin note: models with route_margin > 0 widen the TRACE to
    top-(k+m) while dispatching exact top-k. Callers then pass a key_fn
    slicing the true top-k (verify/acquire stay exact and
    capacity-bounded) and feed the runner-up columns into their prefetch
    calls (make_block_monitor margin_fn + spec_trace_and_prefetch
    extra_orders) as SOFT candidate-protected orders — so when a
    replay's corrected activations flip a near-tie, the flipped-to
    expert is already resident and the block accepts instead of
    cascading another replay (chip diagnosis: deep-layer top-2 flips per
    dispatch cost ~5 executions per 4-token block).

    Returns (outputs, ids_np, executions). The TPU-native inversion of the
    reference's per-miss cv.wait on the hot path
    (archer_prefetch_handle.cpp:83-121): no per-layer host sync at all."""
    if key_fn is None:
        key_fn = lambda ids, j: np.unique(ids[j])  # noqa: E731
    held: set = set()

    def _tick(phase, t0):
        t1 = _time.perf_counter()
        if timings is not None:
            timings[phase] = timings.get(phase, 0.0) + (t1 - t0)
        return t1

    try:
        for replay in range(limit):
            t0 = _time.perf_counter()
            # dispatch under a LEASE, not the residency lock: fetch
            # workers keep fetching + uploading during the (relay-slow)
            # dispatch; only donated landings defer to the lease. The
            # snapshot is consistent with the dispatched slot state, so a
            # prefetch landing mid-step cannot make a stale execution
            # accept.
            with arena.dispatch_snapshot() as (
                tree, slot_rows_np, resident_at_dispatch
            ):
                slot_rows = jnp.asarray(slot_rows_np)
                *outs, trace = run(tree, slot_rows)
            ids_np = np.asarray(trace)
            t0 = _tick("dispatch_s", t0)
            keys = {
                (mlis[j], int(e))
                for j in range(ids_np.shape[0])
                for e in key_fn(ids_np, j)
            }
            missing = [k for k in keys if k not in resident_at_dispatch]
            if on_replay is not None:
                on_replay(replay, keys, missing, ids_np)
            t0 = _tick("replay_hook_s", t0)
            # re-protect exactly this run's working set (acquire protects
            # all keys before any eviction, so releasing first is safe —
            # no concurrent fetches outside acquire on this path)
            if held:
                arena.release(sorted(held))
            # reassign BEFORE acquire: it protects keys before fetching,
            # so a fetch failure must still release them via the finally
            held = keys
            arena.acquire(sorted(keys), mlis[-1] if mlis else 0)
            _tick("acquire_s", t0)
            if not missing:
                return outs, ids_np, replay + 1
        raise RuntimeError(
            f"speculative execution did not converge in {limit} replays; "
            f"the arena ({arena.num_slots} slots) likely cannot hold one "
            "step's union of routed experts across MoE layers — raise "
            "num_slots or disable speculative decode"
        )
    finally:
        if held:
            arena.release(sorted(held))


def quantize_block(remaining: int, block: int) -> int:
    """Largest size from the halving chain {block, block/2, ..., 1} that
    fits `remaining` — call sites use this so only log2(block)+1 block
    programs ever compile (a fresh size mid-measurement costs a full
    relay compile)."""
    k = max(1, block)
    while k > remaining:
        k //= 2
    return max(1, k)


def run_speculative_block(
    arena: ExpertArena,
    mlis,
    dispatch,
    k: int,
    limit: int,
    tok0,
    kvs,
    margin: int = 0,
    skip_mlis=frozenset(),
):
    """Speculative k-step decode with PARTIAL PREFIX ACCEPTANCE.

    dispatch(tree, slot_rows, cur_tok, j0, kk, kvs) runs a kk-step greedy
    block from token `cur_tok` at step offset j0 and returns
    (toks [B, kk], new_kvs, ids [L_moe, B, kk, K']) — per-step routed ids.

    A step whose routed experts were ALL resident at dispatch — and whose
    predecessors were too — is exact: its tokens and its KV writes were
    computed from exact inputs. So instead of replaying the whole block on
    any miss (which under routing drift costs ~k executions per block),
    the verified prefix is ACCEPTED and only the suffix re-dispatches: the
    suffix's garbage KV columns are rewritten by the re-executed steps
    (a column write is a full overwrite, and columns past the current
    step are never read). The reference has no analogue — its per-miss
    cv.wait serializes every layer (archer_prefetch_handle.cpp:83-121).

    Returns (tokens [B, k], final_kvs, executions, accepted_ids
    [L_moe, B, k, K']).
    """
    import os as _os

    dbg = _os.environ.get("MOE_SPEC_DEBUG")
    accepted_toks = []
    accepted_ids = []
    cur = tok0
    held: set = set()
    execs = 0
    j0 = 0
    try:
        while j0 < k:
            if execs >= limit:
                raise RuntimeError(
                    f"speculative execution did not converge in {limit} "
                    f"replays; the arena ({arena.num_slots} slots) likely "
                    "cannot hold one step's union of routed experts — "
                    "raise num_slots or disable speculative decode"
                )
            # suffix sizes from the halving chain so at most log2(k)+1
            # block programs ever compile (a fresh size mid-measurement
            # costs a full relay compile)
            kk = quantize_block(k - j0, k)
            t0 = _time.perf_counter()
            with arena.dispatch_snapshot() as (tree, rows_np, resident):
                toks, kvs_new, ids = dispatch(
                    tree, jnp.asarray(rows_np), cur, j0, kk, kvs
                )
            t1 = _time.perf_counter()
            execs += 1
            ids_np = np.asarray(ids)  # [L, B, kk, K']
            if margin > 0:
                # drop the routing-margin runner-up columns: prefix
                # exactness is judged on the DISPATCHED top-k only
                ids_np = ids_np[..., : ids_np.shape[-1] - margin]
            t2 = _time.perf_counter()
            if dbg:
                print(
                    f"[specblk] j0={j0} kk={kk} dispatch={1e3*(t1-t0):.0f}ms "
                    f"sync={1e3*(t2-t1):.0f}ms",
                    flush=True,
                )
            step_keys = [
                {
                    (mlis[layer], int(e))
                    for layer in range(ids_np.shape[0])
                    if mlis[layer] not in skip_mlis  # direct-tier layers
                    for e in np.unique(ids_np[layer, :, jj])
                }
                for jj in range(kk)
            ]
            good = kk
            for jj in range(kk):
                if any(key not in resident for key in step_keys[jj]):
                    good = jj
                    break
            # suffix KV columns are garbage but get rewritten on the next
            # dispatch of the same positions; prefix columns are exact
            kvs = kvs_new
            if good > 0:
                toks_np = np.asarray(toks)
                accepted_toks.append(toks_np[:, :good])
                accepted_ids.append(ids_np[:, :, :good])
                cur = jnp.asarray(toks_np[:, good - 1:good], jnp.int32)
                j0 += good
            # acquire the observed union either way: on a miss it loads +
            # protects before the next dispatch; on full acceptance it
            # records the hits (stats parity with the per-step path) and
            # keeps the hot set protected until the block returns
            union = set().union(*step_keys) if step_keys else set()
            if held:
                arena.release(sorted(held))
            held = union
            arena.acquire(sorted(union), mlis[-1] if mlis else 0)
            if dbg:
                print(
                    f"[specblk]   good={good} union={len(union)} "
                    f"acquire={1e3*(_time.perf_counter()-t2):.0f}ms",
                    flush=True,
                )
        return (
            np.concatenate(accepted_toks, axis=1),
            kvs,
            execs,
            np.concatenate(accepted_ids, axis=2),
        )
    finally:
        if held:
            arena.release(sorted(held))


def plan_drift_prefetch(engine, mlis, keys, budget):
    """Replay-drift prefetch: when a speculative dispatch misses, the next
    dispatch's corrected tokens route to experts NEAR — but not identical
    to — the observed union, and the block after that starts from a hot
    set one drift step further. Score each MoE layer's experts by global
    routing frequency blended with transition affinity from the previous
    layer's observed experts (the tracer's (L-1)xExE counts — recorded by
    the reference as children_visit_cnt but never fed back,
    /root/reference/core/model/model_topology.h:75-103), and prefetch the
    top non-resident candidates. Issued DURING the replay loop so the
    fetches overlap the ~0.5-0.9 s re-dispatch instead of the next block
    discovering them as blocking misses (VERDICT r3 item 1)."""
    tracer, policy = engine.tracer, engine.arena.policy
    if tracer is None or budget <= 0:
        return []
    obs: Dict[int, set] = {mli: set() for mli in mlis}
    for (mli, e) in keys:
        if mli in obs:
            obs[mli].add(e)
    scored = []
    for j, mli in enumerate(mlis):
        score = policy.frequency[mli].astype(np.float64)
        tot = score.sum()
        if tot > 0:
            score = score / tot
        if (
            j > 0
            and mli - 1 == mlis[j - 1]
            and mli - 1 < tracer.transitions.shape[0]
            and obs[mlis[j - 1]]
        ):
            rows = tracer.transitions[mli - 1][sorted(obs[mlis[j - 1]])]
            aff_tot = rows.sum()
            if aff_tot > 0:
                score = score + rows.sum(axis=0) / aff_tot
        for e in np.flatnonzero(score > 0):
            if int(e) not in obs[mli]:
                scored.append((float(score[e]), (mli, int(e))))
    scored.sort(key=lambda t: -t[0])
    orders = []
    for _, key in scored:
        if engine.arena.is_resident(key):
            continue
        orders.append(key)
        if len(orders) >= budget:
            break
    return orders


def rolling_protect(engine, union):
    """Record `union` in the engine's protection ring (last 4 accepted
    unions) and return the combined rolling hot set to candidate-protect."""
    from collections import deque

    ring = getattr(engine, "_protect_ring", None)
    if ring is None:
        ring = engine._protect_ring = deque(maxlen=4)
    ring.append(set(union))
    return sorted(set().union(*ring))


def make_block_monitor(engine, mlis, margin_fn=None):
    """(on_replay, log) pair for a speculative block dispatch loop: logs
    per-dispatch union/miss counts into `log` and, on a miss, issues the
    drift prefetch so its fetches ride the replay's dispatch window. The
    caller appends `log` to engine.spec_log after the block (bounded).

    margin_fn(ids_np) -> runner-up (layer, expert) orders from the
    trace's routing-margin columns; merged ahead of the drift orders so
    the next dispatch's near-tie flips land on resident experts."""
    log = {"unions": [], "misses": []}

    def on_replay(replay, keys, missing, ids_np=None):
        log["unions"].append(len(keys))
        log["misses"].append(len(missing))
        if missing and engine.prefetch:
            # small: drift orders beyond the actual miss count mostly
            # fetch tail-probability candidates whose landings cycle the
            # arena (round-4 chip diagnosis: ~100 fetches/block evicted
            # ~19 soon-re-routed keys per block — 80% of decode misses
            # were churn, not uncovered drift)
            budget = min(8, max(4, len(missing)))
            orders = plan_drift_prefetch(engine, mlis, keys, budget)
            if margin_fn is not None and ids_np is not None:
                near = [
                    k for k in margin_fn(ids_np)
                    if k not in keys and not engine.arena.is_resident(k)
                ]
                seen = set(near)
                orders = near + [k for k in orders if k not in seen]
            if orders:
                # protect the observed union PLUS the rolling ring: a
                # drift fetch must never evict an expert this block — or
                # a recent block — is about to re-dispatch (an
                # unprotected margin storm livelocked the replay loop on
                # the first round-4 chip run; ring rationale in
                # spec_trace_and_prefetch)
                ring = getattr(engine, "_protect_ring", [])
                guard = sorted(set(keys).union(*ring)) if ring else sorted(keys)
                engine.arena.prefetch(orders, protect=guard)

    return on_replay, log


def record_block_log(engine, log):
    """Bounded per-block speculative diagnostics (read by bench --diag and
    the stats() aggregates)."""
    if not hasattr(engine, "spec_log"):
        engine.spec_log = []
    engine.spec_log.append(log)
    if len(engine.spec_log) > 512:
        del engine.spec_log[: len(engine.spec_log) - 512]


def spec_block_diag(spec_log) -> dict:
    """Aggregate per-dispatch miss structure over the logged blocks:
    how many blocks accepted on dispatch 1 / 2 / later, and the mean
    misses discovered at each dispatch index — the numbers that say
    WHETHER replays come from uncovered drift (miss at dispatch 2+) or
    from a cold first dispatch (miss at dispatch 1)."""
    if not spec_log:
        return {}
    n = len(spec_log)
    execs = [len(b["misses"]) for b in spec_log]
    max_d = max(execs)
    miss_at = [
        round(
            float(np.mean([b["misses"][d] for b in spec_log
                           if len(b["misses"]) > d])), 1,
        )
        for d in range(min(max_d, 4))
    ]
    return {
        "blocks": n,
        "accept_at_1": sum(1 for e in execs if e == 1) / n,
        "accept_at_2": sum(1 for e in execs if e == 2) / n,
        "mean_union": round(float(np.mean(
            [b["unions"][-1] for b in spec_log])), 1),
        "mean_miss_at_dispatch": miss_at,
    }


def spec_trace_and_prefetch(engine, ids_np, mlis, seq_ids, plan_floor=-1,
                            n_feed=None, budget_scale=1, extra_orders=()):
    """After an accepted speculative step: record the realized routing in
    the EAMC tracer and (with prefetch on) warm the NEXT step's likely
    experts — those fetches overlap the next step's compute, and the
    dispatch-time residency snapshot keeps concurrently landing prefetches
    from corrupting verification. plan_floor: plan_prefetch current_layer
    (-1 = all MoE layers; seq2seq passes the first decoder layer - 1 since
    the encoder never runs again). Batched callers pass per-row seq_ids
    with None for inactive slots and n_feed [B] (real tokens per row this
    step) so hole columns stay out of the trace."""
    if engine.tracer is None or not seq_ids or not any(seq_ids):
        return
    for j, mli in enumerate(mlis):
        for b, sid in enumerate(seq_ids):
            if sid is None:
                continue
            row = ids_np[j, b]
            if n_feed is not None:
                if n_feed[b] == 0:
                    continue
                row = row[: int(n_feed[b])]
            engine.tracer.update_entry(sid, row.ravel(), mli)
    if not engine.prefetch:
        return
    first_sid = next(s for s in seq_ids if s is not None)
    # score from the FIRST plannable layer, not the last recorded one:
    # predict()'s within-step score zeroes every row below the layer just
    # seen, which would leave nothing to warm for the next step. The
    # block's realized routing sharpens every future layer's row through
    # the transition matrix (predict_block), not just layer+1.
    score = engine.predictor.predict_block(
        first_sid,
        {mli: ids_np[j] for j, mli in enumerate(mlis)},
        from_layer=max(plan_floor + 1, 0),
    )
    engine.arena.set_context(
        mlis[-1], engine.tracer.get_entry_decoder(first_sid).matrix
    )
    # budget_scale: k-step blocks plan once per k tokens, so each plan may
    # warm k steps' worth of experts without outpacing the interconnect.
    # balance_layers: the block revisits ALL its MoE layers next dispatch,
    # so the budget round-robins across layers instead of letting the
    # predictor's layer-distance decay starve depth (round-4 diagnosis).
    orders = plan_prefetch(
        score, plan_floor, lookahead=None,
        budget=engine._current_budget() * max(1, budget_scale),
        # engine-level residency when present: direct-tier layers are
        # resident in place and must never be ordered
        is_resident=getattr(engine, "is_resident", engine.arena.is_resident),
        balance_layers=True,
    )
    if extra_orders:
        # routing-margin runner-ups lead the plan: the router itself says
        # these are the next block's most likely flips
        extra = [
            k for k in extra_orders if not engine.arena.is_resident(k)
        ]
        seen = set(extra)
        orders = extra + [o for o in orders if o not in seen]
    # protect the ROLLING hot set — the last few blocks' unions, not just
    # this one: churn victims are precisely the keys routed 1-3 blocks
    # ago that a landing displaced before they came around again (chip
    # diagnosis: 80% of decode misses were such re-misses). Candidate
    # protection is prefetch-only (on-demand fetches may still evict
    # through it), so a large ring cannot deadlock tiny arenas — excess
    # prefetch orders just drop.
    union = [
        (mli, int(e))
        for j, mli in enumerate(mlis)
        for e in np.unique(ids_np[j])
    ]
    engine.arena.prefetch(orders, protect=rolling_protect(engine, union))


class OffloadEngine:
    """Drives a layer-step-protocol model (pre_moe/apply_moe) against an
    ExpertArena. Implements the Stepper protocol used by runtime.generate."""

    def __init__(
        self,
        model,
        params,
        arena: ExpertArena,
        *,
        tracer: Optional[ExpertTracer] = None,
        predictor: Optional[ExpertPredictor] = None,
        prefetch: bool = True,
        lookahead: int = 3,
        prefetch_budget: Optional[int] = None,
        impl: str = "ragged",
        prefill_impl: Optional[str] = None,
        adaptive_budget: bool = True,
        speculative: bool = False,
        max_replays: Optional[int] = None,
        spec_block: int = 1,
        dense_arena=None,
        host_fallback: bool = False,
        host_fallback_timeout: float = 0.25,
    ):
        """dense_arena: optional DenseLayerArena paging the dense layer
        stack (params['layers'] may then be host-resident or absent) — the
        reference's dense-node paging (model_topology.cpp:518-530). Forces
        the per-layer path: a speculative whole-step program would need
        every dense layer resident at once, which is exactly what paging
        removes."""
        if dense_arena is not None and speculative:
            raise ValueError(
                "speculative decode requires the dense side resident; "
                "disable speculative_decode when dense paging is active"
            )
        self.dense_arena = dense_arena
        self._paged_jits: dict = {}
        # run-on-host escape hatch: an expert that cannot be made resident
        # within host_fallback_timeout runs as the arena's zero slot on
        # device (contributing 0) and its true contribution is computed on
        # the host from the store record (runtime/host_exec.py) — a miss
        # bounds step latency instead of stalling it
        self.host_fallback = host_fallback
        self.host_fallback_timeout = host_fallback_timeout
        self.host_exec_count = 0
        self._host_exec = None
        if host_fallback:
            if arena.zero_slot is None:
                raise ValueError(
                    "host_fallback requires an arena built with "
                    "reserve_zero_slot=True"
                )
            from moe_infinity_tpu.runtime.host_exec import (
                HostExpertExecutor,
                activation_for,
            )

            self._host_exec = HostExpertExecutor(
                arena.store, activation_for(arena.store.meta)
            )
        self.model = model
        self.params = params
        self.arena = arena
        self.speculative = speculative
        self.max_replays = max_replays
        self.spec_block = max(1, spec_block)
        self._impl = impl
        self._spec_block_cache: dict = {}
        self.replay_counts: list = []
        self.tracer = tracer
        self.predictor = predictor
        self.prefetch = prefetch and predictor is not None
        self.lookahead = lookahead
        # grouped-FFN computes a whole layer's routed experts in one kernel,
        # so the arena must be able to hold at least one full MoE layer
        if arena.num_slots < model.spec.num_experts:
            raise ValueError(
                f"arena num_slots={arena.num_slots} < num_experts="
                f"{model.spec.num_experts}; the slot arena must fit one "
                f"full MoE layer"
            )
        # default budget: don't queue more than half the arena per plan;
        # with adaptive_budget the static value is the cap and the live
        # budget shrinks to what the arena can land inside the lookahead
        # window (measured layer period vs measured per-fetch seconds)
        self.prefetch_budget = prefetch_budget or max(1, arena.num_slots // 2)
        self.adaptive_budget = adaptive_budget
        self._layer_seconds: Optional[float] = None
        self._last_layer_t: Optional[float] = None

        self._embed = jax.jit(model.embed)
        self._pre = jax.jit(model.pre_moe, donate_argnums=(2,))
        self._head = jax.jit(model.head)
        self._dense = (
            jax.jit(model.dense_layer, donate_argnums=(2,))
            if hasattr(model, "dense_layer")
            else None
        )

        pimpl = prefill_impl or impl

        def apply(pl, x, h, cw, ids, tree, slot_row):
            weights, biases = _split_arena_tree(tree)
            # T is static per compiled shape: decode (T=1) keeps `impl`;
            # prefill-sized steps can use a grouped-GEMM impl whose weight
            # traffic is one read per routed expert, not per (token, k)
            use = impl if h.shape[1] == 1 else pimpl
            return model.apply_moe(
                pl, x, h, cw, ids, weights, slot_row, biases, use
            )

        self._apply = jax.jit(apply)

        if speculative:
            # decode steps run as ONE compiled program over the arena's
            # current slots; verified + replayed on miss (run_speculative)
            def spec_fwd(params, tree, slot_rows, tokens, positions, kvs,
                         kv_len):
                weights, biases = _split_arena_tree(tree)

                def for_layer(_experts, mli):
                    return weights, slot_rows[mli], biases

                return model.forward(
                    params, None, tokens, positions, kvs, kv_len,
                    for_layer=for_layer, impl=impl,
                )

            self._spec_fwd = jax.jit(spec_fwd)
            self._moe_lis = [
                model.moe_layer_index(li)
                for li in range(model.spec.num_layers)
                if model.moe_layer_index(li) is not None
            ]

    def _spec_block_fn(self, k: int):
        """Jitted k-step GREEDY decode block: a lax.scan of k decode steps
        inside ONE compiled program over the arena's current slot state —
        routing for steps 2..k resolves in-program from the step before.
        Returns (tokens [B, k], kvs, trace [L_moe, B, k*topk]). Amortizes
        per-program dispatch/launch overhead by k."""
        if k in self._spec_block_cache:
            return self._spec_block_cache[k]
        model, impl = self.model, self._impl

        def spec_block(params, tree, slot_rows, tok0, pos0, kvs):
            weights, biases = _split_arena_tree(tree)

            def for_layer(_experts, mli):
                return weights, slot_rows[mli], biases

            def body(carry, _):
                tok, pos, kvs = carry
                positions = jnp.full((tok.shape[0], 1), pos, jnp.int32)
                logits, kvs, (t_ids, _t_w) = model.forward(
                    params, None, tok, positions, kvs, pos,
                    for_layer=for_layer, impl=impl,
                )
                nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
                return (nxt[:, None], pos + 1, kvs), (nxt, t_ids)

            (_, _, kvs), (toks, tids) = jax.lax.scan(
                body, (tok0, jnp.int32(pos0), kvs), None, length=k
            )
            # tids [k, L_moe, B, 1, K] -> per-step [L_moe, B, k, K]
            # (partial prefix acceptance judges each step separately)
            tr = jnp.moveaxis(tids, 0, 2)
            tr = tr.reshape(tr.shape[0], tr.shape[1], k, -1)
            return toks.T, kvs, tr  # toks [B, k]

        fn = jax.jit(spec_block)
        self._spec_block_cache[k] = fn
        return fn

    def decode_block(self, tok, pos: int, kv_caches, k: int, seq_ids=None):
        """Run k greedy decode steps speculatively with PARTIAL PREFIX
        ACCEPTANCE (run_speculative_block): a step whose routed experts —
        and all predecessors' — were resident at dispatch is exact; a
        miss re-dispatches only the suffix. Raises RuntimeError when the
        arena cannot hold a step's expert union — callers drop to
        single-step decode."""
        import os

        params = self.params
        dev = self.arena.device
        if os.environ.get("MOE_SPEC_BLOCK_MODE", "whole") == "whole":
            # DEFAULT: whole-block replay (see engine_seq2seq for the
            # measured A/B; prefix acceptance via MOE_SPEC_BLOCK_MODE)
            fn = self._spec_block_fn(k)

            def run(tree, slot_rows):
                toks, kvs2, tr = fn(
                    params, tree, slot_rows, tok, jnp.int32(pos), kv_caches
                )
                return toks, kvs2, tr.reshape(tr.shape[0], tr.shape[1], -1)

            limit = self.max_replays or (len(self._moe_lis) + 2 + k)
            on_replay, blog = make_block_monitor(self, self._moe_lis)
            (toks, new_kvs), ids_np, execs = run_speculative(
                self.arena, self._moe_lis, run, limit, on_replay=on_replay
            )
            record_block_log(self, blog)
            self.replay_counts.append(execs)
            spec_trace_and_prefetch(
                self, ids_np, self._moe_lis, seq_ids, budget_scale=k
            )
            return np.asarray(toks), new_kvs

        def dispatch(tree, slot_rows, cur, j0, kk, kvs_):
            fn = self._spec_block_fn(kk)
            # canonical placements: committed-vs-uncommitted inputs are
            # DIFFERENT jit cache entries (~8 s relay recompile each)
            cur = jax.device_put(cur, dev)
            kvs_ = jax.device_put(kvs_, dev)
            return fn(params, tree, slot_rows, cur, jnp.int32(pos + j0), kvs_)

        limit = self.max_replays or (len(self._moe_lis) + 2) * k
        toks, new_kvs, execs, acc_ids = run_speculative_block(
            self.arena, self._moe_lis, dispatch, k, limit, tok, kv_caches,
        )
        self.replay_counts.append(execs)
        ids_flat = acc_ids.reshape(acc_ids.shape[0], acc_ids.shape[1], -1)
        spec_trace_and_prefetch(
            self, ids_flat, self._moe_lis, seq_ids, budget_scale=k
        )
        return np.asarray(toks), new_kvs

    # ---- Stepper protocol --------------------------------------------------
    def init_cache(self, batch: int, max_len: int):
        return self.model.init_cache(batch, max_len)

    def begin_sequences(self, batch: int) -> Optional[List[str]]:
        if self.tracer is None:
            return None
        return [self.tracer.create_entry() for _ in range(batch)]

    def end_sequences(self, seq_ids: Optional[Sequence[str]]) -> None:
        if self.tracer is None or not seq_ids:
            return
        for sid in seq_ids:
            self.tracer.finish_entry(sid)

    def forward(
        self,
        tokens: jax.Array,  # [B, T]
        positions: jax.Array,  # [B, T]
        kv_caches: List,
        kv_len,
        seq_ids: Optional[Sequence[str]] = None,
    ):
        model, arena = self.model, self.arena
        params = self.params
        if self.speculative and tokens.shape[1] == 1:
            # decode: speculative whole-step execution (prefill keeps the
            # per-layer path — a long prompt's per-layer expert union can
            # exceed the arena, which the replay protocol requires)
            def run(tree, slot_rows):
                logits, new_kvs, (t_ids, t_w) = self._spec_fwd(
                    params, tree, slot_rows, tokens, positions, kv_caches,
                    kv_len,
                )
                return logits, new_kvs, t_w, t_ids

            limit = self.max_replays or (len(self._moe_lis) + 2)
            try:
                (logits, new_kvs, t_w), ids_np, execs = run_speculative(
                    arena, self._moe_lis, run, limit
                )
            except RuntimeError as e:
                if is_spec_capacity_error(e):
                    # arena can't hold this step's expert union (or
                    # replays didn't converge): fall back to the exact
                    # per-layer path permanently
                    logger.warning(
                        "speculative decode disabled (%s); falling back "
                        "to the per-layer path", e,
                    )
                    self.speculative = False
                else:
                    # transient: the per-layer path below makes this
                    # step's progress; the next step retries speculative
                    logger.warning(
                        "speculative step transient error (%s); "
                        "per-layer for this step", e,
                    )
            else:
                self.replay_counts.append(execs)
                spec_trace_and_prefetch(self, ids_np, self._moe_lis, seq_ids)
                return logits, new_kvs, (jnp.asarray(ids_np), t_w)
        x = self._embed(params, tokens)
        trace_ids, trace_w = [], []
        self._last_layer_t = None  # don't count inter-step host gaps
        for li in range(model.spec.num_layers):
            self._tick_layer_clock()
            mli = model.moe_layer_index(li)
            if self.dense_arena is not None:
                x, kv_caches[li], step = self._paged_layer(
                    li, mli, x, kv_caches[li], positions, kv_len, seq_ids
                )
                if step is not None:
                    trace_ids.append(step[0])
                    trace_w.append(step[1])
                continue
            pl = params["layers"][li]
            if mli is None:  # leading dense layer (DeepSeek)
                x, kv_caches[li] = self._dense(
                    pl, x, kv_caches[li], positions, kv_len
                )
                continue
            x, h, cw, ids, kv_caches[li] = self._pre(
                pl, x, kv_caches[li], positions, kv_len
            )
            # --- host sync: tiny int array of routed experts --------------
            ids_np = np.asarray(ids)  # [B, T, K]
            keys = [(mli, int(e)) for e in np.unique(ids_np)]
            self._trace_and_prefetch(ids_np, mli, seq_ids)
            x = self._moe_apply(pl, x, h, cw, ids, ids_np, keys, mli)
            trace_ids.append(ids)
            trace_w.append(cw)
        logits = self._head(params, x)
        return logits, kv_caches, (jnp.stack(trace_ids), jnp.stack(trace_w))

    # ---- dense-layer paging --------------------------------------------------
    def _paged_fn(self, kind: str, gid: int):
        """Jitted per-layer stages that rebuild the layer pytree from the
        dense arena (leaf[slot] is an in-place major-axis view): ONE
        compiled program per (stage, structure-group) serves every layer."""
        key = (kind, gid)
        fn = self._paged_jits.get(key)
        if fn is None:
            treedef = self.dense_arena.treedef(gid)
            model, impl = self.model, self._impl

            def unflat(leaves, slot):
                return jax.tree.unflatten(
                    treedef, [a[slot] for a in leaves]
                )

            if kind == "pre":
                def f(leaves, slot, x, kv, positions, kv_len):
                    return model.pre_moe(
                        unflat(leaves, slot), x, kv, positions, kv_len
                    )
                fn = jax.jit(f, donate_argnums=(3,))
            elif kind == "dense":
                def f(leaves, slot, x, kv, positions, kv_len):
                    return model.dense_layer(
                        unflat(leaves, slot), x, kv, positions, kv_len
                    )
                fn = jax.jit(f, donate_argnums=(3,))
            else:  # "apply"
                def f(leaves, slot, x, h, cw, ids, tree, slot_row):
                    weights, biases = _split_arena_tree(tree)
                    return model.apply_moe(
                        unflat(leaves, slot), x, h, cw, ids, weights,
                        slot_row, biases, impl,
                    )
                fn = jax.jit(f)
            self._paged_jits[key] = fn
        return fn

    def _paged_layer(self, li, mli, x, kv, positions, kv_len, seq_ids):
        """One layer through the dense arena (+ expert arena for its MoE
        block). Returns (x, kv, (ids, cw) | None)."""
        da = self.dense_arena
        dslot = jnp.int32(da.acquire(li))
        gid = da.group_of(li)
        try:
            if mli is None:
                with da.lease():
                    x, kv = self._paged_fn("dense", gid)(
                        da.tree(gid), dslot, x, kv, positions, kv_len
                    )
                return x, kv, None
            with da.lease():
                x, h, cw, ids, kv = self._paged_fn("pre", gid)(
                    da.tree(gid), dslot, x, kv, positions, kv_len
                )
            ids_np = np.asarray(ids)
            keys = [(mli, int(e)) for e in np.unique(ids_np)]
            self._trace_and_prefetch(ids_np, mli, seq_ids)
            self.arena.acquire(keys, mli)
            with self.arena.locked_tree() as tree, da.lease():
                slot_row = jnp.asarray(self.arena.slot_map(mli))
                x = self._paged_fn("apply", gid)(
                    da.tree(gid), dslot, x, h, cw, ids, tree, slot_row
                )
            self.arena.release(keys)
            return x, kv, (ids, cw)
        finally:
            da.release(li)

    def _moe_apply(self, pl, x, h, cw, ids, ids_np, keys, mli):
        """Acquire + grouped-FFN apply for one MoE layer, with the optional
        run-on-host escape hatch for experts that miss the deadline."""
        arena = self.arena
        if self.host_fallback:
            resident, missing = arena.try_acquire(
                keys, mli, self.host_fallback_timeout
            )
        else:
            arena.acquire(keys, mli)
            resident, missing = keys, []
        with arena.locked_tree() as tree:
            slot_row = arena.slot_map(mli)
            if missing:
                slot_row = slot_row.copy()
                slot_row[[e for (_, e) in missing]] = arena.zero_slot
            x = self._apply(pl, x, h, cw, ids, tree, jnp.asarray(slot_row))
        if missing:
            from moe_infinity_tpu.runtime.host_exec import host_moe_delta

            self.host_exec_count += len(missing)
            delta = host_moe_delta(
                self._host_exec, mli, missing,
                np.asarray(h), np.asarray(cw), ids_np,
            )
            x = x + jnp.asarray(delta).astype(x.dtype)
        arena.release(resident)
        return x

    # ---- policy glue -------------------------------------------------------
    def _trace_and_prefetch(
        self, ids_np: np.ndarray, mli: int, seq_ids: Optional[Sequence[str]]
    ) -> None:
        if self.tracer is None or not seq_ids:
            return
        if self.prefetch:
            score = None
            for b, sid in enumerate(seq_ids):
                # predict() also records the activations in the tracer
                score = self.predictor.predict(sid, ids_np[b], mli)
            self.arena.set_context(
                mli, self.tracer.get_entry_decoder(seq_ids[0]).matrix
            )
            orders = plan_prefetch(
                score,
                mli,
                lookahead=self.lookahead,
                budget=self._current_budget(),
                is_resident=self.arena.is_resident,
            )
            if orders:
                self.arena.prefetch(orders)
        else:
            for b, sid in enumerate(seq_ids):
                self.tracer.update_entry(sid, ids_np[b], mli)

    def _tick_layer_clock(self) -> None:
        t = _time.perf_counter()
        if self._last_layer_t is not None:
            dt = t - self._last_layer_t
            self._layer_seconds = (
                dt
                if self._layer_seconds is None
                else 0.8 * self._layer_seconds + 0.2 * dt
            )
        self._last_layer_t = t

    def _current_budget(self) -> int:
        if not self.adaptive_budget:
            return self.prefetch_budget
        return adaptive_prefetch_budget(
            self._layer_seconds,
            self.arena.fetch_seconds_ewma,
            self.arena.num_workers,
            self.lookahead,
            self.prefetch_budget,
        )

    # ---- metrics ------------------------------------------------------------
    def hit_rate(self) -> float:
        return self.arena.policy.stats.hit_rate

    def stats(self) -> dict:
        out = self.arena.hit_stats()
        out.update(speculative_stats(self.replay_counts))
        if self.dense_arena is not None:
            out.update(self.dense_arena.stats())
        if self.host_fallback:
            out["host_exec_count"] = self.host_exec_count
        return out

    def node_stats(self) -> dict:
        return self.arena.node_stats()
