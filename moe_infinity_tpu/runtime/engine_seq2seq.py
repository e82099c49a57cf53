"""Offload engine for encoder-decoder MoE models (Switch / NLLB).

The reference's headline offload configs are encoder-decoder
(Switch-large-128, NLLB-MoE-54B on one 24 GB GPU — BASELINE.md); this
engine brings those models' experts out of HBM on the TPU side. Same
design as the decoder-only OffloadEngine (runtime/engine.py): the engine
owns the block loop, jitting attention+routing stages per block, pulling
the routed ids to the host between stages, and acquiring experts from the
slot arena (tracing + activation-aware prefetch across the encoder→decoder
layer sequence — the EAMC policy's encoder/decoder topology scoring
applies, cache_policy._topo_score).

Drives SwitchModel's stage protocol (enc_prelude / enc_block_* /
dec_block_* / *_final); models expose it by implementing those methods.
"""

from __future__ import annotations

import time as _time
from typing import Optional, Sequence

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
from moe_infinity_tpu.runtime.engine import (
    _split_arena_tree,
    make_block_monitor,
    record_block_log,
    spec_trace_and_prefetch,
)
from moe_infinity_tpu.runtime.generate import (
    GenerationResult,
    _bucket_len,
    eos_hit,
)
from moe_infinity_tpu.utils.logger import get_logger

_log = get_logger("engine_seq2seq")


class Seq2SeqOffloadEngine:
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
        route_margin: int = 2,
        max_direct_layers: Optional[int] = None,
        stream_decode: bool = False,
        stream_unique: int = 32,
        dense_arena=None,
        host_fallback: bool = False,
        host_fallback_timeout: float = 0.25,
    ):
        """dense_arena: optional DenseLayerArena paging the COMBINED
        encoder+decoder block stack (global layer index = encoder block i
        -> i, decoder block i -> n_enc + i; params['enc_blocks'] /
        ['dec_blocks'] may then be 1-element stubs holding only what the
        preludes read). The reference pages dense nodes uniformly for every
        architecture (/root/reference/core/model/model_topology.cpp:518-530,
        task_scheduler.cpp:319-378); this closes that gap for the seq2seq
        engines. Forces the per-layer path: a speculative whole-step
        program needs every dense layer resident at once."""
        if dense_arena is not None and speculative:
            raise ValueError(
                "speculative decode requires the dense side resident; "
                "disable speculative_decode when dense paging is active"
            )
        self.dense_arena = dense_arena
        self._paged_jits: dict = {}
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
        self.tracer = tracer
        self.predictor = predictor
        self.prefetch = prefetch and predictor is not None
        self.lookahead = lookahead
        self.prefetch_budget = prefetch_budget or max(1, arena.num_slots // 2)
        self.adaptive_budget = adaptive_budget
        self.speculative = speculative
        self.max_replays = max_replays
        self.spec_block = max(1, spec_block)
        # configured block size: capacity degradation halves spec_block,
        # and a streak of clean blocks grows it back toward this
        self._spec_block_cfg = self.spec_block
        # measured-cost adaptive block sizing (VERDICT r4 weak #3: fixed
        # k=4 at accept_at_1=0.062 doubled execs/block). First cut gated
        # k on an acceptance EWMA — chip-measured WORSE on the uniform
        # headline (k collapsed to 1 and programs/token rose 1.7 → 2.77,
        # 57 tok/s): acceptance is the wrong objective, because a k-step
        # block amortizes its replays over k tokens even when it never
        # accepts first-dispatch. The engine now hill-climbs on the
        # right quantity — measured PROGRAMS PER COMMITTED TOKEN: it
        # probes each size of the compiled halving chain for a few
        # blocks, exploits the argmin, and re-probes periodically or
        # when the chosen size's cost drifts, so regime changes (e.g.
        # routing skew appearing) move k in either direction. Zero
        # recompiles: all sizes come from the halving chain.
        self.adaptive_spec = True
        self._k_trace: list = []
        self._ppt_ewma: dict = {}
        self._probe_queue: Optional[list] = None
        self._chosen: Optional[tuple] = None
        self._blocks_since_probe = 0
        self._k_cap = self._spec_block_cfg
        self.replay_counts: list = []
        # per-phase wall-clock attribution for the speculative decode
        # loop (dispatch / replay-hook / acquire / trace+prefetch
        # seconds, cumulative): the round-5 switch-servable stage read
        # 570 ms/step with execs 1.1 and nothing in the artifact said
        # WHERE the time went — benches snapshot + delta this dict
        self.phase_timings: dict = {}
        self._impl = impl
        self._layer_seconds = None
        self._last_layer_t = None
        if (
            arena.num_slots * getattr(self, "arena_multiplicity", 1)
            < model.spec.num_experts
        ):
            # pod subclass sets arena_multiplicity = expert-axis size (the
            # capacity constraint is on the GLOBAL slot count)
            raise ValueError("arena must fit one full MoE layer of experts")
        s = model.spec
        self._n_enc = (
            getattr(s, "encoder_layers", 0)
            or getattr(s, "num_encoder_layers", 0)
        )
        self._n_dec = (
            getattr(s, "decoder_layers", 0)
            or getattr(s, "num_decoder_layers", 0)
        )
        # decoder sparse-layer ids, the rows of every speculative trace
        # (shared with the continuous batcher's offload mode)
        self.dec_mlis = [
            s.moe_layer_id(i, True)
            for i in range(
                getattr(s, "decoder_layers", 0)
                or getattr(s, "num_decoder_layers", 0)
            )
            if s.is_sparse(i, True)
        ]

        m = model
        self._enc_prelude = jax.jit(m.enc_prelude)
        self._enc_sparse = jax.jit(m.enc_block_sparse_pre)
        self._enc_dense = jax.jit(m.enc_block_dense)
        self._enc_final = jax.jit(m.enc_final)
        self._cross = jax.jit(m.cross_kv)
        self._dec_prelude = jax.jit(m.dec_prelude, static_argnums=(2,))
        self._dec_sparse = jax.jit(m.dec_block_sparse_pre, donate_argnums=(2,))
        self._dec_dense = jax.jit(m.dec_block_dense, donate_argnums=(2,))
        self._dec_final = jax.jit(m.dec_final)
        self._dec_embed = jax.jit(m.dec_embed)

        pimpl = prefill_impl or impl

        def apply(x, h, cw, ids, tree, slot_row):
            weights, biases = _split_arena_tree(tree)
            # encoder passes and prefill-sized decoder steps (static T>1)
            # can use a grouped-GEMM impl; T=1 decode keeps `impl`
            use = impl if h.shape[1] == 1 else pimpl
            return m.apply_ff(x, h, cw, ids, weights, slot_row, biases, use)

        self._apply = jax.jit(apply)

        # ---- DIRECT-TIER layers (PinnedExpertTier.layer_stack) ----------
        # A MoE layer whose FULL expert stack sits in a layer-aligned tier
        # segment dispatches straight from that segment with an identity
        # slot row: no arena slot, no fetch, no miss, no speculative
        # replay, ever, for that layer. The TPU-native shape of "the
        # steady-state hot tier fits in HBM quantized": compute from it
        # in place instead of caching copies of it through slots. The
        # chip diagnosis that forced this: the benchmark's 48-step decode
        # routed 556 distinct experts against 388 affordable slots —
        # capacity churn no eviction policy could fix — while the full
        # int4 decoder tier (6.2 GB) already sat in device memory.
        self._direct: dict = {}
        tier = getattr(arena, "_tier", None)
        # dequant-on-write arenas hold compute-dtype slots while the tier
        # holds quantized bytes — direct dispatch would hand the kernels
        # undequantized values. Those configs keep the slot path.
        dequant_on_write = any(
            not k.endswith("_scale")
            and ((k[:-1] if k.endswith("4") else k) + "_scale")
            in arena._role_to_tail
            and ((k[:-1] if k.endswith("4") else k) + "_scale")
            not in arena._arena
            for k in arena._arena
        )
        if (
            tier is not None
            and hasattr(tier, "layer_stack")
            and not dequant_on_write
        ):
            candidates = [
                mli for mli in range(arena.num_layers)
                if tier.layer_stack(mli, promote=False) is not None
            ]
            if max_direct_layers is not None:
                # DEEPEST-first under an HBM byte budget (the promote
                # copies a ~E * record_bytes stack per layer when the
                # tier memory kind is true host): deep layers carry both
                # the worst capacity churn AND the longest replay
                # cascades (layer l only stabilizes by replay l+1), so
                # each deep layer made direct removes misses and shortens
                # convergence for the whole block
                candidates = candidates[
                    max(0, len(candidates) - max_direct_layers):
                ]
            for mli in candidates:
                stack = tier.layer_stack(mli)
                if stack is None:
                    continue
                self._direct[str(mli)] = {
                    akey: stack[tail]
                    for akey, tail in arena._role_to_tail.items()
                    if akey in arena._arena
                }
        self._direct_mlis = frozenset(int(kk) for kk in self._direct)
        if self._direct:
            _log.info(
                "direct-tier dispatch for %d/%d MoE layers: %s",
                len(self._direct), arena.num_layers,
                sorted(self._direct_mlis),
            )

        # ---- STREAM decode (ops/stream.py) ------------------------------
        # Decode blocks gather the routed experts from the pinned tier
        # INSIDE the program: no arena residency for the decoder at all,
        # no speculative replay cascade — the only re-dispatch is the
        # exact, host-detected unique-overflow escalation (U doubles).
        self._stream = False
        if stream_decode:
            if tier is None or not getattr(tier, "fields", None):
                raise ValueError("stream_decode requires a pinned tier")
            if dequant_on_write:
                raise ValueError(
                    "stream_decode computes from the tier's stored "
                    "dtype; disable dequant_on_write"
                )
            if not speculative:
                raise ValueError(
                    "stream_decode rides the block-decode loop; pass "
                    "speculative=True"
                )
            route_margin = 0  # near-tie margin is a slot-cache concern
            self._stream_fields = {
                akey: tier.fields[tail]
                for akey, tail in arena._role_to_tail.items()
                if akey in arena._arena
            }
            E_s = arena.num_experts
            self._stream_rec_rows = {
                mli: tier._rec_row[mli * E_s:(mli + 1) * E_s].copy()
                for mli in range(arena.num_layers)
            }
            self._stream_hbm = tier.hbm_sharding()
            self._stream_seg_rows = tier._seg_rows
            self._stream_U = max(2, int(stream_unique))
            self._stream_src_cache: dict = {}
            self._stream_block_cache: dict = {}
            self._stream = True
            _log.info(
                "stream decode: in-program gather from %d tier segments, "
                "U0=%d", len(next(iter(self._stream_fields.values()))),
                self._stream_U,
            )

        if speculative:
            # routing-margin acquisition: the spec programs' traces carry
            # the router's next-m runner-ups per (token, layer). Dispatch
            # stays exact top-k; verification requires the WIDENED set
            # resident (strictly stronger, still exact), so when a
            # replay's corrected activations flip a near-tie the flipped-
            # to expert is already resident and the block accepts instead
            # of cascading (chip diagnosis: deep NLLB layers flip top-2
            # per dispatch; 5 executions per 4-token block without this)
            if hasattr(model, "route_margin"):
                import os as _os

                model.route_margin = max(0, int(
                    _os.environ.get("MOE_ROUTE_MARGIN", route_margin)
                ))
            # whole-decoder step against the arena's CURRENT slot state:
            # routing resolves inside one compiled program; the host
            # verifies the routed ids afterward and replays on miss
            E_ = m.spec.num_experts

            def spec_step(params, tree, direct, slot_rows, tok, positions,
                          step, kvs, enc_mask, cross):
                weights, biases = _split_arena_tree(tree)

                def for_layer(_experts, mli):
                    d = direct.get(str(mli))
                    if d is not None:  # direct-tier layer: identity row
                        w, b = _split_arena_tree(d)
                        return w, jnp.arange(E_, dtype=jnp.int32), b
                    return weights, slot_rows[mli], biases

                return m.decode_step(
                    params, None, tok, positions, kvs, step, enc_mask,
                    cross, for_layer, impl,
                )

            self._spec_step = jax.jit(spec_step)
            self._spec_block_cache = {}

    def _spec_block_fn(self, k: int):
        """Jitted k-step GREEDY decode block over the arena's current slot
        state: a lax.scan of k decode steps inside ONE compiled program —
        routing for steps 2..k resolves in-program from the step before.
        Returns (tokens [B, k], kvs, trace [L_moe, B, k*topk]). Amortizes
        per-program dispatch/launch overhead by k (on remote-attached
        chips dispatch dominates the offload decode step; on local chips
        it removes k-1 host round-trips per k tokens)."""
        if k in self._spec_block_cache:
            return self._spec_block_cache[k]
        m, impl = self.model, self._impl

        E_ = m.spec.num_experts

        def spec_block(params, tree, direct, slot_rows, tok0, step0, kvs,
                       enc_mask, cross):
            weights, biases = _split_arena_tree(tree)

            def for_layer(_experts, mli):
                d = direct.get(str(mli))
                if d is not None:  # direct-tier layer: identity row
                    w, b = _split_arena_tree(d)
                    return w, jnp.arange(E_, dtype=jnp.int32), b
                return weights, slot_rows[mli], biases

            def body(carry, _):
                tok, step, kvs = carry
                positions = jnp.full((tok.shape[0], 1), step, jnp.int32)
                logits, kvs, trace = m.decode_step(
                    params, None, tok, positions, kvs, step, enc_mask,
                    cross, for_layer, impl,
                )
                nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
                return (nxt[:, None], step + 1, kvs), (nxt, trace)

            (_, _, kvs), (toks, traces) = jax.lax.scan(
                body, (tok0, jnp.int32(step0), kvs), None, length=k
            )
            # decode_step's trace is either a list of per-layer [B, ...]
            # id arrays (Switch) or one stacked [L, B, ...] array (NLLB);
            # after the scan both carry a leading step axis k. Verification
            # wants PER-STEP ids [L_moe, B, k, K'] (partial prefix
            # acceptance judges each step separately)
            if isinstance(traces, (list, tuple)):
                traces = jnp.stack(traces, axis=1)  # [k, L, B, ...]
            tr = jnp.moveaxis(traces, 0, 2)
            tr = tr.reshape(tr.shape[0], tr.shape[1], k, -1)
            return toks.T, kvs, tr  # toks [B, k]

        fn = jax.jit(spec_block)
        self._spec_block_cache[k] = fn
        return fn

    def _stream_sources(self, U: int):
        src = self._stream_src_cache.get(U)
        if src is None:
            from moe_infinity_tpu.ops.stream import StreamSource

            src = {
                str(mli): StreamSource(
                    fields=self._stream_fields, rec_row=rows,
                    seg_rows=self._stream_seg_rows, hbm=self._stream_hbm,
                    max_unique=U, impl=self._impl,
                )
                for mli, rows in self._stream_rec_rows.items()
            }
            self._stream_src_cache[U] = src
        return src

    def _stream_block_fn(self, k: int):
        """Jitted k-step greedy decode block whose MoE layers gather
        their routed experts from the pinned tier in-program (U is part
        of the sources' static treedef: one compile per (k, U))."""
        fn = self._stream_block_cache.get(k)
        if fn is not None:
            return fn
        m, impl = self.model, self._impl
        E_ = m.spec.num_experts

        def sblock(params, sources, tok0, step0, kvs, enc_mask, cross):
            def for_layer(_experts, mli):
                return (
                    sources[str(mli)],
                    jnp.arange(E_, dtype=jnp.int32),
                    None,
                )

            def body(carry, _):
                tok, step, kvs = carry
                positions = jnp.full((tok.shape[0], 1), step, jnp.int32)
                logits, kvs, trace = m.decode_step(
                    params, None, tok, positions, kvs, step, enc_mask,
                    cross, for_layer, impl,
                )
                nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(
                    jnp.int32
                )
                return (nxt[:, None], step + 1, kvs), (nxt, trace)

            (_, _, kvs), (toks, traces) = jax.lax.scan(
                body, (tok0, jnp.int32(step0), kvs), None, length=k
            )
            if isinstance(traces, (list, tuple)):
                traces = jnp.stack(traces, axis=1)
            tr = jnp.moveaxis(traces, 0, 2)
            tr = tr.reshape(tr.shape[0], tr.shape[1], k, -1)
            return toks.T, kvs, tr

        fn = jax.jit(sblock)
        self._stream_block_cache[k] = fn
        return fn

    def _stream_block(
        self, params, cur_tok, step, kvs, mask, cross, dec_mlis, seq_ids,
        k: int,
    ):
        """k greedy decode steps with in-program expert gathering. The
        only re-dispatch is the EXACT host-side overflow check: a
        (layer, step) whose routing touched more than U unique experts
        — or an unstaged one — had those contributions zero-masked, so
        the block re-runs at doubled U (sticky: routing width is a
        property of the workload, not of one block)."""
        from moe_infinity_tpu.ops.stream import stream_overflow

        E = self.model.spec.num_experts
        execs = 0
        while True:
            fn = self._stream_block_fn(k)
            toks, kvs2, tr = fn(
                params, self._stream_sources(self._stream_U), cur_tok,
                jnp.int32(step), kvs, mask, cross,
            )
            execs += 1
            ids_np = np.asarray(tr)  # [L, B, k, K]
            over = any(
                stream_overflow(
                    ids_np[j, :, jj], self._stream_U,
                    self._stream_rec_rows[mli],
                )
                for j, mli in enumerate(dec_mlis)
                for jj in range(k)
            )
            if not over:
                break
            if self._stream_U >= E:
                raise RuntimeError(
                    "stream decode: an unstaged expert was routed at "
                    "U=E — stage the full decoder tier or disable "
                    "stream_decode"
                )
            self._stream_U = min(E, self._stream_U * 2)
            _log.info(
                "stream decode U escalated to %d", self._stream_U
            )
        self.replay_counts.append(execs)
        if self.tracer is not None and seq_ids:
            for j, mli in enumerate(dec_mlis):
                for b, sid in enumerate(seq_ids):
                    if sid is not None:
                        self.tracer.update_entry(
                            sid, ids_np[j, b].ravel(), mli
                        )
        return np.asarray(toks), kvs2

    def _direct_filtered(self, key_fn, margin_fn, mlis):
        """Wrap (key_fn, margin_fn) so direct-tier layers drop out of
        verification/acquisition entirely (their experts are always
        resident in place) and margin prefetch never orders them."""
        if not self._direct_mlis:
            return key_fn, margin_fn
        base = key_fn or (lambda ids, j: np.unique(ids[j]))
        direct = self._direct_mlis

        def kf(ids, j):
            if mlis[j] in direct:
                return np.empty(0, np.int64)
            return base(ids, j)

        mf = None
        if margin_fn is not None:
            def mf(ids_np):
                return [
                    key for key in margin_fn(ids_np)
                    if key[0] not in direct
                ]

        return kf, mf

    def is_resident(self, key):
        """Residency including direct-tier layers (prefetch planners and
        scorers must never order fetches for in-place tier experts)."""
        return key[0] in self._direct_mlis or self.arena.is_resident(key)

    def _speculative_block(
        self, params, cur_tok, step, kvs, mask, cross, dec_mlis, seq_ids,
        k: int,
    ):
        """Run k greedy decode steps speculatively with PARTIAL PREFIX
        ACCEPTANCE (run_speculative_block): a step whose routed experts —
        and all predecessors' — were resident at dispatch is exact, so a
        miss only re-dispatches the suffix. Under routing drift (distinct
        expert weights, cold cache) whole-block replay cost ~k executions
        per block; prefix acceptance makes each execution commit its
        verified tokens."""
        import os

        from moe_infinity_tpu.runtime.engine import (
            run_speculative,
            run_speculative_block,
        )

        if self._stream:
            # in-program gather: no arena verification loop at all
            try:
                return self._stream_block(
                    params, cur_tok, step, kvs, mask, cross, dec_mlis,
                    seq_ids, k,
                )
            except Exception as e:  # noqa: BLE001
                if "unstaged expert was routed" in str(e):
                    raise  # exactness violation, not a compile problem
                # a stream program that cannot compile on this backend
                # (e.g. the axon concatenate memory-space RET_CHECK at
                # full NLLB depth) would otherwise re-attempt its ~80 s
                # compile EVERY block; disable stream once and serve
                # through the arena path for the rest of this engine's
                # life
                self._stream = False
                _log.warning(
                    "stream decode disabled (%s: %.200s); serving via "
                    "the arena path", type(e).__name__, e,
                )
                raise RuntimeError(f"stream dispatch failed: {e}") from e
        if os.environ.get("MOE_SPEC_BLOCK_MODE", "whole") == "whole":
            # DEFAULT: whole-block replay. Measured A/B on the relay chip
            # (12-layer NLLB, steady state): whole 756 tok/s vs prefix 257
            # — at high hit rates a replay is ONE k-step dispatch, while
            # prefix acceptance pays per-suffix dispatch + host-sync round
            # trips. Prefix acceptance (MOE_SPEC_BLOCK_MODE=prefix) wins
            # when replays are expensive relative to dispatch overhead
            # (cold caches / routing drift / directly-attached chips).
            fn = self._spec_block_fn(k)
            margin = getattr(self.model, "route_margin", 0)

            def run(tree, slot_rows):
                toks, kvs2, tr = fn(
                    params, tree, self._direct, slot_rows, cur_tok,
                    jnp.int32(step), kvs, mask, cross,
                )
                # [L, B, k, K+m]: keep the column structure so the
                # margin runner-ups stay separable from the top-k
                return toks, kvs2, tr

            from moe_infinity_tpu.runtime.engine import (
                margin_key_fns,
                split_margin_columns,
            )

            key_fn, margin_fn = self._direct_filtered(
                *margin_key_fns(dec_mlis, margin), dec_mlis
            )
            limit = self.max_replays or (len(dec_mlis) + 2 + k)
            on_replay, blog = make_block_monitor(
                self, dec_mlis, margin_fn=margin_fn
            )
            (toks, new_kvs), ids_np, execs = run_speculative(
                self.arena, dec_mlis, run, limit,
                key_fn=key_fn, on_replay=on_replay,
                timings=self.phase_timings,
            )
            record_block_log(self, blog)
            self.replay_counts.append(execs)
            top, _ = split_margin_columns(ids_np, margin)
            t_tp = _time.perf_counter()
            spec_trace_and_prefetch(
                self, top.reshape(top.shape[0], top.shape[1], -1),
                dec_mlis, seq_ids,
                plan_floor=dec_mlis[0] - 1 if dec_mlis else -1,
                budget_scale=k,
                extra_orders=margin_fn(ids_np) if margin_fn else (),
            )
            self.phase_timings["trace_prefetch_s"] = (
                self.phase_timings.get("trace_prefetch_s", 0.0)
                + (_time.perf_counter() - t_tp)
            )
            return np.asarray(toks), new_kvs

        dev = self.arena.device

        def dispatch(tree, slot_rows, cur, j0, kk, kvs_):
            fn = self._spec_block_fn(kk)
            # canonicalize placements: a committed-vs-uncommitted input
            # mismatch is a DIFFERENT jit cache entry — each ~8 s relay
            # recompile of an already-compiled block size (observed via
            # JAX_LOG_COMPILES; device_put here is metadata-only)
            cur = jax.device_put(cur, dev)
            kvs_ = jax.device_put(kvs_, dev)
            return fn(
                params, tree, self._direct, slot_rows, cur,
                jnp.int32(step + j0), kvs_, mask, cross,
            )

        limit = self.max_replays or (len(dec_mlis) + 2) * k
        t0 = _time.perf_counter()
        toks, new_kvs, execs, acc_ids = run_speculative_block(
            self.arena, dec_mlis, dispatch, k, limit, cur_tok, kvs,
            margin=getattr(self.model, "route_margin", 0),
            skip_mlis=self._direct_mlis,
        )
        t1 = _time.perf_counter()
        self.replay_counts.append(execs)
        ids_flat = acc_ids.reshape(acc_ids.shape[0], acc_ids.shape[1], -1)
        spec_trace_and_prefetch(
            self, ids_flat, dec_mlis, seq_ids,
            plan_floor=dec_mlis[0] - 1 if dec_mlis else -1,
            budget_scale=k,
        )
        if os.environ.get("MOE_SPEC_DEBUG"):
            print(
                f"[specblk] block k={k} loop={1e3*(t1-t0):.0f}ms "
                f"trace+prefetch={1e3*(_time.perf_counter()-t1):.0f}ms",
                flush=True,
            )
        return np.asarray(toks), new_kvs

    _PROBE_BLOCKS = 3
    _REPROBE_EVERY = 24

    def _halving_chain(self) -> list:
        chain, k = [], min(self._spec_block_cfg, self._k_cap)
        while k >= 1:
            chain.append(k)
            if k == 1:
                break
            k //= 2
        return chain

    def _adapt_spec_block(self, k: Optional[int] = None,
                          tokens: Optional[int] = None) -> None:
        """Post-block (or post-step) block-size adaptation that
        hill-climbs on MEASURED programs per committed token: probe each
        halving-chain size for _PROBE_BLOCKS blocks, exploit the argmin,
        re-probe every _REPROBE_EVERY blocks or when the chosen size's
        cost EWMA drifts 1.5x above its value at choice time. The chip
        data that shaped this: near-uniform routing measured ppt 1.7 at
        k=4 vs 2.77 at k=1 (bigger blocks amortize replays even at ~0
        first-dispatch acceptance), while a skewed workload at high hit
        rate wants large k outright — one objective covers both."""
        if not self.replay_counts:
            return
        k = k or self.spec_block
        toks = tokens or k
        ppt = self.replay_counts[-1] / max(1, toks)
        old = self._ppt_ewma.get(k)
        self._ppt_ewma[k] = ppt if old is None else 0.7 * old + 0.3 * ppt
        self._k_trace.append(k)
        if len(self._k_trace) > 512:
            del self._k_trace[: len(self._k_trace) - 512]
        if not self.adaptive_spec:
            return
        self._blocks_since_probe += 1
        chain = self._halving_chain()
        if len(chain) == 1:
            self.spec_block = chain[0]
            return
        while self._probe_queue:
            s = self._probe_queue.pop(0)
            best = min(self._ppt_ewma.values(), default=None)
            if best is not None and best <= 1.0 / s:
                # a size-s block costs >= 1/s programs/token by
                # construction, so s cannot beat the best measured size —
                # don't burn real decode blocks probing it (on a
                # high-hit workload ppt(k=4) ~ 0.3 skips the k=2 and k=1
                # probes entirely; chip r5: each skipped k=1 probe block
                # saved ~3 programs for 1 token)
                continue
            self.spec_block = s
            return
        if self._chosen is None:
            if self._probe_queue is None:  # first block ever: start probe
                self._probe_queue = [
                    s for s in chain for _ in range(self._PROBE_BLOCKS)
                ]
                self.spec_block = self._probe_queue.pop(0)
                return
            # probe queue just drained: every size measured — choose
            scored = {
                s: self._ppt_ewma[s] for s in chain if s in self._ppt_ewma
            }
            best = min(scored, key=scored.get)
            self._chosen = (best, scored[best])
            self._blocks_since_probe = 0
            self.spec_block = best
            _log.info(
                "speculative block chosen k=%d (programs/token %s)",
                best,
                {s: round(v, 2) for s, v in sorted(scored.items())},
            )
            return
        cur_k, chosen_ppt = self._chosen
        self.spec_block = cur_k
        cur = self._ppt_ewma.get(cur_k, chosen_ppt)
        if (
            self._blocks_since_probe >= self._REPROBE_EVERY
            or cur > 1.5 * chosen_ppt
        ):
            # regime may have shifted (either direction) — fresh probe
            # with fresh estimates so the old regime can't pin the choice
            self._probe_queue = [
                s for s in chain for _ in range(self._PROBE_BLOCKS)
            ]
            self._chosen = None
            self._ppt_ewma = {}
            self._blocks_since_probe = 0
            self.spec_block = self._probe_queue.pop(0)
            _log.info("speculative block re-probing (from k=%d)", cur_k)

    def reset_arena(
        self, arena: ExpertArena, *, speculative: Optional[bool] = None,
        tracer: Optional[ExpertTracer] = None,
        predictor: Optional[ExpertPredictor] = None,
    ) -> None:
        """Swap the expert arena (and optionally tracer/predictor and the
        speculative mode) in place. The dense-stage jitted programs
        survive; only arena-shaped programs retrace on next use. For A/B
        benches (cache pressure vs the headline arena) where recompiling
        the whole per-layer stack through a relay link would dominate the
        measurement."""
        self.arena = arena
        if speculative is not None:
            self.speculative = speculative
        if tracer is not None:
            self.tracer = tracer
            self.predictor = predictor
            self.prefetch = self.prefetch and predictor is not None
        self._layer_seconds = None
        self._last_layer_t = None

    # ---- shared expert acquire/apply --------------------------------------
    def _tick_layer_clock(self):
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

    def _place(self, a):
        """Host→device placement hook for generate()'s inputs; the pod
        subclass replicates over the mesh (SPMD needs global arrays)."""
        return a

    def init_cache(self, batch: int, cap: int):
        return self.model.init_cache(batch, cap)

    def _moe(self, x, h, cw, ids, mli, seq_ids):
        self._tick_layer_clock()
        ids_np = np.asarray(ids)
        keys = [(mli, int(e)) for e in np.unique(ids_np)]
        self._plan_layer(ids_np, mli, seq_ids)
        return self._moe_dispatch(x, h, cw, ids, ids_np, keys, mli)

    def _plan_layer(self, ids_np, mli, seq_ids):
        """Trace this layer's routing and enqueue lookahead prefetch (the
        pod subclass plans against the executor's residency instead)."""
        if self.tracer is None or not seq_ids:
            return
        if self.prefetch:
            score = None
            for b, sid in enumerate(seq_ids):
                score = self.predictor.predict(sid, ids_np[b], mli)
            self.arena.set_context(
                mli, self.tracer.get_entry_decoder(seq_ids[0]).matrix
            )
            orders = plan_prefetch(
                score, mli,
                lookahead=self.lookahead, budget=self._current_budget(),
                is_resident=self.is_resident,
            )
            if orders:
                self.arena.prefetch(orders)
        else:
            for b, sid in enumerate(seq_ids):
                self.tracer.update_entry(sid, ids_np[b], mli)

    def _moe_dispatch(self, x, h, cw, ids, ids_np, keys, mli):
        """Acquire + apply one MoE layer against the slot arena (the pod
        subclass dispatches the shard_map EP program instead)."""
        if mli in self._direct_mlis:
            # direct-tier layer: every expert resident in place; no
            # acquire, no slot row, no host fallback to need
            row = jnp.arange(
                self.model.spec.num_experts, dtype=jnp.int32
            )
            return self._apply(
                x, h, cw, ids, self._direct[str(mli)], row
            )
        if self.host_fallback:
            resident, missing = self.arena.try_acquire(
                keys, mli, self.host_fallback_timeout
            )
        else:
            self.arena.acquire(keys, mli)
            resident, missing = keys, []
        with self.arena.locked_tree() as tree:
            slot_row = self.arena.slot_map(mli)
            if missing:
                slot_row = slot_row.copy()
                slot_row[[e for (_, e) in missing]] = self.arena.zero_slot
            x = self._apply(x, h, cw, ids, tree, jnp.asarray(slot_row))
        if missing:
            from moe_infinity_tpu.runtime.host_exec import host_moe_delta

            self.host_exec_count += len(missing)
            delta = host_moe_delta(
                self._host_exec, mli, missing,
                np.asarray(h), np.asarray(cw), ids_np,
            )
            x = x + jnp.asarray(delta).astype(x.dtype)
        self.arena.release(resident)
        return x

    def _prefetch_decoder_tier(self, seq_ids) -> None:
        """Encode→decode transition prefetch: plan the whole decoder tier
        from the EAMC prediction (full depth, block-scaled budget) so the
        first decode steps find their experts resident. The reference has
        no analogue — its prefetch window never spans the phase boundary."""
        if not (self.prefetch and seq_ids and self.dec_mlis):
            return
        first_dec = self.dec_mlis[0]
        # the encoder's last MoE routing sharpens the first decoder row
        # through the cross-boundary transition counts (enc-last -> dec-
        # first are consecutive moe-layer ids, so update_entry recorded
        # them)
        ent = self.tracer.get_entry(seq_ids[0])
        obs = (
            {ent.last_layer: ent.last_experts}
            if ent.last_experts is not None
            else {}
        )
        score = self.predictor.predict_block(
            seq_ids[0], obs, from_layer=first_dec
        )
        self.arena.set_context(
            first_dec, self.tracer.get_entry_decoder(seq_ids[0]).matrix
        )
        orders = plan_prefetch(
            score, first_dec - 1, lookahead=None,
            budget=self._current_budget() * max(1, self.spec_block),
            is_resident=self.is_resident,
        )
        if orders:
            self.arena.prefetch(orders)

    # ---- dense-layer paging ----------------------------------------------
    def _paged_fn(self, kind: str, gid: int):
        """Jitted per-block stages that rebuild the block pytree from the
        dense arena (leaf[slot] is an in-place major-axis view): ONE
        compiled program per (stage, structure-group) serves every block
        of that group at any residency state."""
        key = (kind, gid)
        fn = self._paged_jits.get(key)
        if fn is None:
            treedef = self.dense_arena.treedef(gid)
            m = self.model

            def unflat(leaves, slot):
                return jax.tree.unflatten(
                    treedef, [a[slot] for a in leaves]
                )

            if kind == "enc_sparse":
                def f(leaves, slot, x, bias, q_pos):
                    return m.enc_block_sparse_pre(
                        unflat(leaves, slot), x, bias, q_pos
                    )
                fn = jax.jit(f)
            elif kind == "enc_dense":
                def f(leaves, slot, x, bias, q_pos):
                    return m.enc_block_dense(
                        unflat(leaves, slot), x, bias, q_pos
                    )
                fn = jax.jit(f)
            elif kind == "dec_sparse":
                def f(leaves, slot, x, kv, positions, kv_len, bias, ck, cv,
                      cross_bias):
                    return m.dec_block_sparse_pre(
                        unflat(leaves, slot), x, kv, positions, kv_len,
                        bias, ck, cv, cross_bias,
                    )
                fn = jax.jit(f, donate_argnums=(3,))
            elif kind == "dec_dense":
                def f(leaves, slot, x, kv, positions, kv_len, bias, ck, cv,
                      cross_bias):
                    return m.dec_block_dense(
                        unflat(leaves, slot), x, kv, positions, kv_len,
                        bias, ck, cv, cross_bias,
                    )
                fn = jax.jit(f, donate_argnums=(3,))
            else:  # "cross"
                def f(leaves, slot, enc_out):
                    return m.cross_kv_block(unflat(leaves, slot), enc_out)
                fn = jax.jit(f)
            self._paged_jits[key] = fn
        return fn

    def _enc_block_paged(self, i, x, bias, q_pos, seq_ids):
        da, s = self.dense_arena, self.model.spec
        slot = jnp.int32(da.acquire(i))
        gid = da.group_of(i)
        try:
            if s.is_sparse(i, False):
                with da.lease():
                    x, h, cw, ids = self._paged_fn("enc_sparse", gid)(
                        da.tree(gid), slot, x, bias, q_pos
                    )
                # _moe blocks on expert-arena acquire OUTSIDE the dense
                # lease (the lease invariant), but inside the dense
                # protection — the block cannot be evicted mid-layer
                return self._moe(
                    x, h, cw, ids, s.moe_layer_id(i, False), seq_ids
                )
            with da.lease():
                return self._paged_fn("enc_dense", gid)(
                    da.tree(gid), slot, x, bias, q_pos
                )
        finally:
            da.release(i)

    def _dec_block_paged(
        self, i, x, kv, positions, step, bias, ck, cv, cross_bias, seq_ids
    ):
        da, s = self.dense_arena, self.model.spec
        li = self._n_enc + i
        slot = jnp.int32(da.acquire(li))
        gid = da.group_of(li)
        try:
            if s.is_sparse(i, True):
                with da.lease():
                    x, h, cw, ids, kv = self._paged_fn("dec_sparse", gid)(
                        da.tree(gid), slot, x, kv, positions,
                        jnp.int32(step), bias, ck, cv, cross_bias,
                    )
                x = self._moe(
                    x, h, cw, ids, s.moe_layer_id(i, True), seq_ids
                )
                return x, kv
            with da.lease():
                return self._paged_fn("dec_dense", gid)(
                    da.tree(gid), slot, x, kv, positions, jnp.int32(step),
                    bias, ck, cv, cross_bias,
                )
        finally:
            da.release(li)

    def _cross_paged(self, enc_out):
        """Cross-attention K/V computed per paged decoder block (the
        resident path computes the whole stack in one jit)."""
        da = self.dense_arena
        out = []
        for i in range(self._n_dec):
            li = self._n_enc + i
            slot = jnp.int32(da.acquire(li))
            gid = da.group_of(li)
            try:
                with da.lease():
                    out.append(
                        self._paged_fn("cross", gid)(
                            da.tree(gid), slot, enc_out
                        )
                    )
            finally:
                da.release(li)
        return out

    def run_encoder(self, input_ids, mask, seq_ids=None):
        """Per-layer (acquire/prefetch) encoder pass + cross K/V. Also the
        join-encode path for the continuous seq2seq batcher in offload
        mode."""
        params, s = self.params, self.model.spec
        x, bias, q_pos = self._enc_prelude(params, input_ids, mask)
        for i in range(self._n_enc):
            if self.dense_arena is not None:
                x = self._enc_block_paged(i, x, bias, q_pos, seq_ids)
                continue
            b = params["enc_blocks"][i]
            if s.is_sparse(i, False):
                x, h, cw, ids = self._enc_sparse(b, x, bias, q_pos)
                x = self._moe(
                    x, h, cw, ids, s.moe_layer_id(i, False), seq_ids
                )
            else:
                x = self._enc_dense(b, x, bias, q_pos)
        enc_out = self._enc_final(params, x)
        if self.dense_arena is not None:
            return enc_out, self._cross_paged(enc_out)
        return enc_out, self._cross(params, enc_out)

    # ---- speculative whole-step decode -------------------------------------
    def _speculative_step(
        self, params, cur_tok, positions, step, kvs, mask, cross,
        dec_mlis, seq_ids,
    ):
        """One decode step as ONE compiled program over the arena's current
        slot state — no per-layer host synchronization. The routed ids come
        back with the logits; the host verifies them against residency and,
        on a miss, loads the missed experts and re-executes the step from
        the same inputs. The accepted execution had every routed expert
        resident, so the result is exact.

        Convergence is bounded: layer 0's routing depends only on the
        (correct) inputs, so after one replay its experts are resident and
        its output exact; inductively layer l stabilizes by replay l+1 —
        at most len(dec_mlis)+1 executions. In steady state the decode hot
        set is resident and steps accept on the first run. TPU-native
        answer to the reference's per-miss cv.wait on the hot path
        (archer_prefetch_handle.cpp:83-121): optimistic execution instead
        of per-layer blocking."""
        from moe_infinity_tpu.runtime.engine import (
            margin_key_fns,
            run_speculative,
            split_margin_columns,
        )

        def run(tree, slot_rows):
            return self._spec_step(
                params, tree, self._direct, slot_rows, cur_tok, positions,
                jnp.int32(step), kvs, mask, cross,
            )

        margin = getattr(self.model, "route_margin", 0)
        key_fn, margin_fn = self._direct_filtered(
            *margin_key_fns(dec_mlis, margin), dec_mlis
        )
        limit = self.max_replays or (len(dec_mlis) + 2)
        (logits, new_kvs), ids_np, execs = run_speculative(
            self.arena, dec_mlis, run, limit, key_fn=key_fn,
            timings=self.phase_timings,
        )
        self.replay_counts.append(execs)
        # record routing + warm the next step (decoder rows only: the
        # encoder never runs again)
        top, _ = split_margin_columns(ids_np, margin)
        spec_trace_and_prefetch(
            self, top, dec_mlis, seq_ids,
            plan_floor=dec_mlis[0] - 1 if dec_mlis else -1,
            extra_orders=margin_fn(ids_np) if margin_fn else (),
        )
        return logits, new_kvs

    # ---- generation -------------------------------------------------------
    def generate(
        self,
        input_ids: np.ndarray,
        max_new_tokens: int = 32,
        *,
        attention_mask: Optional[np.ndarray] = None,
        eos_token_id: Optional[int] = 1,
        pad_token_id: int = 0,
        decoder_start_token_id: Optional[int] = None,
        temperature: float = 0.0,
        do_sample: Optional[bool] = None,
        top_k: int = 0,
        top_p: float = 1.0,
        repetition_penalty: float = 1.0,
        presence_penalty: float = 0.0,
        frequency_penalty: float = 0.0,
        logprobs: int = 0,
        logit_bias=None,
        seed: int = 0,
        cache_len: Optional[int] = None,
    ) -> GenerationResult:
        """cache_len: override the decoder KV capacity (default: bucketed
        from max_new_tokens). Callers timing DIFFERENCED runs must pin the
        same cache_len for both — a different capacity bucket is a
        different compiled program for every block size (measured: ~8 s
        relay recompiles inside the timed region)."""
        from moe_infinity_tpu.runtime.sampling import Sampler, params_from_kwargs

        sp = params_from_kwargs(
            temperature=temperature, do_sample=do_sample, top_k=top_k,
            top_p=top_p, repetition_penalty=repetition_penalty,
            presence_penalty=presence_penalty,
            frequency_penalty=frequency_penalty, logprobs=logprobs,
            logit_bias=logit_bias,
        )
        if not hasattr(self, "_samplers"):
            self._samplers = {}
        if sp not in self._samplers:
            self._samplers[sp] = Sampler(sp)
        sampler = self._samplers[sp]
        model, params, s = self.model, self.params, self.model.spec
        input_ids = np.atleast_2d(np.asarray(input_ids))
        B, T = input_ids.shape
        seq_ids = (
            [self.tracer.create_entry() for _ in range(B)]
            if self.tracer is not None
            else None
        )
        start = (
            decoder_start_token_id
            if decoder_start_token_id is not None
            else s.decoder_start_token_id
        )
        mask = self._place(
            jnp.asarray(attention_mask, jnp.float32)
            if attention_mask is not None
            else jnp.ones((B, T), jnp.float32)
        )

        # ---- encoder ---------------------------------------------------
        enc_out, cross = self.run_encoder(
            self._place(jnp.asarray(input_ids, jnp.int32)), mask, seq_ids
        )
        # warm the decoder's predicted hot set NOW: these fetches overlap
        # the decode prelude + first block's dispatch instead of stalling
        # its first replays (the per-layer lookahead window above only
        # crosses the encoder→decoder boundary near the encoder's end)
        self._prefetch_decoder_tier(seq_ids)

        # ---- decoder ---------------------------------------------------
        cap = cache_len or _bucket_len(max_new_tokens + 1)
        if cap < max_new_tokens + 1:
            raise ValueError(
                f"cache_len {cap} cannot hold max_new_tokens="
                f"{max_new_tokens} (+1 start token)"
            )
        kvs = self.init_cache(B, cap)
        out = np.full((B, max_new_tokens + 1), pad_token_id, dtype=np.int64)
        out[:, 0] = start
        finished = np.zeros(B, dtype=bool)
        num_gen = np.zeros(B, dtype=np.int64)
        cur_tok = self._place(jnp.full((B, 1), start, jnp.int32))
        sstate = None
        lp_tok, lp_top, lp_ids = [], [], []
        dec_mlis = self.dec_mlis
        step = 0
        # per-iteration decode timing (tokens_committed, seconds): lets
        # callers separate the post-encode re-warm cliff from steady-state
        # decode without fragile whole-call differencing
        self.step_times = []
        # decode-window counter snapshot: the cumulative arena stats
        # conflate the encoder's one-shot streaming misses with the decode
        # regime the throughput claim is about; decode_window_stats()
        # isolates this generate()'s decode phase, with per-layer miss
        # attribution for the prefetch-planner diagnosis
        self._dw0 = self.arena.hit_stats()
        self._dw_miss0 = self.arena.policy.node_stats["misses"].copy()
        self._dw_visit0 = self.arena.policy.node_stats["visits"].copy()
        self._dw_evict0 = self.arena.policy.node_stats["evictions"].copy()
        while step < max_new_tokens:
            _it_t0 = _time.perf_counter()
            # ---- k-step speculative block (greedy-only fast path) -------
            # stream mode enters the block path even at k=1: its "block"
            # is the in-program tier gather — one whole-decoder-step
            # program with no arena verification loop. (The round-4
            # full-size stream program — k=4 x 6 MoE layers x U=32
            # unrolled gathers — faulted the axon TPU worker; k=1 and a
            # smaller U shrink the compiled program ~16x, landing the
            # same design in chunks.)
            if (
                self.speculative
                and (self.spec_block > 1 or self._stream)
                and sp.trivial
                and sp.logprobs == 0
            ):
                from moe_infinity_tpu.runtime.engine import quantize_block

                k = quantize_block(max_new_tokens - step, self.spec_block)
                toks = None  # None after a transient error: the block
                # made no progress, fall through to a single step below
                try:
                    toks, kvs = self._speculative_block(
                        params, cur_tok, step, kvs, mask, cross,
                        dec_mlis, seq_ids, k,
                    )
                except RuntimeError as e:
                    from moe_infinity_tpu.runtime.engine import (
                        is_spec_capacity_error,
                    )

                    if is_spec_capacity_error(e):
                        # the arena can't hold a k-step union of routed
                        # experts (or the block didn't converge): HALVE the
                        # block instead of dropping straight to single-step
                        # — the halving-chain sizes are already compiled,
                        # and a cold-cache convergence failure during warm
                        # must not strip the steady state of its biggest
                        # dispatch-amortization lever (a round-4 chip run
                        # lost block mode permanently in warm and decoded
                        # the whole timed window single-step)
                        self.spec_block = max(1, self.spec_block // 2)
                        # capacity CAP on the hill-climb: sizes above
                        # this provably don't fit the arena — re-probe
                        # under the cap with fresh estimates
                        self._k_cap = self.spec_block
                        self._probe_queue = None
                        self._chosen = None
                        self._ppt_ewma = {}
                        _log.warning(
                            "speculative block decode degraded to k=%d "
                            "(%s)", self.spec_block, e,
                        )
                        continue
                    # transient (transport/compile hiccup): make this
                    # step's progress single-step below and retry blocks
                    # next iteration
                    _log.warning(
                        "block decode transient error (%s); "
                        "single-stepping this token", e,
                    )
                if toks is not None:  # a transient error single-steps below
                    # measured-cost sizing: hill-climb k on programs per
                    # committed token (the halving chain is compiled)
                    self._adapt_spec_block(k=k)
                    for jj in range(toks.shape[1]):
                        nxt = toks[:, jj].astype(np.int64)
                        out[~finished, step + jj + 1] = nxt[~finished]
                        num_gen[~finished] += 1
                        if eos_token_id is not None:
                            finished |= eos_hit(nxt, eos_token_id)
                            if finished.all():
                                break
                    # tokens actually committed this iteration (EOS can
                    # stop the whole batch mid-block; the steady-state
                    # throughput accounting must not count the
                    # uncommitted tail)
                    self.step_times.append(
                        (jj + 1 if finished.all() else k,
                         _time.perf_counter() - _it_t0)
                    )
                    if finished.all():
                        break
                    cur_tok = self._place(
                        jnp.asarray(toks[:, -1:], jnp.int32)
                    )
                    step += k
                    continue
            positions = self._place(jnp.full((B, 1), step, jnp.int32))
            logits = None
            if self.speculative:
                try:
                    logits, kvs = self._speculative_step(
                        params, cur_tok, positions, step, kvs, mask, cross,
                        dec_mlis, seq_ids,
                    )
                    # recovery from a full degradation to k=1: the same
                    # cost hill-climb can probe block sizes back up
                    self._adapt_spec_block(k=1, tokens=1)
                except RuntimeError as e:
                    from moe_infinity_tpu.runtime.engine import (
                        is_spec_capacity_error,
                    )

                    if is_spec_capacity_error(e):
                        # arena can't hold the step's expert union (or
                        # replays didn't converge): permanent fallback to
                        # the exact per-layer path below
                        _log.warning(
                            "speculative decode disabled (%s); falling "
                            "back to the per-layer path", e,
                        )
                        self.speculative = False
                    else:
                        _log.warning(
                            "speculative step transient error (%s); "
                            "per-layer for this step", e,
                        )
            if logits is None:  # per-layer path
                bias, cross_bias = self._dec_prelude(
                    params, positions, cap, mask
                )
                x = self._dec_embed(params, cur_tok, jnp.int32(step))
                for i in range(self._n_dec):
                    ck, cv = cross[i]
                    if self.dense_arena is not None:
                        x, kvs[i] = self._dec_block_paged(
                            i, x, kvs[i], positions, step, bias, ck, cv,
                            cross_bias, seq_ids,
                        )
                        continue
                    b = params["dec_blocks"][i]
                    if s.is_sparse(i, True):
                        x, h, cw, ids, kvs[i] = self._dec_sparse(
                            b, x, kvs[i], positions, jnp.int32(step), bias,
                            ck, cv, cross_bias,
                        )
                        x = self._moe(
                            x, h, cw, ids, s.moe_layer_id(i, True), seq_ids
                        )
                    else:
                        x, kvs[i] = self._dec_dense(
                            b, x, kvs[i], positions, jnp.int32(step), bias,
                            ck, cv, cross_bias,
                        )
                logits = self._dec_final(params, x)
            if sstate is None:
                sstate = sampler.init(
                    B, logits.shape[-1],
                    prompt_ids=np.full((B, 1), start), seed=seed,
                )
            sout, sstate = sampler(logits[:, -1, :], sstate)
            if sp.logprobs > 0:
                lp_tok.append(np.asarray(sout.logprob))
                lp_top.append(np.asarray(sout.top_logprobs))
                lp_ids.append(np.asarray(sout.top_tokens))
            nxt = np.asarray(sout.token).astype(np.int64)
            out[~finished, step + 1] = nxt[~finished]
            num_gen[~finished] += 1
            self.step_times.append((1, _time.perf_counter() - _it_t0))
            if eos_token_id is not None:
                finished |= eos_hit(nxt, eos_token_id)
                if finished.all():
                    break
            cur_tok = self._place(jnp.asarray(nxt[:, None], jnp.int32))
            step += 1
        if self.tracer is not None and seq_ids:
            for sid in seq_ids:
                self.tracer.finish_entry(sid)
        return GenerationResult(
            sequences=out[:, : int(num_gen.max()) + 1], num_generated=num_gen,
            token_logprobs=np.stack(lp_tok, 1) if lp_tok else None,
            top_logprobs=np.stack(lp_top, 1) if lp_top else None,
            top_tokens=np.stack(lp_ids, 1) if lp_ids else None,
        )

    def stats(self) -> dict:
        from moe_infinity_tpu.runtime.engine import speculative_stats

        out = self.arena.hit_stats()
        out.update(speculative_stats(self.replay_counts))
        if self.dense_arena is not None:
            out.update(self.dense_arena.stats())
        if self.host_fallback:
            out["host_exec_count"] = self.host_exec_count
        return out

    def decode_window_stats(self) -> dict:
        """Counter deltas since the last generate()'s decode loop began:
        the decode-regime hit rate (what the throughput claim depends on)
        plus per-MoE-layer miss/visit attribution."""
        if not hasattr(self, "_dw0"):
            return {}
        now = self.arena.hit_stats()
        d = {
            k: now.get(k, 0) - self._dw0.get(k, 0)
            for k in ("visits", "hits", "misses", "evictions")
        }
        d["decode_hit_rate"] = (
            d["hits"] / d["visits"] if d["visits"] else 0.0
        )
        miss = self.arena.policy.node_stats["misses"] - self._dw_miss0
        visit = self.arena.policy.node_stats["visits"] - self._dw_visit0
        d["miss_by_layer"] = miss.sum(axis=1).astype(int).tolist()
        d["visit_by_layer"] = visit.sum(axis=1).astype(int).tolist()
        # churn attribution: a key with BOTH evictions and misses inside
        # the window is (to first order) a churn victim — it was resident,
        # something displaced it, and it came back as a miss. Fresh misses
        # (never evicted in-window) are genuine routing drift the planner
        # failed to cover. This is the diagnostic that separates "prefetch
        # storms are eating the hot set" from "prediction can't see the
        # drift" (round-4: 2327 evictions vs 728 misses).
        evict = self.arena.policy.node_stats["evictions"] - self._dw_evict0
        if hasattr(self, "_dw_evict0"):
            churn = (evict > 0) & (miss > 0)
            d["miss_churn"] = int(miss[churn].sum())
            d["miss_fresh"] = int(miss[~churn].sum())
            # working-set vs capacity: if the window's distinct routed
            # keys exceed the slot count, churn is a CAPACITY miss and no
            # eviction policy can fix it; hot/cold evictions separate
            # "displaced something being used" from "prefetched, never
            # used, displaced" (wasted prefetch)
            d["distinct_routed"] = int((visit > 0).sum())
            d["evict_hot"] = int(evict[(evict > 0) & (visit > 0)].sum())
            d["evict_cold"] = int(evict[(evict > 0) & (visit == 0)].sum())
        return d

    def node_stats(self) -> dict:
        return self.arena.node_stats()

    def hit_rate(self) -> float:
        return self.arena.policy.stats.hit_rate
