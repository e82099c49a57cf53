"""Continuous batching: slot-level admission over the paged KV cache.

Unlike the wave batcher (runtime/batching.py), requests join and leave a
persistent decode batch mid-flight:

* the batch runs on a shared cache-column timeline C (every active slot
  writes its K/V at columns [C, C+W) each step), so the scalar kv_len
  stays batch-uniform while rope uses per-row *logical* positions
  (`rope_positions`) and a per-row column-validity bitmap (`key_valid`)
  masks hole columns;
* a joining request takes a free slot and *piggybacks its prefill*: its
  prompt is fed `prefill_chunk` tokens per shared step while other slots
  decode — decode rows feed their one real token at the first chunk
  column and the remaining columns become masked holes. With chunk=1 the
  timeline is hole-free (the original design); larger chunks trade a few
  masked columns for prompt ingestion that is chunk× faster;
* each slot owns pages from the shared pool only for its live column
  range; completion frees the pages and the slot immediately.

The model must support `rope_positions`/`key_valid` (Mixtral and DeepSeek
families do). Two jitted step programs serve the whole lifetime (width 1
and width `prefill_chunk`); shapes never change after warmup.

Offload mode (`arena=...`): the batch's experts live in an ExpertArena
instead of a resident pytree, and every shared step runs SPECULATIVELY —
one compiled program over the arena's current slot state, routed ids
verified on the host, replayed after loading misses (runtime/engine.py's
`run_speculative` protocol, pooled over the whole batch). Requires the
arena to hold one step's UNION of routed experts across all MoE layers
and batch rows. Accepted routing feeds the EAMC tracer per-request and
warms the next step's experts via the predictor.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from moe_infinity_tpu.runtime.engine import (
    _split_arena_tree,
    run_speculative,
    spec_trace_and_prefetch,
)
from moe_infinity_tpu.runtime.paged_kv import PageAllocator, PagedKVCache
from moe_infinity_tpu.runtime.generate import eos_hit as _eos_hit
from moe_infinity_tpu.runtime.sampling import (
    RowParams,
    reset_rows,
    sample_rows,
    update_counts,
)


@dataclass(frozen=True)
class RequestSampling:
    """Per-request sampling settings for batched serving. Requests with
    different settings share one compiled step program (row params are
    traced [B] vectors)."""

    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    min_p: float = 0.0
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    seed: int = 0
    # ((token_id, bias), ...) added to the row's raw logits every step
    # (OpenAI logit_bias; normalized from a dict by submit())
    logit_bias: Optional[tuple] = None

    @property
    def greedy_plain(self) -> bool:
        return (
            self.temperature == 0.0
            and self.repetition_penalty == 1.0
            and self.presence_penalty == 0.0
            and self.frequency_penalty == 0.0
            and not self.logit_bias
        )

    @property
    def needs_counts(self) -> bool:
        return (
            self.repetition_penalty != 1.0
            or self.presence_penalty != 0.0
            or self.frequency_penalty != 0.0
        )


_GREEDY = RequestSampling()


@dataclass
class _Req:
    input_ids: np.ndarray
    max_new_tokens: int
    eos_token_id: Optional[int]
    on_token: Optional[Callable[[int], None]] = None
    sampling: RequestSampling = _GREEDY
    future: Future = field(default_factory=Future)


@dataclass
class _Slot:
    req: Optional[_Req] = None
    start_col: int = 0
    prompt_pos: int = 0  # next prompt token to feed
    generated: list = field(default_factory=list)
    active: bool = False
    seq_id: Optional[str] = None  # EAMC tracer entry (offload mode)

    @property
    def prefilling(self) -> bool:
        return self.active and self.prompt_pos < len(self.req.input_ids)


class ContinuousBatcher:
    def __init__(
        self,
        model,
        params,
        experts,
        for_layer: Callable,
        *,
        impl: str = "ragged",
        max_batch_size: int = 4,
        page_size: int = 16,
        num_pages: int = 64,
        max_cols: int = 256,
        prefill_chunk: int = 1,
        idle_sleep_s: float = 0.005,
        arena=None,
        tracer=None,
        predictor=None,
        prefetch: bool = True,
        prefetch_budget: Optional[int] = None,
        max_replays: Optional[int] = None,
    ):
        self.model = model
        self.B = max_batch_size
        self.page_size = page_size
        self.max_cols = max_cols
        self.max_pages_per_seq = max_cols // page_size
        self.chunk = max(1, int(prefill_chunk))
        self.alloc = PageAllocator(num_pages, page_size)
        # reserve page 0 as the null page: inactive slots write their
        # (masked) rows there and unused table entries point at it
        self.alloc.allocate("__null__", 1)
        self.idle_sleep_s = idle_sleep_s

        # derive per-layer pool shapes from the model's own cache layout
        # (MLA caches have asymmetric k/v slots, GQA has [Hkv, Dh], ...)
        probe = model.init_cache(1, 1)
        self._pool_specs = [
            (
                (num_pages, page_size) + kv.k.shape[2:], kv.k.dtype,
                (num_pages, page_size) + kv.v.shape[2:], kv.v.dtype,
            )
            for kv in probe
        ]
        self._kvs = self._fresh_pools()

        # ---- offload (speculative) mode ---------------------------------
        self.arena = arena
        self.tracer = tracer
        self.predictor = predictor
        self.prefetch = bool(prefetch and predictor is not None and arena)
        self.max_replays = max_replays
        self.replay_counts: list = []
        if arena is not None:
            if arena.num_slots < model.spec.num_experts:
                raise ValueError(
                    f"arena num_slots={arena.num_slots} < num_experts="
                    f"{model.spec.num_experts}; speculative batched decode "
                    "needs at least one full MoE layer of slots"
                )
            self._moe_lis = [
                model.moe_layer_index(li)
                for li in range(model.spec.num_layers)
                if model.moe_layer_index(li) is not None
            ]
            self.prefetch_budget = prefetch_budget or max(
                1, arena.num_slots // 2
            )

            def fwd(params, tree, slot_rows, tokens, positions, kvs,
                    kv_len, rope_positions, key_valid):
                weights, biases = _split_arena_tree(tree)

                def arena_layer(_experts, mli):
                    return weights, slot_rows[mli], biases

                return model.forward(
                    params, None, tokens, positions, kvs, kv_len,
                    for_layer=arena_layer, impl=impl,
                    rope_positions=rope_positions, key_valid=key_valid,
                )
        else:
            def fwd(params, experts, tokens, positions, kvs, kv_len,
                    rope_positions, key_valid):
                return model.forward(
                    params, experts, tokens, positions, kvs, kv_len,
                    for_layer=for_layer, impl=impl,
                    rope_positions=rope_positions, key_valid=key_valid,
                )

        self._params = params
        self._experts = experts
        self._fwd_raw = fwd
        self._fwd = {}  # width -> jitted program
        # per-row timeline state
        self._valid = np.zeros((self.B, max_cols), dtype=bool)
        self._logical = np.zeros(self.B, dtype=np.int64)
        # per-row sampling state (device-resident token counts for
        # repetition/presence/frequency penalties)
        V = model.spec.vocab_size
        self._counts_full = jnp.zeros((self.B, V), jnp.int32)
        self._counts_gen = jnp.zeros((self.B, V), jnp.int32)
        self._update_counts = jax.jit(update_counts)
        self._reset_rows = jax.jit(reset_rows)
        # per-row logit_bias rows; host mirror is authoritative, the device
        # copy refreshes only on seat/finish (zero rows when no bias active)
        self._bias_host = np.zeros((self.B, V), np.float32)
        self._bias_dev = jnp.asarray(self._bias_host)

        def sample_step(logits, idx, seeds, counters, cf, cg, rp, bias):
            row = jnp.take_along_axis(logits, idx[:, None, None], axis=1)
            return sample_rows(
                row[:, 0, :], seeds, counters, cf, cg, rp, bias
            )

        self._sample = jax.jit(sample_step)
        self._slots = [_Slot() for _ in range(self.B)]
        self._col = 0  # shared cache-column clock
        self._queue: "queue.Queue[_Req]" = queue.Queue()
        self._shutdown = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _fresh_pools(self):
        table0 = jnp.zeros((self.B, self.max_pages_per_seq), jnp.int32)
        return [
            PagedKVCache(
                jnp.zeros(ks, kd), jnp.zeros(vs, vd), table0
            )
            for ks, kd, vs, vd in self._pool_specs
        ]

    def _program(self, width: int):
        if width not in self._fwd:
            # resident mode donates the KV pools; speculative replays
            # re-feed the SAME pre-step pools, so no donation in arena mode
            donate = () if self.arena is not None else (4,)
            self._fwd[width] = jax.jit(self._fwd_raw, donate_argnums=donate)
        return self._fwd[width]

    # ---- client API ------------------------------------------------------
    def submit(
        self, input_ids, max_new_tokens=32, eos_token_id=None, on_token=None,
        sampling: Optional[RequestSampling] = None, **sampling_kwargs,
    ) -> Future:
        """on_token: optional callback fired from the scheduler thread for
        every generated token (token-level streaming). Per-request sampling
        via `sampling=RequestSampling(...)` or bare kwargs (temperature,
        top_k, top_p, repetition_penalty, presence/frequency_penalty, seed)."""
        if sampling is None:
            sampling_kwargs.pop("do_sample", None)
            if sampling_kwargs.get("logit_bias"):
                from moe_infinity_tpu.runtime.sampling import (
                    normalize_logit_bias,
                )

                sampling_kwargs["logit_bias"] = normalize_logit_bias(
                    sampling_kwargs["logit_bias"]
                )
            else:
                sampling_kwargs.pop("logit_bias", None)
            sampling = (
                RequestSampling(**sampling_kwargs)
                if sampling_kwargs
                else _GREEDY
            )
        r = _Req(
            np.asarray(input_ids).reshape(-1), max_new_tokens, eos_token_id,
            on_token, sampling,
        )
        self._queue.put(r)
        return r.future

    def generate(self, input_ids, **kw) -> np.ndarray:
        return self.submit(input_ids, **kw).result()

    def shutdown(self):
        self._shutdown = True
        self._thread.join(timeout=5)

    def stats(self) -> dict:
        from moe_infinity_tpu.runtime.engine import speculative_stats

        out = self.arena.hit_stats() if self.arena is not None else {}
        out.update(speculative_stats(self.replay_counts))
        return out

    # ---- scheduler -------------------------------------------------------
    def _admit(self) -> bool:
        """Seat queued requests into free slots. Returns True if any slot
        is active afterwards."""
        for b, slot in enumerate(self._slots):
            if slot.active:
                continue
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            T = len(req.input_ids)
            if self._col + T + req.max_new_tokens + self.chunk >= self.max_cols:
                # timeline nearly exhausted; requeue until reset
                self._queue.put(req)
                break
            try:
                # range-offset allocation: no pages below the start column
                self.alloc.allocate(
                    id(req), self._col + T + req.max_new_tokens + 1,
                    start_token=self._col,
                )
            except RuntimeError:
                self._queue.put(req)  # pool full; wait for completions
                break
            slot.req = req
            slot.start_col = self._col
            slot.prompt_pos = 0
            slot.generated = []
            slot.active = True
            slot.seq_id = (
                self.tracer.create_entry() if self.tracer is not None else None
            )
            self._valid[b, :] = False
            self._logical[b] = 0
            if req.sampling.needs_counts:
                keep = np.ones(self.B, dtype=bool)
                keep[b] = False
                self._counts_full, self._counts_gen = self._reset_rows(
                    self._counts_full, self._counts_gen, jnp.asarray(keep)
                )
            if req.sampling.logit_bias or self._bias_host[b].any():
                from moe_infinity_tpu.runtime.sampling import (
                    normalize_logit_bias,
                )

                # normalize here too: submit(sampling=RequestSampling(...))
                # may carry a raw {token: bias} dict
                bias = normalize_logit_bias(req.sampling.logit_bias) or ()
                self._bias_host[b] = 0.0
                for t, v in bias:
                    if 0 <= t < self._bias_host.shape[1]:
                        self._bias_host[b, t] = v
                self._bias_dev = jnp.asarray(self._bias_host)
        return any(s.active for s in self._slots)

    def _finish(self, slot: _Slot):
        req = slot.req
        self.alloc.release(id(req))
        if slot.seq_id is not None:
            self.tracer.finish_entry(slot.seq_id)
            slot.seq_id = None
        req.future.set_result(
            np.concatenate(
                [req.input_ids, np.asarray(slot.generated, dtype=np.int64)]
            )
        )
        slot.req = None
        slot.active = False

    def _fail_all(self, exc: BaseException):
        """Abort every active request (speculative non-convergence, fetch
        failure, or any step error): the scheduler thread must survive,
        futures must not hang. Rebuilds the KV pools — a step that failed
        after dispatch may have consumed the donated buffers — and resets
        the column timeline for the next admission."""
        for s in self._slots:
            if not s.active:
                continue
            self.alloc.release(id(s.req))
            if s.seq_id is not None:
                self.tracer.finish_entry(s.seq_id)
                s.seq_id = None
            s.req.future.set_exception(exc)
            s.req = None
            s.active = False
        self._kvs = self._fresh_pools()
        self._col = 0
        self._valid[:] = False

    def _current_budget(self) -> int:
        return self.prefetch_budget

    def _reset_if_idle(self):
        if not any(s.active for s in self._slots) and self._col > 0:
            self._col = 0  # fresh timeline once the batch drains
            self._valid[:] = False

    def _loop(self):
        self._last_tokens = np.zeros(self.B, dtype=np.int64)
        while not self._shutdown:
            self._reset_if_idle()
            if not self._admit():
                time.sleep(self.idle_sleep_s)
                continue
            try:
                self._step_iteration()
            except Exception as e:
                # any step failure (fetch error, device error, speculative
                # non-convergence) aborts the batch but NOT the scheduler
                self._fail_all(e)

    def _step_iteration(self):
        last_tokens = self._last_tokens
        # ---- pick this step's width -------------------------------
        W = (
            self.chunk
            if any(s.prefilling for s in self._slots)
            and self._col + self.chunk <= self.max_cols
            else 1
        )
        if self._col + W > self.max_cols:
            # timeline exhausted with live slots: truncate them
            for s in self._slots:
                if s.active:
                    self._finish(s)
            return
        # ---- build this step's inputs -----------------------------
        toks = np.zeros((self.B, W), dtype=np.int32)
        rope_pos = np.zeros((self.B, W), dtype=np.int32)
        n_feed = np.zeros(self.B, dtype=np.int64)  # real tokens per row
        for b, s in enumerate(self._slots):
            if not s.active:
                continue
            rope_pos[b] = self._logical[b] + np.arange(W)
            if s.prefilling:
                n = min(W, len(s.req.input_ids) - s.prompt_pos)
                toks[b, :n] = s.req.input_ids[
                    s.prompt_pos : s.prompt_pos + n
                ]
                n_feed[b] = n
            else:
                toks[b, 0] = last_tokens[b]
                n_feed[b] = 1
            self._valid[b, self._col : self._col + int(n_feed[b])] = True
            # extend the page allocation over this step's columns
            # (holes burn columns beyond the admission-time estimate)
            try:
                self.alloc.allocate(
                    id(s.req), self._col + W, start_token=s.start_col
                )
            except RuntimeError:
                self._finish(s)  # pool exhausted: truncate this slot
                n_feed[b] = 0
        table = self.alloc.table(
            [id(s.req) if s.active else "__free__" for s in self._slots],
            self.max_pages_per_seq,
        )
        kvs = [
            PagedKVCache(c.pool_k, c.pool_v, jnp.asarray(table))
            for c in self._kvs
        ]
        positions = np.broadcast_to(
            self._col + np.arange(W, dtype=np.int32), (self.B, W)
        )
        toks_j = jnp.asarray(toks)
        pos_j = jnp.asarray(positions)
        rope_j = jnp.asarray(rope_pos)
        valid_j = jnp.asarray(self._valid[:, : self.max_cols])
        col_j = jnp.int32(self._col)
        if self.arena is not None:
            prog = self._program(W)

            def run(tree, slot_rows):
                lg, new_kvs, (t_ids, _t_w) = prog(
                    self._params, tree, slot_rows, toks_j, pos_j, kvs,
                    col_j, rope_j, valid_j,
                )
                return lg, new_kvs, t_ids

            limit = self.max_replays or (len(self._moe_lis) + 2)
            # verify only live routing: inactive rows / masked hole
            # columns carry garbage ids that must not force fetches
            # (their outputs never reach an active row)
            live = [
                (b, int(n_feed[b]))
                for b, s in enumerate(self._slots)
                if s.active and n_feed[b] > 0
            ]

            def live_keys(ids, j):
                return np.unique(
                    np.concatenate(
                        [ids[j, b, :n].ravel() for b, n in live]
                    )
                ) if live else np.empty(0, np.int64)

            # client_lock: a concurrent direct engine.generate (the
            # facade's fallback for knobs the batcher lacks) must not
            # protect arena keys while this step holds its union
            with self.arena.client_lock:
                (logits, kvs), ids_np, execs = run_speculative(
                    self.arena, self._moe_lis, run, limit,
                    key_fn=live_keys,
                )
            self.replay_counts.append(execs)
            seq_ids = [
                s.seq_id if s.active else None for s in self._slots
            ]
            spec_trace_and_prefetch(
                self, ids_np, self._moe_lis, seq_ids, n_feed=n_feed
            )
        else:
            logits, kvs, _ = self._program(W)(
                self._params, self._experts, toks_j, pos_j, kvs,
                col_j, rope_j, valid_j,
            )
        self._kvs = kvs
        active = [s for s in self._slots if s.active]
        needs_counts = any(s.req.sampling.needs_counts for s in active)
        needs_sampling = any(
            not s.req.sampling.greedy_plain for s in active
        )
        if needs_counts:
            # count this step's fed tokens (prompt for prefill rows;
            # the previously generated token for decode rows) BEFORE
            # sampling, so penalties see everything generated so far
            fed_valid = np.zeros((self.B, W), dtype=bool)
            gen_mask = np.zeros((self.B, W), dtype=bool)
            for b, s in enumerate(self._slots):
                if not s.active or n_feed[b] == 0:
                    continue
                fed_valid[b, : int(n_feed[b])] = True
                if not s.prefilling:
                    # decode rows feed a *generated* token at index 0;
                    # its first feed is the prompt's last token only
                    # when generated is empty (prefill-final edge)
                    gen_mask[b, 0] = len(s.generated) > 0
            self._counts_full, self._counts_gen = self._update_counts(
                self._counts_full, self._counts_gen, jnp.asarray(toks),
                jnp.asarray(fed_valid), jnp.asarray(gen_mask),
            )
        if needs_sampling:
            idx = np.maximum(n_feed - 1, 0).astype(np.int32)
            sp = [
                s.req.sampling if s.active else _GREEDY
                for s in self._slots
            ]
            rp = RowParams.from_lists(
                [p.temperature for p in sp],
                [p.top_k for p in sp],
                [p.top_p for p in sp],
                [p.min_p for p in sp],
                [p.repetition_penalty for p in sp],
                [p.presence_penalty for p in sp],
                [p.frequency_penalty for p in sp],
            )
            seeds = jnp.asarray([p.seed for p in sp], jnp.int32)
            counters = jnp.asarray(
                [len(s.generated) if s.active else 0 for s in self._slots],
                jnp.int32,
            )
            row_tok = np.asarray(
                self._sample(
                    logits, jnp.asarray(idx), seeds, counters,
                    self._counts_full, self._counts_gen, rp,
                    self._bias_dev,
                )
            )  # [B]
            nxt = np.broadcast_to(row_tok[:, None], (self.B, W))
        else:
            nxt = np.asarray(jnp.argmax(logits, axis=-1))  # [B, W]
        self._col += W
        # ---- bookkeeping ------------------------------------------
        for b, s in enumerate(self._slots):
            if not s.active or n_feed[b] == 0:
                continue
            if s.prefilling:
                s.prompt_pos += int(n_feed[b])
                self._logical[b] += int(n_feed[b])
                if s.prefilling:
                    continue  # still consuming the prompt
                # final prompt token consumed at chunk index n_feed-1:
                # its logits give the first generated token
                tok = int(nxt[b, int(n_feed[b]) - 1])
            else:
                self._logical[b] += 1
                tok = int(nxt[b, 0])
            s.generated.append(tok)
            last_tokens[b] = tok
            if s.req.on_token is not None:
                try:
                    s.req.on_token(tok)
                except Exception:
                    pass  # stream consumers must not stall decode
            done = len(s.generated) >= s.req.max_new_tokens or (
                s.req.eos_token_id is not None
                and _eos_hit(tok, s.req.eos_token_id)
            )
            if done:
                self._finish(s)
