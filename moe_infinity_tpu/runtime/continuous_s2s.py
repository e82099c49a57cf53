"""Continuous batching for encoder-decoder models (Switch / NLLB).

Beyond-reference capability, one level past the seq2seq wave batcher
(runtime/batching.py Seq2SeqDynamicBatcher): requests join and leave the
decode batch MID-FLIGHT instead of coalescing into aligned waves. A
joining request:

* runs its encoder pass alone (one fixed-width program; right padding is
  exact — Switch capacity is a per-row prefix count, so trailing pads
  never displace real tokens, and NLLB masks pads throughout),
* has its cross-attention K/V written into its slot's rows of the shared
  [L, B, Se, H, Dk] cross tensors,
* then decodes at its OWN position: the shared decode step takes per-row
  `row_offsets` — each row writes self-attention K/V at its own cache
  column and sees its own position encoding (models/{switch,nllb}.py
  decode_step row_offsets path). A prior occupant's stale columns sit
  beyond the new row's causal horizon, so slot reuse needs no cache
  zeroing.

One compiled decode program serves the whole lifetime. The reference
serves these models strictly one request at a time
(api_server.py:276-277).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from moe_infinity_tpu.runtime.generate import eos_hit as _eos_hit


@dataclass
class _Req:
    input_ids: np.ndarray
    max_new_tokens: int
    eos_token_id: Optional[int]
    future: Future = field(default_factory=Future)


@dataclass
class _Slot:
    req: Optional[_Req] = None
    generated: list = field(default_factory=list)
    cur: int = 0  # token to feed next step
    active: bool = False
    seq_id: Optional[str] = None  # EAMC tracer entry (offload mode)


class Seq2SeqContinuousBatcher:
    def __init__(
        self,
        model,
        params,
        experts,
        for_layer: Callable,
        *,
        impl: str = "ragged",
        max_batch_size: int = 4,
        max_src_len: int = 64,
        max_decode_len: int = 64,
        idle_sleep_s: float = 0.002,
        engine=None,
        max_replays: Optional[int] = None,
    ):
        """engine: a Seq2SeqOffloadEngine for OFFLOAD mode — joins encode
        through the engine's per-layer acquire/prefetch path, and every
        shared decode step runs speculatively over the engine's arena
        (one verified program, replayed after loading misses). Requires
        the arena to hold one decode step's union of routed experts
        across decoder MoE layers and active rows. Without an engine,
        `experts`/`for_layer` carry the resident pytree."""
        self.model = model
        self.params = params
        self.experts = experts
        self.engine = engine
        self.max_replays = max_replays
        self.replay_counts: list = []
        self.B = max_batch_size
        self.Se = int(max_src_len)
        self.cap = int(max_decode_len)
        self.idle_sleep_s = idle_sleep_s
        s = model.spec

        if engine is None:
            self._encode = jax.jit(
                lambda p, e, t, m: model.encode(p, e, t, m, for_layer, impl)
            )
            self._cross = jax.jit(model.cross_kv)

            def step(p, e, tok, pos, kvs, enc_mask, ck_all, cv_all, offs):
                cross = [
                    (ck_all[i], cv_all[i]) for i in range(ck_all.shape[0])
                ]
                return model.decode_step(
                    p, e, tok, pos, kvs, jnp.int32(0), enc_mask, cross,
                    for_layer, impl, row_offsets=offs,
                )

            self._step = jax.jit(step, donate_argnums=(4,))
        else:
            if engine.arena.num_slots < s.num_experts:
                raise ValueError(
                    "arena must fit one full MoE layer of experts"
                )
            self._dec_mlis = engine.dec_mlis

            def spec_step(p, tree, slot_rows, tok, pos, kvs, enc_mask,
                          ck_all, cv_all, offs):
                from moe_infinity_tpu.runtime.engine import _split_arena_tree

                weights, biases = _split_arena_tree(tree)

                def arena_layer(_experts, mli):
                    return weights, slot_rows[mli], biases

                cross = [
                    (ck_all[i], cv_all[i]) for i in range(ck_all.shape[0])
                ]
                return model.decode_step(
                    p, None, tok, pos, kvs, jnp.int32(0), enc_mask, cross,
                    arena_layer, impl, row_offsets=offs,
                )

            # no donation: speculative replays re-feed the same pools
            self._step = jax.jit(spec_step)
        self._seat_row = jax.jit(
            lambda full, row, b: jax.lax.dynamic_update_slice(
                full, row[:, None], (0, b, 0, 0, 0)
            )
        )

        # shared device state
        self._kvs = model.init_cache(self.B, self.cap)
        L = len(self._kvs)
        H = s.num_heads
        Dk = getattr(s, "d_kv", None) or s.d_model // s.num_heads
        self._ck = jnp.zeros((L, self.B, self.Se, H, Dk), model.dtype)
        self._cv = jnp.zeros_like(self._ck)
        self._mask_host = np.zeros((self.B, self.Se), np.float32)
        self._mask_dev = jnp.asarray(self._mask_host)

        self._slots = [_Slot() for _ in range(self.B)]
        self._queue: "queue.Queue[_Req]" = queue.Queue()
        self._shutdown = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ---- client API ------------------------------------------------------
    def submit(
        self, input_ids, max_new_tokens: int = 32, eos_token_id=None,
    ) -> Future:
        """Future resolves to the decoder ids [start, tok, ...] (the wave
        batcher's surface)."""
        ids = np.asarray(input_ids).reshape(-1)
        if len(ids) > self.Se:
            raise ValueError(
                f"source length {len(ids)} exceeds max_src_len={self.Se}; "
                "the continuous batcher never truncates"
            )
        if max_new_tokens + 1 > self.cap:
            raise ValueError(
                f"max_new_tokens {max_new_tokens} exceeds decode cache "
                f"capacity {self.cap}"
            )
        req = _Req(ids, max_new_tokens, eos_token_id)
        self._queue.put(req)
        return req.future

    def generate(self, input_ids, **kw) -> np.ndarray:
        return self.submit(input_ids, **kw).result()

    def shutdown(self):
        self._shutdown = True
        self._thread.join(timeout=5)

    # ---- scheduler -------------------------------------------------------
    def _admit(self) -> bool:
        s = self.model.spec
        pad = getattr(s, "pad_token_id", 0)
        for b, slot in enumerate(self._slots):
            if slot.active:
                continue
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            # encoder pass for this request alone, at a BUCKETED width
            # (cross columns beyond the bucket keep a prior occupant's
            # values — the enc_mask row hides them)
            from moe_infinity_tpu.runtime.generate import _bucket_len

            S1 = min(self.Se, _bucket_len(len(req.input_ids)))
            tok = np.full((1, S1), pad, np.int64)
            tok[0, : len(req.input_ids)] = req.input_ids
            mrow = np.zeros((1, S1), np.float32)
            mrow[0, : len(req.input_ids)] = 1.0
            seq_id = None
            try:
                if self.engine is None:
                    enc = self._encode(
                        self.params, self.experts,
                        jnp.asarray(tok, jnp.int32), jnp.asarray(mrow),
                    )
                    rows = self._cross(self.params, enc)
                else:
                    # per-layer acquire/prefetch encode through the engine
                    # (client_lock: its per-layer protections must not
                    # overlap another executor's protected set)
                    if self.engine.tracer is not None:
                        seq_id = self.engine.tracer.create_entry()
                    with self.engine.arena.client_lock:
                        _enc, rows = self.engine.run_encoder(
                            jnp.asarray(tok, jnp.int32), jnp.asarray(mrow),
                            [seq_id] if seq_id else None,
                        )
                ck_row = jnp.stack([c[0][0] for c in rows])  # [L, S1, H, D]
                cv_row = jnp.stack([c[1][0] for c in rows])
                bi = jnp.int32(b)
                self._ck = self._seat_row(self._ck, ck_row, bi)
                self._cv = self._seat_row(self._cv, cv_row, bi)
            except Exception as e:  # a failed join-encode fails ONLY
                req.future.set_exception(e)  # this request
                if seq_id is not None:
                    self.engine.tracer.finish_entry(seq_id)
                continue
            slot.seq_id = seq_id
            self._mask_host[b] = 0.0
            self._mask_host[b, : len(req.input_ids)] = 1.0
            self._mask_dev = jnp.asarray(self._mask_host)
            slot.req = req
            slot.generated = []
            slot.cur = s.decoder_start_token_id
            slot.active = True
        return any(sl.active for sl in self._slots)

    def _finish(self, slot: _Slot):
        req = slot.req
        start = self.model.spec.decoder_start_token_id
        if slot.seq_id is not None:
            self.engine.tracer.finish_entry(slot.seq_id)
            slot.seq_id = None
        req.future.set_result(
            np.asarray([start] + slot.generated, dtype=np.int64)
        )
        slot.req = None
        slot.active = False

    def _fail_active(self, exc: BaseException):
        """Abort every active request: the scheduler thread must survive
        a failed encode/step, and futures must not hang (the wave
        batcher's guard, batching.py _loop). Rebuilds the decode caches —
        a step that failed after dispatch may have consumed the donated
        pools (resident mode donates)."""
        for sl in self._slots:
            if sl.active:
                sl.req.future.set_exception(exc)
                if sl.seq_id is not None:
                    self.engine.tracer.finish_entry(sl.seq_id)
                    sl.seq_id = None
                sl.req = None
                sl.active = False
        self._kvs = self.model.init_cache(self.B, self.cap)

    def stats(self) -> dict:
        from moe_infinity_tpu.runtime.engine import speculative_stats

        out = (
            self.engine.arena.hit_stats() if self.engine is not None else {}
        )
        out.update(speculative_stats(self.replay_counts))
        return out

    def _loop(self):
        start = self.model.spec.decoder_start_token_id
        while not self._shutdown:
            if not self._admit():
                time.sleep(self.idle_sleep_s)
                continue
            try:
                self._step_once(start)
            except Exception as e:  # a failed shared step aborts the batch
                self._fail_active(e)

    def _step_once(self, start: int):
        toks = np.full((self.B, 1), start, np.int32)
        offs = np.zeros(self.B, np.int32)
        for b, sl in enumerate(self._slots):
            if sl.active:
                toks[b, 0] = sl.cur
                offs[b] = len(sl.generated)
        offs_j = jnp.asarray(offs)
        toks_j = jnp.asarray(toks)
        if self.engine is None:
            logits, self._kvs, _ = self._step(
                self.params, self.experts, toks_j,
                offs_j[:, None], self._kvs, self._mask_dev,
                self._ck, self._cv, offs_j,
            )
        else:
            from moe_infinity_tpu.runtime.engine import (
                run_speculative,
                spec_trace_and_prefetch,
            )

            kvs = self._kvs

            def run(tree, slot_rows):
                lg, new_kvs, t_ids = self._step(
                    self.params, tree, slot_rows, toks_j,
                    offs_j[:, None], kvs, self._mask_dev,
                    self._ck, self._cv, offs_j,
                )
                return lg, new_kvs, t_ids

            live = [b for b, sl in enumerate(self._slots) if sl.active]
            margin = getattr(self.model, "route_margin", 0)

            def live_keys(ids, j):
                ids = np.asarray(ids)
                row = ids[j][live]
                if margin > 0:
                    # verify/acquire the dispatched top-k only; the
                    # runner-up margin columns go through soft prefetch
                    row = row[..., : row.shape[-1] - margin]
                return np.unique(row) if live else np.empty(0, np.int64)

            limit = self.max_replays or (len(self._dec_mlis) + 2)
            # client_lock: a concurrent direct engine.generate must not
            # protect arena keys while this step holds its union
            with self.engine.arena.client_lock:
                (logits, self._kvs), ids_np, execs = run_speculative(
                    self.engine.arena, self._dec_mlis, run, limit,
                    key_fn=live_keys,
                )
            self.replay_counts.append(execs)
            seq_ids = [
                sl.seq_id if sl.active else None for sl in self._slots
            ]
            from moe_infinity_tpu.runtime.engine import (
                margin_key_fns,
                split_margin_columns,
            )

            _, margin_fn = margin_key_fns(self._dec_mlis, margin)
            top, _m = split_margin_columns(ids_np, margin)
            spec_trace_and_prefetch(
                self.engine, top, self._dec_mlis, seq_ids,
                plan_floor=(
                    self._dec_mlis[0] - 1 if self._dec_mlis else -1
                ),
                extra_orders=margin_fn(ids_np) if margin_fn else (),
            )
        nxt = np.asarray(jnp.argmax(logits[:, -1, :], axis=-1))
        for b, sl in enumerate(self._slots):
            if not sl.active:
                continue
            tok = int(nxt[b])
            sl.generated.append(tok)
            sl.cur = tok
            done = len(sl.generated) >= sl.req.max_new_tokens or (
                sl.req.eos_token_id is not None
                and _eos_hit(tok, sl.req.eos_token_id)
            )
            if done:
                self._finish(sl)
