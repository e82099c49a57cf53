"""Continuous batching: slot-level admission over the paged KV cache.

Unlike the wave batcher (runtime/batching.py), requests join and leave a
persistent decode batch mid-flight:

* the batch runs on a shared cache-column timeline C (every active slot
  writes its K/V at column C each step), so the causal mask and the scalar
  kv_len stay batch-uniform while rope uses per-slot sequence positions
  via `pad_offsets` (= the column where the request started);
* a joining request takes a free slot and *piggybacks its prefill*: its
  prompt tokens are fed one per shared step while other slots decode
  (chunked prefill with chunk=1 — no separate prefill program, no
  recompilation);
* each slot owns pages from the shared pool only for its live column
  range; completion frees the pages and the slot immediately.

The model must support `pad_offsets` (Mixtral-family does). One jitted
step function serves the whole lifetime; shapes never change.
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

from moe_infinity_tpu.runtime.paged_kv import PageAllocator, PagedKVCache


@dataclass
class _Req:
    input_ids: np.ndarray
    max_new_tokens: int
    eos_token_id: Optional[int]
    on_token: Optional[Callable[[int], None]] = None
    future: Future = field(default_factory=Future)


@dataclass
class _Slot:
    req: Optional[_Req] = None
    start_col: int = 0
    prompt_pos: int = 0  # next prompt token to feed
    generated: list = field(default_factory=list)
    active: bool = False

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
        idle_sleep_s: float = 0.005,
    ):
        self.model = model
        self.B = max_batch_size
        self.page_size = page_size
        self.max_cols = max_cols
        self.max_pages_per_seq = max_cols // page_size
        self.alloc = PageAllocator(num_pages, page_size)
        # reserve page 0 as the null page: inactive slots write their
        # (masked) rows there and unused table entries point at it
        self.alloc.allocate("__null__", 1)
        self.idle_sleep_s = idle_sleep_s

        # derive per-layer pool shapes from the model's own cache layout
        # (MLA caches have asymmetric k/v slots, GQA has [Hkv, Dh], ...)
        probe = model.init_cache(1, 1)
        table0 = jnp.zeros((self.B, self.max_pages_per_seq), jnp.int32)
        self._kvs = [
            PagedKVCache(
                jnp.zeros((num_pages, page_size) + kv.k.shape[2:], kv.k.dtype),
                jnp.zeros((num_pages, page_size) + kv.v.shape[2:], kv.v.dtype),
                table0,
            )
            for kv in probe
        ]

        def fwd(params, experts, tokens, positions, kvs, kv_len, pad_offsets):
            return model.forward(
                params, experts, tokens, positions, kvs, kv_len,
                for_layer=for_layer, impl=impl, pad_offsets=pad_offsets,
            )

        self._params = params
        self._experts = experts
        self._fwd = jax.jit(fwd, donate_argnums=(4,))
        self._slots = [_Slot() for _ in range(self.B)]
        self._col = 0  # shared cache-column clock
        self._queue: "queue.Queue[_Req]" = queue.Queue()
        self._shutdown = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ---- client API ------------------------------------------------------
    def submit(
        self, input_ids, max_new_tokens=32, eos_token_id=None, on_token=None
    ) -> Future:
        """on_token: optional callback fired from the scheduler thread for
        every generated token (token-level streaming)."""
        r = _Req(
            np.asarray(input_ids).reshape(-1), max_new_tokens, eos_token_id,
            on_token,
        )
        self._queue.put(r)
        return r.future

    def generate(self, input_ids, **kw) -> np.ndarray:
        return self.submit(input_ids, **kw).result()

    def shutdown(self):
        self._shutdown = True
        self._thread.join(timeout=5)

    # ---- scheduler -------------------------------------------------------
    def _admit(self) -> bool:
        """Seat queued requests into free slots. Returns True if any slot
        is active afterwards."""
        for slot in self._slots:
            if slot.active:
                continue
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            T = len(req.input_ids)
            if self._col + T + req.max_new_tokens >= self.max_cols:
                # timeline nearly exhausted; requeue until reset
                self._queue.put(req)
                break
            try:
                self.alloc.allocate(
                    id(req), self._col + T + req.max_new_tokens + 1
                )
            except RuntimeError:
                self._queue.put(req)  # pool full; wait for completions
                break
            slot.req = req
            slot.start_col = self._col
            slot.prompt_pos = 0
            slot.generated = []
            slot.active = True
        return any(s.active for s in self._slots)

    def _finish(self, slot: _Slot):
        req = slot.req
        self.alloc.release(id(req))
        req.future.set_result(
            np.concatenate(
                [req.input_ids, np.asarray(slot.generated, dtype=np.int64)]
            )
        )
        slot.req = None
        slot.active = False

    def _reset_if_idle(self):
        if not any(s.active for s in self._slots) and self._col > 0:
            self._col = 0  # fresh timeline once the batch drains

    def _loop(self):
        last_tokens = np.zeros(self.B, dtype=np.int64)
        while not self._shutdown:
            self._reset_if_idle()
            if not self._admit():
                time.sleep(self.idle_sleep_s)
                continue
            # ---- build this step's inputs -----------------------------
            toks = np.zeros((self.B, 1), dtype=np.int32)
            pad_offsets = np.zeros(self.B, dtype=np.int32)
            for b, s in enumerate(self._slots):
                if not s.active:
                    pad_offsets[b] = self._col  # fully masked row
                    continue
                pad_offsets[b] = s.start_col
                if s.prefilling:
                    toks[b, 0] = s.req.input_ids[s.prompt_pos]
                    s.prompt_pos += 1
                else:
                    toks[b, 0] = last_tokens[b]
            table = self.alloc.table(
                [id(s.req) if s.active else "__free__" for s in self._slots],
                self.max_pages_per_seq,
            )
            kvs = [
                PagedKVCache(c.pool_k, c.pool_v, jnp.asarray(table))
                for c in self._kvs
            ]
            positions = jnp.full((self.B, 1), self._col, jnp.int32)
            logits, kvs, _ = self._fwd(
                self._params, self._experts, jnp.asarray(toks), positions,
                kvs, jnp.int32(self._col), jnp.asarray(pad_offsets),
            )
            self._kvs = kvs
            nxt = np.asarray(jnp.argmax(logits[:, -1, :], axis=-1))
            self._col += 1
            # ---- bookkeeping ------------------------------------------
            for b, s in enumerate(self._slots):
                if not s.active:
                    continue
                if s.prefilling:
                    continue  # still consuming the prompt
                tok = int(nxt[b])
                s.generated.append(tok)
                last_tokens[b] = tok
                if s.req.on_token is not None:
                    try:
                        s.req.on_token(tok)
                    except Exception:
                        pass  # stream consumers must not stall decode
                done = len(s.generated) >= s.req.max_new_tokens or (
                    s.req.eos_token_id is not None
                    and tok == s.req.eos_token_id
                )
                if done:
                    self._finish(s)
