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
    ):
        self.model = model
        self.params = params
        self.experts = experts
        self.B = max_batch_size
        self.Se = int(max_src_len)
        self.cap = int(max_decode_len)
        self.idle_sleep_s = idle_sleep_s
        s = model.spec

        self._encode = jax.jit(
            lambda p, e, t, m: model.encode(p, e, t, m, for_layer, impl)
        )
        self._cross = jax.jit(model.cross_kv)

        def step(p, e, tok, pos, kvs, enc_mask, ck_all, cv_all, offs):
            cross = [(ck_all[i], cv_all[i]) for i in range(ck_all.shape[0])]
            return model.decode_step(
                p, e, tok, pos, kvs, jnp.int32(0), enc_mask, cross,
                for_layer, impl, row_offsets=offs,
            )

        self._step = jax.jit(step, donate_argnums=(4,))
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
            try:
                enc = self._encode(
                    self.params, self.experts, jnp.asarray(tok, jnp.int32),
                    jnp.asarray(mrow),
                )
                rows = self._cross(self.params, enc)  # [(ck [1,S1,H,D], cv)]
                ck_row = jnp.stack([c[0][0] for c in rows])  # [L, S1, H, D]
                cv_row = jnp.stack([c[1][0] for c in rows])
                bi = jnp.int32(b)
                self._ck = self._seat_row(self._ck, ck_row, bi)
                self._cv = self._seat_row(self._cv, cv_row, bi)
            except Exception as e:  # a failed join-encode fails ONLY
                req.future.set_exception(e)  # this request
                continue
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
        req.future.set_result(
            np.asarray([start] + slot.generated, dtype=np.int64)
        )
        slot.req = None
        slot.active = False

    def _fail_active(self, exc: BaseException):
        """Abort every active request: the scheduler thread must survive
        a failed encode/step, and futures must not hang (the wave
        batcher's guard, batching.py _loop)."""
        for sl in self._slots:
            if sl.active:
                sl.req.future.set_exception(exc)
                sl.req = None
                sl.active = False

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
            logits, self._kvs, _ = self._step(
                self.params, self.experts, jnp.asarray(toks),
                offs_j[:, None], self._kvs, self._mask_dev,
                self._ck, self._cv, offs_j,
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
