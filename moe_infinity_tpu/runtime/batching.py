"""Dynamic request batching for serving.

The reference serializes requests through a single-slot queue
(/root/reference/moe_infinity/entrypoints/openai/api_server.py:276-277);
here a scheduler thread coalesces concurrent requests into one batched
decode: prompts are LEFT-padded to a shared bucket (cache-column positions
drive causal masking, sequence positions drive rope, padded key columns
are masked out), sequences finish independently on EOS, and results return
through per-request futures.

This is batch-per-wave scheduling: a wave admits up to `max_batch_size`
requests and runs to completion; arrivals during a wave wait for the next
(continuous slot-level admission lands with the paged KV scheduler).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from moe_infinity_tpu.runtime.generate import eos_hit as _eos, _bucket_len


@dataclass
class _Request:
    input_ids: np.ndarray  # [T]
    max_new_tokens: int
    eos_token_id: Optional[int]
    future: Future = field(default_factory=Future)


class DynamicBatcher:
    """Wraps a decoder-only model + params + experts with a batching loop.

    The model must support `forward(..., pad_offsets=...)` (left-padded
    batched attention); Mixtral-family models do.
    """

    def __init__(
        self,
        model,
        params,
        experts,
        for_layer: Callable,
        *,
        impl: str = "ragged",
        max_batch_size: int = 8,
        max_wait_s: float = 0.02,
        max_seq_len: int = 2048,
        pad_token_id: int = 0,
    ):
        self.model = model
        self.params = params
        self.experts = experts
        self.max_batch_size = max_batch_size
        self.max_wait_s = max_wait_s
        self.max_seq_len = max_seq_len
        self.pad_token_id = pad_token_id

        def fwd(params, experts, tokens, positions, kv, kv_len, pad_offsets):
            return model.forward(
                params, experts, tokens, positions, kv, kv_len,
                for_layer=for_layer, impl=impl, pad_offsets=pad_offsets,
            )

        self._fwd = jax.jit(fwd, donate_argnums=(4,))
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._shutdown = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ---- client API ------------------------------------------------------
    def submit(
        self,
        input_ids: np.ndarray,
        max_new_tokens: int = 32,
        eos_token_id: Optional[int] = None,
    ) -> Future:
        """Returns a Future resolving to the generated ids (prompt + new,
        without padding)."""
        req = _Request(
            np.asarray(input_ids).reshape(-1), max_new_tokens, eos_token_id
        )
        self._queue.put(req)
        return req.future

    def generate(self, input_ids, **kw) -> np.ndarray:
        return self.submit(input_ids, **kw).result()

    def shutdown(self):
        self._shutdown = True
        self._thread.join(timeout=5)

    # ---- scheduler -------------------------------------------------------
    def _collect_wave(self) -> List[_Request]:
        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        wave = [first]
        deadline = self.max_wait_s
        import time as _t

        t0 = _t.monotonic()
        while len(wave) < self.max_batch_size:
            remaining = deadline - (_t.monotonic() - t0)
            if remaining <= 0:
                break
            try:
                wave.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return wave

    def _loop(self):
        while not self._shutdown:
            wave = self._collect_wave()
            if not wave:
                continue
            try:
                self._run_wave(wave)
            except Exception as e:  # propagate to all waiters
                for r in wave:
                    if not r.future.done():
                        r.future.set_exception(e)

    def _run_wave(self, wave: Sequence[_Request]) -> None:
        B = len(wave)
        lens = [len(r.input_ids) for r in wave]
        P = max(lens)
        max_new = max(r.max_new_tokens for r in wave)
        cap = min(self.max_seq_len, _bucket_len(P + max_new))

        tokens = np.full((B, P), self.pad_token_id, dtype=np.int64)
        pad_offsets = np.zeros(B, dtype=np.int32)
        for b, r in enumerate(wave):
            tokens[b, P - lens[b] :] = r.input_ids  # left pad
            pad_offsets[b] = P - lens[b]

        kv = self.model.init_cache(B, cap)
        pad_j = jnp.asarray(pad_offsets)
        positions = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32), (B, P))
        logits, kv, _ = self._fwd(
            self.params, self.experts, jnp.asarray(tokens, jnp.int32),
            positions, kv, jnp.int32(0), pad_j,
        )
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)

        out = [list(r.input_ids) for r in wave]
        done = np.zeros(B, dtype=bool)
        ngen = np.zeros(B, dtype=np.int64)
        cur = P
        for step in range(max_new):
            tok_host = np.asarray(nxt)
            for b, r in enumerate(wave):
                if done[b]:
                    continue
                out[b].append(int(tok_host[b]))
                ngen[b] += 1
                if (
                    r.eos_token_id is not None
                    and _eos(tok_host[b], r.eos_token_id)
                ) or ngen[b] >= r.max_new_tokens:
                    done[b] = True
            if done.all() or step == max_new - 1:
                break
            positions = jnp.full((B, 1), cur, jnp.int32)
            logits, kv, _ = self._fwd(
                self.params, self.experts,
                jnp.asarray(tok_host[:, None], jnp.int32), positions, kv,
                jnp.int32(cur), pad_j,
            )
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            cur += 1

        for b, r in enumerate(wave):
            r.future.set_result(np.asarray(out[b], dtype=np.int64))


class Seq2SeqDynamicBatcher:
    """Wave batching for encoder-decoder models (Switch / NLLB).

    Concurrent translation/generation requests coalesce into one batched
    encode + batched greedy decode: sources are RIGHT-padded with the
    spec's pad token under an attention mask (NLLB's sinusoidal position
    ids derive from the mask cumsum, so padding is position-transparent),
    cross-attention K/V computes once per wave, and sequences finish
    independently on EOS. The reference serves its seq2seq headliners
    strictly one request at a time (api_server.py:276-277)."""

    def __init__(
        self,
        model,
        params,
        experts,
        for_layer: Callable,
        *,
        impl: str = "ragged",
        max_batch_size: int = 8,
        # small: a lone request pays this once per wave, so it must be
        # negligible against a single decode step; bursts still coalesce
        max_wait_s: float = 0.005,
        max_seq_len: int = 512,
    ):
        self.model = model
        self.params = params
        self.experts = experts
        self.max_batch_size = max_batch_size
        self.max_wait_s = max_wait_s
        self.max_seq_len = max_seq_len

        self._encode = jax.jit(
            lambda p, e, t, m: model.encode(p, e, t, m, for_layer, impl)
        )
        self._cross = jax.jit(model.cross_kv)
        self._step = jax.jit(
            lambda p, e, tok, pos, kvs, kv_len, enc_mask, cross:
            model.decode_step(
                p, e, tok, pos, kvs, kv_len, enc_mask, cross, for_layer,
                impl,
            ),
            donate_argnums=(4,),
        )
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._shutdown = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ---- client API ------------------------------------------------------
    def submit(
        self,
        input_ids: np.ndarray,
        max_new_tokens: int = 32,
        eos_token_id: Optional[int] = None,
    ) -> Future:
        """Future resolves to the decoder ids [start, tok, ...] (the same
        surface as Seq2SeqGenerator.generate sequences for one row)."""
        req = _Request(
            np.asarray(input_ids).reshape(-1), max_new_tokens, eos_token_id
        )
        self._queue.put(req)
        return req.future

    def generate(self, input_ids, **kw) -> np.ndarray:
        return self.submit(input_ids, **kw).result()

    def shutdown(self):
        self._shutdown = True
        self._thread.join(timeout=5)

    # ---- scheduler -------------------------------------------------------
    _collect_wave = DynamicBatcher._collect_wave
    _loop = DynamicBatcher._loop

    def _run_wave(self, wave: Sequence[_Request]) -> None:
        s = self.model.spec
        B = len(wave)
        lens = [len(r.input_ids) for r in wave]
        if max(lens) > self.max_seq_len:
            raise ValueError(
                f"source length {max(lens)} exceeds max_seq_len="
                f"{self.max_seq_len}; the wave batcher never truncates"
            )
        S = min(self.max_seq_len, _bucket_len(max(lens)))
        max_new = max(r.max_new_tokens for r in wave)
        pad = getattr(s, "pad_token_id", 0)
        tokens = np.full((B, S), pad, dtype=np.int64)
        mask = np.zeros((B, S), dtype=np.float32)
        for b, r in enumerate(wave):
            tokens[b, : lens[b]] = r.input_ids
            mask[b, : lens[b]] = 1.0

        mask_j = jnp.asarray(mask)
        enc = self._encode(
            self.params, self.experts, jnp.asarray(tokens, jnp.int32), mask_j
        )
        cross = self._cross(self.params, enc)
        cap = _bucket_len(max_new + 1)
        kvs = self.model.init_cache(B, cap)
        start = s.decoder_start_token_id
        cur = jnp.full((B, 1), start, jnp.int32)
        out = [[start] for _ in wave]
        done = np.zeros(B, dtype=bool)
        ngen = np.zeros(B, dtype=np.int64)
        for step in range(max_new):
            positions = jnp.full((B, 1), step, jnp.int32)
            logits, kvs, _ = self._step(
                self.params, self.experts, cur, positions, kvs,
                jnp.int32(step), mask_j, cross,
            )
            tok_host = np.asarray(
                jnp.argmax(logits[:, -1, :], axis=-1)
            ).astype(np.int64)
            for b, r in enumerate(wave):
                if done[b]:
                    continue
                out[b].append(int(tok_host[b]))
                ngen[b] += 1
                if (
                    r.eos_token_id is not None
                    and _eos(tok_host[b], r.eos_token_id)
                ) or ngen[b] >= r.max_new_tokens:
                    done[b] = True
            if done.all():
                break
            cur = jnp.asarray(tok_host[:, None], jnp.int32)

        for b, r in enumerate(wave):
            r.future.set_result(np.asarray(out[b], dtype=np.int64))
