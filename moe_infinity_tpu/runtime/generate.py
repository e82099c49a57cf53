"""Token generation: jitted prefill + decode step, host-side loop.

Replaces the reference's reliance on HF `model.generate` + forward hooks
(SURVEY.md §3.2) with an engine-owned decode loop over a *stepper*:

* ResidentStepper — one whole-model jit (everything in HBM, fast path);
* OffloadEngine (runtime/engine.py) — per-layer jits with the expert arena
  acquire/prefetch protocol between layers.

Static shapes throughout (prompt bucketing, fixed KV capacity), greedy or
temperature sampling, per-step router traces for the EAMC tracer.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _bucket_len(n: int, buckets=(16, 32, 64, 128, 256, 512, 1024, 2048, 4096)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + 1023) // 1024) * 1024


@dataclass
class GenerationResult:
    sequences: np.ndarray  # [B, prompt+new] padded with pad_id
    num_generated: np.ndarray  # [B]
    router_trace: Optional[List[Tuple[np.ndarray, np.ndarray]]] = None
    # decode-time stats filled by the engine
    stats: dict = field(default_factory=dict)


class ResidentStepper:
    """Whole-model jit over fully HBM-resident experts."""

    def __init__(
        self,
        model,
        params,
        experts,
        for_layer: Callable,
        *,
        impl: str = "ragged",
        donate_kv: bool = True,
    ):
        self.model = model
        self.params = params
        self.experts = experts

        def fwd(params, experts, tokens, positions, kv, kv_len):
            return model.forward(
                params, experts, tokens, positions, kv, kv_len,
                for_layer=for_layer, impl=impl,
            )

        # donate the KV cache so decode updates happen in place
        self._raw_fwd = fwd
        self._fwd = jax.jit(fwd, donate_argnums=(4,) if donate_kv else ())

    def init_cache(self, batch: int, max_len: int):
        return self.model.init_cache(batch, max_len)

    def begin_sequences(self, batch: int):
        return None

    def end_sequences(self, seq_ids):
        pass

    def forward(self, tokens, positions, kv, kv_len, seq_ids=None):
        return self._fwd(self.params, self.experts, tokens, positions, kv, kv_len)

    def decode_scan(self, tok0, pos0, kv, num_steps: int):
        """Greedy decode of `num_steps` tokens as ONE jitted lax.scan —
        zero host round-trips inside the loop. Returns ([B, N] tokens, kv).

        The TPU-native decode loop: on hardware where every host sync has
        real latency, the loop must live on device (the reference instead
        pays a Python hook round-trip per module call, SURVEY.md §3.2)."""
        fwd = self._raw_fwd

        def scan_fn(params, experts, tok0, pos0, kv):
            def body(carry, _):
                tok, pos, kv = carry
                logits, kv, _ = fwd(params, experts, tok, pos[:, None], kv, pos[0])
                nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
                return (nxt[:, None], pos + 1, kv), nxt

            (_, _, kv), toks = jax.lax.scan(
                body, (tok0, pos0, kv), None, length=num_steps
            )
            return toks.T, kv  # [B, N]

        key = ("decode_scan", num_steps)
        if not hasattr(self, "_scan_cache"):
            self._scan_cache = {}
        if key not in self._scan_cache:
            self._scan_cache[key] = jax.jit(scan_fn, donate_argnums=(4,))
        return self._scan_cache[key](self.params, self.experts, tok0, pos0, kv)


class Seq2SeqGenerator:
    """Encoder-decoder generation (Switch / NLLB): encode once, precompute
    cross-attention K/V, then greedy/sampled incremental decode."""

    def __init__(
        self,
        model,
        params,
        experts,
        for_layer: Callable,
        *,
        impl: str = "ragged",
        max_seq_len: int = 512,
    ):
        self.model = model
        self.params = params
        self.experts = experts
        self.max_seq_len = max_seq_len

        self._encode = jax.jit(
            lambda p, e, t, m: model.encode(p, e, t, m, for_layer, impl)
        )
        self._cross = jax.jit(model.cross_kv)
        self._step = jax.jit(
            lambda p, e, tok, pos, kvs, kv_len, enc_mask, cross: model.decode_step(
                p, e, tok, pos, kvs, kv_len, enc_mask, cross, for_layer, impl
            ),
            donate_argnums=(4,),
        )

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
        seed: int = 0,
    ) -> GenerationResult:
        input_ids = np.atleast_2d(np.asarray(input_ids))
        B, T = input_ids.shape
        start = (
            decoder_start_token_id
            if decoder_start_token_id is not None
            else self.model.spec.decoder_start_token_id
        )
        mask = (
            jnp.asarray(attention_mask, jnp.float32)
            if attention_mask is not None
            else jnp.ones((B, T), jnp.float32)
        )
        enc_out = self._encode(
            self.params, self.experts, jnp.asarray(input_ids, jnp.int32), mask
        )
        cross = self._cross(self.params, enc_out)
        cap = _bucket_len(max_new_tokens + 1)
        kvs = self.model.init_cache(B, cap)
        key = jax.random.PRNGKey(seed)

        out = np.full((B, max_new_tokens + 1), pad_token_id, dtype=np.int64)
        out[:, 0] = start
        finished = np.zeros(B, dtype=bool)
        num_gen = np.zeros(B, dtype=np.int64)
        cur_tok = jnp.full((B, 1), start, jnp.int32)
        for step in range(max_new_tokens):
            positions = jnp.full((B, 1), step, jnp.int32)
            logits, kvs, _ = self._step(
                self.params, self.experts, cur_tok, positions, kvs,
                jnp.int32(step), mask, cross,
            )
            if temperature == 0.0:
                nxt = jnp.argmax(logits[:, -1, :], axis=-1)
            else:
                key, sub = jax.random.split(key)
                nxt = jax.random.categorical(
                    sub, logits[:, -1, :] / temperature, axis=-1
                )
            tok_host = np.asarray(nxt).astype(np.int64)
            out[~finished, step + 1] = tok_host[~finished]
            num_gen[~finished] += 1
            if eos_token_id is not None:
                finished |= tok_host == eos_token_id
                if finished.all():
                    break
            cur_tok = jnp.asarray(tok_host[:, None], jnp.int32)
        return GenerationResult(
            sequences=out[:, : int(num_gen.max()) + 1],
            num_generated=num_gen,
        )


class Generator:
    """Host-side generation loop over any stepper."""

    def __init__(
        self,
        model=None,
        params=None,
        experts=None,
        for_layer: Optional[Callable] = None,
        *,
        stepper=None,
        impl: str = "ragged",
        max_seq_len: int = 2048,
        donate_kv: bool = True,
        step_callback: Optional[Callable] = None,
    ):
        if stepper is None:
            if model is None or params is None:
                raise ValueError("pass either stepper= or (model, params, experts, for_layer)")
            stepper = ResidentStepper(
                model, params, experts, for_layer, impl=impl, donate_kv=donate_kv
            )
        self.stepper = stepper
        self.max_seq_len = max_seq_len
        self.step_callback = step_callback

    def _sample(self, logits: jax.Array, temperature: float, key) -> jax.Array:
        if temperature == 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jax.random.categorical(key, logits / temperature, axis=-1).astype(
            jnp.int32
        )

    def generate(
        self,
        input_ids: np.ndarray,  # [B, T] (left-aligned, same length for now)
        max_new_tokens: int = 32,
        *,
        eos_token_id: Optional[int] = None,
        pad_token_id: int = 0,
        temperature: float = 0.0,
        seed: int = 0,
        collect_trace: bool = False,
    ) -> GenerationResult:
        input_ids = np.asarray(input_ids)
        if input_ids.ndim == 1:
            input_ids = input_ids[None]
        B, T = input_ids.shape
        cap = min(self.max_seq_len, _bucket_len(T + max_new_tokens))
        if T + max_new_tokens > cap:
            raise ValueError(
                f"prompt {T} + new {max_new_tokens} exceeds capacity {cap}"
            )
        kv = self.stepper.init_cache(B, cap)
        key = jax.random.PRNGKey(seed)
        seq_ids = self.stepper.begin_sequences(B)

        # ---- prefill -----------------------------------------------------
        tokens = jnp.asarray(input_ids, jnp.int32)
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
        logits, kv, trace = self.stepper.forward(
            tokens, positions, kv, jnp.int32(0), seq_ids=seq_ids
        )
        traces = []
        if collect_trace:
            traces.append((np.asarray(trace[0]), np.asarray(trace[1])))
        next_tok = self._sample(logits[:, -1, :], temperature, key)

        # ---- decode ------------------------------------------------------
        out = np.full((B, T + max_new_tokens), pad_token_id, dtype=np.int64)
        out[:, :T] = input_ids
        finished = np.zeros(B, dtype=bool)
        num_gen = np.zeros(B, dtype=np.int64)
        cur = T
        for step in range(max_new_tokens):
            tok_host = np.asarray(next_tok)
            out[~finished, cur] = tok_host[~finished]
            num_gen[~finished] += 1
            if eos_token_id is not None:
                finished |= tok_host == eos_token_id
                if finished.all():
                    cur += 1
                    break
            if step == max_new_tokens - 1:
                cur += 1
                break
            key, sub = jax.random.split(key)
            positions = jnp.full((B, 1), cur, jnp.int32)
            logits, kv, trace = self.stepper.forward(
                jnp.asarray(tok_host[:, None], jnp.int32),
                positions,
                kv,
                jnp.int32(cur),
                seq_ids=seq_ids,
            )
            if collect_trace:
                traces.append((np.asarray(trace[0]), np.asarray(trace[1])))
            if self.step_callback is not None:
                self.step_callback(step, trace)
            next_tok = self._sample(logits[:, -1, :], temperature, sub)
            cur += 1

        self.stepper.end_sequences(seq_ids)
        return GenerationResult(
            sequences=out[:, :cur],
            num_generated=num_gen,
            router_trace=traces if collect_trace else None,
        )
