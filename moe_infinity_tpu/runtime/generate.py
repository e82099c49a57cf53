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

from moe_infinity_tpu.runtime.sampling import (
    Sampler,
    SamplingParams,
    params_from_kwargs,
)
from moe_infinity_tpu.utils.logger import get_logger

logger = get_logger("generate")


def eos_hit(tok, eos_token_id):
    """HF semantics: eos_token_id may be an int or a list/tuple of ints
    (multi-terminator checkpoints); element-wise membership for arrays."""
    import numpy as _np

    if isinstance(eos_token_id, (list, tuple)):
        return _np.isin(tok, _np.asarray(eos_token_id))
    return tok == eos_token_id


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
    # filled when logprobs requested: [B, steps], [B, steps, K], [B, steps, K]
    token_logprobs: Optional[np.ndarray] = None
    top_logprobs: Optional[np.ndarray] = None
    top_tokens: Optional[np.ndarray] = None


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
        prefill_impl: Optional[str] = None,
        donate_kv: bool = True,
    ):
        self.model = model
        self.params = params
        self.experts = experts
        pimpl = prefill_impl or impl

        def fwd(params, experts, tokens, positions, kv, kv_len):
            # token count is static under jit, so each compiled shape picks
            # its grouped-FFN impl at trace time: decode (T=1) favors the
            # gather path; prefill (T>1) can use ragged/pallas gmm, whose
            # weight traffic is one read per routed expert instead of per
            # (token, k) row
            use = impl if tokens.shape[1] == 1 else pimpl
            return model.forward(
                params, experts, tokens, positions, kv, kv_len,
                for_layer=for_layer, impl=use,
            )

        # donate the KV cache so decode updates happen in place
        self._raw_fwd = fwd
        self._fwd = jax.jit(fwd, donate_argnums=(4,) if donate_kv else ())
        self._dp_mesh = None
        self._dp_axis = "data"

    def set_data_sharding(self, mesh, axis: str = "data") -> None:
        """Enable data parallelism: batch-dim-0 arrays (tokens, positions,
        KV-cache leaves) are sharded over `axis` of `mesh` before each
        launch, so GSPMD runs the whole step as DP replicas over the data
        axis (batch rows divisible by the axis size; otherwise that array
        stays replicated). The reference has no DP at all — its server
        serializes requests through one model instance (SURVEY.md §2.4)."""
        self._dp_mesh = mesh
        self._dp_axis = axis

    def _dp_put(self, tree, batch: int):
        """Shard every array leaf whose leading dim is the batch over the
        data axis; replicate the rest. No-op when DP is off."""
        if self._dp_mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = self._dp_mesh.shape[self._dp_axis]
        rep = NamedSharding(self._dp_mesh, P())

        def put(x):
            if not hasattr(x, "ndim"):
                return x
            if x.ndim >= 1 and x.shape[0] == batch and batch % n == 0:
                spec = P(self._dp_axis, *([None] * (x.ndim - 1)))
                return jax.device_put(
                    x, NamedSharding(self._dp_mesh, spec)
                )
            return jax.device_put(x, rep)

        return jax.tree.map(put, tree)

    def init_cache(self, batch: int, max_len: int):
        return self._dp_put(self.model.init_cache(batch, max_len), batch)

    def begin_sequences(self, batch: int):
        return None

    def end_sequences(self, seq_ids):
        pass

    def forward(self, tokens, positions, kv, kv_len, seq_ids=None):
        if self._dp_mesh is not None:
            B = int(tokens.shape[0])
            tokens, positions, kv = self._dp_put((tokens, positions, kv), B)
        return self._fwd(self.params, self.experts, tokens, positions, kv, kv_len)

    def decode_scan(self, tok0, pos0, kv, num_steps: int,
                    sampling: Optional[SamplingParams] = None, seed: int = 0):
        """Decode `num_steps` tokens as ONE jitted lax.scan — zero host
        round-trips inside the loop. Greedy by default; pass
        SamplingParams for device-side sampled decode (the sampler state —
        PRNG key + penalty count tensors — rides the scan carry). Returns
        ([B, N] tokens, kv).

        The TPU-native decode loop: on hardware where every host sync has
        real latency, the loop must live on device (the reference instead
        pays a Python hook round-trip per module call, SURVEY.md §3.2)."""
        from moe_infinity_tpu.runtime import sampling as S

        fwd = self._raw_fwd
        params_s = sampling

        def scan_fn(params, experts, tok0, pos0, kv, sstate):
            def body(carry, _):
                tok, pos, kv, sstate = carry
                logits, kv, _ = fwd(params, experts, tok, pos[:, None], kv, pos[0])
                if params_s is None or params_s.trivial:
                    nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
                else:
                    out, sstate = S.sample_step(
                        logits[:, -1, :], sstate, params_s
                    )
                    nxt = out.token
                return (nxt[:, None], pos + 1, kv, sstate), nxt

            (_, _, kv, _), toks = jax.lax.scan(
                body, (tok0, pos0, kv, sstate), None, length=num_steps
            )
            return toks.T, kv  # [B, N]

        B = int(tok0.shape[0])
        if params_s is None or params_s.trivial:
            sstate = S.init_state(SamplingParams(), B, 1, seed=seed)
        else:
            vocab = self.model.spec.vocab_size
            sstate = S.init_state(params_s, B, vocab, seed=seed)
        key = ("decode_scan", num_steps, params_s, B)
        if not hasattr(self, "_scan_cache"):
            self._scan_cache = {}
        if key not in self._scan_cache:
            self._scan_cache[key] = jax.jit(scan_fn, donate_argnums=(4,))
        if self._dp_mesh is not None:
            tok0, pos0, kv, sstate = self._dp_put(
                (tok0, pos0, kv, sstate), B
            )
        return self._scan_cache[key](
            self.params, self.experts, tok0, pos0, kv, sstate
        )


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
        self._samplers = {}
        self._for_layer = for_layer
        self._impl = impl

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
        do_sample: Optional[bool] = None,
        top_k: int = 0,
        top_p: float = 1.0,
        min_p: float = 0.0,
        repetition_penalty: float = 1.0,
        presence_penalty: float = 0.0,
        frequency_penalty: float = 0.0,
        logprobs: int = 0,
        logit_bias=None,
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
        sp = params_from_kwargs(
            temperature=temperature, do_sample=do_sample, top_k=top_k,
            top_p=top_p, min_p=min_p,
            repetition_penalty=repetition_penalty,
            presence_penalty=presence_penalty,
            frequency_penalty=frequency_penalty, logprobs=logprobs,
            logit_bias=logit_bias,
        )
        if sp not in self._samplers:
            self._samplers[sp] = Sampler(sp)
        sampler = self._samplers[sp]
        enc_out = self._encode(
            self.params, self.experts, jnp.asarray(input_ids, jnp.int32), mask
        )
        cross = self._cross(self.params, enc_out)
        cap = _bucket_len(max_new_tokens + 1)
        kvs = self.model.init_cache(B, cap)
        # HF's repetition penalty on enc-dec counts decoder ids only, which
        # at step 0 is just the start token
        sstate = None

        out = np.full((B, max_new_tokens + 1), pad_token_id, dtype=np.int64)
        out[:, 0] = start
        finished = np.zeros(B, dtype=bool)
        num_gen = np.zeros(B, dtype=np.int64)
        cur_tok = jnp.full((B, 1), start, jnp.int32)
        lp_tok, lp_top, lp_ids = [], [], []
        for step in range(max_new_tokens):
            positions = jnp.full((B, 1), step, jnp.int32)
            logits, kvs, _ = self._step(
                self.params, self.experts, cur_tok, positions, kvs,
                jnp.int32(step), mask, cross,
            )
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
            tok_host = np.asarray(sout.token).astype(np.int64)
            out[~finished, step + 1] = tok_host[~finished]
            num_gen[~finished] += 1
            if eos_token_id is not None:
                finished |= eos_hit(tok_host, eos_token_id)
                if finished.all():
                    break
            cur_tok = jnp.asarray(tok_host[:, None], jnp.int32)
        return GenerationResult(
            sequences=out[:, : int(num_gen.max()) + 1],
            num_generated=num_gen,
            token_logprobs=np.stack(lp_tok, 1) if lp_tok else None,
            top_logprobs=np.stack(lp_top, 1) if lp_top else None,
            top_tokens=np.stack(lp_ids, 1) if lp_ids else None,
        )

    def decode_scan(
        self,
        input_ids: np.ndarray,
        num_steps: int,
        *,
        attention_mask: Optional[np.ndarray] = None,
        decoder_start_token_id: Optional[int] = None,
        sampling: Optional[SamplingParams] = None,
        seed: int = 0,
    ):
        """Encode once, then decode `num_steps` tokens as ONE jitted
        lax.scan — zero host round-trips inside the loop (the seq2seq
        counterpart of ResidentStepper.decode_scan; `generate` above pays
        one D2H per token for EOS/stopping bookkeeping, which a throughput
        bench must not). Greedy by default; SamplingParams for device-side
        sampled decode. Returns ([B, num_steps] tokens, kvs)."""
        from moe_infinity_tpu.runtime import sampling as S

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
        kvs = self.model.init_cache(B, _bucket_len(num_steps + 1))
        model, sp = self.model, sampling

        def scan_fn(params, experts, kvs, enc_mask, cross, sstate):
            def body(carry, _):
                tok, step, kvs, sstate = carry
                logits, kvs, _ = model.decode_step(
                    params, experts, tok, step[:, None], kvs, step[0],
                    enc_mask, cross, self._for_layer, self._impl,
                )
                if sp is None or sp.trivial:
                    nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
                else:
                    out, sstate = S.sample_step(logits[:, -1, :], sstate, sp)
                    nxt = out.token
                return (nxt[:, None], step + 1, kvs, sstate), nxt

            tok0 = jnp.full((B, 1), start, jnp.int32)
            step0 = jnp.zeros((B,), jnp.int32)
            (_, _, kvs, _), toks = jax.lax.scan(
                body, (tok0, step0, kvs, sstate), None, length=num_steps
            )
            return toks.T, kvs  # [B, N]

        if sp is None or sp.trivial:
            sstate = S.init_state(SamplingParams(), B, 1, seed=seed)
        else:
            sstate = S.init_state(sp, B, self.model.spec.vocab_size, seed=seed)
        key = ("decode_scan", num_steps, sp, B)
        if not hasattr(self, "_scan_cache"):
            self._scan_cache = {}
        if key not in self._scan_cache:
            self._scan_cache[key] = jax.jit(scan_fn, donate_argnums=(2,))
        return self._scan_cache[key](
            self.params, self.experts, kvs, mask, cross, sstate
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
        prefill_impl: Optional[str] = None,
        max_seq_len: int = 2048,
        donate_kv: bool = True,
        step_callback: Optional[Callable] = None,
    ):
        if stepper is None:
            if model is None or params is None:
                raise ValueError("pass either stepper= or (model, params, experts, for_layer)")
            stepper = ResidentStepper(
                model, params, experts, for_layer, impl=impl,
                prefill_impl=prefill_impl, donate_kv=donate_kv
            )
        self.stepper = stepper
        self.max_seq_len = max_seq_len
        self.step_callback = step_callback
        self._samplers = {}

    def _sampler(self, params: SamplingParams) -> Sampler:
        if params not in self._samplers:
            self._samplers[params] = Sampler(params)
        return self._samplers[params]

    def generate(
        self,
        input_ids: np.ndarray,  # [B, T] (left-aligned, same length for now)
        max_new_tokens: int = 32,
        *,
        eos_token_id: Optional[int] = None,
        pad_token_id: int = 0,
        temperature: float = 0.0,
        do_sample: Optional[bool] = None,
        top_k: int = 0,
        top_p: float = 1.0,
        min_p: float = 0.0,
        repetition_penalty: float = 1.0,
        presence_penalty: float = 0.0,
        frequency_penalty: float = 0.0,
        logprobs: int = 0,
        logit_bias=None,
        seed: int = 0,
        collect_trace: bool = False,
        cache_len: Optional[int] = None,
    ) -> GenerationResult:
        """cache_len: override the KV capacity bucket (timed benches pin
        one bucket across warm + measured calls — a different capacity is
        a different compiled program for every step/block size)."""
        input_ids = np.asarray(input_ids)
        if input_ids.ndim == 1:
            input_ids = input_ids[None]
        B, T = input_ids.shape
        cap = cache_len or min(
            self.max_seq_len, _bucket_len(T + max_new_tokens)
        )
        if T + max_new_tokens > cap:
            raise ValueError(
                f"prompt {T} + new {max_new_tokens} exceeds capacity {cap}"
            )
        params = params_from_kwargs(
            temperature=temperature, do_sample=do_sample, top_k=top_k,
            top_p=top_p, min_p=min_p,
            repetition_penalty=repetition_penalty,
            presence_penalty=presence_penalty,
            frequency_penalty=frequency_penalty, logprobs=logprobs,
            logit_bias=logit_bias,
        )
        sampler = self._sampler(params)
        kv = self.stepper.init_cache(B, cap)
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
        vocab = logits.shape[-1]
        state = sampler.init(B, vocab, prompt_ids=input_ids, seed=seed)
        sout, state = sampler(logits[:, -1, :], state)
        next_tok = sout.token

        # ---- decode ------------------------------------------------------
        out = np.full((B, T + max_new_tokens), pad_token_id, dtype=np.int64)
        out[:, :T] = input_ids
        finished = np.zeros(B, dtype=bool)
        num_gen = np.zeros(B, dtype=np.int64)
        lp_tok, lp_top, lp_ids = [], [], []

        def record_logprobs(s):
            if params.logprobs > 0:
                lp_tok.append(np.asarray(s.logprob))
                lp_top.append(np.asarray(s.top_logprobs))
                lp_ids.append(np.asarray(s.top_tokens))

        record_logprobs(sout)
        # k-step speculative blocks (offload steppers with spec_block > 1):
        # one compiled program yields k greedy tokens; buffered tokens are
        # consumed by the normal per-step bookkeeping below with no extra
        # device work. Greedy-only: sampling/logprobs/trace need per-step
        # logits on host.
        use_blocks = (
            params.trivial
            and params.logprobs == 0
            and not collect_trace
            and self.step_callback is None
            and getattr(self.stepper, "speculative", False)
            and hasattr(self.stepper, "decode_block")
        )
        pending: list = []
        cur = T
        for step in range(max_new_tokens):
            tok_host = np.asarray(next_tok)
            out[~finished, cur] = tok_host[~finished]
            num_gen[~finished] += 1
            if eos_token_id is not None:
                finished |= eos_hit(tok_host, eos_token_id)
                if finished.all():
                    cur += 1
                    break
            if step == max_new_tokens - 1:
                cur += 1
                break
            if pending:
                next_tok = pending.pop(0)
                cur += 1
                continue
            if use_blocks and self.stepper.spec_block > 1:
                from moe_infinity_tpu.runtime.engine import quantize_block

                k = quantize_block(
                    max_new_tokens - 1 - step, self.stepper.spec_block
                )
                if k >= 2:
                    try:
                        toks, kv = self.stepper.decode_block(
                            jnp.asarray(tok_host[:, None], jnp.int32),
                            cur, kv, k, seq_ids=seq_ids,
                        )
                    except RuntimeError as e:
                        from moe_infinity_tpu.runtime.engine import (
                            is_spec_capacity_error,
                        )

                        if is_spec_capacity_error(e):
                            # arena can't hold a k-step union (or the
                            # block didn't converge): HALVE the block —
                            # the halving-chain sizes are compiled, and a
                            # cold-cache failure must not permanently
                            # strip steady state of block amortization
                            self.stepper.spec_block = max(
                                1, self.stepper.spec_block // 2
                            )
                            logger.warning(
                                "speculative block decode degraded to "
                                "k=%d (%s)", self.stepper.spec_block, e,
                            )
                        else:
                            # transient (transport/compile hiccup): make
                            # this step's progress single-step below and
                            # retry blocks next iteration
                            logger.warning(
                                "block decode transient error (%s); "
                                "single-stepping this token", e,
                            )
                    else:
                        next_tok = toks[:, 0].astype(np.int64)
                        pending = [
                            toks[:, j].astype(np.int64) for j in range(1, k)
                        ]
                        cur += 1
                        continue
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
            sout, state = sampler(logits[:, -1, :], state)
            record_logprobs(sout)
            next_tok = sout.token
            cur += 1

        self.stepper.end_sequences(seq_ids)
        return GenerationResult(
            sequences=out[:, :cur],
            num_generated=num_gen,
            router_trace=traces if collect_trace else None,
            token_logprobs=np.stack(lp_tok, 1) if lp_tok else None,
            top_logprobs=np.stack(lp_top, 1) if lp_top else None,
            top_tokens=np.stack(lp_ids, 1) if lp_ids else None,
        )
