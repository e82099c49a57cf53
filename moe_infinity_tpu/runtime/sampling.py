"""Device-side sampling: the full OpenAI/HF sampling-parameter surface.

The reference forwards temperature / top_p / penalties straight into HF
`model.generate` (/root/reference/moe_infinity/entrypoints/openai/
protocol.py:90-131); our engine owns the decode loop, so the logit
processors live here as jittable JAX functions with exact HF semantics
(`transformers.generation.logits_process`):

* temperature scaling, top-k, top-p — match TemperatureLogitsWarper,
  TopKLogitsWarper, TopPLogitsWarper bit-for-bit (warper order:
  temperature -> top-k -> top-p, as in HF's default warper chain);
* repetition penalty — RepetitionPenaltyLogitsProcessor over prompt +
  generated tokens;
* presence / frequency penalties — OpenAI semantics over *generated*
  tokens only.

State (per-vocab token counts + PRNG key) is a small pytree so the whole
sampler can live inside a jitted decode step or a `lax.scan` carry — no
host round-trips for the sampling math.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_NEG_INF = -float("inf")


@dataclass(frozen=True)
class SamplingParams:
    """Static (trace-time) sampling configuration."""

    temperature: float = 1.0
    top_k: int = 0  # 0 disables
    top_p: float = 1.0
    min_p: float = 0.0  # 0 disables
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    do_sample: bool = True
    logprobs: int = 0  # collect top-N logprobs per step (0 = off)
    # OpenAI logit_bias: ((token_id, bias), ...) added to raw logits before
    # penalties/warpers; -100/+100 effectively ban/force a token. Stored as
    # a sorted tuple so the params stay hashable (one jit per setting).
    logit_bias: Optional[Tuple[Tuple[int, float], ...]] = None

    @property
    def greedy(self) -> bool:
        return (not self.do_sample) or self.temperature == 0.0

    @property
    def needs_full_counts(self) -> bool:
        """Repetition penalty counts prompt + generated tokens."""
        return self.repetition_penalty != 1.0

    @property
    def needs_gen_counts(self) -> bool:
        """Presence/frequency penalties count generated tokens only."""
        return self.presence_penalty != 0.0 or self.frequency_penalty != 0.0

    @property
    def trivial(self) -> bool:
        """Plain greedy with no penalties and no logprobs: argmax fast path."""
        return (
            self.greedy
            and not self.needs_full_counts
            and not self.needs_gen_counts
            and self.logprobs == 0
            and not self.logit_bias
        )


class SamplerState(NamedTuple):
    """Carry pytree. Count tensors are [B, V] int32 (zero-size V axis when
    the corresponding penalty is off, so the carry stays tiny)."""

    key: jax.Array
    counts_full: jax.Array  # prompt + generated (repetition penalty)
    counts_gen: jax.Array  # generated only (presence/frequency)


class StepOutput(NamedTuple):
    token: jax.Array  # [B] int32
    logprob: jax.Array  # [B] f32 log-prob of the chosen token (raw logits)
    top_logprobs: jax.Array  # [B, N] f32
    top_tokens: jax.Array  # [B, N] int32


# ---------------------------------------------------------------------------
# logit processors (HF parity)
# ---------------------------------------------------------------------------


def apply_repetition_penalty(
    logits: jax.Array, counts: jax.Array, penalty: float
) -> jax.Array:
    """HF RepetitionPenaltyLogitsProcessor: for every token that has
    appeared, divide positive scores by `penalty`, multiply negative ones."""
    seen = counts > 0
    scaled = jnp.where(logits < 0, logits * penalty, logits / penalty)
    return jnp.where(seen, scaled, logits)


def apply_presence_frequency(
    logits: jax.Array,
    counts: jax.Array,
    presence: float,
    frequency: float,
) -> jax.Array:
    """OpenAI: logit -= frequency * count + presence * 1[count > 0]."""
    c = counts.astype(logits.dtype)
    return logits - frequency * c - presence * (c > 0)


def top_k_filter(logits: jax.Array, k: int) -> jax.Array:
    """HF TopKLogitsWarper: keep scores >= the k-th largest, -inf the rest."""
    k = min(k, logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, _NEG_INF, logits)


def min_p_filter(logits: jax.Array, min_p: float) -> jax.Array:
    """HF MinPLogitsWarper (min_tokens_to_keep=1): drop tokens whose
    probability is below min_p * max_prob. The top-1 always survives."""
    probs = jax.nn.softmax(logits, axis=-1)
    cutoff = min_p * probs.max(axis=-1, keepdims=True)
    return jnp.where(probs < cutoff, _NEG_INF, logits)


def top_p_filter(logits: jax.Array, p: float) -> jax.Array:
    """HF TopPLogitsWarper (min_tokens_to_keep=1): sort ascending, drop
    tokens whose ascending-cumulative probability is <= 1 - p."""
    sorted_idx = jnp.argsort(logits, axis=-1)  # ascending
    sorted_logits = jnp.take_along_axis(logits, sorted_idx, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    remove_sorted = cum <= (1.0 - p)
    remove_sorted = remove_sorted.at[..., -1].set(False)  # keep >= 1 token
    inv = jnp.argsort(sorted_idx, axis=-1)
    remove = jnp.take_along_axis(remove_sorted, inv, axis=-1)
    return jnp.where(remove, _NEG_INF, logits)


def process_logits(
    logits: jax.Array, state: SamplerState, params: SamplingParams
) -> jax.Array:
    """Full HF processor/warper chain on raw [B, V] logits."""
    if params.logit_bias:
        # applied to raw logits first (OpenAI: "added to the logits prior
        # to sampling"); affects greedy argmax too. Out-of-vocab ids are
        # dropped at trace time (JAX scatter would clamp/wrap them onto
        # real tokens); matches the continuous batcher's guard
        V = logits.shape[-1]
        items = [(t, v) for t, v in params.logit_bias if 0 <= t < V]
        if items:
            idx = jnp.asarray([t for t, _ in items], jnp.int32)
            val = jnp.asarray([v for _, v in items], logits.dtype)
            logits = logits.at[..., idx].add(val)
    if params.needs_full_counts:
        logits = apply_repetition_penalty(
            logits, state.counts_full, params.repetition_penalty
        )
    if params.needs_gen_counts:
        logits = apply_presence_frequency(
            logits, state.counts_gen,
            params.presence_penalty, params.frequency_penalty,
        )
    if not params.greedy and params.temperature != 1.0:
        logits = logits / params.temperature
    if not params.greedy and params.top_k > 0:
        logits = top_k_filter(logits, params.top_k)
    if not params.greedy and params.top_p < 1.0:
        logits = top_p_filter(logits, params.top_p)
    if not params.greedy and params.min_p > 0.0:
        logits = min_p_filter(logits, params.min_p)
    return logits


# ---------------------------------------------------------------------------
# state init / step
# ---------------------------------------------------------------------------


def _count_tokens(ids: jax.Array, mask: Optional[jax.Array], vocab: int) -> jax.Array:
    """[B, T] ids (+ optional validity mask) -> [B, vocab] int32 counts."""
    one = jnp.ones(ids.shape, jnp.int32) if mask is None else mask.astype(jnp.int32)
    zeros = jnp.zeros((ids.shape[0], vocab), jnp.int32)
    b = jnp.arange(ids.shape[0])[:, None]
    return zeros.at[b, ids].add(one)


def init_state(
    params: SamplingParams,
    batch: int,
    vocab: int,
    *,
    prompt_ids: Optional[np.ndarray] = None,
    prompt_mask: Optional[np.ndarray] = None,
    seed: int = 0,
) -> SamplerState:
    key = jax.random.PRNGKey(seed)
    if params.needs_full_counts:
        if prompt_ids is not None:
            counts_full = _count_tokens(
                jnp.asarray(prompt_ids, jnp.int32),
                None if prompt_mask is None else jnp.asarray(prompt_mask),
                vocab,
            )
        else:
            counts_full = jnp.zeros((batch, vocab), jnp.int32)
    else:
        counts_full = jnp.zeros((batch, 0), jnp.int32)
    counts_gen = (
        jnp.zeros((batch, vocab), jnp.int32)
        if params.needs_gen_counts
        else jnp.zeros((batch, 0), jnp.int32)
    )
    return SamplerState(key, counts_full, counts_gen)


def sample_step(
    logits: jax.Array, state: SamplerState, params: SamplingParams
) -> Tuple[StepOutput, SamplerState]:
    """One sampling step on [B, V] raw logits. Jittable (params static)."""
    processed = process_logits(logits, state, params)
    key = state.key
    if params.greedy:
        token = jnp.argmax(processed, axis=-1).astype(jnp.int32)
    else:
        key, sub = jax.random.split(key)
        token = jax.random.categorical(sub, processed, axis=-1).astype(jnp.int32)

    b = jnp.arange(logits.shape[0])
    if params.logprobs > 0:
        lp = jax.nn.log_softmax(logits, axis=-1)
        chosen = lp[b, token]
        top_lp, top_tok = jax.lax.top_k(lp, params.logprobs)
    else:
        chosen = jnp.zeros(logits.shape[0], logits.dtype)
        top_lp = jnp.zeros((logits.shape[0], 0), logits.dtype)
        top_tok = jnp.zeros((logits.shape[0], 0), jnp.int32)

    counts_full = state.counts_full
    if params.needs_full_counts:
        counts_full = counts_full.at[b, token].add(1)
    counts_gen = state.counts_gen
    if params.needs_gen_counts:
        counts_gen = counts_gen.at[b, token].add(1)
    return (
        StepOutput(token, chosen, top_lp, top_tok),
        SamplerState(key, counts_full, counts_gen),
    )


class Sampler:
    """Host-side convenience wrapper: jits `sample_step` once per params."""

    def __init__(self, params: SamplingParams):
        self.params = params
        self._step = jax.jit(
            lambda logits, state: sample_step(logits, state, params)
        )

    def init(self, batch: int, vocab: int, **kw) -> SamplerState:
        return init_state(self.params, batch, vocab, **kw)

    def __call__(
        self, logits: jax.Array, state: SamplerState
    ) -> Tuple[StepOutput, SamplerState]:
        return self._step(logits, state)


# ---------------------------------------------------------------------------
# row-wise (per-request) sampling for the continuous batcher
# ---------------------------------------------------------------------------


class RowParams(NamedTuple):
    """Per-row sampling parameters as [B] device arrays — traced inputs, so
    requests with different settings share one compiled program."""

    temperature: jax.Array  # f32; 0 = greedy
    top_k: jax.Array  # i32; 0 = off
    top_p: jax.Array  # f32; 1 = off
    min_p: jax.Array  # f32; 0 = off
    repetition_penalty: jax.Array  # f32; 1 = off
    presence_penalty: jax.Array  # f32
    frequency_penalty: jax.Array  # f32

    @classmethod
    def from_lists(cls, temperature, top_k, top_p, min_p, repetition_penalty,
                   presence_penalty, frequency_penalty) -> "RowParams":
        return cls(
            jnp.asarray(temperature, jnp.float32),
            jnp.asarray(top_k, jnp.int32),
            jnp.asarray(top_p, jnp.float32),
            jnp.asarray(min_p, jnp.float32),
            jnp.asarray(repetition_penalty, jnp.float32),
            jnp.asarray(presence_penalty, jnp.float32),
            jnp.asarray(frequency_penalty, jnp.float32),
        )


def sample_rows(
    logits: jax.Array,  # [B, V] raw
    seeds: jax.Array,  # [B] int32 per-request seeds
    counters: jax.Array,  # [B] int32 tokens generated so far by the row
    counts_full: jax.Array,  # [B, V] int32 prompt+generated counts
    counts_gen: jax.Array,  # [B, V] int32 generated counts
    rp: RowParams,
    bias: Optional[jax.Array] = None,  # [B, V] f32 per-row logit_bias
) -> jax.Array:
    """One vectorized sampling step with per-row parameters. Returns
    tokens [B]. Keys derive from (seed, counter) so a request's draws
    depend only on its own progress, not on batch co-tenants — the same
    request alone or batched samples identically. Fully jittable."""
    B, V = logits.shape
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    # processors (apply in greedy mode too, like HF)
    rep = rp.repetition_penalty[:, None]
    scaled = jnp.where(logits < 0, logits * rep, logits / rep)
    x = jnp.where(counts_full > 0, scaled, logits)
    c = counts_gen.astype(x.dtype)
    x = x - rp.frequency_penalty[:, None] * c - rp.presence_penalty[:, None] * (
        c > 0
    )
    greedy = rp.temperature <= 0.0
    greedy_tok = jnp.argmax(x, axis=-1).astype(jnp.int32)

    # warpers (sampling rows only)
    t = jnp.where(greedy, 1.0, rp.temperature)[:, None]
    w = x / t
    # per-row top-k: keep scores >= the k-th largest (k=0 disables)
    sorted_desc = jnp.sort(w, axis=-1)[:, ::-1]
    k_idx = jnp.clip(rp.top_k - 1, 0, V - 1)
    kth = jnp.take_along_axis(sorted_desc, k_idx[:, None], axis=-1)
    kth = jnp.where((rp.top_k > 0)[:, None], kth, -jnp.inf)
    w = jnp.where(w < kth, _NEG_INF, w)
    # per-row top-p (HF semantics, min_tokens_to_keep=1)
    sorted_idx = jnp.argsort(w, axis=-1)  # ascending
    sorted_w = jnp.take_along_axis(w, sorted_idx, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(sorted_w, axis=-1), axis=-1)
    remove_sorted = cum <= (1.0 - rp.top_p[:, None])
    remove_sorted = remove_sorted.at[:, -1].set(False)
    inv = jnp.argsort(sorted_idx, axis=-1)
    remove = jnp.take_along_axis(remove_sorted, inv, axis=-1)
    w = jnp.where(remove, _NEG_INF, w)
    # per-row min-p (after top-p, matching HF's warper order)
    probs = jax.nn.softmax(w, axis=-1)
    cutoff = rp.min_p[:, None] * probs.max(axis=-1, keepdims=True)
    w = jnp.where(probs < cutoff, _NEG_INF, w)

    def draw(seed, counter, row):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), counter)
        return jax.random.categorical(key, row).astype(jnp.int32)

    sampled_tok = jax.vmap(draw)(seeds, counters, w)
    return jnp.where(greedy, greedy_tok, sampled_tok)


def update_counts(
    counts_full: jax.Array,  # [B, V]
    counts_gen: jax.Array,
    tokens: jax.Array,  # [B, W] tokens fed/generated this step
    valid: jax.Array,  # [B, W] bool — count these
    gen_mask: jax.Array,  # [B, W] bool — also count into counts_gen
) -> Tuple[jax.Array, jax.Array]:
    """Scatter-add this step's tokens into the per-row count tensors."""
    B = tokens.shape[0]
    b = jnp.broadcast_to(jnp.arange(B)[:, None], tokens.shape)
    counts_full = counts_full.at[b, tokens].add(valid.astype(jnp.int32))
    counts_gen = counts_gen.at[b, tokens].add(
        (valid & gen_mask).astype(jnp.int32)
    )
    return counts_full, counts_gen


def reset_rows(
    counts_full: jax.Array, counts_gen: jax.Array, keep: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Zero the count rows where keep[b] is False (slot re-seated)."""
    m = keep[:, None]
    return jnp.where(m, counts_full, 0), jnp.where(m, counts_gen, 0)


def normalize_logit_bias(
    logit_bias,
) -> Optional[Tuple[Tuple[int, float], ...]]:
    """{token_id: bias} dict (or pre-normalized tuple) -> sorted hashable
    tuple; None/empty -> None."""
    if not logit_bias:
        return None
    items = (
        logit_bias.items() if hasattr(logit_bias, "items") else logit_bias
    )
    return tuple(sorted((int(t), float(v)) for t, v in items))


def params_from_kwargs(
    *,
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
) -> SamplingParams:
    """Map HF-style generate kwargs onto SamplingParams. `do_sample=None`
    infers from temperature (0.0 -> greedy), matching our historical API."""
    if do_sample is None:
        do_sample = temperature != 0.0
    return SamplingParams(
        logit_bias=normalize_logit_bias(logit_bias),
        temperature=float(temperature),
        top_k=int(top_k or 0),
        top_p=float(top_p),
        min_p=float(min_p or 0.0),
        repetition_penalty=float(repetition_penalty),
        presence_penalty=float(presence_penalty),
        frequency_penalty=float(frequency_penalty),
        do_sample=bool(do_sample),
        logprobs=int(logprobs or 0),
    )
