"""Shared transformer building blocks (pure functions over param pytrees).

The engine owns its model definitions end-to-end (no HF monkey-patching, the
TPU-native replacement for /root/reference/moe_infinity/runtime/model_offload.py's
hook machinery). Dense weights keep the HF torch-Linear layout ([out, in]);
expert weights use the transposed compute layout (see common/arch.py).

All functions are batch-first: activations are [B, T, D].
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """LLaMA/T5-style RMSNorm: normalize in f32, scale, cast back."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    x32 = x32 * jax.lax.rsqrt(var + eps)
    return (x32 * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: Optional[jax.Array], eps: float
) -> jax.Array:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def linear(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None) -> jax.Array:
    """x [..., in] @ w[out, in] (HF layout) -> [..., out]."""
    y = jnp.einsum("...d,od->...o", x, w.astype(x.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


# --------------------------------------------------------------------------
# Rotary position embeddings
# --------------------------------------------------------------------------

def rope_cos_sin(
    positions: jax.Array,  # [B, T] int32
    dim: int,
    base: float = 10000.0,
    *,
    scaling_factor: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Default (llama/neox) RoPE tables: cos/sin [B, T, dim] (half-duplicated,
    matching HF's `cos = cat(freqs, freqs)` convention)."""
    inv_freq = 1.0 / (
        base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    )
    pos = positions.astype(jnp.float32) / scaling_factor
    freqs = pos[..., None] * inv_freq[None, None, :]  # [B, T, dim/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    q: jax.Array,  # [B, T, H, Dh]
    k: jax.Array,  # [B, T, Hkv, Dh]
    cos: jax.Array,  # [B, T, Dh]
    sin: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    cos = cos[:, :, None, :].astype(jnp.float32)
    sin = sin[:, :, None, :].astype(jnp.float32)
    q32, k32 = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = q32 * cos + _rotate_half(q32) * sin
    k_out = k32 * cos + _rotate_half(k32) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


# --------------------------------------------------------------------------
# KV cache + attention
# --------------------------------------------------------------------------

class KVCache(NamedTuple):
    """Per-layer contiguous KV cache. k/v: [B, S_max, Hkv, Dh]."""

    k: jax.Array
    v: jax.Array

    @classmethod
    def empty(cls, batch: int, max_len: int, n_kv: int, head_dim: int, dtype):
        shape = (batch, max_len, n_kv, head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    def update(self, k_new: jax.Array, v_new: jax.Array, offset: jax.Array):
        """Insert [B, T, Hkv, Dh] at time offset (scalar int32)."""
        k = jax.lax.dynamic_update_slice(self.k, k_new.astype(self.k.dtype), (0, offset, 0, 0))
        v = jax.lax.dynamic_update_slice(self.v, v_new.astype(self.v.dtype), (0, offset, 0, 0))
        return KVCache(k, v)

    def update_rows(
        self, k_new: jax.Array, v_new: jax.Array, offsets: jax.Array
    ):
        """Insert [B, 1, Hkv, Dh] at PER-ROW time offsets [B] (continuous
        seq2seq batching: each slot decodes at its own position). One-hot
        select along the time axis — no scatter, XLA fuses it."""
        S = self.k.shape[1]
        hot = (
            jnp.arange(S, dtype=jnp.int32)[None, :] == offsets[:, None]
        )[:, :, None, None]
        k = jnp.where(hot, k_new.astype(self.k.dtype), self.k)
        v = jnp.where(hot, v_new.astype(self.v.dtype), self.v)
        return KVCache(k, v)


# Attention implementation selector. "auto" uses the Pallas flash kernels
# on TPU (above the size gates below) and the einsum oracle elsewhere;
# tests pin it explicitly. Read at TRACE time — set it before building
# jitted programs. MOE_TPU_ATTN_IMPL overrides for A/B benchmarking.
import os as _os

_ATTN_IMPL = _os.environ.get("MOE_TPU_ATTN_IMPL", "auto")


def set_attention_impl(impl: str) -> None:
    global _ATTN_IMPL
    if impl not in ("auto", "flash", "naive"):
        raise ValueError(f"unknown attention impl {impl!r}")
    _ATTN_IMPL = impl


def get_attention_impl() -> str:
    return _ATTN_IMPL


def _flash_enabled() -> bool:
    if _ATTN_IMPL == "flash":
        return True
    if _ATTN_IMPL == "naive":
        return False
    return jax.default_backend() == "tpu"


# auto-mode size gates: at tiny shapes XLA's fused einsum attention beats
# the kernels' launch/DMA setup overhead (measured: NLLB decode S=128
# regressed 1.8x routed through flash). Explicit impl="flash" bypasses.
_FLASH_DECODE_MIN_BYTES = 8 << 20   # live K/V bytes worth one kernel
_FLASH_PREFILL_MIN_SCORES = 32 << 20  # f32 score-tensor bytes the naive
                                      # path would materialize


def _flash_worthwhile(q, k_cache, T: int) -> bool:
    if _ATTN_IMPL == "flash":
        return True
    B, S, Hkv, Dh = k_cache.shape
    if T == 1:
        kv_bytes = B * S * Hkv * Dh * k_cache.dtype.itemsize
        return kv_bytes >= _FLASH_DECODE_MIN_BYTES
    H = q.shape[2]
    return 4 * B * H * T * S >= _FLASH_PREFILL_MIN_SCORES


def attend(
    q: jax.Array,  # [B, T, H, Dh] (rope already applied)
    k_cache: jax.Array,  # [B, S, Hkv, Dh]
    v_cache: jax.Array,  # [B, S, Hkv, Dh]
    q_positions: jax.Array,  # [B, T] absolute positions of the queries
    kv_len: jax.Array,  # scalar int32: number of valid cache entries
    *,
    scale: Optional[float] = None,
    causal: bool = True,
    logit_softcap: Optional[float] = None,
    bias: Optional[jax.Array] = None,  # [B or 1, H, T, S] additive
    pad_mask: Optional[jax.Array] = None,  # [B, S] True = valid key
) -> jax.Array:
    """Masked multi-head attention over a (possibly over-allocated) KV cache.
    GQA: q heads grouped onto kv heads (grouped einsum — the cache is read
    once, never repeated). Softmax in f32.

    Dispatches to the Pallas flash kernels on TPU (tiled online softmax for
    prefill, live-length-bounded DMA for decode); this einsum body is the
    numerics oracle everywhere else. The reference relies on optional
    FlashAttention-2 (/root/reference/moe_infinity/entrypoints/
    big_modeling.py:125-148)."""
    if _flash_enabled() and _flash_worthwhile(q, k_cache, q.shape[1]):
        from moe_infinity_tpu.ops.flash_attention import flash_attend

        out = flash_attend(
            q, k_cache, v_cache, q_positions, kv_len,
            scale=scale, causal=causal, logit_softcap=logit_softcap,
            bias=bias, pad_mask=pad_mask,
        )
        if out is not None:  # None = shape unsupported by the kernel
            return out
    return attend_reference(
        q, k_cache, v_cache, q_positions, kv_len,
        scale=scale, causal=causal, logit_softcap=logit_softcap,
        bias=bias, pad_mask=pad_mask,
    )


def attend_cache(
    q: jax.Array,  # [B, T, H, Dh]
    kv,  # KVCache or PagedKVCache (already updated with this step's K/V)
    q_positions: jax.Array,
    kv_len: jax.Array,
    *,
    scale: Optional[float] = None,
    causal: bool = True,
    logit_softcap: Optional[float] = None,
    bias: Optional[jax.Array] = None,
    pad_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """attend() over a cache OBJECT. For a paged cache on TPU, decode steps
    read K/V pages in place via the paged flash kernel — no
    ``pool[page_table]`` materialization; everything else routes through
    attend() on the gathered view."""
    if (
        _flash_enabled()
        and q.shape[1] == 1
        and causal
        and bias is None
        and hasattr(kv, "pool_k")
        # paged pools gate on the POOL gather the naive path would pay
        and (
            _ATTN_IMPL == "flash"
            or kv.pool_k.size * kv.pool_k.dtype.itemsize
            >= _FLASH_DECODE_MIN_BYTES
        )
    ):
        from moe_infinity_tpu.ops.flash_attention import paged_flash_decode

        B = q.shape[0]
        row_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (B,))
        row_len = jnp.minimum(
            row_len, q_positions[:, 0].astype(jnp.int32) + 1
        )
        out = paged_flash_decode(
            q[:, 0], kv.pool_k, kv.pool_v, kv.page_table, row_len,
            scale=scale, logit_softcap=logit_softcap, pad_mask=pad_mask,
        )
        if out is not None:
            return out[:, None]
    return attend(
        q, kv.k, kv.v, q_positions, kv_len,
        scale=scale, causal=causal, logit_softcap=logit_softcap,
        bias=bias, pad_mask=pad_mask,
    )


def attend_reference(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    q_positions: jax.Array,
    kv_len: jax.Array,
    *,
    scale: Optional[float] = None,
    causal: bool = True,
    logit_softcap: Optional[float] = None,
    bias: Optional[jax.Array] = None,
    pad_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """The einsum oracle (see attend)."""
    B, T, H, Dh = q.shape
    S, Hkv = k_cache.shape[1], k_cache.shape[2]
    if scale is None:
        scale = Dh ** -0.5
    rep = H // Hkv

    # grouped GQA: contract q [B,T,Hkv,rep,Dh] against the cache once
    qg = q.reshape(B, T, Hkv, rep, Dh).astype(jnp.float32)
    logits = jnp.einsum(
        "bthgd,bshd->bhgts", qg, k_cache.astype(jnp.float32)
    ) * scale  # [B, Hkv, rep, T, S]
    if logit_softcap is not None:
        logits = jnp.tanh(logits / logit_softcap) * logit_softcap
    if bias is not None:
        # bias dims may broadcast ([B,1,1,S] pad bias, [1,H,T,S] T5 bias)
        Bb, Hb, Tb, Sb = bias.shape
        bias32 = bias.astype(jnp.float32)
        if Hb == 1:
            bias_g = bias32[:, :, None]  # [Bb, 1, 1, Tb, Sb]
        else:
            bias_g = bias32.reshape(Bb, Hkv, rep, Tb, Sb)
        logits = logits + bias_g

    key_pos = jnp.arange(S, dtype=jnp.int32)[None, None, None, None, :]
    valid = key_pos < kv_len
    if causal:
        valid = jnp.logical_and(
            valid, key_pos <= q_positions[:, None, None, :, None]
        )
    if pad_mask is not None:
        valid = jnp.logical_and(valid, pad_mask[:, None, None, None, :])
    logits = jnp.where(valid, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgts,bshd->bthgd", probs, v_cache.astype(jnp.float32))
    return out.reshape(B, T, H, Dh).astype(q.dtype)


# --------------------------------------------------------------------------
# T5-style relative position bias (Switch Transformers)
# --------------------------------------------------------------------------

def t5_relative_bucket(
    relative_position: jax.Array, bidirectional: bool, num_buckets: int, max_distance: int
) -> jax.Array:
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + jnp.where(n < 0, num_buckets, 0)
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def t5_position_bias(
    rel_bias_table: jax.Array,  # [num_buckets, H]
    q_positions: jax.Array,  # [T] query absolute positions
    k_positions: jax.Array,  # [S]
    bidirectional: bool,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> jax.Array:
    """[1, H, T, S] additive attention bias."""
    rel = k_positions[None, :] - q_positions[:, None]  # [T, S]
    buckets = t5_relative_bucket(rel, bidirectional, num_buckets, max_distance)
    bias = rel_bias_table[buckets]  # [T, S, H]
    return jnp.transpose(bias, (2, 0, 1))[None]


# --------------------------------------------------------------------------
# Sinusoidal positions (NLLB / M2M100)
# --------------------------------------------------------------------------

def sinusoidal_embedding(
    num_positions: int, dim: int, padding_idx: Optional[int] = 1
) -> jax.Array:
    """M2M100-style sinusoidal table [num_positions, dim] (fp32)."""
    import numpy as np

    half = dim // 2
    emb = np.log(10000.0) / (half - 1)
    emb = np.exp(np.arange(half, dtype=np.float64) * -emb)
    pos = np.arange(num_positions, dtype=np.float64)[:, None] * emb[None, :]
    table = np.concatenate([np.sin(pos), np.cos(pos)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((num_positions, 1))], axis=1)
    if padding_idx is not None:
        table[padding_idx] = 0.0
    return jnp.asarray(table, jnp.float32)
