"""Ring attention: sequence-parallel causal attention over a mesh axis.

Long-context prefill support — beyond the reference, which has no
sequence/context parallelism anywhere (SURVEY.md §2.4/§5: longest input is
bounded by one GPU's activation memory; its example truncates prompts at
512 tokens, /root/reference/examples/interface_example.py:122-132).

TPU-native design: each device on the `seq` mesh axis holds one contiguous
block of the sequence (queries, keys, values [B, T/s, H, Dh]). The kernel
runs s block-steps; at each step every device attends its local queries
against the K/V block currently resident, accumulates with the online
(flash-style) softmax — running max, rescaled numerator/denominator, all
in f32 — then rotates K/V one hop around the ring with `lax.ppermute`.
The ppermute rides neighbor ICI links (the `seq` axis is innermost in the
mesh), and XLA overlaps the collective with the block compute.

Memory: attention scores never materialize beyond one [B, H, T/s, T/s]
block per device, so activation memory scales 1/s with the ring size —
the point of sequence parallelism.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_NEG = jnp.finfo(jnp.float32).min


def ring_attention(
    q: jax.Array,  # [B, Tl, H, Dh] local query block (rope applied)
    k: jax.Array,  # [B, Tl, Hkv, Dh] local key block (rope applied)
    v: jax.Array,  # [B, Tl, Hkv, Dh] local value block
    *,
    axis_name: str,
    axis_size: int,
    causal: bool = True,
    scale: Optional[float] = None,
    bias_fn=None,  # (q_pos [Tq], k_pos [Tk]) -> additive [.., H, Tq, Tk]
    logit_softcap: Optional[float] = None,  # tanh cap (Grok)
) -> jax.Array:
    """Blockwise ring attention. MUST run inside shard_map with the inputs
    sharded over `axis_name` on their time axis. GQA handled by repeating
    kv heads; the value dim may differ from the key dim (MLA latents).
    bias_fn computes position-dependent additive bias per ring step from
    the GLOBAL positions (T5 relative bias, ALiBi, ...).
    Returns [B, Tl, H, Dv] in q's dtype."""
    B, Tl, H, Dh = q.shape
    Hkv = k.shape[2]
    Dv = v.shape[-1]  # may differ from Dh (MLA: keys [c|k_pe], values c)
    if scale is None:
        scale = Dh ** -0.5
    # GQA/MLA: the ring rotates the UN-repeated kv blocks (ppermute bytes
    # stay at Hkv heads — for MLA the latent itself rides the ring); heads
    # broadcast per step inside the block compute, where XLA fuses the
    # repeat into the einsum
    rep = H // Hkv
    qf = q.astype(jnp.float32) * scale

    idx = jax.lax.axis_index(axis_name)
    q_pos = idx * Tl + jnp.arange(Tl, dtype=jnp.int32)  # [Tl] global
    local = jnp.arange(Tl, dtype=jnp.int32)

    # online-softmax accumulators
    num = jnp.zeros((B, H, Tl, Dv), jnp.float32)
    den = jnp.zeros((B, H, Tl), jnp.float32)
    m = jnp.full((B, H, Tl), -jnp.inf, jnp.float32)

    cur_k, cur_v = k, v
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    for t in range(axis_size):
        # after t forward hops, this device holds the block that
        # originated on device (idx - t) mod axis_size
        src = jax.lax.rem(idx - t + axis_size, axis_size)
        k_t, v_t = cur_k, cur_v
        if rep > 1:
            k_t = jnp.repeat(k_t, rep, axis=2)
            v_t = jnp.repeat(v_t, rep, axis=2)
        logits = jnp.einsum(
            "bthd,bshd->bhts", qf, k_t.astype(jnp.float32)
        )
        if logit_softcap is not None:
            logits = jnp.tanh(logits / logit_softcap) * logit_softcap
        k_pos = src * Tl + local
        if bias_fn is not None:
            logits = logits + bias_fn(q_pos, k_pos).astype(jnp.float32)
        if causal:
            valid = k_pos[None, None, None, :] <= q_pos[None, None, :, None]
            logits = jnp.where(valid, logits, _NEG)
        bmax = logits.max(axis=-1)  # [B, H, Tl]
        m_new = jnp.maximum(m, bmax)
        safe_m = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        corr = jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
        p = jnp.exp(logits - safe_m[..., None])
        p = jnp.where(jnp.isfinite(logits), p, 0.0)  # masked block rows
        num = num * corr[..., None] + jnp.einsum(
            "bhts,bshd->bhtd", p, v_t.astype(jnp.float32)
        )
        den = den * corr + p.sum(axis=-1)
        m = m_new
        if t < axis_size - 1:
            cur_k = jax.lax.ppermute(cur_k, axis_name, perm)
            cur_v = jax.lax.ppermute(cur_v, axis_name, perm)

    out = num / jnp.maximum(den, 1e-30)[..., None]  # [B, H, Tl, Dh]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def _flash_partial(qf, k, v, valid, softcap):
    """Online-softmax partial over one K/V block. qf [B, H, Tq, Dh] f32
    pre-scaled; k/v [B, S, Hkv, D*]; valid optional [S] bool. Returns
    (m [B,H,Tq], num [B,H,Tq,Dv], den [B,H,Tq]) — a mergeable triple."""
    rep = qf.shape[1] // k.shape[2]
    if rep > 1:
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    logits = jnp.einsum("bhtd,bshd->bhts", qf, k.astype(jnp.float32))
    if softcap is not None:
        logits = jnp.tanh(logits / softcap) * softcap
    if valid is not None:
        logits = jnp.where(valid[None, None, None, :], logits, _NEG)
    m = logits.max(axis=-1)
    p = jnp.exp(logits - m[..., None])
    p = jnp.where(logits > _NEG / 2, p, 0.0)  # zero masked columns
    num = jnp.einsum("bhts,bshd->bhtd", p, v.astype(jnp.float32))
    return m, num, p.sum(axis=-1)


def sp_decode_attention(
    q: jax.Array,  # [B, 1, H, Dh] replicated query (rope applied)
    k_shard: jax.Array,  # [B, Ts, Hkv, Dh] local FROZEN prefill shard
    v_shard: jax.Array,  # [B, Ts, Hkv, Dv]
    tail_k: jax.Array,  # [B, C, Hkv, Dh] replicated decode tail
    tail_v: jax.Array,  # [B, C, Hkv, Dv]
    tail_len: jax.Array,  # scalar int32: valid tail columns
    *,
    axis_name: str,
    scale: Optional[float] = None,
    logit_softcap: Optional[float] = None,
) -> jax.Array:
    """Distributed flash decoding over a sequence-sharded cache.

    Long-context DECODE counterpart of `ring_attention` (which serves
    prefill): the prompt's K/V stays sharded over `axis_name` — frozen,
    every column valid — while generated tokens live in a small
    replicated tail. Each device computes the flash partial over its own
    shard; the partials merge with TWO tiny collectives (pmax of the
    running max, psum of the rescaled numerator/denominator — bytes are
    O(B·H·Dv), independent of context length). The tail partial is
    computed identically on every device and folded in after the psum,
    so the result is replicated. No ring rotation: a decode step moves
    no K/V bytes across the ICI at all.

    MUST run inside shard_map. Returns [B, 1, H, Dv] replicated."""
    B, Tq, H, Dh = q.shape
    if scale is None:
        scale = Dh ** -0.5
    # [B, H, Tq, Dh]: _flash_partial's layout
    qf = (q.astype(jnp.float32) * scale).transpose(0, 2, 1, 3)
    m_s, n_s, d_s = _flash_partial(qf, k_shard, v_shard, None, logit_softcap)
    C = tail_k.shape[1]
    tvalid = jnp.arange(C, dtype=jnp.int32) < tail_len
    m_t, n_t, d_t = _flash_partial(qf, tail_k, tail_v, tvalid, logit_softcap)
    m_g = jnp.maximum(jax.lax.pmax(m_s, axis_name), m_t)
    c_s = jnp.exp(m_s - m_g)
    c_t = jnp.exp(m_t - m_g)  # 0 when the tail is empty (m_t = _NEG)
    num = jax.lax.psum(n_s * c_s[..., None], axis_name) + n_t * c_t[..., None]
    den = jax.lax.psum(d_s * c_s, axis_name) + d_t * c_t
    out = num / jnp.maximum(den, 1e-30)[..., None]  # [B, H, Tq, Dv]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def ring_attend(
    q: jax.Array,  # [B, T, H, Dh] global (sharded or shardable on T)
    k: jax.Array,
    v: jax.Array,
    mesh,
    *,
    seq_axis: str = "seq",
    causal: bool = True,
    scale: Optional[float] = None,
) -> jax.Array:
    """Standalone entry: shard q/k/v over `seq_axis` on the time dimension
    and run the ring. For use outside a larger shard_map (tests, ad-hoc
    long-context attention); sp_prefill embeds `ring_attention` directly."""
    s = mesh.shape[seq_axis]
    if q.shape[1] % s:
        raise ValueError(f"T={q.shape[1]} not divisible by seq={s}")
    spec = P(None, seq_axis, None, None)
    fn = jax.shard_map(
        partial(
            ring_attention,
            axis_name=seq_axis,
            axis_size=s,
            causal=causal,
            scale=scale,
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
