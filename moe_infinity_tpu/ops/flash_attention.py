"""Pallas TPU flash attention: tiled online-softmax prefill + a decode
kernel whose HBM traffic is one pass over the LIVE K/V rows.

The TPU-native replacement for the reference's optional FlashAttention-2
pickup (/root/reference/moe_infinity/entrypoints/big_modeling.py:125-148),
re-designed for this engine's cache layout:

* ``flash_attend`` — grid (B, H, Tq-tiles, S-tiles) with online-softmax
  scratch carried across the S dimension. Never materializes the
  [B, H, T, S] f32 score tensor (the einsum oracle's memory ceiling for
  long prompts). GQA is folded into the BlockSpec index map — the q-head
  grid coordinate reads kv head ``h // rep``, so the KV cache is streamed
  once, never ``jnp.repeat``-ed. q/k/v are transposed to head-leading
  [B, H, T, Dh] outside the kernel (one fused pass, amortized over the
  O(T·S) attention work) so every BlockSpec slice lands on leading dims —
  Mosaic cannot slice the sublane head axis of the engine's [B, S, Hkv,
  Dh] cache layout. Supports causal masking from absolute query
  positions, additive bias (T5 relative bias), key padding masks, and
  Grok-style logit softcap.

* ``flash_decode`` — grid (B, Hkv); all ``rep`` grouped q-heads of one kv
  head attend together from a single double-buffered DMA stream over the
  cache, with the loop bounded by the row's live length ``cdiv(len, bs)``
  rather than the cache capacity. The cache is viewed as [B, S, Hkv*Dh]
  (a free reshape) so per-head DMA is a lane-aligned column slice —
  requires Dh % 128 == 0 (Mixtral/NLLB/Grok/DeepSeek/OPT; Switch's d_kv
  64 falls back to the oracle, where its tiny decode caches are cheap).
  Scores keep keys on the sublane axis ([bs, rep]) so length/pad masks
  broadcast without relayout. Decode-step HBM traffic ≈ live K/V bytes,
  the bandwidth speed-of-light for attention.

* ``paged_flash_decode`` — the same live-bounded loop over a paged KV
  pool: the page table rides scalar prefetch and each logical page is
  DMA'd from its physical pool slot in place. No ``pool[page_table]``
  gather (the round-1 ceiling: PagedKVCache.k materialized the entire
  table view every step).

All kernels accumulate in f32 and are numerics-tested against
``models.layers.attend_reference``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30  # finite -inf stand-in: keeps exp() NaN-free on masked tiles

# interpret-mode switch for CPU tests (the dispatcher only routes here on
# TPU; tests call the kernels directly after set_flash_interpret(True))
_INTERPRET = False


def set_flash_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = value


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_bs(S: int, cap: int = 256) -> Optional[int]:
    """Largest power-of-two tile (mult of 8) dividing S — decode DMA tiles
    must partition the cache exactly (no block padding on manual copies)."""
    for bs in (cap, 128, 64, 32, 16, 8):
        if S % bs == 0:
            return bs
    return None


# ---------------------------------------------------------------------------
# Prefill / general kernel: grid (B, H, Tt, St), online softmax over St
# ---------------------------------------------------------------------------

def _attend_kernel(
    kvlen_ref,  # SMEM (1,)
    q_ref,      # (1, 1, bt, Dh)   from [B, H, T, Dh]
    qpos_ref,   # (1, bt, 1) int32 from [B, T, 1]
    k_ref,      # (1, 1, bs, Dh)   from [B, Hkv, S, Dh]
    v_ref,      # (1, 1, bs, Dh)
    *rest,      # [bias_ref], [mask_ref], out_ref, m_sc, l_sc, acc_sc
    bt: int,
    bs: int,
    causal: bool,
    scale: float,
    softcap: Optional[float],
    has_bias: bool,
    has_mask: bool,
):
    it = 0
    bias_ref = rest[it] if has_bias else None
    it += has_bias
    mask_ref = rest[it] if has_mask else None
    it += has_mask
    out_ref, m_sc, l_sc, acc_sc = rest[it:]

    s = pl.program_id(3)
    n_s = pl.num_programs(3)
    kv_len = kvlen_ref[0]

    @pl.when(s == 0)
    def _init():
        m_sc[:] = jnp.full_like(m_sc, _NEG)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    qp = qpos_ref[0]  # [bt, 1]
    key_base = s * bs
    # tile-level skip: tiles past the valid length, or (causal) entirely in
    # the future of every query row, contribute nothing
    tile_live = key_base < kv_len
    if causal:
        tile_live = jnp.logical_and(tile_live, key_base <= jnp.max(qp))

    @pl.when(tile_live)
    def _compute():
        q = q_ref[0, 0]  # [bt, Dh]
        k = k_ref[0, 0]  # [bs, Dh]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [bt, bs]
        if softcap is not None:
            scores = jnp.tanh(scores / softcap) * softcap
        if has_bias:
            scores = scores + bias_ref[0, 0].astype(jnp.float32)

        kpos = key_base + jax.lax.broadcasted_iota(jnp.int32, (bt, bs), 1)
        valid = kpos < kv_len
        if causal:
            valid = jnp.logical_and(valid, kpos <= qp)
        if has_mask:
            valid = jnp.logical_and(valid, mask_ref[0] > 0)  # [1, bs]

        scores = jnp.where(valid, scores, _NEG)
        m_prev = m_sc[:]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)  # [bt, bs]
        l_sc[:] = alpha * l_sc[:] + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, 0]  # [bs, Dh]
        # sanitize the block-padded tail rows of v: p is 0 there, but the
        # padding can be NaN/inf and 0*NaN = NaN in the dot accumulation
        krow_valid = (
            key_base
            + jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0)
        ) < kv_len
        v = jnp.where(krow_valid, v, 0)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_sc[:] = alpha * acc_sc[:] + pv
        m_sc[:] = m_new

    @pl.when(s == n_s - 1)
    def _write():
        l = l_sc[:]
        out = jnp.where(l > 0, acc_sc[:] / jnp.where(l > 0, l, 1.0), 0.0)
        out_ref[0, 0] = out.astype(out_ref.dtype)


def flash_attend(
    q: jax.Array,          # [B, T, H, Dh]
    k_cache: jax.Array,    # [B, S, Hkv, Dh]
    v_cache: jax.Array,    # [B, S, Hkv, Dh]
    q_positions: jax.Array,  # [B, T] int32
    kv_len: jax.Array,     # scalar int32
    *,
    scale: Optional[float] = None,
    causal: bool = True,
    logit_softcap: Optional[float] = None,
    bias: Optional[jax.Array] = None,      # [B or 1, H, T, S]
    pad_mask: Optional[jax.Array] = None,  # [B, S] bool
    interpret: Optional[bool] = None,
) -> Optional[jax.Array]:
    """Same contract as models.layers.attend. Returns None when the shape
    is outside the kernel's envelope (the dispatcher falls back)."""
    B, T, H, Dh = q.shape
    S, Hkv = k_cache.shape[1], k_cache.shape[2]
    if H % Hkv != 0 or S == 0:
        return None
    rep = H // Hkv
    if scale is None:
        scale = Dh ** -0.5
    interpret = _INTERPRET if interpret is None else interpret

    if T == 1 and bias is None:
        out = flash_decode(
            q, k_cache, v_cache, q_positions, kv_len,
            scale=scale, causal=causal, logit_softcap=logit_softcap,
            pad_mask=pad_mask, interpret=interpret,
        )
        if out is not None:
            return out
        # fall through to the grid kernel (handles any S/Dh via padding)

    # tile sizes: single padded block for small dims, 128-aligned otherwise
    bt = _round_up(T, 8) if T <= 128 else 128
    bs = _round_up(S, 128) if S <= 128 else 128
    grid = (B, H, pl.cdiv(T, bt), pl.cdiv(S, bs))

    # head-leading layouts: every BlockSpec slice below lands on leading
    # dims (Mosaic cannot slice the sublane head axis of [B, S, Hkv, Dh])
    qT = jnp.swapaxes(q, 1, 2)            # [B, H, T, Dh]
    kT = jnp.swapaxes(k_cache, 1, 2)      # [B, Hkv, S, Dh]
    vT = jnp.swapaxes(v_cache, 1, 2)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # kv_len
        pl.BlockSpec(
            (1, 1, bt, Dh), lambda b, h, t, s: (b, h, t, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, bt, 1), lambda b, h, t, s: (b, t, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, bs, Dh), lambda b, h, t, s: (b, h // rep, s, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, bs, Dh), lambda b, h, t, s: (b, h // rep, s, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [
        jnp.asarray(kv_len, jnp.int32).reshape(1),
        qT,
        q_positions.astype(jnp.int32)[:, :, None],  # [B, T, 1]
        kT,
        vT,
    ]
    if bias is not None:
        # bias dims may broadcast ([B,1,1,S] pad bias, [1,H,T,S] T5 bias);
        # broadcast dims map to block 0 and a size-1 block dim
        Bb, Hb, Tb, Sb = bias.shape
        if Sb != S:
            return None  # S-broadcast bias unsupported; oracle handles it
        bbt = bt if Tb != 1 else 1
        in_specs.append(
            pl.BlockSpec(
                (1, 1, bbt, bs),
                lambda b, h, t, s, _Bb=Bb, _Hb=Hb, _Tb=Tb: (
                    b if _Bb != 1 else 0,
                    h if _Hb != 1 else 0,
                    t if _Tb != 1 else 0,
                    s,
                ),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(bias)
    if pad_mask is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, bs), lambda b, h, t, s: (b, 0, s),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(pad_mask.astype(jnp.int8)[:, None, :])  # [B, 1, S]

    kernel = functools.partial(
        _attend_kernel,
        bt=bt, bs=bs, causal=causal, scale=float(scale),
        softcap=(None if logit_softcap is None else float(logit_softcap)),
        has_bias=bias is not None, has_mask=pad_mask is not None,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, bt, Dh), lambda b, h, t, s: (b, h, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, T, Dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt, 1), jnp.float32),
            pltpu.VMEM((bt, 1), jnp.float32),
            pltpu.VMEM((bt, Dh), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * S * Dh,
            bytes_accessed=(
                q.size * q.dtype.itemsize
                + 2 * k_cache.size * k_cache.dtype.itemsize
            ),
            transcendentals=B * H * T * S,
        ),
        interpret=interpret,
    )(*operands)
    return jnp.swapaxes(out, 1, 2)  # [B, T, H, Dh]


# ---------------------------------------------------------------------------
# Decode kernel: grid (B, Hkv), manual double-buffered DMA bounded by the
# row's live length. HBM traffic = live K/V bytes.
# ---------------------------------------------------------------------------

def _decode_kernel(
    rowlen_ref,  # scalar prefetch SMEM: [B] int32 per-row live lengths
    q_ref,       # (1, 1, rep, Dh) VMEM
    k_hbm,       # [B, S, Hkv*Dh] ANY
    v_hbm,
    *rest,       # [mask_hbm], out_ref, kbuf, vbuf, (mbuf), sem
    rep: int,
    bs: int,
    Dh: int,
    scale: float,
    softcap: Optional[float],
    has_mask: bool,
):
    if has_mask:
        mask_hbm, out_ref, kbuf, vbuf, mbuf, sem = rest
    else:
        mask_hbm, mbuf = None, None
        out_ref, kbuf, vbuf, sem = rest

    b = pl.program_id(0)
    h = pl.program_id(1)
    row_len = rowlen_ref[b]
    n = pl.cdiv(row_len, bs)
    col = h * Dh

    def dmas(slot, i):
        st = i * bs
        out = [
            pltpu.make_async_copy(
                k_hbm.at[b, pl.ds(st, bs), pl.ds(col, Dh)],
                kbuf.at[slot], sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[b, pl.ds(st, bs), pl.ds(col, Dh)],
                vbuf.at[slot], sem.at[slot, 1],
            ),
        ]
        if has_mask:
            out.append(
                pltpu.make_async_copy(
                    mask_hbm.at[b, pl.ds(st, bs), :],
                    mbuf.at[slot], sem.at[slot, 2],
                )
            )
        return out

    def start_dma(slot, i):
        for d in dmas(slot, i):
            d.start()

    @pl.when(n > 0)
    def _warm():
        start_dma(0, 0)

    q = q_ref[0, 0].astype(jnp.float32)  # [rep, Dh]

    def body(i, carry):
        m, l, acc = carry  # [1, rep], [1, rep], [rep, Dh]
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n)
        def _next():
            start_dma(jax.lax.rem(i + 1, 2), i + 1)

        for d in dmas(slot, i):
            d.wait()
        # keys on the sublane axis: masks broadcast with no relayout
        scores = jax.lax.dot_general(
            kbuf[slot].astype(jnp.float32), q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [bs, rep]
        if softcap is not None:
            scores = jnp.tanh(scores / softcap) * softcap
        kpos = i * bs + jax.lax.broadcasted_iota(jnp.int32, (bs, rep), 0)
        valid = kpos < row_len
        if has_mask:
            valid = jnp.logical_and(valid, mbuf[slot] > 0)  # [bs, 1]
        scores = jnp.where(valid, scores, _NEG)
        m_new = jnp.maximum(m, jnp.max(scores, axis=0, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)  # [bs, rep]
        l_new = alpha * l + jnp.sum(p, axis=0, keepdims=True)
        pv = jax.lax.dot_general(
            p, vbuf[slot].astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rep, Dh]
        return m_new, l_new, alpha.reshape(rep, 1) * acc + pv

    m0 = jnp.full((1, rep), _NEG, jnp.float32)
    l0 = jnp.zeros((1, rep), jnp.float32)
    a0 = jnp.zeros((rep, Dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n, body, (m0, l0, a0))
    lc = l.reshape(rep, 1)
    out = jnp.where(lc > 0, acc / jnp.where(lc > 0, lc, 1.0), 0.0)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def flash_decode(
    q: jax.Array,          # [B, 1, H, Dh] or [B, H, Dh]
    k_cache: jax.Array,    # [B, S, Hkv, Dh]
    v_cache: jax.Array,
    q_positions: jax.Array,  # [B, 1] or [B] int32
    kv_len: jax.Array,     # scalar int32
    *,
    scale: Optional[float] = None,
    causal: bool = True,
    logit_softcap: Optional[float] = None,
    pad_mask: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> Optional[jax.Array]:
    squeeze = q.ndim == 4
    if squeeze:
        q = q[:, 0]
        q_positions = q_positions[:, 0]
    B, H, Dh = q.shape
    S, Hkv = k_cache.shape[1], k_cache.shape[2]
    # per-head DMA slices the fused Hkv*Dh lane axis at h*Dh: 128-alignment
    # requires Dh % 128 == 0 (the grid kernel or oracle covers the rest)
    if H % Hkv != 0 or S == 0 or Dh % 128 != 0:
        return None
    bs = _pick_bs(S)
    if bs is None:
        return None
    rep = H // Hkv
    if scale is None:
        scale = Dh ** -0.5
    interpret = _INTERPRET if interpret is None else interpret

    # the row's live key range: cache validity, and (causal) nothing past
    # the query's own position
    row_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (B,))
    if causal:
        row_len = jnp.minimum(row_len, q_positions.astype(jnp.int32) + 1)
    row_len = jnp.minimum(row_len, S)

    qg = q.reshape(B, Hkv, rep, Dh)
    k2 = k_cache.reshape(B, S, Hkv * Dh)  # free reshape
    v2 = v_cache.reshape(B, S, Hkv * Dh)
    in_specs = [
        pl.BlockSpec(
            (1, 1, rep, Dh), lambda b, h, *_: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    operands = [qg, k2, v2]
    n_sems = 2
    scratch = [
        pltpu.VMEM((2, bs, Dh), k_cache.dtype),
        pltpu.VMEM((2, bs, Dh), v_cache.dtype),
    ]
    if pad_mask is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        operands.append(pad_mask.astype(jnp.int8)[:, :, None])  # [B, S, 1]
        scratch.append(pltpu.VMEM((2, bs, 1), jnp.int8))
        n_sems = 3
    scratch.append(pltpu.SemaphoreType.DMA((2, n_sems)))

    kernel = functools.partial(
        _decode_kernel,
        rep=rep, bs=bs, Dh=Dh, scale=float(scale),
        softcap=(None if logit_softcap is None else float(logit_softcap)),
        has_mask=pad_mask is not None,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, rep, Dh), lambda b, h, *_: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rep, Dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * Dh,
            bytes_accessed=2 * k_cache.size * k_cache.dtype.itemsize,
            transcendentals=B * H * S,
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(row_len, *operands)
    out = out.reshape(B, H, Dh)
    return out[:, None] if squeeze else out


# ---------------------------------------------------------------------------
# MLA decode: DeepSeek's absorbed-latent attention. Scores sum two dot
# products over SHARED caches (the 512-dim compressed latent + the 64-dim
# rope key); values ARE the latent. Effectively MQA with one wide head —
# one K/V stream serves all H query heads, and the lane axes are full-width
# (no head slicing), so any latent/rope dims work.
# ---------------------------------------------------------------------------

def _mla_decode_kernel(
    rowlen_ref,  # scalar prefetch SMEM [B]
    qlat_ref,    # (1, H, R)
    qpe_ref,     # (1, H, P)
    c_hbm,       # [B, S, R] ANY — compressed latent cache
    kpe_hbm,     # [B, S, P] ANY — roped shared key cache
    *rest,       # [mask_hbm], out_ref, cbuf, pbuf, (mbuf), sem
    H: int,
    bs: int,
    R: int,
    scale: float,
    has_mask: bool,
):
    if has_mask:
        mask_hbm, out_ref, cbuf, pbuf, mbuf, sem = rest
    else:
        mask_hbm, mbuf = None, None
        out_ref, cbuf, pbuf, sem = rest

    b = pl.program_id(0)
    row_len = rowlen_ref[b]
    n = pl.cdiv(row_len, bs)

    def dmas(slot, i):
        st = i * bs
        out = [
            pltpu.make_async_copy(
                c_hbm.at[b, pl.ds(st, bs), :], cbuf.at[slot],
                sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                kpe_hbm.at[b, pl.ds(st, bs), :], pbuf.at[slot],
                sem.at[slot, 1],
            ),
        ]
        if has_mask:
            out.append(
                pltpu.make_async_copy(
                    mask_hbm.at[b, pl.ds(st, bs), :],
                    mbuf.at[slot], sem.at[slot, 2],
                )
            )
        return out

    def start_dma(slot, i):
        for d in dmas(slot, i):
            d.start()

    @pl.when(n > 0)
    def _warm():
        start_dma(0, 0)

    q_lat = qlat_ref[0].astype(jnp.float32)  # [H, R]
    q_pe = qpe_ref[0].astype(jnp.float32)    # [H, P]

    def body(i, carry):
        m, l, acc = carry  # [1, H], [1, H], [H, R]
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n)
        def _next():
            start_dma(jax.lax.rem(i + 1, 2), i + 1)

        for d in dmas(slot, i):
            d.wait()
        kc = cbuf[slot].astype(jnp.float32)   # [bs, R]
        kp = pbuf[slot].astype(jnp.float32)   # [bs, P]
        scores = (
            jax.lax.dot_general(
                kc, q_lat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                kp, q_pe, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        ) * scale  # [bs, H]
        kpos = i * bs + jax.lax.broadcasted_iota(jnp.int32, (bs, H), 0)
        valid = kpos < row_len
        if has_mask:
            valid = jnp.logical_and(valid, mbuf[slot] > 0)  # [bs, 1]
        scores = jnp.where(valid, scores, _NEG)
        m_new = jnp.maximum(m, jnp.max(scores, axis=0, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)  # [bs, H]
        l_new = alpha * l + jnp.sum(p, axis=0, keepdims=True)
        pv = jax.lax.dot_general(
            p, kc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, R]
        return m_new, l_new, alpha.reshape(H, 1) * acc + pv

    m0 = jnp.full((1, H), _NEG, jnp.float32)
    l0 = jnp.zeros((1, H), jnp.float32)
    a0 = jnp.zeros((H, R), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n, body, (m0, l0, a0))
    lc = l.reshape(H, 1)
    out = jnp.where(lc > 0, acc / jnp.where(lc > 0, lc, 1.0), 0.0)
    out_ref[0] = out.astype(out_ref.dtype)


def mla_flash_decode(
    q_lat: jax.Array,     # [B, H, R] absorbed latent query
    q_pe: jax.Array,      # [B, H, P] roped query
    c_cache: jax.Array,   # [B, S, R] compressed latent cache
    kpe_cache: jax.Array,  # [B, S, P] roped shared key cache
    q_positions: jax.Array,  # [B] absolute position of the query
    kv_len: jax.Array,    # scalar int32 valid cache entries
    *,
    scale: float,
    pad_mask: Optional[jax.Array] = None,  # [B, S]
    interpret: Optional[bool] = None,
) -> Optional[jax.Array]:
    """Online-softmax MLA decode: returns out_lat [B, H, R] (the caller
    applies w_uv / o_fold). HBM traffic = one pass over the live latent +
    rope caches shared by all H heads."""
    B, H, R = q_lat.shape
    S = c_cache.shape[1]
    P = q_pe.shape[-1]
    if S == 0 or R % 128 != 0:
        return None
    bs = _pick_bs(S)
    if bs is None:
        return None
    interpret = _INTERPRET if interpret is None else interpret
    if P % 128 != 0:
        # Mosaic requires 128-aligned lane extents on DMA'd slices; the
        # zero-padded rope lanes contribute 0 to the scores
        pad = _round_up(P, 128) - P
        q_pe = jnp.pad(q_pe, ((0, 0), (0, 0), (0, pad)))
        kpe_cache = jnp.pad(kpe_cache, ((0, 0), (0, 0), (0, pad)))
        P += pad

    row_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (B,))
    row_len = jnp.minimum(row_len, q_positions.astype(jnp.int32) + 1)
    row_len = jnp.minimum(row_len, S)

    in_specs = [
        pl.BlockSpec(
            (1, H, R), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, H, P), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    operands = [q_lat, q_pe, c_cache, kpe_cache]
    scratch = [
        pltpu.VMEM((2, bs, R), c_cache.dtype),
        pltpu.VMEM((2, bs, P), kpe_cache.dtype),
    ]
    n_sems = 2
    if pad_mask is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        operands.append(pad_mask.astype(jnp.int8)[:, :, None])
        scratch.append(pltpu.VMEM((2, bs, 1), jnp.int8))
        n_sems = 3
    scratch.append(pltpu.SemaphoreType.DMA((2, n_sems)))

    kernel = functools.partial(
        _mla_decode_kernel,
        H=H, bs=bs, R=R, scale=float(scale),
        has_mask=pad_mask is not None,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, H, R), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, R), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * (R + P // 2),
            bytes_accessed=B * S * (R + P) * c_cache.dtype.itemsize,
            transcendentals=B * H * S,
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(row_len, *operands)


# ---------------------------------------------------------------------------
# Paged decode: the same live-bounded loop over a page pool, page table in
# scalar-prefetch SMEM. No pool[page_table] materialization.
# ---------------------------------------------------------------------------

def _paged_decode_kernel(
    rowlen_ref,  # SMEM [B]
    ptab_ref,    # SMEM [B, P] physical page ids
    q_ref,       # (1, 1, rep, Dh)
    pool_k,      # [NP, page, Hkv*Dh] ANY
    pool_v,
    *rest,       # [mask_hbm], out_ref, kbuf, vbuf, (mbuf), sem
    rep: int,
    page: int,
    Dh: int,
    scale: float,
    softcap: Optional[float],
    has_mask: bool,
):
    if has_mask:
        mask_hbm, out_ref, kbuf, vbuf, mbuf, sem = rest
    else:
        mask_hbm, mbuf = None, None
        out_ref, kbuf, vbuf, sem = rest

    b = pl.program_id(0)
    h = pl.program_id(1)
    row_len = rowlen_ref[b]
    n = pl.cdiv(row_len, page)
    col = h * Dh

    def dmas(slot, i):
        phys = ptab_ref[b, i]
        out = [
            pltpu.make_async_copy(
                pool_k.at[phys, :, pl.ds(col, Dh)],
                kbuf.at[slot], sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                pool_v.at[phys, :, pl.ds(col, Dh)],
                vbuf.at[slot], sem.at[slot, 1],
            ),
        ]
        if has_mask:
            # mask is LOGICAL [B, P, page, 1]: indexed by i, not phys
            out.append(
                pltpu.make_async_copy(
                    mask_hbm.at[b, i], mbuf.at[slot], sem.at[slot, 2]
                )
            )
        return out

    def start_dma(slot, i):
        for d in dmas(slot, i):
            d.start()

    @pl.when(n > 0)
    def _warm():
        start_dma(0, 0)

    q = q_ref[0, 0].astype(jnp.float32)  # [rep, Dh]

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n)
        def _next():
            start_dma(jax.lax.rem(i + 1, 2), i + 1)

        for d in dmas(slot, i):
            d.wait()
        scores = jax.lax.dot_general(
            kbuf[slot].astype(jnp.float32), q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [page, rep]
        if softcap is not None:
            scores = jnp.tanh(scores / softcap) * softcap
        kpos = i * page + jax.lax.broadcasted_iota(
            jnp.int32, (page, rep), 0
        )
        valid = kpos < row_len
        if has_mask:
            valid = jnp.logical_and(valid, mbuf[slot] > 0)  # [page, 1]
        scores = jnp.where(valid, scores, _NEG)
        m_new = jnp.maximum(m, jnp.max(scores, axis=0, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)
        l_new = alpha * l + jnp.sum(p, axis=0, keepdims=True)
        pv = jax.lax.dot_general(
            p, vbuf[slot].astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, alpha.reshape(rep, 1) * acc + pv

    m0 = jnp.full((1, rep), _NEG, jnp.float32)
    l0 = jnp.zeros((1, rep), jnp.float32)
    a0 = jnp.zeros((rep, Dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n, body, (m0, l0, a0))
    lc = l.reshape(rep, 1)
    out = jnp.where(lc > 0, acc / jnp.where(lc > 0, lc, 1.0), 0.0)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def paged_flash_decode(
    q: jax.Array,           # [B, H, Dh] (one decode step)
    pool_k: jax.Array,      # [NP, page, Hkv, Dh]
    pool_v: jax.Array,
    page_table: jax.Array,  # [B, P] int32 physical page ids
    lengths: jax.Array,     # [B] int32 live tokens per row (causality
                            # already folded in by the caller)
    *,
    scale: Optional[float] = None,
    logit_softcap: Optional[float] = None,
    pad_mask: Optional[jax.Array] = None,  # [B, P*page] logical hole mask
    interpret: Optional[bool] = None,
) -> Optional[jax.Array]:
    B, H, Dh = q.shape
    NP, page, Hkv = pool_k.shape[0], pool_k.shape[1], pool_k.shape[2]
    P = page_table.shape[1]
    if H % Hkv != 0 or Dh % 128 != 0:
        return None
    rep = H // Hkv
    if scale is None:
        scale = Dh ** -0.5
    interpret = _INTERPRET if interpret is None else interpret

    qg = q.reshape(B, Hkv, rep, Dh)
    pk = pool_k.reshape(NP, page, Hkv * Dh)
    pv = pool_v.reshape(NP, page, Hkv * Dh)
    in_specs = [
        pl.BlockSpec(
            (1, 1, rep, Dh), lambda b, h, *_: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    operands = [qg, pk, pv]
    scratch = [
        pltpu.VMEM((2, page, Dh), pool_k.dtype),
        pltpu.VMEM((2, page, Dh), pool_v.dtype),
    ]
    n_sems = 2
    if pad_mask is not None:
        if pad_mask.shape[1] != P * page:
            return None
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        operands.append(
            pad_mask.astype(jnp.int8).reshape(B, P, page, 1)
        )
        scratch.append(pltpu.VMEM((2, page, 1), jnp.int8))
        n_sems = 3
    scratch.append(pltpu.SemaphoreType.DMA((2, n_sems)))
    kernel = functools.partial(
        _paged_decode_kernel,
        rep=rep, page=page, Dh=Dh, scale=float(scale),
        softcap=(None if logit_softcap is None else float(logit_softcap)),
        has_mask=pad_mask is not None,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, rep, Dh), lambda b, h, *_: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rep, Dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * page * page_table.shape[1] * Dh,
            bytes_accessed=2 * B * page_table.shape[1] * page * Dh
            * pool_k.dtype.itemsize,
            transcendentals=B * H * page * page_table.shape[1],
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        lengths.astype(jnp.int32),
        page_table.astype(jnp.int32),
        *operands,
    )
    return out.reshape(B, H, Dh)
