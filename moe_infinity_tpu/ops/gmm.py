"""Pallas TPU grouped matmul (GMM) with fused weight dequantization.

The hot expert kernel — the TPU-native replacement for the reference's
per-expert libtorch FFN threads (/root/reference/core/parallel/
expert_dispatcher.cpp:309-395). One kernel computes every routed expert of a
layer:

* tokens are pre-sorted by expert slot (host/XLA argsort), so each expert's
  rows are contiguous;
* the grid is (row_tiles, slots); a program streams its group's weight
  slabs HBM→VMEM with double-buffered async DMA and runs the MXU dot —
  **slots with no routed tokens transfer nothing**, so HBM traffic is
  exactly the routed experts' bytes (the speed-of-light for offloaded MoE
  decode);
* int8/fp8 arenas dequantize *after* the dot: out[:, c] = (x @ w_q)[:, c]
  * scale[c] — int8 values are exact in bf16, so the MXU runs bf16×bf16
  and the per-output-channel scale multiplies the small [tm, tf] tile.

Shapes: x [T, D] (sorted), w [S, D, F], scale [S, F] or None,
group_sizes [S] → out [T, F].
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _largest_divisor_leq(n: int, cap: int) -> int:
    """Largest divisor of n that is <= cap and a multiple of 128 (TPU lane
    alignment for dynamic slices); falls back to any divisor for small n."""
    for c in range(min(n, cap) // 128 * 128, 0, -128):
        if n % c == 0:
            return c
    for c in range(min(n, cap), 0, -1):
        if n % c == 0:
            return c
    return n


def _gmm_kernel(
    group_start_ref,  # scalar prefetch: [G+1] int32 row offsets
    ids_ref,  # scalar prefetch: [G] int32 group -> weight row (slot id)
    off_ref,  # scalar prefetch: [1] base group offset into w/scale dim 0
    *refs,  # x_ref, w_ref, [scale_ref], out_ref, wbuf, sem, acc
    tm: int,
    tk: int,
    tf: int,
    quantized: bool,
    tiled: bool,
    packed: bool,
):
    if quantized:
        x_ref, w_ref, scale_ref, out_ref, wbuf, sem, acc = refs
    else:
        x_ref, w_ref, out_ref, wbuf, sem, acc = refs
        scale_ref = None
    m = pl.program_id(0)
    g = pl.program_id(1)
    # row in the (possibly layer-stacked) weight array: the grid runs over
    # ACTIVE groups only (ids_ref maps group -> slot), so grid cost scales
    # with routed tokens, not arena slots
    gw = ids_ref[g] + off_ref[0]

    @pl.when(g == 0)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    rs = group_start_ref[g]
    re = group_start_ref[g + 1]
    tile_start = m * tm
    # intersection of this group's rows with this row tile
    lo = jnp.maximum(rs - tile_start, 0)
    hi = jnp.minimum(re - tile_start, tm)

    @pl.when(hi > lo)
    def _work():
        D = x_ref.shape[1]
        F = out_ref.shape[1]
        nk = D // tk
        # packed int4: w carries F//2 packed columns; each [tk, tf] slab
        # yields TWO output tiles (split-nibble packing: low nibbles are
        # out channels [0, F/2), high nibbles [F/2, F)) — half the HBM
        # bytes per output column of the int8 path, same MXU work
        half = F // 2 if packed else 0
        nf = (half if packed else F) // tf

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
        mask = (row_ids >= lo) & (row_ids < hi)

        def get_dma(slot, fi, ki):
            if tiled:
                # w pre-tiled [S, nf, D, tf]: the slab is one contiguous
                # burst — ~100x the bandwidth of a strided [D, tf] window
                src = w_ref.at[gw, fi, pl.ds(ki * tk, tk), :]
            else:
                src = w_ref.at[gw, pl.ds(ki * tk, tk), pl.ds(fi * tf, tf)]
            return pltpu.make_async_copy(src, wbuf.at[slot], sem.at[slot])

        get_dma(0, 0, 0).start()

        def body(it, _):
            fi = it // nk
            ki = it % nk
            slot = it % 2

            @pl.when(it + 1 < nf * nk)
            def _prefetch():
                nxt = it + 1
                get_dma((nxt) % 2, nxt // nk, nxt % nk).start()

            get_dma(slot, fi, ki).wait()

            @pl.when(ki == 0)
            def _reset():
                acc[:] = jnp.zeros_like(acc)

            xk = jnp.where(mask, x_ref[:, pl.ds(ki * tk, tk)], 0)
            xk = xk.astype(jnp.bfloat16)
            if packed:
                # sign-extend both nibbles (ops.moe.unpack_int4 semantics).
                # Mosaic has no int8 vector shifts (arith.shli fails to
                # legalize), so extract via float math — exact for nibble
                # ints: byte = hi*16 + lo_u, lo_u in [0,16), hi in [-8,7]
                wf = wbuf[slot].astype(jnp.float32)
                whi = jnp.floor(wf * 0.0625)
                lo_u = wf - 16.0 * whi
                wlo = lo_u - jnp.where(lo_u >= 8.0, 16.0, 0.0)
                acc[:, :tf] += jax.lax.dot(
                    xk, wlo.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                acc[:, tf:] += jax.lax.dot(
                    xk, whi.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
            else:
                wt = wbuf[slot].astype(jnp.bfloat16)
                acc[:] += jax.lax.dot(
                    xk, wt, preferred_element_type=jnp.float32
                )

            @pl.when(ki == nk - 1)
            def _emit():
                if packed:
                    p_lo, p_hi = acc[:, :tf], acc[:, tf:]
                    off = pl.multiple_of(fi * tf, 128)
                    off_hi = pl.multiple_of(half + fi * tf, 128)
                    if quantized:
                        p_lo = p_lo * scale_ref[0, 0, pl.ds(off, tf)][None, :]
                        p_hi = (
                            p_hi * scale_ref[0, 0, pl.ds(off_hi, tf)][None, :]
                        )
                    # groups own disjoint row ranges, so += never overlaps
                    out_ref[:, pl.ds(off, tf)] += p_lo.astype(out_ref.dtype)
                    out_ref[:, pl.ds(off_hi, tf)] += p_hi.astype(out_ref.dtype)
                else:
                    part = acc[:]
                    if quantized:
                        off = pl.multiple_of(fi * tf, 128)
                        part = part * scale_ref[0, 0, pl.ds(off, tf)][None, :]
                    out_ref[:, pl.ds(fi * tf, tf)] += part.astype(out_ref.dtype)

            return 0

        jax.lax.fori_loop(0, nf * nk, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_groups", "tm", "tk", "tf", "out_dtype", "interpret", "packed"
    ),
)
def gmm(
    x: jax.Array,  # [T, D] sorted by group
    w: jax.Array,  # [S_total, D, F], or tiled [S_total, F//tf, D, tf]
    group_sizes: jax.Array,  # [S_active] int32
    scale: Optional[jax.Array] = None,  # [S_total, F]
    group_offset: Optional[jax.Array] = None,  # scalar: base row into w
    group_ids: Optional[jax.Array] = None,  # [S_active] int32 rows into w
    *,
    num_groups: int = 0,  # S_active (defaults to w.shape[0])
    tm: int = 0,
    tk: int = 0,
    tf: int = 0,
    out_dtype=jnp.float32,
    interpret: bool = False,
    packed: bool = False,  # w is split-nibble int4: [S_total, D, F//2]
) -> jax.Array:
    T, D = x.shape
    tiled = w.ndim == 4
    if tiled:
        if packed:
            raise ValueError("packed int4 gmm takes 3D [S, D, F//2] weights")
        S_total, nf_w, _, tf_w = w.shape
        F = nf_w * tf_w
        tf = tf_w
    else:
        S_total, _, Fw = w.shape
        F = 2 * Fw if packed else Fw
    S = num_groups or S_total
    if tm == 0:
        tm = min(_next_multiple(T, 16), 64)
    if tk == 0:
        tk = _largest_divisor_leq(D, 2048)
    if tf == 0:
        # packed: tf tiles the PACKED column space (F//2)
        tf = _largest_divisor_leq(F // 2 if packed else F, 512)
    m_tiles = pl.cdiv(T, tm)

    group_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(group_sizes, dtype=jnp.int32)]
    )
    if group_offset is None:
        group_offset = jnp.zeros(1, jnp.int32)
    else:
        group_offset = jnp.asarray(group_offset, jnp.int32).reshape(1)
    if group_ids is None:
        group_ids = jnp.arange(S, dtype=jnp.int32)  # identity: group == slot
    else:
        group_ids = jnp.asarray(group_ids, jnp.int32)

    quantized = scale is not None
    kernel = functools.partial(
        _gmm_kernel, tm=tm, tk=tk, tf=tf, quantized=quantized, tiled=tiled,
        packed=packed,
    )
    in_specs = [
        pl.BlockSpec((tm, D), lambda m, g, *_: (m, 0)),
        pl.BlockSpec(memory_space=pltpu.ANY),  # w stays in HBM
    ]
    inputs = [group_start, group_ids, group_offset, x, w]
    if quantized:
        # [S, 1, F] with a (1, 1, F) block: block dims equal the array dims
        # on the last two axes, satisfying the TPU (8, 128) tiling rule;
        # the kernel slices the lane (last) dim at tf granularity
        in_specs.append(
            pl.BlockSpec(
                (1, 1, F),
                lambda m, g, gs_ref, ids_ref, off_ref: (
                    ids_ref[g] + off_ref[0], 0, 0
                ),
            )
        )
        inputs.append(scale.reshape(S_total, 1, F))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(m_tiles, S),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, F), lambda m, g, *_: (m, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, tk, tf), w.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((tm, 2 * tf if packed else tf), jnp.float32),
        ],
    )
    flops = 2 * T * D * F  # upper bound; per-group masking reduces it
    wbytes = S * D * (F // 2 if packed else F)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, F), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=T * D * 2 + wbytes, transcendentals=0
        ),
        interpret=interpret,
    )(*inputs)


def _next_multiple(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def pack_tiled(w: jax.Array, tf: int = 0) -> jax.Array:
    """[S, D, F] → DMA-native [S, F//tf, D, tf] (each (group, f-tile) slab
    is one contiguous burst). One-time transform at pool build / ingest."""
    S, D, F = w.shape
    if tf == 0:
        tf = _largest_divisor_leq(F, 512)
    return jnp.transpose(w.reshape(S, D, F // tf, tf), (0, 2, 1, 3))


# --------------------------------------------------------------------------
# Grouped-FFN built on gmm (pallas impl for ops.moe.grouped_ffn)
# --------------------------------------------------------------------------

def gffn_pallas(x, expert_ids, combine_weights, expert_to_slot, weights,
                activation, biases=None, interpret=False):
    """Pallas grouped FFN: sort → gate/up gmm → activation → down gmm →
    weighted scatter-combine. Signature matches ops.moe._gffn_ragged.

    '<role>4' split-nibble int4 weights run NATIVELY: the kernel DMAs the
    packed slabs (half the HBM bytes of int8) and sign-extends the nibbles
    in VMEM — no whole-slot-array unpack materializes. A packed 'gateup4'
    falls out for free: its low nibbles ARE the gate columns and its high
    nibbles the up columns, so one packed gmm emits [gate | up]."""
    from moe_infinity_tpu.ops.moe import _activate

    T, D = x.shape
    K = expert_ids.shape[1]
    S = next(
        weights[k].shape[0]
        for k in ("gateup4", "gateup", "gate4", "gate")
        if k in weights
    )
    compute_dtype = x.dtype

    slot_ids = expert_to_slot[expert_ids]  # [T, K]
    flat_slots = slot_ids.reshape(-1)
    order = jnp.argsort(flat_slots)
    inv_token = order // K
    xs = x[inv_token]
    # Compact the grid to ACTIVE groups: at most T*K distinct slots route,
    # so the kernel's group axis is min(S, T*K) instead of the whole arena
    # — on the offload decode path S is the arena size (hundreds..
    # thousands of slots) while T*K is ~32-64, and per-grid-step overhead
    # (scale-block copies, grid bookkeeping) made the block program cost
    # scale with SLOTS, not routed work (round-5 chip finding: the
    # switch-servable program cost ~550 ms/program and grew when slots
    # did). jnp.unique pads with fill_value at the END with count 0, so
    # cumsum(group_sizes) still matches the sorted row order; padded
    # groups do no work and duplicate slot 0's (harmless) scale block.
    G = min(S, flat_slots.shape[0])
    if G < S:
        group_ids, group_sizes = jnp.unique(
            flat_slots, size=G, fill_value=0, return_counts=True
        )
        group_ids = group_ids.astype(jnp.int32)
        group_sizes = group_sizes.astype(jnp.int32)
    else:
        group_ids = None
        group_sizes = jnp.bincount(flat_slots, length=S).astype(jnp.int32)

    def run(role, xin):
        p = role + "4" in weights
        return gmm(
            xin, weights[role + "4"] if p else weights[role], group_sizes,
            weights.get(role + "_scale"), group_ids=group_ids,
            num_groups=G if G < S else 0,
            out_dtype=jnp.float32, interpret=interpret, packed=p,
        )

    if "gateup4" in weights or "gateup" in weights:
        hcat = run("gateup", xs)
        F = hcat.shape[-1] // 2
        h = hcat[:, :F]
        h_up = hcat[:, F:]
        if biases is not None and "gate_bias" in biases:
            h = h + biases["gate_bias"][flat_slots[order]]
        h = _activate(h, h_up, activation)
    else:
        h = run("gate", xs)
        if biases is not None and "gate_bias" in biases:
            h = h + biases["gate_bias"][flat_slots[order]]
        if "up" in weights or "up4" in weights:
            h_up = run("up", xs)
            h = _activate(h, h_up, activation)
        else:
            h = _activate(h, None, activation)

    out = run("down", h.astype(compute_dtype))
    if biases is not None and "down_bias" in biases:
        out = out + biases["down_bias"][flat_slots[order]]

    cw = combine_weights.reshape(-1)[order]
    out = out * cw[:, None]
    combined = jnp.zeros((T, D), dtype=jnp.float32).at[inv_token].add(out)
    return combined.astype(compute_dtype)
