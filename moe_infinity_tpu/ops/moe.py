"""MoE compute ops: routing and slot-indexed grouped expert FFN.

This is the TPU-native replacement for the reference's C++ ExpertDispatcher
hot path (/root/reference/core/parallel/expert_dispatcher.cpp:111-450): where
the reference spawns per-GPU fetch/exec threads and runs one libtorch FFN per
expert, here the whole layer's expert compute is ONE fused device computation
(sort tokens by expert slot → grouped matmul over the stacked weight arena →
weighted scatter-combine), compiled by XLA / implemented in Pallas.

Weight layout ("compute layout", see common/arch.py):
  gate/up : [S, D, F]   down : [S, F, D]     (S = arena slots or experts)
A per-layer int32 `expert_to_slot[E]` indirection decouples router expert ids
from physical arena slots, so expert residency changes never recompile.

Two interchangeable implementations:
  * 'ragged'  — argsort + jax.lax.ragged_dot (XLA grouped GEMM)
  * 'dense'   — one-hot einsum over all slots (tiny-model reference/tests)
  * 'pallas'  — Pallas grouped kernel with fused dequant (ops/gmm.py)
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# Routing
# --------------------------------------------------------------------------

def topk_router(
    router_logits: jax.Array,  # [T, E] (any float dtype; promoted to f32)
    k: int,
    *,
    pre_softmax: bool = True,
    normalize: bool = False,
    scaling: float = 1.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Generic top-k router. Returns (combine_weights [T,k] f32,
    expert_ids [T,k] i32, full_probs [T,E] f32).

    pre_softmax=True: softmax over all experts, then top-k of probs
    (Switch top-1, Mixtral/NLLB top-2, Grok).
    pre_softmax=False: top-k of raw logits, softmax over the selected k
    (used by some DeepSeek variants via scoring_func handling upstream).
    normalize=True: renormalize the k selected weights to sum to 1 (Mixtral).
    """
    logits = router_logits.astype(jnp.float32)
    if pre_softmax:
        probs = jax.nn.softmax(logits, axis=-1)
        weights, ids = jax.lax.top_k(probs, k)
    else:
        probs = jax.nn.softmax(logits, axis=-1)
        top_logits, ids = jax.lax.top_k(logits, k)
        weights = jax.nn.softmax(top_logits, axis=-1)
    if normalize:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    if scaling != 1.0:
        weights = weights * scaling
    return weights, ids.astype(jnp.int32), probs


# --------------------------------------------------------------------------
# Grouped expert FFN
# --------------------------------------------------------------------------

def _activate(h_gate: jax.Array, h_up: Optional[jax.Array], activation: str) -> jax.Array:
    if activation == "relu":
        a = jax.nn.relu(h_gate)
    elif activation == "gelu":
        a = jax.nn.gelu(h_gate, approximate=False)
    elif activation == "gelu_tanh":
        a = jax.nn.gelu(h_gate, approximate=True)
    elif activation == "silu":
        a = jax.nn.silu(h_gate)
    else:
        raise ValueError(f"unknown activation {activation}")
    return a * h_up if h_up is not None else a


def _dequant(w: jax.Array, scale: Optional[jax.Array], dtype) -> jax.Array:
    """Row-wise dequant: w [S, in, out] x scale [S, out] (jnp fallback path;
    the Pallas kernel fuses this into the matmul)."""
    if scale is None:
        return w.astype(dtype)
    return w.astype(jnp.float32) * scale[:, None, :].astype(jnp.float32)


# --------------------------------------------------------------------------
# int4 packing — two signed nibbles per int8 byte along the OUT axis.
#
# Weight-dict convention: a packed array lives under "<role>4" (e.g.
# "gate4" [S, D, F//2] int8) with its scale under the usual "<role>_scale"
# [S, F]. The reference reaches 4-bit through GPTQ conversion at load
# (/root/reference/moe_infinity/runtime/model_offload.py:452-467); here int4
# is a first-class arena dtype: the gather decode path unpacks AFTER the
# row gather, so routed HBM bytes halve vs int8.
# --------------------------------------------------------------------------

def pack_int4(v: jax.Array) -> jax.Array:
    """Pack int8 values in [-8, 7] SPLIT-wise along the last axis: byte i
    holds channel i in its low nibble and channel i+N/2 in its high nibble
    (N = last-dim size, must be even). Split packing makes unpack a plain
    concat — no interleave relayout on the lane dimension, which matters
    on the op-dispatch-bound decode path."""
    n = v.shape[-1] // 2
    lo = jnp.bitwise_and(v[..., :n].astype(jnp.int8), jnp.int8(0x0F))
    hi = jnp.left_shift(v[..., n:].astype(jnp.int8), 4)
    return jnp.bitwise_or(hi, lo)


def unpack_int4(w8: jax.Array) -> jax.Array:
    """Inverse of pack_int4: int8 [..., P] -> int8 [..., 2P]; low nibbles
    become the first P channels, high nibbles the last P (sign-extended
    via arithmetic shifts)."""
    lo = jnp.right_shift(jnp.left_shift(w8, 4), 4)
    hi = jnp.right_shift(w8, 4)
    return jnp.concatenate([lo, hi], axis=-1)


def _unpack4_weights(weights: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Normalize any '<role>4' packed entries to full int8 '<role>' arrays
    (for impls without a native packed path; the unpack is one fused XLA
    expression, materialized per layer at trace time)."""
    if not any(k.endswith("4") for k in weights):
        return weights
    w = {}
    for k, v in weights.items():
        if k.endswith("4"):
            w[k[:-1]] = unpack_int4(v)
        else:
            w[k] = v
    return w


def _num_slots(weights: Dict[str, jax.Array]) -> int:
    for k in ("gateup", "gateup4", "gate", "gate4"):
        if k in weights:
            return weights[k].shape[0]
    raise KeyError("weight dict has no gate/gateup entry")


def grouped_ffn(
    x: jax.Array,  # [T, D]
    expert_ids: jax.Array,  # [T, K] int32 router choices
    combine_weights: jax.Array,  # [T, K] f32
    expert_to_slot: jax.Array,  # [E] int32 (identity when resident)
    weights: Dict[str, jax.Array],
    activation: str,
    *,
    biases: Optional[Dict[str, jax.Array]] = None,
    impl: str = "ragged",
) -> jax.Array:
    """Apply the routed expert FFN and combine. Returns [T, D] in x.dtype.

    weights keys: 'gate' [S,D,F], optional 'up' [S,D,F], 'down' [S,F,D],
    optional '<key>_scale' [S,out] for quantized arenas.
    biases (NLLB): 'gate_bias' [S,F], 'down_bias' [S,D].
    """
    if hasattr(weights, "rec_row"):
        # StreamSource: gather the routed experts from the pinned tier
        # INSIDE the program (ops/stream.py) — expert_to_slot is unused
        # (the gather builds its own token->scratch mapping)
        from moe_infinity_tpu.ops.stream import gffn_stream

        return gffn_stream(
            x, expert_ids, combine_weights, weights, activation,
            max_unique=weights.max_unique,
            impl=weights.impl or impl,
        )
    # Non-resident slots are -1 (the arena clears evicted rows): mask them
    # to ZERO contribution instead of gathering a stale slot's weights.
    # Resident/per-layer paths route only >= 0 slots, so this folds away;
    # on the SPECULATIVE path it turns a miss into an expert-dropout
    # approximation instead of garbage — deeper layers then route from
    # near-correct activations and the verify/replay loop converges in
    # 1-2 dispatches instead of cascading layer by layer (round-4 chip
    # diagnosis with garbage contributions: mean_step_executions 5.5,
    # accept_at_1 9%, replays re-discovering 3-8 misses each).
    invalid = expert_to_slot[expert_ids] < 0  # [T, K]
    combine_weights = jnp.where(invalid, 0.0, combine_weights)
    expert_to_slot = jnp.maximum(expert_to_slot, 0)
    if impl == "ragged":
        return _gffn_ragged(
            x, expert_ids, combine_weights, expert_to_slot,
            _unpack4_weights(weights), activation, biases,
        )
    if impl == "dense":
        return _gffn_dense(
            x, expert_ids, combine_weights, expert_to_slot,
            _unpack4_weights(weights), activation, biases,
        )
    if impl == "pallas":
        from moe_infinity_tpu.ops.gmm import gffn_pallas

        # the kernel handles '<role>4' packed int4 and fused 'gateup'
        # natively — no whole-array unpack materializes
        return gffn_pallas(
            x, expert_ids, combine_weights, expert_to_slot, weights,
            activation, biases,
        )
    if impl == "gather":
        return _gffn_gather(
            x, expert_ids, combine_weights, expert_to_slot, weights,
            activation, biases,
        )
    raise ValueError(f"unknown grouped_ffn impl {impl!r}")


def _split_gateup(weights: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """View a fused 'gateup' [S, D, 2F] dict as separate gate/up (for impls
    without a fused path); slices are compile-time, no copies at trace."""
    w = dict(weights)
    gu = w.pop("gateup")
    F = gu.shape[-1] // 2
    w["gate"], w["up"] = gu[..., :F], gu[..., F:]
    if "gateup_scale" in w:
        sc = w.pop("gateup_scale")
        w["gate_scale"], w["up_scale"] = sc[..., :F], sc[..., F:]
    return w


def fuse_gateup(weights: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Concatenate gate+up (and their scales) into fused arrays: the gather
    and ragged paths then do ONE gather + ONE matmul for both projections —
    fewer ops on the op-overhead-bound decode path, same FLOPs/bytes."""
    if "gate4" in weights and "gateup4" not in weights:
        # split packing is positional, so fuse by unpack -> concat ->
        # repack (one-time, at load/trace; not on the decode path)
        w = dict(weights)
        w["gateup4"] = pack_int4(
            jnp.concatenate(
                [unpack_int4(w.pop("gate4")), unpack_int4(w.pop("up4"))],
                axis=-1,
            )
        )
        if "gate_scale" in w:
            w["gateup_scale"] = jnp.concatenate(
                [w.pop("gate_scale"), w.pop("up_scale")], axis=-1
            )
        return w
    if "up" not in weights or "gateup" in weights:
        return weights
    w = dict(weights)
    w["gateup"] = jnp.concatenate([w.pop("gate"), w.pop("up")], axis=-1)
    if "gate_scale" in w:
        w["gateup_scale"] = jnp.concatenate(
            [w.pop("gate_scale"), w.pop("up_scale")], axis=-1
        )
    return w


def _gffn_gather(x, expert_ids, combine_weights, expert_to_slot, weights,
                 activation, biases):
    """Decode-path grouped FFN as pure XLA gather + batched matvec: each
    (token, k) row gathers its expert's slab and runs a GEMV; combine is a
    weighted sum over k. Top-k experts are distinct per token, so the
    gather reads exactly the routed experts' bytes (~2x with the gather
    copy). No sorting, no Pallas, no scalar operands — the fastest exact
    path for small token counts."""
    T, D = x.shape
    K = expert_ids.shape[1]
    compute_dtype = x.dtype
    rows = expert_to_slot[expert_ids].reshape(-1)  # [T*K]
    x_rep = x[jnp.arange(T * K, dtype=jnp.int32) // K]  # [TK, D]

    def dq(role):
        if role + "4" in weights:  # packed int4: gather bytes, then unpack
            return unpack_int4(weights[role + "4"][rows]).astype(jnp.bfloat16)
        w = weights[role][rows]
        return w.astype(jnp.bfloat16) if w.dtype == jnp.int8 else w

    if "gateup" in weights or "gateup4" in weights:
        wgu = dq("gateup")
        xb = x_rep.astype(wgu.dtype)
        hcat = jnp.einsum(
            "td,tdf->tf", xb, wgu, preferred_element_type=jnp.float32
        )
        if "gateup_scale" in weights:
            hcat = hcat * weights["gateup_scale"][rows]
        F = hcat.shape[-1] // 2
        h = _activate(hcat[:, :F], hcat[:, F:], activation)
    else:
        wg = dq("gate")
        xb = x_rep.astype(wg.dtype)
        h = jnp.einsum("td,tdf->tf", xb, wg, preferred_element_type=jnp.float32)
        if "gate_scale" in weights:
            h = h * weights["gate_scale"][rows]
        if biases is not None and "gate_bias" in biases:
            h = h + biases["gate_bias"][rows]
        if "up" in weights or "up4" in weights:
            hu = jnp.einsum(
                "td,tdf->tf", xb, dq("up"), preferred_element_type=jnp.float32
            )
            if "up_scale" in weights:
                hu = hu * weights["up_scale"][rows]
            h = _activate(h, hu, activation)
        else:
            h = _activate(h, None, activation)
    out = jnp.einsum(
        "tf,tfd->td", h.astype(compute_dtype), dq("down"),
        preferred_element_type=jnp.float32,
    )
    if "down_scale" in weights:
        out = out * weights["down_scale"][rows]
    if biases is not None and "down_bias" in biases:
        out = out + biases["down_bias"][rows]
    out = out * combine_weights.reshape(-1).astype(jnp.float32)[:, None]
    return out.reshape(T, K, D).sum(axis=1).astype(compute_dtype)


def _gffn_ragged(x, expert_ids, combine_weights, expert_to_slot, weights,
                 activation, biases):
    T, D = x.shape
    K = expert_ids.shape[1]
    S = weights["gateup" if "gateup" in weights else "gate"].shape[0]
    compute_dtype = x.dtype

    slot_ids = expert_to_slot[expert_ids]  # [T, K]
    flat_slots = slot_ids.reshape(-1)  # [T*K]
    order = jnp.argsort(flat_slots)  # stable
    inv_token = order // K  # original token of each sorted row

    xs = x[inv_token]  # [T*K, D] sorted by slot
    group_sizes = jnp.bincount(flat_slots, length=S)

    if "gateup" in weights:
        w_gu = _dequant(
            weights["gateup"], weights.get("gateup_scale"), compute_dtype
        )
        hcat = jax.lax.ragged_dot(
            xs, w_gu.astype(compute_dtype), group_sizes,
            preferred_element_type=jnp.float32,
        )
        F = hcat.shape[-1] // 2
        h = _activate(hcat[:, :F], hcat[:, F:], activation)
    else:
        w_gate = _dequant(
            weights["gate"], weights.get("gate_scale"), compute_dtype
        )
        h = jax.lax.ragged_dot(
            xs, w_gate.astype(compute_dtype), group_sizes,
            preferred_element_type=jnp.float32,
        )
        if biases is not None and "gate_bias" in biases:
            h = h + biases["gate_bias"][flat_slots[order]]
        if "up" in weights:
            w_up = _dequant(weights["up"], weights.get("up_scale"), compute_dtype)
            h_up = jax.lax.ragged_dot(
                xs, w_up.astype(compute_dtype), group_sizes,
                preferred_element_type=jnp.float32,
            )
            h = _activate(h, h_up, activation)
        else:
            h = _activate(h, None, activation)

    w_down = _dequant(weights["down"], weights.get("down_scale"), compute_dtype)
    out = jax.lax.ragged_dot(
        h.astype(compute_dtype), w_down.astype(compute_dtype), group_sizes,
        preferred_element_type=jnp.float32,
    )
    if biases is not None and "down_bias" in biases:
        out = out + biases["down_bias"][flat_slots[order]]

    cw = combine_weights.reshape(-1)[order]  # [T*K]
    out = out * cw[:, None]
    combined = jnp.zeros((T, D), dtype=jnp.float32).at[inv_token].add(out)
    return combined.astype(compute_dtype)


def grouped_ffn_ep(
    x: jax.Array,  # [T, D] tokens (sharded on `data` axis outside)
    expert_ids: jax.Array,  # [T, K]
    combine_weights: jax.Array,  # [T, K]
    expert_to_slot: jax.Array,  # [E] global slot ids, or [dp, E] per-row
    weights: Dict[str, jax.Array],  # stacked arrays sharded on `expert` dim 0
    activation: str,
    *,
    mesh,
    biases: Optional[Dict[str, jax.Array]] = None,
    expert_axis: str = "expert",
    data_axis: str = "data",
    model_axis: str = "model",
    impl: str = "ragged",
) -> jax.Array:
    """Expert-parallel grouped FFN via shard_map over the `expert` mesh axis.

    TPU-native replacement for the reference's cross-device expert dispatch
    (/root/reference/moe_infinity/distributed/expert_executor.py:60-136,
    torch-RPC, dormant): every expert shard sees its data shard's tokens,
    computes the contribution of its local experts (invalid routes masked to
    zero weight), and the shards psum-combine over ICI. No token all-to-all
    is needed at decode batch sizes; the psum *is* the combine.

    DP x EP composition: a 2-D ``expert_to_slot`` ([dp, E], sharded over
    `data`) selects the joint mode — the weight stack's slot dim is then
    sharded over BOTH axes (data-major: global slot (d*ep + c)*S + s lives
    on mesh coordinate (d, c)), each data row carries its OWN expert->slot
    table, and the psum still combines over `expert` only (within the
    row). Every (data, expert) device is an independent cache shard
    serving its own batch slice — host-affinity that weight REPLICATION
    over the data axis (the obvious alternative) would destroy, since
    replicas would have to agree on slot assignment across processes and
    fetch every expert dp times. The reference's multi-GPU dispatch
    (expert_executor.py:49-54) places one replica per GPU with no
    cross-GPU consistency story at all.
    """
    from jax.sharding import PartitionSpec as P

    joint = expert_to_slot.ndim == 2
    w_axes = (data_axis, expert_axis) if joint else expert_axis
    tp = mesh.shape.get(model_axis, 1)

    def _mdim(k: str, ndim: int):
        # d_ff dim sharded over `model` under TP x EP (store/column.py
        # slicing plan; +1 for the leading slot dim)
        if tp == 1:
            return None
        from moe_infinity_tpu.common.arch import TP_MODEL_DIMS

        return TP_MODEL_DIMS.get(k)

    def _wspec(k, v):
        mdim = _mdim(k, v.ndim)
        return P(w_axes, *(
            (model_axis if i == mdim else None) for i in range(1, v.ndim)
        ))

    w_specs = {k: _wspec(k, v) for k, v in weights.items()}
    b_specs = (
        {k: _wspec(k, v) for k, v in biases.items()} if biases else None
    )
    tok_spec = P(data_axis, None)
    row_spec = P(data_axis, None) if joint else P(None)
    ep_size = mesh.shape[expert_axis]

    def local_ffn(x, ids, cw, slot_map, w, b):
        shard = jax.lax.axis_index(expert_axis)
        if joint:
            # flat shard index along the jointly-sharded slot dim
            shard = jax.lax.axis_index(data_axis) * ep_size + shard
            slot_map = slot_map[0]  # this data row's table
        s_local = _num_slots(w)
        slots = slot_map[ids]  # [T, K] global slots
        local = slots - shard * s_local
        valid = (local >= 0) & (local < s_local)
        local_ids = jnp.clip(local, 0, s_local - 1)
        cw_masked = cw * valid.astype(cw.dtype)
        if tp > 1 and b is not None and "down_bias" in b:
            # d_model bias is replicated across TP columns; zero it on
            # columns != 0 so the (expert, model) psum adds it exactly once
            col = jax.lax.axis_index(model_axis)
            b = dict(b)
            b["down_bias"] = jnp.where(col == 0, b["down_bias"], 0.0)
        out = grouped_ffn(
            x,
            local_ids,
            cw_masked,
            jnp.arange(s_local, dtype=jnp.int32),
            w,
            activation,
            biases=b,
            impl=impl,
        )
        # TP columns hold d_ff slices: the model-axis psum reassembles
        # each expert's full FFN output from its column partials
        axes = (expert_axis, model_axis) if tp > 1 else expert_axis
        return jax.lax.psum(out, axes)

    fn = jax.shard_map(
        local_ffn,
        mesh=mesh,
        in_specs=(tok_spec, tok_spec, tok_spec, row_spec, w_specs, b_specs),
        out_specs=tok_spec,
        check_vma=False,
    )
    return fn(x, expert_ids, combine_weights, expert_to_slot, weights, biases)


def _gffn_dense(x, expert_ids, combine_weights, expert_to_slot, weights,
                activation, biases):
    """Reference implementation: computes every slot for every token via
    one-hot masks. O(T*S*F*D) — tests and tiny models only."""
    if "gateup" in weights:
        weights = _split_gateup(weights)
    T, D = x.shape
    S = weights["gate"].shape[0]
    compute_dtype = x.dtype
    slot_ids = expert_to_slot[expert_ids]  # [T, K]
    # per-token per-slot combine weight
    onehot = jax.nn.one_hot(slot_ids, S, dtype=jnp.float32)  # [T, K, S]
    mix = jnp.einsum("tk,tks->ts", combine_weights.astype(jnp.float32), onehot)

    w_gate = _dequant(weights["gate"], weights.get("gate_scale"), compute_dtype)
    h = jnp.einsum(
        "td,sdf->tsf", x.astype(jnp.float32), w_gate.astype(jnp.float32)
    )
    if biases is not None and "gate_bias" in biases:
        h = h + biases["gate_bias"][None, :, :]
    if "up" in weights:
        w_up = _dequant(weights["up"], weights.get("up_scale"), compute_dtype)
        h_up = jnp.einsum(
            "td,sdf->tsf", x.astype(jnp.float32), w_up.astype(jnp.float32)
        )
        h = _activate(h, h_up, activation)
    else:
        h = _activate(h, None, activation)
    w_down = _dequant(weights["down"], weights.get("down_scale"), compute_dtype)
    out = jnp.einsum("tsf,sfd->tsd", h, w_down.astype(jnp.float32))
    if biases is not None and "down_bias" in biases:
        out = out + biases["down_bias"][None, :, :]
    combined = jnp.einsum("tsd,ts->td", out, mix)
    return combined.astype(compute_dtype)
