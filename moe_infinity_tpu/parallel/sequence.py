"""Sequence-parallel (long-context) prefill.

Beyond-reference capability: the reference has no sequence/context
parallelism (SURVEY.md §5 "Long-context: absent"); prompts are bounded by
one device's activation memory. Here the prefill tokens are sharded over
the mesh's `seq` axis: every device embeds and runs the full layer stack
on its 1/s slice of the sequence, attention crosses slices via the ring
primitive (ops/ring_attention.py), and the MoE block runs on local tokens
with replicated expert weights — activation memory scales 1/s with the
ring size, so an s-device ring prefills an s-times-longer prompt.

One jitted SPMD program per shape: shard_map over the whole layer stack;
XLA schedules the ring ppermutes to overlap block compute. Decode then
continues on the standard path: `sp_prefill` returns per-layer K/V for the
whole prompt (time-sharded), which `caches_from_sp` scatters into regular
decode KV caches.

Scope: models with the llama-style attention layout (q/k/v/o + rope +
rms_norm) — the Mixtral family — and MLA models (DeepSeek V2/V3), whose
absorbed-latent attention reduces to the SAME ring primitive: logits
q·k = [q_lat | q_pe]·[c | k_pe] and values = c, so the latent cache
itself rides the ring (10.7× fewer ring bytes than rotating
materialized K/V heads).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from moe_infinity_tpu.models.layers import (
    KVCache,
    apply_rope,
    linear,
    rms_norm,
    rope_cos_sin,
)
from moe_infinity_tpu.ops.moe import grouped_ffn
from moe_infinity_tpu.ops.ring_attention import ring_attention
from moe_infinity_tpu.parallel.mesh import SEQ


def sp_prefill(
    model,
    params: Dict[str, Any],
    experts: Dict[str, Any],
    tokens: jax.Array,  # [B, T], T % mesh.shape[seq] == 0
    mesh,
    *,
    for_layer,
    impl: str = "gather",
    seq_axis: str = SEQ,
) -> Tuple[jax.Array, List[KVCache]]:
    """Full-model prefill with the sequence sharded over `seq_axis`.
    Returns (logits [B, T, V] f32, per-layer KVCache with k/v
    [B, T, Hkv, Dh]) — both sharded on the time axis."""
    s = mesh.shape[seq_axis]
    B, T = tokens.shape
    if T % s:
        raise ValueError(f"prompt length {T} not divisible by seq={s}")
    spec = model.spec

    is_mla = hasattr(spec, "kv_lora_rank")

    def _moe_ffn(pl, hn, mli, experts):
        cw, ids = model.route(pl, hn)
        w, slot_map, biases = for_layer(experts, mli)
        Bq, Tl, D = hn.shape
        K = ids.shape[-1]
        y = grouped_ffn(
            hn.reshape(Bq * Tl, D),
            ids.reshape(Bq * Tl, K),
            cw.reshape(Bq * Tl, K).astype(jnp.float32),
            slot_map,
            w,
            "silu",
            biases=biases,
            impl=impl,
        ).reshape(Bq, Tl, D)
        if getattr(spec, "n_shared_experts", 0):
            y = y + model._dense_mlp(
                hn, pl["shared_gate"], pl["shared_up"], pl["shared_down"]
            )
        return y

    def _llama_layer(pl, x, positions):
        h = rms_norm(x, pl["input_norm"], spec.rms_eps)
        q = linear(h, pl["q"]).reshape(B, -1, spec.num_heads, spec.head_dim)
        k = linear(h, pl["k"]).reshape(B, -1, spec.num_kv_heads, spec.head_dim)
        v = linear(h, pl["v"]).reshape(B, -1, spec.num_kv_heads, spec.head_dim)
        cos, sin = rope_cos_sin(positions, spec.head_dim, spec.rope_theta)
        q, k = apply_rope(q, k, cos, sin)
        attn = ring_attention(
            q, k, v, axis_name=seq_axis, axis_size=s, causal=True
        )
        Tl = x.shape[1]
        x = x + linear(attn.reshape(B, Tl, -1), pl["o"])
        return x, k.astype(model.dtype), v.astype(model.dtype)

    def _mla_layer(pl, x, positions):
        """Absorbed-MLA attention over the latent ring (mirrors
        models/deepseek_v2.py attn_block, unfolded path): the ring carries
        [c | k_pe] as keys and c as values."""
        from moe_infinity_tpu.models.deepseek_v2 import rope_interleaved

        Tl = x.shape[1]
        H = spec.num_heads
        h = rms_norm(x, pl["input_norm"], spec.rms_eps)
        if spec.q_lora_rank is None:
            q = linear(h, pl["q"])
        else:
            q = linear(
                rms_norm(linear(h, pl["q_a"]), pl["q_a_norm"], spec.rms_eps),
                pl["q_b"],
            )
        q = q.reshape(B, Tl, H, spec.qk_head_dim)
        q_nope = q[..., : spec.qk_nope_head_dim]
        q_pe = q[..., spec.qk_nope_head_dim :]
        ckv = linear(h, pl["kv_a"])
        c = rms_norm(ckv[..., : spec.kv_lora_rank], pl["kv_a_norm"], spec.rms_eps)
        k_pe = ckv[..., spec.kv_lora_rank :][:, :, None, :]
        cos, sin = model._rope_tables(positions)
        q_pe = rope_interleaved(q_pe, cos, sin)
        k_pe = rope_interleaved(k_pe, cos, sin)
        q_lat = jnp.einsum(
            "bthd,hdr->bthr", q_nope.astype(jnp.float32),
            pl["w_uk"].astype(jnp.float32),
        )
        scale = spec.qk_head_dim ** -0.5
        q_ring = jnp.concatenate(
            [q_lat, q_pe.astype(jnp.float32)], axis=-1
        )
        k_ring = jnp.concatenate(
            [c.astype(jnp.float32), k_pe[:, :, 0, :].astype(jnp.float32)],
            axis=-1,
        )[:, :, None, :]
        v_ring = c.astype(jnp.float32)[:, :, None, :]
        out_lat = ring_attention(
            q_ring, k_ring, v_ring,
            axis_name=seq_axis, axis_size=s, causal=True, scale=scale,
        )  # [B, Tl, H, R]
        out = jnp.einsum(
            "bthr,hdr->bthd", out_lat, pl["w_uv"].astype(jnp.float32)
        )
        out = linear(
            out.reshape(B, Tl, H * spec.v_head_dim).astype(model.dtype),
            pl["o"],
        )
        # decode caches hold (c, k_pe) — the latent IS the cache
        return x + out, c[:, :, None, :].astype(model.dtype), k_pe.astype(
            model.dtype
        )

    def local_fn(params, experts, tokens_loc):
        idx = jax.lax.axis_index(seq_axis)
        Tl = tokens_loc.shape[1]
        positions = jnp.broadcast_to(
            idx * Tl + jnp.arange(Tl, dtype=jnp.int32), (B, Tl)
        )
        x = model.embed(params, tokens_loc)
        ks, vs = [], []
        for li in range(spec.num_layers):
            pl = params["layers"][li]
            layer = _mla_layer if is_mla else _llama_layer
            x, k, v = layer(pl, x, positions)
            hn = rms_norm(x, pl["post_norm"], spec.rms_eps)
            mli = model.moe_layer_index(li)
            if mli is None:  # DeepSeek first_k_dense_replace layers
                x = x + model._dense_mlp(
                    hn, pl["mlp_gate"], pl["mlp_up"], pl["mlp_down"]
                )
            else:
                x = x + _moe_ffn(pl, hn, mli, experts)
            ks.append(k)
            vs.append(v)
        logits = model.head(params, x)
        return logits, jnp.stack(ks), jnp.stack(vs)

    rep = P()
    t_spec = P(None, seq_axis)
    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(rep, rep, t_spec),
        out_specs=(
            P(None, seq_axis, None),
            P(None, None, seq_axis, None, None),
            P(None, None, seq_axis, None, None),
        ),
        check_vma=False,
    )
    logits, ks, vs = jax.jit(fn)(params, experts, tokens)
    kvs = [KVCache(ks[li], vs[li]) for li in range(spec.num_layers)]
    return logits, kvs


def caches_from_sp(
    sp_kvs: List[KVCache], max_len: int, mesh=None
) -> List[KVCache]:
    """Scatter sequence-parallel prefill K/V ([B, T, ...]) into standard
    decode caches ([B, max_len, ...], zero-padded) so generation continues
    on the regular decode path with kv_len = T."""
    out = []
    for c in sp_kvs:
        B, T = c.k.shape[0], c.k.shape[1]
        if T > max_len:
            raise ValueError(f"prefill length {T} exceeds cache {max_len}")
        pad = [(0, 0), (0, max_len - T), (0, 0), (0, 0)]
        k = jnp.pad(c.k, pad)
        v = jnp.pad(c.v, pad)
        if mesh is not None:
            rep = NamedSharding(mesh, P())
            k, v = jax.device_put(k, rep), jax.device_put(v, rep)
        out.append(KVCache(k, v))
    return out
