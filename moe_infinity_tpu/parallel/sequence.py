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
rms_norm) — the Mixtral family. MLA models (DeepSeek) compress the KV
down to latents; a latent-ring variant is future work.
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
            h = rms_norm(x, pl["input_norm"], spec.rms_eps)
            q = linear(h, pl["q"]).reshape(B, Tl, spec.num_heads, spec.head_dim)
            k = linear(h, pl["k"]).reshape(
                B, Tl, spec.num_kv_heads, spec.head_dim
            )
            v = linear(h, pl["v"]).reshape(
                B, Tl, spec.num_kv_heads, spec.head_dim
            )
            cos, sin = rope_cos_sin(positions, spec.head_dim, spec.rope_theta)
            q, k = apply_rope(q, k, cos, sin)
            attn = ring_attention(
                q, k, v, axis_name=seq_axis, axis_size=s, causal=True
            )
            x = x + linear(attn.reshape(B, Tl, -1), pl["o"])
            hn = rms_norm(x, pl["post_norm"], spec.rms_eps)
            cw, ids = model.route(pl, hn)
            w, slot_map, biases = for_layer(experts, model.moe_layer_index(li))
            K = ids.shape[-1]
            y = grouped_ffn(
                hn.reshape(B * Tl, -1),
                ids.reshape(B * Tl, K),
                cw.reshape(B * Tl, K).astype(jnp.float32),
                slot_map,
                w,
                "silu",
                biases=biases,
                impl=impl,
            )
            x = x + y.reshape(B, Tl, -1)
            ks.append(k.astype(model.dtype))
            vs.append(v.astype(model.dtype))
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
