"""Grok-1 — decoder-only MoE with norm-sandwich blocks.

Behavioral spec from the reference's vendored Grok-1 modeling
(/root/reference/moe_infinity/models/modeling_grok/modeling_grok1.py:
MultiHeadAttention:252, MoeBlock:362, DecoderLayer:436): llama rope GQA
attention with unscaled q·k times `attn_output_multiplier` followed by a
`max_attn_val * tanh(x / max_attn_val)` softcap; four RMS norms per layer
(pre/post attention, pre/post MoE, each inside the residual); top-2 router
= top-k of softmax with NO renormalization; GELU-gated experts
(linear * linear_v -> linear_1); embeddings and logits scaled by
`embedding_multiplier_scale` / `output_multiplier_scale`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from moe_infinity_tpu.models.layers import (
    KVCache,
    apply_rope,
    attend,
    linear,
    rms_norm,
    rope_cos_sin,
)
from moe_infinity_tpu.ops.moe import grouped_ffn, topk_router


@dataclass(frozen=True)
class GrokSpec:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    num_experts: int
    top_k: int
    rms_eps: float
    attn_output_multiplier: float
    max_attn_value: float
    embedding_multiplier_scale: float
    output_multiplier_scale: float

    @classmethod
    def from_hf(cls, config) -> "GrokSpec":
        return cls(
            vocab_size=config.vocab_size,
            hidden_size=config.hidden_size,
            intermediate_size=config.intermediate_size,
            num_layers=config.num_hidden_layers,
            num_heads=config.num_attention_heads,
            num_kv_heads=config.num_key_value_heads,
            head_dim=config.hidden_size // config.num_attention_heads,
            num_experts=config.num_experts,
            top_k=config.num_experts_per_tok,
            rms_eps=config.rms_norm_eps,
            attn_output_multiplier=config.attn_output_multiplier,
            max_attn_value=config.max_attn_value,
            embedding_multiplier_scale=config.embedding_multiplier_scale,
            output_multiplier_scale=config.output_multiplier_scale,
        )


class GrokModel:
    arch = "grok"

    def __init__(self, spec: GrokSpec, compute_dtype=jnp.float32, mesh=None):
        self.spec = spec
        self.dtype = compute_dtype
        self.mesh = mesh

    def load_params(self, dense, device_put=jax.device_put) -> Dict[str, Any]:
        s = self.spec

        def get(name, dt=None):
            a = jnp.asarray(dense.get(name))
            if dt is None:
                dt = self.dtype if a.ndim >= 2 else jnp.float32
            return device_put(a.astype(dt))

        layers = []
        for i in range(s.num_layers):
            p = f"model.layers.{i}."
            layers.append(
                {
                    "pre_attn": get(p + "pre_attn_norm.scale"),
                    "post_attn": get(p + "post_attn_norm.scale"),
                    "pre_moe": get(p + "pre_moe_norm.scale"),
                    "post_moe": get(p + "post_moe_norm.scale"),
                    "q": get(p + "attn.q_proj.weight"),
                    "k": get(p + "attn.k_proj.weight"),
                    "v": get(p + "attn.v_proj.weight"),
                    "o": get(p + "attn.o_proj.weight"),
                    "router": get(p + "moe_block.gate.weight", jnp.float32),
                }
            )
        params = {
            "embed": get("model.embed_tokens.weight"),
            "final_norm": get("model.norm.scale"),
            "layers": layers,
        }
        if "lm_head.weight" in dense:
            params["lm_head"] = get("lm_head.weight")
        return params

    def init_cache(self, batch: int, max_len: int) -> List[KVCache]:
        s = self.spec
        return [
            KVCache.empty(batch, max_len, s.num_kv_heads, s.head_dim, self.dtype)
            for _ in range(s.num_layers)
        ]

    def init_random(self, key, *, expert_dtype=None):
        """Random params + resident expert tree (tests/dryruns)."""
        s = self.spec
        expert_dtype = expert_dtype or self.dtype
        keys = jax.random.split(key, 2 + s.num_layers)

        def mat(k, shape, dt, scale=0.02):
            return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)

        hd, kvd = s.num_heads * s.head_dim, s.num_kv_heads * s.head_dim
        layers, experts = [], []
        for i in range(s.num_layers):
            ks = jax.random.split(keys[2 + i], 8)
            layers.append({
                "pre_attn": jnp.ones(s.hidden_size, jnp.float32),
                "post_attn": jnp.ones(s.hidden_size, jnp.float32),
                "pre_moe": jnp.ones(s.hidden_size, jnp.float32),
                "post_moe": jnp.ones(s.hidden_size, jnp.float32),
                "q": mat(ks[0], (hd, s.hidden_size), self.dtype),
                "k": mat(ks[1], (kvd, s.hidden_size), self.dtype),
                "v": mat(ks[2], (kvd, s.hidden_size), self.dtype),
                "o": mat(ks[3], (s.hidden_size, hd), self.dtype),
                "router": mat(ks[4], (s.num_experts, s.hidden_size), jnp.float32),
            })
            experts.append({
                "gate": mat(ks[5], (s.num_experts, s.hidden_size, s.intermediate_size), expert_dtype),
                "up": mat(ks[6], (s.num_experts, s.hidden_size, s.intermediate_size), expert_dtype),
                "down": mat(ks[7], (s.num_experts, s.intermediate_size, s.hidden_size), expert_dtype),
            })
        params = {
            "embed": mat(keys[0], (s.vocab_size, s.hidden_size), self.dtype),
            "final_norm": jnp.ones(s.hidden_size, jnp.float32),
            "layers": layers,
        }
        return params, {
            "layers": experts,
            "slot_map": jnp.arange(s.num_experts, dtype=jnp.int32),
        }

    def embed(self, params, tokens: jax.Array) -> jax.Array:
        return (
            params["embed"][tokens].astype(self.dtype)
            * self.spec.embedding_multiplier_scale
        )

    def moe_layer_index(self, layer_idx: int) -> Optional[int]:
        return layer_idx

    def pre_moe(self, pl, x, kv: KVCache, positions, kv_len,
                pad_offsets=None, rope_positions=None, key_valid=None):
        """rope_positions/key_valid give per-row timelines for continuous
        batching with chunked prefill (see models/mixtral.py attn_block)."""
        s = self.spec
        B, T, D = x.shape
        h = rms_norm(x, pl["pre_attn"], s.rms_eps)
        q = linear(h, pl["q"]).reshape(B, T, s.num_heads, s.head_dim)
        k = linear(h, pl["k"]).reshape(B, T, s.num_kv_heads, s.head_dim)
        v = linear(h, pl["v"]).reshape(B, T, s.num_kv_heads, s.head_dim)
        rope_pos = positions
        pad_mask = None
        if rope_positions is not None:
            rope_pos = rope_positions
            pad_mask = key_valid
        elif pad_offsets is not None:
            rope_pos = jnp.maximum(positions - pad_offsets[:, None], 0)
            cols = jnp.arange(kv.k.shape[1], dtype=jnp.int32)[None, :]
            pad_mask = cols >= pad_offsets[:, None]
        cos, sin = rope_cos_sin(rope_pos, s.head_dim, 10000.0)
        q, k = apply_rope(q, k, cos, sin)
        kv = kv.update(k, v, kv_len)
        a = attend(
            q, kv.k, kv.v, positions, kv_len + T,
            scale=s.attn_output_multiplier,
            logit_softcap=s.max_attn_value,
            pad_mask=pad_mask,
        )
        a = linear(a.reshape(B, T, -1), pl["o"])
        x = x + rms_norm(a, pl["post_attn"], s.rms_eps)
        h = rms_norm(x, pl["pre_moe"], s.rms_eps)
        logits = linear(h.astype(jnp.float32), pl["router"])
        cw, ids, _ = topk_router(
            logits.reshape(B * T, -1), s.top_k, normalize=False
        )
        return x, h, cw.reshape(B, T, -1), ids.reshape(B, T, -1), kv

    def apply_moe(self, pl, x, h, cw, ids, weights, slot_map, biases, impl):
        s = self.spec
        B, T, D = h.shape
        K = ids.shape[-1]
        if self.mesh is not None and self.mesh.shape.get("expert", 1) > 1:
            from moe_infinity_tpu.ops.moe import grouped_ffn_ep

            y = grouped_ffn_ep(
                h.reshape(B * T, D), ids.reshape(B * T, K),
                cw.reshape(B * T, K).astype(jnp.float32), slot_map, weights,
                "gelu", mesh=self.mesh, biases=biases, impl=impl,
            )
        else:
            y = grouped_ffn(
                h.reshape(B * T, D), ids.reshape(B * T, K),
                cw.reshape(B * T, K).astype(jnp.float32), slot_map, weights,
                "gelu", biases=biases, impl=impl,
            )
        return x + rms_norm(y.reshape(B, T, D), pl["post_moe"], s.rms_eps)

    def head(self, params, x: jax.Array) -> jax.Array:
        s = self.spec
        h = rms_norm(x, params["final_norm"], s.rms_eps)
        w = params.get("lm_head", params["embed"])
        return (
            linear(h.astype(jnp.float32), w.astype(jnp.float32))
            * s.output_multiplier_scale
        )

    def forward(
        self, params, experts, tokens, positions, kv_caches, kv_len,
        *, for_layer, impl: str = "ragged", pad_offsets=None,
        rope_positions=None, key_valid=None,
    ):
        s = self.spec
        x = self.embed(params, tokens)
        new_kvs, trace_ids, trace_w = [], [], []
        for li in range(s.num_layers):
            pl = params["layers"][li]
            x, h, cw, ids, kv = self.pre_moe(
                pl, x, kv_caches[li], positions, kv_len,
                pad_offsets, rope_positions, key_valid,
            )
            w, slot_map, biases = for_layer(experts, li)
            x = self.apply_moe(pl, x, h, cw, ids, w, slot_map, biases, impl)
            new_kvs.append(kv)
            trace_ids.append(ids)
            trace_w.append(cw)
        logits = self.head(params, x)
        return logits, new_kvs, (jnp.stack(trace_ids), jnp.stack(trace_w))
