"""Snowflake Arctic — dense+MoE hybrid with parallel attention/MLP residual.

Behavioral spec from the reference's vendored modeling
(/root/reference/moe_infinity/models/modeling_arctic/modeling_arctic.py:
ArcticMoE:1104, ArcticDecoderLayer:1260): Mixtral-style GQA attention
(scaled, llama rope); on MoE layers with `parallel_attn_mlp_res` the MoE
branch reads the **pre-attention** input while a dense residual MLP reads
the post-attention stream:

    a   = x + attn(ln_in(x))
    rr  = a + residual_mlp(ln_res(a))
    out = rr + moe(ln_post(x))          # note: ln_post applied to x, not a

Router is Mixtral softmax top-k (renormalized when k > 1); experts are
silu-gated w1/w3/w2. Layers where (i+1) % moe_layer_frequency != 0 use a
dense ArcticMLP instead. (The reference's own runtime Arctic path is
incomplete — its Sync block returns zeros, SURVEY.md §2.2 — ours is
complete and oracle-checked against the vendored modeling.)
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
class ArcticSpec:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    num_experts: int
    top_k: int
    moe_layer_frequency: int
    parallel_attn_mlp_res: bool
    rms_eps: float
    rope_theta: float

    @classmethod
    def from_hf(cls, config) -> "ArcticSpec":
        return cls(
            vocab_size=config.vocab_size,
            hidden_size=config.hidden_size,
            intermediate_size=config.intermediate_size,
            num_layers=config.num_hidden_layers,
            num_heads=config.num_attention_heads,
            num_kv_heads=config.num_key_value_heads,
            head_dim=config.hidden_size // config.num_attention_heads,
            num_experts=config.num_local_experts,
            top_k=config.num_experts_per_tok,
            moe_layer_frequency=getattr(config, "moe_layer_frequency", 1),
            parallel_attn_mlp_res=getattr(config, "parallel_attn_mlp_res", False),
            rms_eps=config.rms_norm_eps,
            rope_theta=getattr(config, "rope_theta", 1e6),
        )

    def is_moe(self, layer: int) -> bool:
        return (layer + 1) % self.moe_layer_frequency == 0


class ArcticModel:
    arch = "arctic"

    def __init__(self, spec: ArcticSpec, compute_dtype=jnp.float32, mesh=None):
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
            pl = {
                "input_norm": get(p + "input_layernorm.weight"),
                "post_norm": get(p + "post_attention_layernorm.weight"),
                "q": get(p + "self_attn.q_proj.weight"),
                "k": get(p + "self_attn.k_proj.weight"),
                "v": get(p + "self_attn.v_proj.weight"),
                "o": get(p + "self_attn.o_proj.weight"),
            }
            if s.is_moe(i):
                pl["router"] = get(p + "block_sparse_moe.gate.weight", jnp.float32)
                if s.parallel_attn_mlp_res:
                    pl["res_norm"] = get(p + "residual_layernorm.weight")
                    pl["res_w1"] = get(p + "residual_mlp.w1.weight")
                    pl["res_w2"] = get(p + "residual_mlp.w2.weight")
                    pl["res_w3"] = get(p + "residual_mlp.w3.weight")
            else:
                pl["mlp_w1"] = get(p + "block_sparse_moe.mlp.w1.weight")
                pl["mlp_w2"] = get(p + "block_sparse_moe.mlp.w2.weight")
                pl["mlp_w3"] = get(p + "block_sparse_moe.mlp.w3.weight")
            layers.append(pl)
        params = {
            "embed": get("model.embed_tokens.weight"),
            "final_norm": get("model.norm.weight"),
            "layers": layers,
        }
        if "lm_head.weight" in dense:
            params["lm_head"] = get("lm_head.weight")
        return params

    def init_random(self, key, *, expert_dtype=None):
        """Random params + resident expert tree (tests/dryruns)."""
        s = self.spec
        expert_dtype = expert_dtype or self.dtype
        keys = jax.random.split(key, 2 + s.num_layers)

        def mat(k, shape, dt, scale=0.02):
            return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)

        hd, kvd = s.num_heads * s.head_dim, s.num_kv_heads * s.head_dim
        D, F = s.hidden_size, s.intermediate_size
        layers, experts = [], []
        for i in range(s.num_layers):
            ks = jax.random.split(keys[2 + i], 12)
            pl = {
                "input_norm": jnp.ones(D, jnp.float32),
                "post_norm": jnp.ones(D, jnp.float32),
                "q": mat(ks[0], (hd, D), self.dtype),
                "k": mat(ks[1], (kvd, D), self.dtype),
                "v": mat(ks[2], (kvd, D), self.dtype),
                "o": mat(ks[3], (D, hd), self.dtype),
            }
            if s.is_moe(i):
                pl["router"] = mat(ks[4], (s.num_experts, D), jnp.float32)
                if s.parallel_attn_mlp_res:
                    pl["res_norm"] = jnp.ones(D, jnp.float32)
                    pl["res_w1"] = mat(ks[5], (F, D), self.dtype)
                    pl["res_w2"] = mat(ks[6], (D, F), self.dtype)
                    pl["res_w3"] = mat(ks[7], (F, D), self.dtype)
                experts.append({
                    "gate": mat(ks[9], (s.num_experts, D, F), expert_dtype),
                    "up": mat(ks[10], (s.num_experts, D, F), expert_dtype),
                    "down": mat(ks[11], (s.num_experts, F, D), expert_dtype),
                })
            else:
                pl["mlp_w1"] = mat(ks[5], (F, D), self.dtype)
                pl["mlp_w2"] = mat(ks[6], (D, F), self.dtype)
                pl["mlp_w3"] = mat(ks[7], (F, D), self.dtype)
            layers.append(pl)
        params = {
            "embed": mat(keys[0], (s.vocab_size, D), self.dtype),
            "final_norm": jnp.ones(D, jnp.float32),
            "layers": layers,
        }
        return params, {
            "layers": experts,
            "slot_map": jnp.arange(s.num_experts, dtype=jnp.int32),
        }

    def init_cache(self, batch: int, max_len: int) -> List[KVCache]:
        s = self.spec
        return [
            KVCache.empty(batch, max_len, s.num_kv_heads, s.head_dim, self.dtype)
            for _ in range(s.num_layers)
        ]

    def embed(self, params, tokens):
        return params["embed"][tokens].astype(self.dtype)

    def moe_layer_index(self, layer_idx: int) -> Optional[int]:
        if not self.spec.is_moe(layer_idx):
            return None
        return (layer_idx + 1) // self.spec.moe_layer_frequency - 1

    def _silu_mlp(self, x, w1, w2, w3):
        return linear(jax.nn.silu(linear(x, w1)) * linear(x, w3), w2)

    def _attn(self, pl, x, kv, positions, kv_len,
              pad_offsets=None, rope_positions=None, key_valid=None):
        s = self.spec
        B, T, D = x.shape
        h = rms_norm(x, pl["input_norm"], s.rms_eps)
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
        cos, sin = rope_cos_sin(rope_pos, s.head_dim, s.rope_theta)
        q, k = apply_rope(q, k, cos, sin)
        kv = kv.update(k, v, kv_len)
        a = attend(q, kv.k, kv.v, positions, kv_len + T, pad_mask=pad_mask)
        return x + linear(a.reshape(B, T, -1), pl["o"]), kv

    def dense_layer(self, pl, x, kv, positions, kv_len,
                    pad_offsets=None, rope_positions=None, key_valid=None):
        s = self.spec
        x0 = x
        x, kv = self._attn(pl, x, kv, positions, kv_len,
                           pad_offsets, rope_positions, key_valid)
        h = rms_norm(x, pl["post_norm"], s.rms_eps)
        return x + self._silu_mlp(h, pl["mlp_w1"], pl["mlp_w2"], pl["mlp_w3"]), kv

    def pre_moe(self, pl, x, kv, positions, kv_len,
                pad_offsets=None, rope_positions=None, key_valid=None):
        """Returns (x_ready_for_moe_residual, h_moe_input, cw, ids, kv).
        With parallel_attn_mlp_res the MoE input is post_norm(x_pre_attn)
        and the residual stream already includes the dense residual MLP."""
        s = self.spec
        B, T, D = x.shape
        x_pre = x
        x, kv = self._attn(pl, x, kv, positions, kv_len,
                           pad_offsets, rope_positions, key_valid)
        if s.parallel_attn_mlp_res:
            hr = rms_norm(x, pl["res_norm"], s.rms_eps)
            x = x + self._silu_mlp(hr, pl["res_w1"], pl["res_w2"], pl["res_w3"])
            h = rms_norm(x_pre, pl["post_norm"], s.rms_eps)
        else:
            h = rms_norm(x, pl["post_norm"], s.rms_eps)
        logits = linear(h.astype(jnp.float32), pl["router"])
        cw, ids, _ = topk_router(
            logits.reshape(B * T, -1), s.top_k, normalize=(s.top_k > 1)
        )
        return x, h, cw.reshape(B, T, -1), ids.reshape(B, T, -1), kv

    def apply_moe(self, pl, x, h, cw, ids, weights, slot_map, biases, impl):
        B, T, D = h.shape
        K = ids.shape[-1]
        if self.mesh is not None and self.mesh.shape.get("expert", 1) > 1:
            from moe_infinity_tpu.ops.moe import grouped_ffn_ep

            y = grouped_ffn_ep(
                h.reshape(B * T, D), ids.reshape(B * T, K),
                cw.reshape(B * T, K).astype(jnp.float32), slot_map, weights,
                "silu", mesh=self.mesh, biases=biases, impl=impl,
            )
        else:
            y = grouped_ffn(
                h.reshape(B * T, D), ids.reshape(B * T, K),
                cw.reshape(B * T, K).astype(jnp.float32), slot_map, weights,
                "silu", biases=biases, impl=impl,
            )
        return x + y.reshape(B, T, D)

    def head(self, params, x):
        h = rms_norm(x, params["final_norm"], self.spec.rms_eps)
        w = params.get("lm_head", params["embed"])
        return linear(h.astype(jnp.float32), w.astype(jnp.float32))

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
            mli = self.moe_layer_index(li)
            if mli is None:
                x, kv = self.dense_layer(
                    pl, x, kv_caches[li], positions, kv_len,
                    pad_offsets, rope_positions, key_valid,
                )
            else:
                x, h, cw, ids, kv = self.pre_moe(
                    pl, x, kv_caches[li], positions, kv_len,
                    pad_offsets, rope_positions, key_valid,
                )
                w, slot_map, biases = for_layer(experts, mli)
                x = self.apply_moe(pl, x, h, cw, ids, w, slot_map, biases, impl)
                trace_ids.append(ids)
                trace_w.append(cw)
            new_kvs.append(kv)
        logits = self.head(params, x)
        return logits, new_kvs, (jnp.stack(trace_ids), jnp.stack(trace_w))
