"""Mixtral (and Mixtral-family) decoder-only MoE model.

Our own JAX definition, provider-agnostic for expert weights — the TPU-native
counterpart of the reference's SyncMixtralSparseMoeBlock swap
(/root/reference/moe_infinity/models/mixtral.py:40-118): HF semantics (top-2
softmax router with renormalization, SiLU-gated experts, GQA attention with
RoPE) but no monkey-patching and one fused grouped-FFN per layer instead of
per-expert module calls.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from moe_infinity_tpu.models.layers import (
    KVCache,
    apply_rope,
    attend_cache,
    linear,
    rms_norm,
    rope_cos_sin,
)
from moe_infinity_tpu.ops.moe import grouped_ffn, grouped_ffn_ep, topk_router


@dataclass(frozen=True)
class MixtralSpec:
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
    rope_theta: float
    tie_embeddings: bool

    @classmethod
    def from_hf(cls, config) -> "MixtralSpec":
        return cls(
            vocab_size=config.vocab_size,
            hidden_size=config.hidden_size,
            intermediate_size=config.intermediate_size,
            num_layers=config.num_hidden_layers,
            num_heads=config.num_attention_heads,
            num_kv_heads=config.num_key_value_heads,
            head_dim=getattr(config, "head_dim", None)
            or config.hidden_size // config.num_attention_heads,
            num_experts=config.num_local_experts,
            top_k=config.num_experts_per_tok,
            rms_eps=config.rms_norm_eps,
            rope_theta=getattr(config, "rope_theta", 1e6),
            tie_embeddings=getattr(config, "tie_word_embeddings", False),
        )


class MixtralModel:
    """Pure-functional forward; params/experts passed explicitly so the same
    instance serves jit'd whole-model and per-layer (offload) paths."""

    arch = "mixtral"

    def __init__(self, spec: MixtralSpec, compute_dtype=jnp.bfloat16, mesh=None):
        self.spec = spec
        self.dtype = compute_dtype
        self.mesh = mesh  # (data, model, expert) Mesh; None = single chip

    # ---- param loading ---------------------------------------------------
    def load_params(self, dense, device_put=jax.device_put) -> Dict[str, Any]:
        """Build the dense param pytree from a DenseArchive (store/blob.py)."""
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
                    "input_norm": get(p + "input_layernorm.weight"),
                    "post_norm": get(p + "post_attention_layernorm.weight"),
                    "q": get(p + "self_attn.q_proj.weight"),
                    "k": get(p + "self_attn.k_proj.weight"),
                    "v": get(p + "self_attn.v_proj.weight"),
                    "o": get(p + "self_attn.o_proj.weight"),
                    "router": get(p + "block_sparse_moe.gate.weight", jnp.float32),
                }
            )
        params = {
            "embed": get("model.embed_tokens.weight"),
            "final_norm": get("model.norm.weight"),
            "layers": layers,
        }
        if not s.tie_embeddings and "lm_head.weight" in dense:
            params["lm_head"] = get("lm_head.weight")
        return params

    def init_random(self, key, *, expert_dtype=None, with_experts=True):
        """Random params + resident expert tree (tests, dryruns, synthetic
        benchmarks — weight values don't change the compute graph).
        with_experts=False skips the expert tree (offload benches use a
        SyntheticStore instead; a full 8x7B expert tree would be ~90GB)."""
        s = self.spec
        expert_dtype = expert_dtype or self.dtype
        n_keys = 4 + s.num_layers
        keys = jax.random.split(key, n_keys)

        def mat(k, shape, dt, scale=0.02):
            return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)

        layers = []
        experts = []
        hd = s.num_heads * s.head_dim
        kvd = s.num_kv_heads * s.head_dim
        for i in range(s.num_layers):
            ks = jax.random.split(keys[4 + i], 8)
            layers.append(
                {
                    "input_norm": jnp.ones(s.hidden_size, jnp.float32),
                    "post_norm": jnp.ones(s.hidden_size, jnp.float32),
                    "q": mat(ks[0], (hd, s.hidden_size), self.dtype),
                    "k": mat(ks[1], (kvd, s.hidden_size), self.dtype),
                    "v": mat(ks[2], (kvd, s.hidden_size), self.dtype),
                    "o": mat(ks[3], (s.hidden_size, hd), self.dtype),
                    "router": mat(ks[4], (s.num_experts, s.hidden_size), jnp.float32),
                }
            )
            if with_experts:
                experts.append(
                    {
                        "gate": mat(ks[5], (s.num_experts, s.hidden_size, s.intermediate_size), expert_dtype),
                        "up": mat(ks[6], (s.num_experts, s.hidden_size, s.intermediate_size), expert_dtype),
                        "down": mat(ks[7], (s.num_experts, s.intermediate_size, s.hidden_size), expert_dtype),
                    }
                )
        params = {
            "embed": mat(keys[0], (s.vocab_size, s.hidden_size), self.dtype),
            "final_norm": jnp.ones(s.hidden_size, jnp.float32),
            "layers": layers,
        }
        if not s.tie_embeddings:
            params["lm_head"] = mat(keys[1], (s.vocab_size, s.hidden_size), self.dtype)
        if not with_experts:
            return params, None
        expert_tree = {
            "layers": experts,
            "slot_map": jnp.arange(s.num_experts, dtype=jnp.int32),
        }
        return params, expert_tree

    # ---- caches ------------------------------------------------------------
    def init_cache(self, batch: int, max_len: int) -> List[KVCache]:
        s = self.spec
        return [
            KVCache.empty(batch, max_len, s.num_kv_heads, s.head_dim, self.dtype)
            for _ in range(s.num_layers)
        ]

    # ---- building blocks (pure; called under jit) --------------------------
    def embed(self, params, tokens: jax.Array) -> jax.Array:
        return params["embed"][tokens].astype(self.dtype)

    def attn_block(
        self, pl, x, kv: KVCache, positions, kv_len, pad_offsets=None,
        rope_positions=None, key_valid=None,
    ) -> Tuple[jax.Array, KVCache]:
        """positions are cache-column positions; with left padding,
        pad_offsets [B] shifts rope to sequence positions and masks the
        padded key columns. For per-row timelines (chunked prefill in the
        continuous batcher), rope_positions [B, T] gives each row's logical
        sequence positions directly and key_valid [B, S] masks hole columns
        (junk K/V written by rows that fed fewer real tokens this step)."""
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
            S = kv.k.shape[1]
            cols = jnp.arange(S, dtype=jnp.int32)[None, :]
            pad_mask = cols >= pad_offsets[:, None]
        cos, sin = rope_cos_sin(rope_pos, s.head_dim, s.rope_theta)
        q, k = apply_rope(q, k, cos, sin)
        kv = kv.update(k, v, kv_len)
        # cache-object dispatch: paged decode reads pool pages in place on TPU
        out = attend_cache(q, kv, positions, kv_len + T, pad_mask=pad_mask)
        out = linear(out.reshape(B, T, -1), pl["o"])
        return x + out, kv

    def route(self, pl, h: jax.Array):
        """h: [B, T, D] post-norm hidden. Returns (combine [B,T,K], ids)."""
        logits = linear(h.astype(jnp.float32), pl["router"])
        B, T, _ = logits.shape
        cw, ids, _ = topk_router(
            logits.reshape(B * T, -1), self.spec.top_k, normalize=True
        )
        return cw.reshape(B, T, -1), ids.reshape(B, T, -1)

    def moe_block(self, h, cw, ids, weights, slot_map, biases, impl):
        B, T, D = h.shape
        K = ids.shape[-1]
        if self.mesh is not None and self.mesh.shape.get("expert", 1) > 1:
            y = grouped_ffn_ep(
                h.reshape(B * T, D),
                ids.reshape(B * T, K),
                cw.reshape(B * T, K).astype(jnp.float32),
                slot_map,
                weights,
                "silu",
                mesh=self.mesh,
                biases=biases,
                impl=impl,
            )
        else:
            y = grouped_ffn(
                h.reshape(B * T, D),
                ids.reshape(B * T, K),
                cw.reshape(B * T, K).astype(jnp.float32),
                slot_map,
                weights,
                "silu",
                biases=biases,
                impl=impl,
            )
        return y.reshape(B, T, D)

    # ---- layer-step protocol (offload engine drives these per layer) -------
    def pre_moe(self, pl, x, kv: KVCache, positions, kv_len, pad_offsets=None,
                rope_positions=None, key_valid=None):
        """Everything before expert compute for one layer: attention,
        post-norm, routing. Returns (x_resid, h_norm, combine, ids, kv)."""
        x, kv = self.attn_block(pl, x, kv, positions, kv_len, pad_offsets,
                                rope_positions, key_valid)
        h = rms_norm(x, pl["post_norm"], self.spec.rms_eps)
        cw, ids = self.route(pl, h)
        return x, h, cw, ids, kv

    def apply_moe(self, pl, x, h, cw, ids, weights, slot_map, biases, impl):
        """Expert compute + residual for one layer (pl carries per-layer
        dense params — used by models with shared experts)."""
        return x + self.moe_block(h, cw, ids, weights, slot_map, biases, impl)

    def head(self, params, x: jax.Array) -> jax.Array:
        h = rms_norm(x, params["final_norm"], self.spec.rms_eps)
        w = params.get("lm_head", params["embed"])
        return linear(h.astype(jnp.float32), w.astype(jnp.float32))

    # moe layer ids are dense here; deepseek overrides with first_k_dense
    def moe_layer_index(self, layer_idx: int) -> Optional[int]:
        return layer_idx

    # ---- full forward -------------------------------------------------------
    def forward(
        self,
        params,
        experts,
        tokens: jax.Array,  # [B, T]
        positions: jax.Array,  # [B, T]
        kv_caches: List[KVCache],
        kv_len: jax.Array,  # scalar int32
        *,
        for_layer,
        impl: str = "ragged",
        pad_offsets=None,
        rope_positions=None,
        key_valid=None,
    ):
        """Whole-model forward. Returns (logits [B,T,V] f32, new kv list,
        router trace (ids [L,B,T,K] i32, weights [L,B,T,K] f32))."""
        s = self.spec
        x = self.embed(params, tokens)
        new_kvs, trace_ids, trace_w = [], [], []
        for li in range(s.num_layers):
            pl = params["layers"][li]
            x, h, cw, ids, kv = self.pre_moe(
                pl, x, kv_caches[li], positions, kv_len, pad_offsets,
                rope_positions, key_valid,
            )
            mli = self.moe_layer_index(li)
            w, slot_map, biases = for_layer(experts, mli)
            x = self.apply_moe(pl, x, h, cw, ids, w, slot_map, biases, impl)
            new_kvs.append(kv)
            trace_ids.append(ids)
            trace_w.append(cw)
        logits = self.head(params, x)
        return logits, new_kvs, (jnp.stack(trace_ids), jnp.stack(trace_w))
