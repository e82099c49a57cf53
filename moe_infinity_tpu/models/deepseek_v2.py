"""DeepSeek-V2 family (V2 / V2-Lite) — MLA attention + shared-expert MoE.

Own JAX definition with HF-checkpoint parity (reference vendors the HF
modeling wholesale: /root/reference/moe_infinity/models/modeling_deepseek/
modeling_deepseek.py:753 MLA, :436 MoEGate; our oracle is the upstream
transformers DeepseekV2 implementation).

TPU-native difference: attention uses the **absorbed MLA** decode form —
the KV cache stores only the 512-dim compressed latent + the 64-dim shared
rope key per token (vs per-head K/V in the reference), and the kv_b
up-projection is folded into the query/output sides:

    q_lat[h]  = q_nope[h] @ W_uk[h]          # [R]
    score     = q_lat · c_s + q_pe[h] · k_pe_s
    out[h]    = (Σ_s p_s c_s) @ W_uv[h]^T    # [Dv]

Mathematically identical to materializing K/V, ~10.7x smaller KV cache
(576 vs 6144 floats/token for V2-Lite), and the absorbed einsums are tiny.

Routing: softmax scores, greedy or group-limited top-k, optional
routed_scaling_factor; shared experts run densely on every token.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from moe_infinity_tpu.models.layers import KVCache, linear, rms_norm
from moe_infinity_tpu.ops.moe import grouped_ffn, grouped_ffn_ep


@dataclass(frozen=True)
class DeepseekV2Spec:
    vocab_size: int
    hidden_size: int
    intermediate_size: int  # dense-MLP ffn dim
    moe_intermediate_size: int
    num_layers: int
    num_heads: int
    q_lora_rank: Optional[int]
    kv_lora_rank: int
    qk_nope_head_dim: int
    qk_rope_head_dim: int
    v_head_dim: int
    num_experts: int
    top_k: int
    n_shared_experts: int
    first_k_dense_replace: int
    topk_method: str  # 'greedy' | 'group_limited_greedy'
    n_group: Optional[int]
    topk_group: Optional[int]
    routed_scaling_factor: float
    rms_eps: float
    rope_theta: float
    tie_embeddings: bool
    router_variant: str = "v2"  # 'v2' softmax | 'v3' sigmoid + noaux bias
    norm_topk_prob: bool = False

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    @classmethod
    def from_hf(cls, config) -> "DeepseekV2Spec":
        return cls(
            vocab_size=config.vocab_size,
            hidden_size=config.hidden_size,
            intermediate_size=config.intermediate_size,
            moe_intermediate_size=config.moe_intermediate_size,
            num_layers=config.num_hidden_layers,
            num_heads=config.num_attention_heads,
            q_lora_rank=getattr(config, "q_lora_rank", None),
            kv_lora_rank=config.kv_lora_rank,
            qk_nope_head_dim=config.qk_nope_head_dim,
            qk_rope_head_dim=config.qk_rope_head_dim,
            v_head_dim=config.v_head_dim,
            num_experts=config.n_routed_experts,
            top_k=config.num_experts_per_tok,
            n_shared_experts=config.n_shared_experts or 0,
            first_k_dense_replace=config.first_k_dense_replace,
            topk_method=getattr(config, "topk_method", "greedy"),
            n_group=getattr(config, "n_group", None),
            topk_group=getattr(config, "topk_group", None),
            routed_scaling_factor=getattr(config, "routed_scaling_factor", 1.0),
            rms_eps=config.rms_norm_eps,
            rope_theta=getattr(config, "rope_theta", 10000.0),
            tie_embeddings=getattr(config, "tie_word_embeddings", False),
            router_variant=(
                "v3" if getattr(config, "model_type", "") == "deepseek_v3" else "v2"
            ),
            norm_topk_prob=getattr(config, "norm_topk_prob", False),
        )


def rope_interleaved(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """DeepSeek rope: complex/interleaved pairing (x[2i], x[2i+1]).
    x: [B, T, H, P]; cos/sin: [B, T, P/2]."""
    B, T, H, P = x.shape
    x32 = x.astype(jnp.float32).reshape(B, T, H, P // 2, 2)
    xr, xi = x32[..., 0], x32[..., 1]
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    outr = xr * c - xi * s
    outi = xr * s + xi * c
    return jnp.stack([outr, outi], axis=-1).reshape(B, T, H, P).astype(x.dtype)


class DeepseekV2ModelJax:
    arch = "deepseek"

    def __init__(
        self, spec: DeepseekV2Spec, compute_dtype=jnp.bfloat16, mesh=None,
        shared_in_pool: bool = False,
    ):
        """shared_in_pool: fold the shared experts into the routed expert
        pool as `n_shared_experts` always-routed pseudo-experts (the
        down-projection decomposes exactly over F-sized chunks, so outputs
        are identical); removes the separate shared-MLP matmuls per layer
        — the expert tree then has E + n_shared rows per layer."""
        self.spec = spec
        self.dtype = compute_dtype
        self.mesh = mesh
        self.shared_in_pool = shared_in_pool and spec.n_shared_experts > 0

    # ---- param loading ---------------------------------------------------
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
            pl: Dict[str, Any] = {
                "input_norm": get(p + "input_layernorm.weight"),
                "post_norm": get(p + "post_attention_layernorm.weight"),
                "kv_a": get(p + "self_attn.kv_a_proj_with_mqa.weight"),
                "kv_a_norm": get(p + "self_attn.kv_a_layernorm.weight"),
                "o": get(p + "self_attn.o_proj.weight"),
            }
            if s.q_lora_rank is None:
                pl["q"] = get(p + "self_attn.q_proj.weight")
            else:
                pl["q_a"] = get(p + "self_attn.q_a_proj.weight")
                pl["q_a_norm"] = get(p + "self_attn.q_a_layernorm.weight")
                pl["q_b"] = get(p + "self_attn.q_b_proj.weight")
            # kv_b [H*(Dn+Dv), R] -> absorbed W_uk [H, Dn, R], W_uv [H, Dv, R]
            kv_b = jnp.asarray(dense.get(p + "self_attn.kv_b_proj.weight"))
            kv_b = kv_b.reshape(
                s.num_heads, s.qk_nope_head_dim + s.v_head_dim, s.kv_lora_rank
            )
            pl["w_uk"] = device_put(
                kv_b[:, : s.qk_nope_head_dim, :].astype(self.dtype)
            )
            pl["w_uv"] = device_put(
                kv_b[:, s.qk_nope_head_dim :, :].astype(self.dtype)
            )
            if i < s.first_k_dense_replace:
                pl["mlp_gate"] = get(p + "mlp.gate_proj.weight")
                pl["mlp_up"] = get(p + "mlp.up_proj.weight")
                pl["mlp_down"] = get(p + "mlp.down_proj.weight")
            else:
                pl["router"] = get(p + "mlp.gate.weight", jnp.float32)
                if s.router_variant == "v3":
                    pl["router_bias"] = get(
                        p + "mlp.gate.e_score_correction_bias", jnp.float32
                    )
                if s.n_shared_experts:
                    pl["shared_gate"] = get(p + "mlp.shared_experts.gate_proj.weight")
                    pl["shared_up"] = get(p + "mlp.shared_experts.up_proj.weight")
                    pl["shared_down"] = get(p + "mlp.shared_experts.down_proj.weight")
            layers.append(pl)
        params = {
            "embed": get("model.embed_tokens.weight"),
            "final_norm": get("model.norm.weight"),
            "layers": layers,
        }
        if not s.tie_embeddings and "lm_head.weight" in dense:
            params["lm_head"] = get("lm_head.weight")
        return params

    # ---- caches ----------------------------------------------------------
    def init_cache(self, batch: int, max_len: int) -> List[KVCache]:
        s = self.spec
        # k slot: compressed latent [B, S, 1, R]; v slot: roped key [B, S, 1, P]
        return [
            KVCache(
                jnp.zeros((batch, max_len, 1, s.kv_lora_rank), self.dtype),
                jnp.zeros((batch, max_len, 1, s.qk_rope_head_dim), self.dtype),
            )
            for _ in range(s.num_layers)
        ]

    def embed(self, params, tokens: jax.Array) -> jax.Array:
        return params["embed"][tokens].astype(self.dtype)

    # ---- MLA attention ---------------------------------------------------
    def _rope_tables(self, positions: jax.Array):
        s = self.spec
        half = s.qk_rope_head_dim // 2
        inv_freq = 1.0 / (
            s.rope_theta ** (jnp.arange(0, half, dtype=jnp.float32) / half)
        )
        freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [B,T,half]
        return jnp.cos(freqs), jnp.sin(freqs)

    def attn_block(self, pl, x, kv: KVCache, positions, kv_len, pad_offsets=None,
                   rope_positions=None, key_valid=None, rope=None):
        """positions are cache-column positions; with left padding /
        continuous batching, pad_offsets [B] shifts rope to sequence
        positions and masks foreign/padded key columns. rope_positions /
        key_valid give per-row timelines for chunked prefill (see
        models/mixtral.py attn_block). rope=(cos, sin) passes hoisted
        tables (computed once per step instead of per layer).

        With folded params (fold_mla_params), the q projection emits the
        latent-absorbed query directly and w_uv is folded into the output
        projection — two fewer matmuls and one fewer multiply per layer on
        the decode path, exact up to f32 re-association."""
        s = self.spec
        B, T, D = x.shape
        H = s.num_heads
        folded = "o_fold" in pl
        h = rms_norm(x, pl["input_norm"], s.rms_eps)

        if folded:
            R, P = s.kv_lora_rank, s.qk_rope_head_dim
            if s.q_lora_rank is None:
                qcat = linear(h, pl["q_fold"])
            else:
                qcat = linear(
                    rms_norm(linear(h, pl["q_a"]), pl["q_a_norm"], s.rms_eps),
                    pl["q_b_fold"],
                )
            qcat = qcat.reshape(B, T, H, R + P)
            q_lat = qcat[..., :R].astype(jnp.float32)  # pre-scaled
            q_pe = qcat[..., R:]
        else:
            if s.q_lora_rank is None:
                q = linear(h, pl["q"])
            else:
                q = linear(
                    rms_norm(linear(h, pl["q_a"]), pl["q_a_norm"], s.rms_eps),
                    pl["q_b"],
                )
            q = q.reshape(B, T, H, s.qk_head_dim)
            q_nope = q[..., : s.qk_nope_head_dim]
            q_pe = q[..., s.qk_nope_head_dim :]

        ckv = linear(h, pl["kv_a"])  # [B, T, R + P]
        c = ckv[..., : s.kv_lora_rank]
        k_pe = ckv[..., s.kv_lora_rank :][:, :, None, :]  # [B, T, 1, P]
        c = rms_norm(c, pl["kv_a_norm"], s.rms_eps)

        if rope is None:
            rope_pos = positions
            if rope_positions is not None:
                rope_pos = rope_positions
            elif pad_offsets is not None:
                rope_pos = jnp.maximum(positions - pad_offsets[:, None], 0)
            rope = self._rope_tables(rope_pos)
        cos, sin = rope
        q_pe = rope_interleaved(q_pe, cos, sin)
        k_pe = rope_interleaved(k_pe, cos, sin)

        kv = kv.update(c[:, :, None, :], k_pe, kv_len)
        c_cache = kv.k[:, :, 0, :]  # [B, S, R]
        kpe_cache = kv.v[:, :, 0, :]  # [B, S, P]

        if not folded:
            # absorbed query: q_lat [B, T, H, R]
            q_lat = jnp.einsum(
                "bthd,hdr->bthr",
                q_nope.astype(jnp.float32),
                pl["w_uk"].astype(jnp.float32),
            )

        # decode fast path: the MLA flash kernel streams the live latent +
        # rope caches once for all H heads (models/layers.py gates)
        out_lat = None
        if T == 1 and self._mla_flash_ok(c_cache):
            from moe_infinity_tpu.ops.flash_attention import mla_flash_decode

            mask = key_valid
            if mask is None and pad_offsets is not None:
                cols = jnp.arange(c_cache.shape[1], dtype=jnp.int32)[None, :]
                mask = cols >= pad_offsets[:, None]
            o1 = mla_flash_decode(
                q_lat[:, 0].astype(jnp.float32),
                q_pe[:, 0].astype(jnp.float32),
                c_cache, kpe_cache,
                positions[:, 0], kv_len + T,
                scale=1.0 if folded else s.qk_head_dim ** -0.5,
                pad_mask=mask,
            )
            if o1 is not None:
                out_lat = o1[:, None]  # [B, 1, H, R]
        if out_lat is None:
            logits = (
                jnp.einsum(
                    "bthr,bsr->bhts", q_lat, c_cache.astype(jnp.float32)
                )
                + jnp.einsum(
                    "bthp,bsp->bhts",
                    q_pe.astype(jnp.float32),
                    kpe_cache.astype(jnp.float32),
                )
            )
            if not folded:
                logits = logits * (s.qk_head_dim**-0.5)

            S = c_cache.shape[1]
            key_pos = jnp.arange(S, dtype=jnp.int32)[None, None, None, :]
            valid = (key_pos < kv_len + T) & (
                key_pos <= positions[:, None, :, None]
            )
            if key_valid is not None:
                valid = jnp.logical_and(valid, key_valid[:, None, None, :])
            elif pad_offsets is not None:
                valid = jnp.logical_and(
                    valid, key_pos >= pad_offsets[:, None, None, None]
                )
            logits = jnp.where(valid, logits, jnp.finfo(jnp.float32).min)
            probs = jax.nn.softmax(logits, axis=-1)
            out_lat = jnp.einsum(
                "bhts,bsr->bthr", probs, c_cache.astype(jnp.float32)
            )
        if folded:
            out = jnp.einsum(
                "bthr,dhr->btd", out_lat, pl["o_fold"].astype(jnp.float32)
            ).astype(self.dtype)
        else:
            out = jnp.einsum(
                "bthr,hdr->bthd", out_lat, pl["w_uv"].astype(jnp.float32)
            )  # [B, T, H, Dv]
            out = linear(
                out.reshape(B, T, H * s.v_head_dim).astype(self.dtype), pl["o"]
            )
        return x + out, kv

    @staticmethod
    def _mla_flash_ok(c_cache) -> bool:
        from moe_infinity_tpu.models.layers import (
            _FLASH_DECODE_MIN_BYTES,
            _flash_enabled,
            get_attention_impl,
        )

        if not _flash_enabled():
            return False
        if get_attention_impl() == "flash":
            return True
        return (
            c_cache.size * c_cache.dtype.itemsize >= _FLASH_DECODE_MIN_BYTES
        )

    # ---- routing ---------------------------------------------------------
    def route(self, pl, h: jax.Array):
        s = self.spec
        B, T, D = h.shape
        logits = linear(h.astype(jnp.float32), pl["router"])  # [B, T, E]
        if s.router_variant == "v3":
            return self._route_v3(pl, logits, B, T)
        scores = jax.nn.softmax(logits.reshape(B * T, -1), axis=-1)
        if s.topk_method == "group_limited_greedy":
            n = scores.shape[0]
            gsz = s.num_experts // s.n_group
            group_scores = scores.reshape(n, s.n_group, gsz).max(axis=-1)
            _, gidx = jax.lax.top_k(group_scores, s.topk_group)
            gmask = jnp.zeros_like(group_scores).at[
                jnp.arange(n)[:, None], gidx
            ].set(1.0)
            smask = jnp.repeat(gmask, gsz, axis=-1)
            masked = jnp.where(smask > 0, scores, 0.0)
            cw, ids = jax.lax.top_k(masked, s.top_k)
        else:
            cw, ids = jax.lax.top_k(scores, s.top_k)
        cw = cw * s.routed_scaling_factor
        return (
            cw.reshape(B, T, s.top_k),
            ids.astype(jnp.int32).reshape(B, T, s.top_k),
        )

    def _route_v3(self, pl, logits, B, T):
        """DeepSeek-V3 noaux-tc router: sigmoid scores; selection uses
        scores + e_score_correction_bias with sum-of-top-2 group scoring;
        combine weights use the *raw* sigmoid scores of the selected
        experts, optionally normalized (HF DeepseekV3TopkRouter)."""
        s = self.spec
        n = B * T
        scores = jax.nn.sigmoid(logits.reshape(n, s.num_experts))
        choice = scores + pl["router_bias"][None, :]
        gsz = s.num_experts // s.n_group
        g2, _ = jax.lax.top_k(choice.reshape(n, s.n_group, gsz), 2)
        group_scores = g2.sum(axis=-1)  # [n, G]
        _, gidx = jax.lax.top_k(group_scores, s.topk_group)
        gmask = jnp.zeros_like(group_scores).at[
            jnp.arange(n)[:, None], gidx
        ].set(1.0)
        smask = jnp.repeat(gmask, gsz, axis=-1)
        masked = jnp.where(smask > 0, choice, 0.0)
        _, ids = jax.lax.top_k(masked, s.top_k)
        cw = jnp.take_along_axis(scores, ids, axis=-1)
        if s.norm_topk_prob:
            cw = cw / (cw.sum(axis=-1, keepdims=True) + 1e-20)
        cw = cw * s.routed_scaling_factor
        return (
            cw.reshape(B, T, s.top_k),
            ids.astype(jnp.int32).reshape(B, T, s.top_k),
        )

    # ---- MoE / dense-MLP blocks -----------------------------------------
    def _dense_mlp(self, x, wg, wu, wd):
        h = jax.nn.silu(linear(x, wg)) * linear(x, wu)
        return linear(h, wd)

    def moe_layer_index(self, layer_idx: int) -> Optional[int]:
        if layer_idx < self.spec.first_k_dense_replace:
            return None
        return layer_idx - self.spec.first_k_dense_replace

    def dense_layer(self, pl, x, kv, positions, kv_len, pad_offsets=None,
                    rope_positions=None, key_valid=None, rope=None):
        """Full step for a first_k_dense_replace layer."""
        s = self.spec
        x, kv = self.attn_block(pl, x, kv, positions, kv_len, pad_offsets,
                                rope_positions, key_valid, rope)
        h = rms_norm(x, pl["post_norm"], s.rms_eps)
        return x + self._dense_mlp(h, pl["mlp_gate"], pl["mlp_up"], pl["mlp_down"]), kv

    def pre_moe(self, pl, x, kv, positions, kv_len, pad_offsets=None,
                rope_positions=None, key_valid=None, rope=None):
        s = self.spec
        x, kv = self.attn_block(pl, x, kv, positions, kv_len, pad_offsets,
                                rope_positions, key_valid, rope)
        h = rms_norm(x, pl["post_norm"], s.rms_eps)
        cw, ids = self.route(pl, h)
        return x, h, cw, ids, kv

    # ---- MLA weight folding (decode-path op reduction) --------------------
    def fold_mla_params(self, params):
        """Fold the absorbed-MLA weights into the projections:
        * w_uk folds into the q (or q_b) projection, emitting the latent
          query directly, concatenated with the rope part — one matmul where
          the unfolded path needs two (q proj + absorb einsum);
        * the attention scale folds into the same weights;
        * w_uv folds into o_proj: one einsum instead of two.
        Exact up to f32 re-association (folding is done in f32, stored in
        the compute dtype). Returns new params; the per-layer originals
        (q/q_b, w_uk, w_uv, o) are dropped to save HBM."""
        s = self.spec
        scale = s.qk_head_dim**-0.5
        new_layers = []
        for pl in params["layers"]:
            pl = dict(pl)
            wuk = pl.pop("w_uk").astype(jnp.float32)  # [H, Dn, R]
            wuv = pl.pop("w_uv").astype(jnp.float32)  # [H, Dv, R]
            qkey = "q" if s.q_lora_rank is None else "q_b"
            wq = pl.pop(qkey).astype(jnp.float32)  # [H*Dk, In] (HF layout)
            wq = wq.reshape(s.num_heads, s.qk_head_dim, wq.shape[-1])
            wqn = wq[:, : s.qk_nope_head_dim]  # [H, Dn, In]
            wqp = wq[:, s.qk_nope_head_dim :]  # [H, P, In]
            wql = jnp.einsum("hni,hnr->hri", wqn, wuk)  # [H, R, In]
            fold = jnp.concatenate([wql, wqp], axis=1) * scale
            pl[qkey + "_fold"] = fold.reshape(
                s.num_heads * (s.kv_lora_rank + s.qk_rope_head_dim), -1
            ).astype(self.dtype)
            wo = pl.pop("o").astype(jnp.float32)  # [D, H*Dv]
            wo = wo.reshape(-1, s.num_heads, s.v_head_dim)  # [D, H, Dv]
            pl["o_fold"] = jnp.einsum("dhv,hvr->dhr", wo, wuv).astype(self.dtype)
            new_layers.append(pl)
        return {**params, "layers": new_layers}

    def apply_moe(self, pl, x, h, cw, ids, weights, slot_map, biases, impl):
        s = self.spec
        B, T, D = h.shape
        if self.shared_in_pool:
            n = s.n_shared_experts
            extra_ids = jnp.broadcast_to(
                jnp.arange(s.num_experts, s.num_experts + n, dtype=jnp.int32),
                (B, T, n),
            )
            ids = jnp.concatenate([ids, extra_ids], axis=-1)
            cw = jnp.concatenate(
                [cw, jnp.ones((B, T, n), cw.dtype)], axis=-1
            )
        K = ids.shape[-1]
        if self.mesh is not None and self.mesh.shape.get("expert", 1) > 1:
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
        y = y.reshape(B, T, D)
        if s.n_shared_experts and not self.shared_in_pool:
            y = y + self._dense_mlp(
                h, pl["shared_gate"], pl["shared_up"], pl["shared_down"]
            )
        return x + y

    def head(self, params, x: jax.Array) -> jax.Array:
        h = rms_norm(x, params["final_norm"], self.spec.rms_eps)
        w = params.get("lm_head", params["embed"])
        return linear(h.astype(jnp.float32), w.astype(jnp.float32))

    # ---- full forward ----------------------------------------------------
    def forward(
        self, params, experts, tokens, positions, kv_caches, kv_len,
        *, for_layer, impl: str = "ragged", pad_offsets=None,
        rope_positions=None, key_valid=None,
    ):
        s = self.spec
        x = self.embed(params, tokens)
        # hoist the rope tables: identical across layers, compute once
        rope_pos = positions
        if rope_positions is not None:
            rope_pos = rope_positions
        elif pad_offsets is not None:
            rope_pos = jnp.maximum(positions - pad_offsets[:, None], 0)
        rope = self._rope_tables(rope_pos)
        new_kvs, trace_ids, trace_w = [], [], []
        for li in range(s.num_layers):
            pl = params["layers"][li]
            mli = self.moe_layer_index(li)
            if mli is None:
                x, kv = self.dense_layer(
                    pl, x, kv_caches[li], positions, kv_len, pad_offsets,
                    rope_positions, key_valid, rope,
                )
            else:
                x, h, cw, ids, kv = self.pre_moe(
                    pl, x, kv_caches[li], positions, kv_len, pad_offsets,
                    rope_positions, key_valid, rope,
                )
                w, slot_map, biases = for_layer(experts, mli)
                x = self.apply_moe(pl, x, h, cw, ids, w, slot_map, biases, impl)
                trace_ids.append(ids)
                trace_w.append(cw)
            new_kvs.append(kv)
        logits = self.head(params, x)
        return logits, new_kvs, (jnp.stack(trace_ids), jnp.stack(trace_w))

    def pool_shared_experts(self, expert_layers, params):
        """Build the extended expert trees for shared_in_pool from a
        default expert tree + loaded params: shared gate/up split into
        F-sized column chunks, shared down into F-sized row chunks —
        summing the chunk outputs reproduces the shared MLP exactly."""
        s = self.spec
        F, n, k0 = s.moe_intermediate_size, s.n_shared_experts, s.first_k_dense_replace
        out = []
        for mli, lt in enumerate(expert_layers):
            if lt["gate"].dtype == jnp.int8:
                raise NotImplementedError(
                    "pool_shared_experts requires unquantized trees; "
                    "quantize after pooling"
                )
            pl = params["layers"][k0 + mli]
            g, u, d = pl["shared_gate"], pl["shared_up"], pl["shared_down"]
            gs = jnp.stack([g[k * F : (k + 1) * F, :].T for k in range(n)])
            us = jnp.stack([u[k * F : (k + 1) * F, :].T for k in range(n)])
            ds = jnp.stack([d[:, k * F : (k + 1) * F].T for k in range(n)])
            new = dict(lt)
            new["gate"] = jnp.concatenate([lt["gate"], gs.astype(lt["gate"].dtype)], 0)
            new["up"] = jnp.concatenate([lt["up"], us.astype(lt["up"].dtype)], 0)
            new["down"] = jnp.concatenate([lt["down"], ds.astype(lt["down"].dtype)], 0)
            out.append(new)
        return {
            "layers": out,
            "slot_map": jnp.arange(s.num_experts + n, dtype=jnp.int32),
        }

    # ---- fused scan-over-layers path (single-chip serving fast path) ------
    def stack_moe_layers(self, params):
        """Stack the homogeneous MoE layers' params for lax.scan. Leading
        first_k_dense_replace layers stay in the python loop. Keeps the
        compiled program O(1) in depth (one layer trace, one Pallas kernel
        instance) — large-depth programs otherwise overwhelm the compiler."""
        k0 = self.spec.first_k_dense_replace
        moe_pls = params["layers"][k0:]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *moe_pls)

    @staticmethod
    def stack_experts(layer_trees, layout="tiled"):
        """Per-layer expert dicts ([E, ...] arrays) → one [Lm*E, ...] pool
        per role (the global-arena layout the gmm group_offset consumes).
        layout='tiled' packs weights for the gmm kernel's contiguous DMA;
        'flat' keeps [S, D, F] rows for the gather decode path."""
        from moe_infinity_tpu.ops.gmm import pack_tiled

        keys = layer_trees[0].keys()
        out = {}
        for k in keys:
            a = jnp.concatenate([lt[k] for lt in layer_trees], axis=0)
            if a.ndim == 3 and layout == "tiled":
                a = pack_tiled(a)
            out[k] = a
        return out

    def _fused_moe_gather(self, h, cw, ids, pool, offset):
        """Decode-path MoE as pure XLA gather + batched matvec.

        For small token counts each (token, k) row gathers its expert's
        weight slab ([D, F] contiguous rows of the pool) and runs a batched
        GEMV; combine is a weighted segment-sum. No Pallas, no scalar
        operands — on backends where scalar staging is expensive this is
        the fastest exact decode path; HBM traffic is ~2x the routed bytes
        (gather copy + read)."""
        s = self.spec
        B, T, D = h.shape
        K = ids.shape[-1]
        x = h.reshape(B * T, D)
        rows = ids.reshape(-1) + offset  # [T*K] pool rows (top-k: distinct per token)
        x_rep = x[jnp.arange(B * T * K, dtype=jnp.int32) // K]  # [TK, D]

        def dq(role):
            w = pool[role][rows]  # [TK, D, F] gather (int8 exact in bf16)
            return w.astype(jnp.bfloat16) if w.dtype == jnp.int8 else w

        xb = x_rep.astype(dq("gate").dtype)
        hg = jnp.einsum(
            "td,tdf->tf", xb, dq("gate"), preferred_element_type=jnp.float32
        )
        hu = jnp.einsum(
            "td,tdf->tf", xb, dq("up"), preferred_element_type=jnp.float32
        )
        if "gate_scale" in pool:
            hg = hg * pool["gate_scale"][rows]
            hu = hu * pool["up_scale"][rows]
        a = jax.nn.silu(hg) * hu
        out = jnp.einsum(
            "tf,tfd->td", a.astype(jnp.bfloat16), dq("down"),
            preferred_element_type=jnp.float32,
        )
        if "down_scale" in pool:
            out = out * pool["down_scale"][rows]
        out = out * cw.reshape(-1).astype(jnp.float32)[:, None]
        comb = out.reshape(B * T, K, D).sum(axis=1)
        return comb.reshape(B, T, D).astype(h.dtype)

    def _fused_moe(self, h, cw, ids, pool, offset, interpret=False):
        """Grouped FFN against the stacked expert pool via the Pallas gmm
        with a per-layer group offset."""
        from moe_infinity_tpu.ops.gmm import gmm
        from moe_infinity_tpu.ops.moe import _activate

        s = self.spec
        B, T, D = h.shape
        K = ids.shape[-1]
        x = h.reshape(B * T, D)
        flat = ids.reshape(-1)
        order = jnp.argsort(flat)
        inv_token = order // K
        xs = x[inv_token]
        group_sizes = jnp.bincount(flat, length=s.num_experts).astype(jnp.int32)

        kw = dict(group_offset=offset, num_groups=s.num_experts,
                  interpret=interpret)
        hg = gmm(xs, pool["gate"], group_sizes, pool.get("gate_scale"), **kw)
        hu = gmm(xs, pool["up"], group_sizes, pool.get("up_scale"), **kw)
        a = _activate(hg, hu, "silu").astype(x.dtype)
        out = gmm(a, pool["down"], group_sizes, pool.get("down_scale"), **kw)
        cwf = cw.reshape(-1).astype(jnp.float32)[order]
        out = out * cwf[:, None]
        comb = jnp.zeros((B * T, D), jnp.float32).at[inv_token].add(out)
        return comb.reshape(B, T, D).astype(h.dtype)

    def init_fused_cache(self, batch: int, max_len: int):
        """(dense kv list, stacked moe kv KVCache with leading Lm dim)."""
        s = self.spec
        k0 = s.first_k_dense_replace
        Lm = s.num_layers - k0
        dense = [
            KVCache(
                jnp.zeros((batch, max_len, 1, s.kv_lora_rank), self.dtype),
                jnp.zeros((batch, max_len, 1, s.qk_rope_head_dim), self.dtype),
            )
            for _ in range(k0)
        ]
        moe = KVCache(
            jnp.zeros((Lm, batch, max_len, 1, s.kv_lora_rank), self.dtype),
            jnp.zeros((Lm, batch, max_len, 1, s.qk_rope_head_dim), self.dtype),
        )
        return dense, moe

    def fused_forward(
        self, params, stacked, pool, tokens, positions, kv_state, kv_len,
        *, moe_impl="gmm", interpret=False,
    ):
        """Forward with lax.scan over the MoE layers and the expert pool.
        kv_state: (dense kv list, stacked moe KVCache [Lm, B, S, 1, .])."""
        s = self.spec
        k0 = s.first_k_dense_replace
        E = s.num_experts
        dense_kv, moe_kv = kv_state
        x = self.embed(params, tokens)
        new_dense_kv = []
        for li in range(k0):
            x, kv = self.dense_layer(
                params["layers"][li], x, dense_kv[li], positions, kv_len
            )
            new_dense_kv.append(kv)

        Lm = s.num_layers - k0

        def body(x, xs):
            pl, kk, vv, li = xs
            kv = KVCache(kk, vv)
            x, h, cw, ids, kv = self.pre_moe(pl, x, kv, positions, kv_len)
            if moe_impl == "gather":
                y = self._fused_moe_gather(h, cw, ids, pool, li * E)
            else:
                y = self._fused_moe(
                    h, cw, ids, pool, li * E, interpret=interpret
                )
            if s.n_shared_experts:
                y = y + self._dense_mlp(
                    h, pl["shared_gate"], pl["shared_up"], pl["shared_down"]
                )
            x = x + y
            return x, (kv.k, kv.v)

        x, (ks, vs) = jax.lax.scan(
            body,
            x,
            (stacked, moe_kv.k, moe_kv.v, jnp.arange(Lm, dtype=jnp.int32)),
        )
        logits = self.head(params, x)
        return logits, (new_dense_kv, KVCache(ks, vs))

    # ---- synthetic init (benches/dryruns) --------------------------------
    def init_random(self, key, *, expert_dtype=None, with_experts=True):
        s = self.spec
        expert_dtype = expert_dtype or self.dtype
        keys = jax.random.split(key, 4 + s.num_layers)

        def mat(k, shape, dt=None, scale=0.02):
            return (jax.random.normal(k, shape, jnp.float32) * scale).astype(
                dt or self.dtype
            )

        layers, experts = [], []
        for i in range(s.num_layers):
            ks = jax.random.split(keys[4 + i], 12)
            pl = {
                "input_norm": jnp.ones(s.hidden_size, jnp.float32),
                "post_norm": jnp.ones(s.hidden_size, jnp.float32),
                "kv_a": mat(ks[0], (s.kv_lora_rank + s.qk_rope_head_dim, s.hidden_size)),
                "kv_a_norm": jnp.ones(s.kv_lora_rank, jnp.float32),
                "o": mat(ks[1], (s.hidden_size, s.num_heads * s.v_head_dim)),
                "w_uk": mat(ks[2], (s.num_heads, s.qk_nope_head_dim, s.kv_lora_rank)),
                "w_uv": mat(ks[3], (s.num_heads, s.v_head_dim, s.kv_lora_rank)),
            }
            if s.q_lora_rank is None:
                pl["q"] = mat(ks[4], (s.num_heads * s.qk_head_dim, s.hidden_size))
            else:
                pl["q_a"] = mat(ks[4], (s.q_lora_rank, s.hidden_size))
                pl["q_a_norm"] = jnp.ones(s.q_lora_rank, jnp.float32)
                pl["q_b"] = mat(ks[5], (s.num_heads * s.qk_head_dim, s.q_lora_rank))
            if i < s.first_k_dense_replace:
                pl["mlp_gate"] = mat(ks[6], (s.intermediate_size, s.hidden_size))
                pl["mlp_up"] = mat(ks[7], (s.intermediate_size, s.hidden_size))
                pl["mlp_down"] = mat(ks[8], (s.hidden_size, s.intermediate_size))
            else:
                pl["router"] = mat(ks[6], (s.num_experts, s.hidden_size), jnp.float32)
                if s.n_shared_experts and not self.shared_in_pool:
                    fs = s.moe_intermediate_size * s.n_shared_experts
                    pl["shared_gate"] = mat(ks[7], (fs, s.hidden_size))
                    pl["shared_up"] = mat(ks[8], (fs, s.hidden_size))
                    pl["shared_down"] = mat(ks[9], (s.hidden_size, fs))
                if with_experts:
                    def emat(k, shape):
                        if expert_dtype == jnp.int8:
                            return jax.random.randint(k, shape, -127, 127, jnp.int8)
                        return mat(k, shape, expert_dtype)

                    E, D, Fm = s.num_experts, s.hidden_size, s.moe_intermediate_size
                    if self.shared_in_pool:
                        E = E + s.n_shared_experts
                    layer_e = {
                        "gate": emat(ks[10], (E, D, Fm)),
                        "up": emat(ks[11], (E, D, Fm)),
                        "down": emat(ks[10], (E, Fm, D)),
                    }
                    if expert_dtype == jnp.int8:
                        layer_e["gate_scale"] = jax.random.uniform(ks[1], (E, Fm), jnp.float32, 1e-3, 2e-3)
                        layer_e["up_scale"] = jax.random.uniform(ks[2], (E, Fm), jnp.float32, 1e-3, 2e-3)
                        layer_e["down_scale"] = jax.random.uniform(ks[3], (E, D), jnp.float32, 1e-3, 2e-3)
                    experts.append(layer_e)
            layers.append(pl)
        params = {
            "embed": mat(keys[0], (s.vocab_size, s.hidden_size)),
            "final_norm": jnp.ones(s.hidden_size, jnp.float32),
            "layers": layers,
        }
        if not s.tie_embeddings:
            params["lm_head"] = mat(keys[1], (s.vocab_size, s.hidden_size))
        if not with_experts:
            return params, None
        n_slots = s.num_experts + (
            s.n_shared_experts if self.shared_in_pool else 0
        )
        return params, {
            "layers": experts,
            "slot_map": jnp.arange(n_slots, dtype=jnp.int32),
        }
