"""Switch Transformers (google/switch-*) — T5 encoder-decoder MoE.

Own JAX definition with HF parity (reference swaps HF's SparseMLP:
/root/reference/moe_infinity/models/switch_transformers.py:58-113; our
oracle is transformers' modeling_switch_transformers). Semantics matched:

* T5 attention: NO 1/sqrt(d) scaling (mesh-TF init); relative position
  bias from block 0's bucket table, shared across blocks; decoder buckets
  unidirectional; no bias on cross-attention;
* top-1 router in float32 with **expert capacity**: per sequence, tokens
  routed to an expert beyond `expert_capacity` are dropped (combine weight
  zero — the residual passes through), exactly HF's cumsum mask;
* sparse MLP every `sparse_step` blocks at odd indices
  (`i % step == 1 or step == 1`); dense T5 FF otherwise;
* tied embeddings scale decoder output by d_model^-0.5.

Global MoE layer ids: encoder sparse layers first, then decoder
(matching utils/hf_config.parse_expert_param and the expert store).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from moe_infinity_tpu.models.layers import (
    KVCache,
    attend,
    linear,
    rms_norm,
    t5_position_bias,
)
from moe_infinity_tpu.ops.moe import grouped_ffn, grouped_ffn_ep


@dataclass(frozen=True)
class SwitchSpec:
    vocab_size: int
    d_model: int
    d_kv: int
    d_ff: int
    num_heads: int
    num_encoder_layers: int
    num_decoder_layers: int
    encoder_sparse_step: int
    decoder_sparse_step: int
    num_experts: int
    expert_capacity: int
    rel_buckets: int
    rel_max_distance: int
    rms_eps: float
    tie_embeddings: bool
    is_gated: bool
    dense_act_gelu: bool
    decoder_start_token_id: int

    @classmethod
    def from_hf(cls, config) -> "SwitchSpec":
        return cls(
            vocab_size=config.vocab_size,
            d_model=config.d_model,
            d_kv=config.d_kv,
            d_ff=config.d_ff,
            num_heads=config.num_heads,
            num_encoder_layers=config.num_layers,
            num_decoder_layers=config.num_decoder_layers,
            encoder_sparse_step=config.encoder_sparse_step,
            decoder_sparse_step=config.decoder_sparse_step,
            num_experts=config.num_experts,
            expert_capacity=config.expert_capacity,
            rel_buckets=config.relative_attention_num_buckets,
            rel_max_distance=config.relative_attention_max_distance,
            rms_eps=config.layer_norm_epsilon,
            tie_embeddings=getattr(config, "tie_word_embeddings", True),
            is_gated=getattr(config, "is_gated_act", False),
            dense_act_gelu=getattr(config, "dense_act_fn", "relu")
            in ("gelu_new", "gelu"),
            decoder_start_token_id=config.decoder_start_token_id,
        )

    def is_sparse(self, block: int, decoder: bool) -> bool:
        step = self.decoder_sparse_step if decoder else self.encoder_sparse_step
        if step <= 0:
            return False
        return block % step == 1 or step == 1

    def moe_layer_id(self, block: int, decoder: bool) -> int:
        """Global MoE layer id for a sparse block."""
        step = self.decoder_sparse_step if decoder else self.encoder_sparse_step
        base = 0
        if decoder:
            base = sum(
                1 for i in range(self.num_encoder_layers)
                if self.is_sparse(i, False)
            )
        return base + block // step

    @property
    def num_moe_layers(self) -> int:
        return sum(
            1 for i in range(self.num_encoder_layers) if self.is_sparse(i, False)
        ) + sum(
            1 for i in range(self.num_decoder_layers) if self.is_sparse(i, True)
        )


class SwitchModel:
    arch = "switch"

    def __init__(self, spec: SwitchSpec, compute_dtype=jnp.float32, mesh=None):
        self.spec = spec
        self.dtype = compute_dtype
        self.mesh = mesh
        # speculative engines set this > 0: traces then carry the
        # router's next-m runner-ups (near-tie acquisition, see nllb.py)
        self.route_margin = 0
        # expert + non-gated dense activation follows dense_act_fn;
        # is_gated selects the gated class for DENSE FF layers only
        self.activation = "gelu_tanh" if spec.dense_act_gelu else "relu"

    # ---- params ---------------------------------------------------------
    def load_params(self, dense, device_put=jax.device_put) -> Dict[str, Any]:
        s = self.spec

        def get(name, dt=None):
            a = jnp.asarray(dense.get(name))
            if dt is None:
                dt = self.dtype if a.ndim >= 2 else jnp.float32
            return device_put(a.astype(dt))

        def stack_params(prefix, n, decoder):
            blocks = []
            for i in range(n):
                p = f"{prefix}.block.{i}.layer."
                b: Dict[str, Any] = {
                    "ln0": get(p + "0.layer_norm.weight"),
                    "q": get(p + "0.SelfAttention.q.weight"),
                    "k": get(p + "0.SelfAttention.k.weight"),
                    "v": get(p + "0.SelfAttention.v.weight"),
                    "o": get(p + "0.SelfAttention.o.weight"),
                }
                if i == 0:
                    b["rel_bias"] = get(
                        p + "0.SelfAttention.relative_attention_bias.weight",
                        jnp.float32,
                    )
                ff = "2" if decoder else "1"
                if decoder:
                    b["ln_cross"] = get(p + "1.layer_norm.weight")
                    b["cq"] = get(p + "1.EncDecAttention.q.weight")
                    b["ck"] = get(p + "1.EncDecAttention.k.weight")
                    b["cv"] = get(p + "1.EncDecAttention.v.weight")
                    b["co"] = get(p + "1.EncDecAttention.o.weight")
                b["ln_ff"] = get(p + f"{ff}.layer_norm.weight")
                if s.is_sparse(i, decoder):
                    b["router"] = get(
                        p + f"{ff}.mlp.router.classifier.weight", jnp.float32
                    )
                else:
                    # dense FF is always DenseActDense in current HF
                    # (is_gated_act selects only the activation function)
                    b["wi"] = get(p + f"{ff}.mlp.wi.weight")
                    b["wo"] = get(p + f"{ff}.mlp.wo.weight")
                blocks.append(b)
            return blocks

        params = {
            "embed": get("shared.weight"),
            "enc_blocks": stack_params("encoder", s.num_encoder_layers, False),
            "enc_final_ln": get("encoder.final_layer_norm.weight"),
            "dec_blocks": stack_params("decoder", s.num_decoder_layers, True),
            "dec_final_ln": get("decoder.final_layer_norm.weight"),
        }
        if not s.tie_embeddings and "lm_head.weight" in dense:
            params["lm_head"] = get("lm_head.weight")
        return params

    def init_random(self, key, *, expert_dtype=None, with_experts=True):
        """Random params + resident expert tree (tests, dryruns, synthetic
        benchmarks — weight values don't change the compute graph).
        with_experts=False skips the expert tree (the full switch-large-128
        expert tier is ~18 GB bf16; benches generate it quantized)."""
        s = self.spec
        expert_dtype = expert_dtype or self.dtype
        keys = jax.random.split(key, 2 + s.num_encoder_layers + s.num_decoder_layers)

        def mat(k, shape, dt, scale=0.02):
            return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)

        hd = s.num_heads * s.d_kv
        experts: List[Dict[str, jax.Array]] = []

        def block(k, i, decoder):
            ks = jax.random.split(k, 12)
            b: Dict[str, Any] = {
                "ln0": jnp.ones(s.d_model, jnp.float32),
                "ln_ff": jnp.ones(s.d_model, jnp.float32),
                "q": mat(ks[0], (hd, s.d_model), self.dtype),
                "k": mat(ks[1], (hd, s.d_model), self.dtype),
                "v": mat(ks[2], (hd, s.d_model), self.dtype),
                "o": mat(ks[3], (s.d_model, hd), self.dtype),
            }
            if i == 0:
                b["rel_bias"] = mat(
                    ks[4], (s.rel_buckets, s.num_heads), jnp.float32
                )
            if decoder:
                b["ln_cross"] = jnp.ones(s.d_model, jnp.float32)
                b["cq"] = mat(ks[5], (hd, s.d_model), self.dtype)
                b["ck"] = mat(ks[6], (hd, s.d_model), self.dtype)
                b["cv"] = mat(ks[7], (hd, s.d_model), self.dtype)
                b["co"] = mat(ks[8], (s.d_model, hd), self.dtype)
            if s.is_sparse(i, decoder):
                b["router"] = mat(
                    ks[9], (s.num_experts, s.d_model), jnp.float32, scale=0.5
                )
                if with_experts:
                    experts.append(
                        {
                            "gate": mat(
                                ks[10],
                                (s.num_experts, s.d_model, s.d_ff),
                                expert_dtype,
                            ),
                            "down": mat(
                                ks[11],
                                (s.num_experts, s.d_ff, s.d_model),
                                expert_dtype,
                            ),
                        }
                    )
            else:
                b["wi"] = mat(ks[10], (s.d_ff, s.d_model), self.dtype)
                b["wo"] = mat(ks[11], (s.d_model, s.d_ff), self.dtype)
            return b

        params = {
            "embed": mat(keys[0], (s.vocab_size, s.d_model), self.dtype),
            "enc_blocks": [
                block(keys[2 + i], i, False)
                for i in range(s.num_encoder_layers)
            ],
            "enc_final_ln": jnp.ones(s.d_model, jnp.float32),
            "dec_blocks": [
                block(keys[2 + s.num_encoder_layers + i], i, True)
                for i in range(s.num_decoder_layers)
            ],
            "dec_final_ln": jnp.ones(s.d_model, jnp.float32),
        }
        if not s.tie_embeddings:
            params["lm_head"] = mat(keys[1], (s.vocab_size, s.d_model), self.dtype)
        if not with_experts:
            return params, None
        expert_tree = {
            "layers": experts,
            "slot_map": jnp.arange(s.num_experts, dtype=jnp.int32),
        }
        return params, expert_tree

    # ---- attention ------------------------------------------------------
    def _attn(self, b, x, kv_k, kv_v, q_pos, kv_len, bias, prefix=""):
        s = self.spec
        B, T, D = x.shape
        H, Dk = s.num_heads, s.d_kv
        q = linear(x, b[prefix + "q"]).reshape(B, T, H, Dk)
        out = attend(
            q, kv_k, kv_v, q_pos, kv_len,
            scale=1.0, causal=False, bias=bias,
        )
        return linear(out.reshape(B, T, H * Dk), b[prefix + "o"])

    def switch_route(self, b, h, margin: int = 0):
        """Capacity-masked top-1 router. Returns (cw [B,T,1], ids [B,T,1],
        trace_ids). margin > 0 widens trace_ids to [B, T, 1+m] with the
        router's next-m runner-ups — the speculative engines acquire the
        near-tie candidates so a replay's routing flip lands on an
        already-resident expert (see nllb.py _route_top2)."""
        s = self.spec
        B, T, D = h.shape
        logits = linear(h.astype(jnp.float32), b["router"])  # [B, T, E]
        probs = jax.nn.softmax(logits, axis=-1)
        idx = jnp.argmax(probs, axis=-1)  # [B, T]
        onehot = jax.nn.one_hot(idx, s.num_experts, dtype=jnp.int32)
        priority = jnp.cumsum(onehot, axis=1)  # over tokens, per sequence
        keep = (priority <= s.expert_capacity).astype(jnp.float32)
        keep = jnp.take_along_axis(keep, idx[..., None], axis=-1)[..., 0]
        maxp = jnp.max(probs, axis=-1)
        ids = idx[..., None].astype(jnp.int32)
        if margin <= 0:
            return (maxp * keep)[..., None], ids, ids
        masked = jnp.where(
            jax.nn.one_hot(idx, s.num_experts, dtype=bool),
            -jnp.inf, logits,
        )
        nxt = jax.lax.top_k(masked, margin)[1].astype(jnp.int32)
        return (maxp * keep)[..., None], ids, jnp.concatenate(
            [ids, nxt], axis=-1
        )

    def apply_ff(self, x, h, cw, ids, weights, slot_map, biases, impl):
        """Routed expert FF + residual (engine-facing). Under an
        expert-axis mesh the slot_map carries GLOBAL slot ids and the
        dispatch is the shard_map EP program (psum combine over ICI) —
        the seq2seq pod serving path (parallel/pod.py)."""
        B, T, D = h.shape
        if self.mesh is not None and self.mesh.shape.get("expert", 1) > 1:
            y = grouped_ffn_ep(
                h.reshape(B * T, D), ids.reshape(B * T, 1),
                cw.reshape(B * T, 1).astype(jnp.float32), slot_map, weights,
                self.activation, mesh=self.mesh, biases=biases, impl=impl,
            )
        else:
            y = grouped_ffn(
                h.reshape(B * T, D), ids.reshape(B * T, 1),
                cw.reshape(B * T, 1), slot_map, weights,
                self.activation, biases=biases, impl=impl,
            )
        return x + y.reshape(B, T, D)

    def _routed_ff(self, b, h, mli, experts, for_layer, impl):
        """Capacity-masked top-1 sparse FF. h: [B, T, D] post-LN. The
        returned trace keeps its legacy [B, T] shape at margin 0; with
        route_margin > 0 it is [B, T, 1+m] (top-1 + runner-ups)."""
        cw, ids, tids = self.switch_route(b, h, self.route_margin)
        weights, slot_map, biases = for_layer(experts, mli)
        y = self.apply_ff(
            jnp.zeros_like(h), h, cw, ids, weights, slot_map, biases, impl
        )
        return y, (tids if self.route_margin > 0 else ids[..., 0])

    def _dense_ff(self, b, h):
        a = linear(h, b["wi"])
        a = (
            jax.nn.gelu(a, approximate=True)
            if self.spec.dense_act_gelu
            else jax.nn.relu(a)
        )
        return linear(a, b["wo"])

    # ---- stage methods (seq2seq offload engine drives these per block) ----
    def enc_prelude(self, params, tokens, pad_mask):
        s = self.spec
        B, T = tokens.shape
        x = params["embed"][tokens].astype(self.dtype)
        pos = jnp.arange(T, dtype=jnp.int32)
        bias = t5_position_bias(
            params["enc_blocks"][0]["rel_bias"], pos, pos, True,
            s.rel_buckets, s.rel_max_distance,
        )
        bias = bias + jnp.where(
            pad_mask[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min
        )
        q_pos = jnp.broadcast_to(pos, (B, T))
        return x, bias, q_pos

    def _enc_attn(self, b, x, bias, q_pos):
        s = self.spec
        B, T, _ = x.shape
        h = rms_norm(x, b["ln0"], s.rms_eps)
        k = linear(h, b["k"]).reshape(B, T, s.num_heads, s.d_kv)
        v = linear(h, b["v"]).reshape(B, T, s.num_heads, s.d_kv)
        x = x + self._attn(b, h, k, v, q_pos, jnp.int32(T), bias)
        return x, rms_norm(x, b["ln_ff"], s.rms_eps)

    def enc_block_sparse_pre(self, b, x, bias, q_pos):
        x, h = self._enc_attn(b, x, bias, q_pos)
        cw, ids, _ = self.switch_route(b, h)
        return x, h, cw, ids

    def enc_block_dense(self, b, x, bias, q_pos):
        x, h = self._enc_attn(b, x, bias, q_pos)
        return x + self._dense_ff(b, h)

    def enc_final(self, params, x):
        return rms_norm(x, params["enc_final_ln"], self.spec.rms_eps)

    def dec_prelude(self, params, positions, cache_len: int, enc_mask):
        s = self.spec
        k_pos = jnp.arange(cache_len, dtype=jnp.int32)
        bias = t5_position_bias(
            params["dec_blocks"][0]["rel_bias"], positions[0], k_pos, False,
            s.rel_buckets, s.rel_max_distance,
        )
        cross_bias = jnp.where(
            enc_mask[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min
        )
        return bias, cross_bias

    def _dec_attn(self, b, x, kv, positions, kv_len, bias, ck, cv, cross_bias):
        s = self.spec
        B, T, _ = x.shape
        h = rms_norm(x, b["ln0"], s.rms_eps)
        k = linear(h, b["k"]).reshape(B, T, s.num_heads, s.d_kv)
        v = linear(h, b["v"]).reshape(B, T, s.num_heads, s.d_kv)
        kv = kv.update(k, v, kv_len)
        q = linear(h, b["q"]).reshape(B, T, s.num_heads, s.d_kv)
        a = attend(
            q, kv.k, kv.v, positions, kv_len + T,
            scale=1.0, causal=True, bias=bias,
        )
        x = x + linear(a.reshape(B, T, -1), b["o"])
        h = rms_norm(x, b["ln_cross"], s.rms_eps)
        a = attend(
            linear(h, b["cq"]).reshape(B, T, s.num_heads, s.d_kv),
            ck, cv, positions, jnp.int32(ck.shape[1]),
            scale=1.0, causal=False, bias=cross_bias,
        )
        x = x + linear(a.reshape(B, T, -1), b["co"])
        return x, rms_norm(x, b["ln_ff"], s.rms_eps), kv

    def dec_block_sparse_pre(self, b, x, kv, positions, kv_len, bias, ck, cv, cross_bias):
        x, h, kv = self._dec_attn(
            b, x, kv, positions, kv_len, bias, ck, cv, cross_bias
        )
        cw, ids, _ = self.switch_route(b, h)
        return x, h, cw, ids, kv

    def dec_block_dense(self, b, x, kv, positions, kv_len, bias, ck, cv, cross_bias):
        x, h, kv = self._dec_attn(
            b, x, kv, positions, kv_len, bias, ck, cv, cross_bias
        )
        return x + self._dense_ff(b, h), kv

    def dec_final(self, params, x):
        s = self.spec
        x = rms_norm(x, params["dec_final_ln"], s.rms_eps)
        if s.tie_embeddings:
            x = x * (s.d_model**-0.5)
            w = params["embed"]
        else:
            w = params["lm_head"]
        return linear(x.astype(jnp.float32), w.astype(jnp.float32))

    def dec_embed(self, params, dec_tokens, step=0):
        return params["embed"][dec_tokens].astype(self.dtype)

    # ---- encoder --------------------------------------------------------
    def encode(self, params, experts, tokens, pad_mask, for_layer, impl="ragged"):
        """tokens [B, T]; pad_mask [B, T] 1=real. Returns [B, T, D]."""
        s = self.spec
        B, T = tokens.shape
        x = params["embed"][tokens].astype(self.dtype)
        pos = jnp.arange(T, dtype=jnp.int32)
        bias = t5_position_bias(
            params["enc_blocks"][0]["rel_bias"], pos, pos, True,
            s.rel_buckets, s.rel_max_distance,
        )  # [1, H, T, T]
        bias = bias + jnp.where(
            pad_mask[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min
        )
        q_pos = jnp.broadcast_to(pos, (B, T))
        for i, b in enumerate(params["enc_blocks"]):
            h = rms_norm(x, b["ln0"], s.rms_eps)
            k = linear(h, b["k"]).reshape(B, T, s.num_heads, s.d_kv)
            v = linear(h, b["v"]).reshape(B, T, s.num_heads, s.d_kv)
            x = x + self._attn(b, h, k, v, q_pos, jnp.int32(T), bias)
            h = rms_norm(x, b["ln_ff"], s.rms_eps)
            if s.is_sparse(i, False):
                y, _ = self._routed_ff(
                    b, h, s.moe_layer_id(i, False), experts, for_layer, impl
                )
            else:
                y = self._dense_ff(b, h)
            x = x + y
        return rms_norm(x, params["enc_final_ln"], s.rms_eps)

    # ---- decoder --------------------------------------------------------
    def init_cache(self, batch: int, max_len: int) -> List[KVCache]:
        s = self.spec
        return [
            KVCache.empty(batch, max_len, s.num_heads, s.d_kv, self.dtype)
            for _ in range(s.num_decoder_layers)
        ]

    def cross_kv_block(self, b, enc_out):
        """One decoder block's cross-attention K/V (dense paging computes
        these per paged block instead of over the whole stack)."""
        s = self.spec
        B, Te, _ = enc_out.shape
        k = linear(enc_out, b["ck"]).reshape(B, Te, s.num_heads, s.d_kv)
        v = linear(enc_out, b["cv"]).reshape(B, Te, s.num_heads, s.d_kv)
        return k, v

    def cross_kv(self, params, enc_out):
        """Precompute decoder cross-attention K/V from the encoder output."""
        return [
            self.cross_kv_block(b, enc_out) for b in params["dec_blocks"]
        ]

    def decode_step(
        self, params, experts, dec_tokens, positions, kvs, kv_len,
        enc_mask, cross, for_layer, impl="ragged", row_offsets=None,
    ):
        """dec_tokens [B, T]; returns (logits, new kvs, trace ids).
        row_offsets [B] (optional, T must be 1): PER-ROW decode positions —
        each batch row writes its K/V at its own cache column and sees its
        own relative-position bias (continuous seq2seq batching: slots at
        different decode depths share one compiled step)."""
        s = self.spec
        B, T = dec_tokens.shape
        x = params["embed"][dec_tokens].astype(self.dtype)
        S = kvs[0].k.shape[1]
        k_pos = jnp.arange(S, dtype=jnp.int32)
        if row_offsets is None:
            bias = t5_position_bias(
                params["dec_blocks"][0]["rel_bias"], positions[0], k_pos,
                False, s.rel_buckets, s.rel_max_distance,
            )
        else:
            from moe_infinity_tpu.models.layers import t5_relative_bucket

            rel = k_pos[None, :] - row_offsets[:, None]  # [B, S]
            buckets = t5_relative_bucket(
                rel, False, s.rel_buckets, s.rel_max_distance
            )
            # [B, S, H] -> [B, H, 1, S]
            bias = jnp.transpose(
                params["dec_blocks"][0]["rel_bias"][buckets], (0, 2, 1)
            )[:, :, None, :]
        cross_bias = jnp.where(
            enc_mask[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min
        )
        new_kvs, trace = [], []
        for i, b in enumerate(params["dec_blocks"]):
            h = rms_norm(x, b["ln0"], s.rms_eps)
            k = linear(h, b["k"]).reshape(B, T, s.num_heads, s.d_kv)
            v = linear(h, b["v"]).reshape(B, T, s.num_heads, s.d_kv)
            if row_offsets is None:
                kv = kvs[i].update(k, v, kv_len)
                valid_len = kv_len + T
            else:
                kv = kvs[i].update_rows(k, v, row_offsets)
                # per-row validity rides the causal mask: columns beyond a
                # row's own position (incl. a prior occupant's leftovers)
                # are masked by key_pos <= positions
                valid_len = jnp.int32(S)
            q = linear(h, b["q"]).reshape(B, T, s.num_heads, s.d_kv)
            a = attend(
                q, kv.k, kv.v, positions, valid_len,
                scale=1.0, causal=True, bias=bias,
            )
            x = x + linear(a.reshape(B, T, -1), b["o"])
            # cross attention
            h = rms_norm(x, b["ln_cross"], s.rms_eps)
            ck, cv = cross[i]
            a = attend(
                linear(h, b["cq"]).reshape(B, T, s.num_heads, s.d_kv),
                ck, cv, positions, jnp.int32(ck.shape[1]),
                scale=1.0, causal=False, bias=cross_bias,
            )
            x = x + linear(a.reshape(B, T, -1), b["co"])
            # FF
            h = rms_norm(x, b["ln_ff"], s.rms_eps)
            if s.is_sparse(i, True):
                y, ids = self._routed_ff(
                    b, h, s.moe_layer_id(i, True), experts, for_layer, impl
                )
                trace.append(ids)
            else:
                y = self._dense_ff(b, h)
            x = x + y
            new_kvs.append(kv)
        x = rms_norm(x, params["dec_final_ln"], s.rms_eps)
        if s.tie_embeddings:
            x = x * (s.d_model**-0.5)
            w = params["embed"]
        else:
            w = params["lm_head"]
        logits = linear(x.astype(jnp.float32), w.astype(jnp.float32))
        return logits, new_kvs, trace
