"""NLLB-MoE (facebook/nllb-moe-54b) — M2M100-style encoder-decoder MoE.

Own JAX definition with HF parity (reference swaps SyncNllbMoeSparseMLP,
/root/reference/moe_infinity/models/nllb_moe.py:46-109; oracle is
transformers' modeling_nllb_moe). Inference-mode semantics:

* pre-LN transformer with biased LayerNorms and biased attention
  projections; scaled dot-product attention (1/sqrt(d_head));
* sinusoidal positions (M2M100 table, padding_idx=1, position ids =
  cumsum of the non-pad mask + padding_idx), embeddings scaled by
  sqrt(d_model);
* top-2 router: top-1 by softmax prob, top-2 = argmax of logits with the
  top-1 masked out; combine weights are the two probs normalized to sum
  to one. With the default `moe_eval_capacity_token_fraction = 1.0`,
  capacity never binds at eval, so no token dropping;
* sparse FF every `sparse_step` layers at blocks (i+1) % step == 0;
  expert FFNs carry fc1/fc2 biases.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from moe_infinity_tpu.models.layers import (
    KVCache,
    attend,
    layer_norm,
    linear,
    sinusoidal_embedding,
)
from moe_infinity_tpu.ops.moe import grouped_ffn, grouped_ffn_ep


@dataclass(frozen=True)
class NllbSpec:
    vocab_size: int
    d_model: int
    num_heads: int
    encoder_layers: int
    decoder_layers: int
    encoder_ffn_dim: int
    decoder_ffn_dim: int
    encoder_sparse_step: int
    decoder_sparse_step: int
    num_experts: int
    pad_token_id: int
    decoder_start_token_id: int
    max_positions: int
    scale_embedding: bool

    @classmethod
    def from_hf(cls, config) -> "NllbSpec":
        return cls(
            vocab_size=config.vocab_size,
            d_model=config.d_model,
            num_heads=config.encoder_attention_heads,
            encoder_layers=config.encoder_layers,
            decoder_layers=config.decoder_layers,
            encoder_ffn_dim=config.encoder_ffn_dim,
            decoder_ffn_dim=config.decoder_ffn_dim,
            encoder_sparse_step=config.encoder_sparse_step,
            decoder_sparse_step=config.decoder_sparse_step,
            num_experts=config.num_experts,
            pad_token_id=config.pad_token_id,
            decoder_start_token_id=config.decoder_start_token_id,
            max_positions=config.max_position_embeddings,
            scale_embedding=getattr(config, "scale_embedding", True),
        )

    def is_sparse(self, block: int, decoder: bool) -> bool:
        step = self.decoder_sparse_step if decoder else self.encoder_sparse_step
        return step > 0 and (block + 1) % step == 0

    def moe_layer_id(self, block: int, decoder: bool) -> int:
        step = self.decoder_sparse_step if decoder else self.encoder_sparse_step
        base = 0
        if decoder:
            base = self.encoder_layers // self.encoder_sparse_step
        return base + block // step


class NllbModel:
    arch = "nllb"

    def __init__(self, spec: NllbSpec, compute_dtype=jnp.float32, mesh=None):
        self.spec = spec
        self.dtype = compute_dtype
        self.mesh = mesh
        # speculative engines set this > 0: the trace then carries the
        # router's next-m runner-ups so acquisition covers near-tie flips
        self.route_margin = 0
        self._pos_table = sinusoidal_embedding(
            spec.max_positions + spec.pad_token_id + 1,
            spec.d_model,
            padding_idx=spec.pad_token_id,
        )
        self._scale = spec.d_model**0.5 if spec.scale_embedding else 1.0

    # ---- params ---------------------------------------------------------
    def load_params(self, dense, device_put=jax.device_put) -> Dict[str, Any]:
        s = self.spec

        def get(name, dt=None):
            a = jnp.asarray(dense.get(name))
            if dt is None:
                dt = self.dtype if a.ndim >= 2 else jnp.float32
            return device_put(a.astype(dt))

        def attn(prefix):
            return {
                "q": get(prefix + "q_proj.weight"),
                "qb": get(prefix + "q_proj.bias"),
                "k": get(prefix + "k_proj.weight"),
                "kb": get(prefix + "k_proj.bias"),
                "v": get(prefix + "v_proj.weight"),
                "vb": get(prefix + "v_proj.bias"),
                "o": get(prefix + "out_proj.weight"),
                "ob": get(prefix + "out_proj.bias"),
            }

        def stack(prefix, n, decoder):
            blocks = []
            for i in range(n):
                p = f"{prefix}.layers.{i}."
                b: Dict[str, Any] = {
                    "self_attn": attn(p + "self_attn."),
                    "ln0_w": get(p + "self_attn_layer_norm.weight"),
                    "ln0_b": get(p + "self_attn_layer_norm.bias"),
                    "lnf_w": get(p + "ff_layer_norm.weight"),
                    "lnf_b": get(p + "ff_layer_norm.bias"),
                }
                if decoder:
                    b["cross_attn"] = attn(p + "cross_attention.")
                    b["lnc_w"] = get(p + "cross_attention_layer_norm.weight")
                    b["lnc_b"] = get(p + "cross_attention_layer_norm.bias")
                if s.is_sparse(i, decoder):
                    b["router"] = get(p + "ffn.router.classifier.weight", jnp.float32)
                    # zero by default (HF NLLB's router classifier has no
                    # bias); benches inject expert-popularity skew here
                    # (bench.py skewed-locality leg) without changing the
                    # params treedef of compiled programs
                    b["router_bias"] = jnp.zeros(
                        s.num_experts, jnp.float32
                    )
                else:
                    b["fc1"] = get(p + "ffn.fc1.weight")
                    b["fc1b"] = get(p + "ffn.fc1.bias")
                    b["fc2"] = get(p + "ffn.fc2.weight")
                    b["fc2b"] = get(p + "ffn.fc2.bias")
                blocks.append(b)
            return blocks

        return {
            "embed": get("model.shared.weight"),
            "enc_blocks": stack("model.encoder", s.encoder_layers, False),
            "enc_final_ln_w": get("model.encoder.layer_norm.weight"),
            "enc_final_ln_b": get("model.encoder.layer_norm.bias"),
            "dec_blocks": stack("model.decoder", s.decoder_layers, True),
            "dec_final_ln_w": get("model.decoder.layer_norm.weight"),
            "dec_final_ln_b": get("model.decoder.layer_norm.bias"),
        }

    def init_random(self, key, *, expert_dtype=None, with_experts=True):
        """Random params (+ optional resident expert tree) at spec geometry
        for tests and synthetic benchmarks — weight values don't change the
        compute graph. with_experts=False skips the expert tree (NLLB-54B's
        expert tiers are ~100 GB bf16; benches stream them quantized)."""
        s = self.spec
        expert_dtype = expert_dtype or self.dtype
        D, E = s.d_model, s.num_experts
        keys = jax.random.split(
            key, 2 + s.encoder_layers + s.decoder_layers
        )

        def mat(k, shape, dt, scale=0.02):
            return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)

        def attn(k):
            ks = jax.random.split(k, 4)
            return {
                "q": mat(ks[0], (D, D), self.dtype),
                "qb": jnp.zeros(D, jnp.float32),
                "k": mat(ks[1], (D, D), self.dtype),
                "kb": jnp.zeros(D, jnp.float32),
                "v": mat(ks[2], (D, D), self.dtype),
                "vb": jnp.zeros(D, jnp.float32),
                "o": mat(ks[3], (D, D), self.dtype),
                "ob": jnp.zeros(D, jnp.float32),
            }

        experts: List[Dict[str, Any]] = []

        def block(k, i, decoder):
            F = s.decoder_ffn_dim if decoder else s.encoder_ffn_dim
            ks = jax.random.split(k, 8)
            b: Dict[str, Any] = {
                "self_attn": attn(ks[0]),
                "ln0_w": jnp.ones(D, jnp.float32),
                "ln0_b": jnp.zeros(D, jnp.float32),
                "lnf_w": jnp.ones(D, jnp.float32),
                "lnf_b": jnp.zeros(D, jnp.float32),
            }
            if decoder:
                b["cross_attn"] = attn(ks[1])
                b["lnc_w"] = jnp.ones(D, jnp.float32)
                b["lnc_b"] = jnp.zeros(D, jnp.float32)
            if s.is_sparse(i, decoder):
                b["router"] = mat(ks[2], (E, D), jnp.float32, scale=0.5)
                b["router_bias"] = jnp.zeros(E, jnp.float32)
                if with_experts:
                    experts.append(
                        {
                            "gate": mat(ks[3], (E, D, F), expert_dtype),
                            "down": mat(ks[4], (E, F, D), expert_dtype),
                            "gate_bias": jnp.zeros((E, F), jnp.float32),
                            "down_bias": jnp.zeros((E, D), jnp.float32),
                        }
                    )
            else:
                b["fc1"] = mat(ks[5], (F, D), self.dtype)
                b["fc1b"] = jnp.zeros(F, jnp.float32)
                b["fc2"] = mat(ks[6], (D, F), self.dtype)
                b["fc2b"] = jnp.zeros(D, jnp.float32)
            return b

        params = {
            "embed": mat(keys[0], (s.vocab_size, D), self.dtype),
            "enc_blocks": [
                block(keys[2 + i], i, False) for i in range(s.encoder_layers)
            ],
            "enc_final_ln_w": jnp.ones(D, jnp.float32),
            "enc_final_ln_b": jnp.zeros(D, jnp.float32),
            "dec_blocks": [
                block(keys[2 + s.encoder_layers + i], i, True)
                for i in range(s.decoder_layers)
            ],
            "dec_final_ln_w": jnp.ones(D, jnp.float32),
            "dec_final_ln_b": jnp.zeros(D, jnp.float32),
        }
        if not with_experts:
            return params, None
        tree = {
            "layers": experts,
            "slot_map": jnp.arange(E, dtype=jnp.int32),
        }
        return params, tree

    # ---- building blocks -------------------------------------------------
    def _attn(self, a, x_q, k, v, q_pos, kv_len, *, causal, pad_bias=None):
        s = self.spec
        B, T, D = x_q.shape
        H = s.num_heads
        Dh = D // H
        q = linear(x_q, a["q"], a["qb"]).reshape(B, T, H, Dh)
        out = attend(
            q, k, v, q_pos, kv_len,
            scale=Dh**-0.5, causal=causal, bias=pad_bias,
        )
        return linear(out.reshape(B, T, D), a["o"], a["ob"])

    def _kv(self, a, x):
        s = self.spec
        B, T, D = x.shape
        H = s.num_heads
        k = linear(x, a["k"], a["kb"]).reshape(B, T, H, D // H)
        v = linear(x, a["v"], a["vb"]).reshape(B, T, H, D // H)
        return k, v

    def _route_top2(self, b, h, margin: int = 0):
        """Eval-mode NLLB top-2 (no capacity dropping). margin > 0 also
        returns the NEXT-m runner-up expert ids (trace_ids [BT, 2+m]):
        the speculative engines widen acquisition to the router's own
        near-tie candidates so a replay's routing flip lands on an
        already-resident expert (chip diagnosis: deep-layer top-2 sits at
        near-ties under drift, so each replay flipped to a NEW expert and
        the block re-missed — 5 dispatches per 4-token block)."""
        E = self.spec.num_experts
        B, T, D = h.shape
        logits = linear(h.astype(jnp.float32), b["router"]).reshape(B * T, E)
        rb = b.get("router_bias")
        if rb is not None:
            # additive per-expert popularity bias: zero in every served
            # configuration (HF NLLB routers are bias-free); the bench's
            # skewed-locality leg sets Zipf-shaped values to model the
            # skewed, temporally local routing of real workloads
            logits = logits + rb
        probs = jax.nn.softmax(logits, axis=-1)
        top1 = jnp.argmax(probs, axis=-1)
        masked = jnp.where(
            jax.nn.one_hot(top1, E, dtype=bool), -jnp.inf, logits
        )
        top2 = jnp.argmax(masked, axis=-1)
        w1 = jnp.take_along_axis(probs, top1[:, None], axis=-1)[:, 0]
        w2 = jnp.take_along_axis(probs, top2[:, None], axis=-1)[:, 0]
        denom = jnp.maximum(w1 + w2, jnp.finfo(jnp.float32).eps)
        ids = jnp.stack([top1, top2], axis=-1).astype(jnp.int32)
        cw = jnp.stack([w1 / denom, w2 / denom], axis=-1)
        if margin <= 0:
            return cw, ids, ids
        masked2 = jnp.where(
            jax.nn.one_hot(top2, E, dtype=bool), -jnp.inf, masked
        )
        nxt = jax.lax.top_k(masked2, margin)[1].astype(jnp.int32)
        return cw, ids, jnp.concatenate([ids, nxt], axis=-1)

    def _ff(self, b, h, mli, experts, for_layer, impl, trace=None):
        s = self.spec
        B, T, D = h.shape
        if mli is None:
            a = jax.nn.relu(linear(h, b["fc1"], b["fc1b"]))
            return linear(a, b["fc2"], b["fc2b"])
        cw, ids, trace_ids = self._route_top2(b, h, self.route_margin)
        if trace is not None:
            trace.append(trace_ids.reshape(B, T, -1))
        weights, slot_map, biases = for_layer(experts, mli)
        y = grouped_ffn(
            h.reshape(B * T, D), ids, cw, slot_map, weights, "relu",
            biases=biases, impl=impl,
        )
        return y.reshape(B, T, D)

    # ---- stage protocol (seq2seq offload engine) -------------------------
    def apply_ff(self, x, h, cw, ids, weights, slot_map, biases, impl):
        """Under an expert-axis mesh: shard_map EP dispatch with GLOBAL
        slot ids (seq2seq pod serving, parallel/pod.py)."""
        B, T, D = h.shape
        K = ids.shape[-1]
        if self.mesh is not None and self.mesh.shape.get("expert", 1) > 1:
            y = grouped_ffn_ep(
                h.reshape(B * T, D), ids.reshape(B * T, K),
                cw.reshape(B * T, K).astype(jnp.float32), slot_map, weights,
                "relu", mesh=self.mesh, biases=biases, impl=impl,
            )
        else:
            y = grouped_ffn(
                h.reshape(B * T, D), ids.reshape(B * T, K),
                cw.reshape(B * T, K), slot_map, weights, "relu",
                biases=biases, impl=impl,
            )
        return x + y.reshape(B, T, D)

    def enc_prelude(self, params, tokens, pad_mask):
        B, T = tokens.shape
        x = self._embed(params, tokens)
        bias = jnp.where(
            pad_mask[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min
        )
        q_pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
        return x, bias, q_pos

    def _enc_attn(self, b, x, bias, q_pos):
        T = x.shape[1]
        h = layer_norm(x, b["ln0_w"], b["ln0_b"], 1e-5)
        k, v = self._kv(b["self_attn"], h)
        x = x + self._attn(
            b["self_attn"], h, k, v, q_pos, jnp.int32(T),
            causal=False, pad_bias=bias,
        )
        return x, layer_norm(x, b["lnf_w"], b["lnf_b"], 1e-5)

    def enc_block_sparse_pre(self, b, x, bias, q_pos):
        x, h = self._enc_attn(b, x, bias, q_pos)
        B, T, _ = h.shape
        cw, ids, _ = self._route_top2(b, h)
        return x, h, cw.reshape(B, T, -1), ids.reshape(B, T, -1)

    def enc_block_dense(self, b, x, bias, q_pos):
        x, h = self._enc_attn(b, x, bias, q_pos)
        a = jax.nn.relu(linear(h, b["fc1"], b["fc1b"]))
        return x + linear(a, b["fc2"], b["fc2b"])

    def enc_final(self, params, x):
        return layer_norm(
            x, params["enc_final_ln_w"], params["enc_final_ln_b"], 1e-5
        )

    def dec_prelude(self, params, positions, cache_len: int, enc_mask):
        cross_bias = jnp.where(
            enc_mask[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min
        )
        return None, cross_bias  # no self-attn bias in NLLB

    def _dec_attn(self, b, x, kv, positions, kv_len, bias, ck, cv, cross_bias):
        B, T, _ = x.shape
        h = layer_norm(x, b["ln0_w"], b["ln0_b"], 1e-5)
        k, v = self._kv(b["self_attn"], h)
        kv = kv.update(k, v, kv_len)
        x = x + self._attn(
            b["self_attn"], h, kv.k, kv.v, positions, kv_len + T, causal=True
        )
        h = layer_norm(x, b["lnc_w"], b["lnc_b"], 1e-5)
        x = x + self._attn(
            b["cross_attn"], h, ck, cv, positions,
            jnp.int32(ck.shape[1]), causal=False, pad_bias=cross_bias,
        )
        return x, layer_norm(x, b["lnf_w"], b["lnf_b"], 1e-5), kv

    def dec_block_sparse_pre(self, b, x, kv, positions, kv_len, bias, ck, cv, cross_bias):
        x, h, kv = self._dec_attn(
            b, x, kv, positions, kv_len, bias, ck, cv, cross_bias
        )
        B, T, _ = h.shape
        cw, ids, _ = self._route_top2(b, h)
        return x, h, cw.reshape(B, T, -1), ids.reshape(B, T, -1), kv

    def dec_block_dense(self, b, x, kv, positions, kv_len, bias, ck, cv, cross_bias):
        x, h, kv = self._dec_attn(
            b, x, kv, positions, kv_len, bias, ck, cv, cross_bias
        )
        a = jax.nn.relu(linear(h, b["fc1"], b["fc1b"]))
        return x + linear(a, b["fc2"], b["fc2b"]), kv

    def dec_final(self, params, x):
        x = layer_norm(
            x, params["dec_final_ln_w"], params["dec_final_ln_b"], 1e-5
        )
        return linear(
            x.astype(jnp.float32), params["embed"].astype(jnp.float32)
        )

    def dec_embed(self, params, dec_tokens, step=0):
        return self._embed(params, dec_tokens, step)

    def _positions(self, tokens: jax.Array, past: int) -> jax.Array:
        mask = (tokens != self.spec.pad_token_id).astype(jnp.int32)
        return (jnp.cumsum(mask, axis=1) + past) * mask + self.spec.pad_token_id

    def _embed(self, params, tokens, past=0):
        x = params["embed"][tokens].astype(self.dtype) * self._scale
        pos = self._positions(tokens, past)
        return x + self._pos_table[pos].astype(self.dtype)

    # ---- encoder --------------------------------------------------------
    def encode(self, params, experts, tokens, pad_mask, for_layer, impl="ragged"):
        s = self.spec
        B, T = tokens.shape
        x = self._embed(params, tokens)
        bias = jnp.where(
            pad_mask[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min
        )
        q_pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
        for i, b in enumerate(params["enc_blocks"]):
            h = layer_norm(x, b["ln0_w"], b["ln0_b"], 1e-5)
            k, v = self._kv(b["self_attn"], h)
            x = x + self._attn(
                b["self_attn"], h, k, v, q_pos, jnp.int32(T),
                causal=False, pad_bias=bias,
            )
            h = layer_norm(x, b["lnf_w"], b["lnf_b"], 1e-5)
            mli = s.moe_layer_id(i, False) if s.is_sparse(i, False) else None
            x = x + self._ff(b, h, mli, experts, for_layer, impl)
        return layer_norm(x, params["enc_final_ln_w"], params["enc_final_ln_b"], 1e-5)

    # ---- decoder --------------------------------------------------------
    def init_cache(self, batch: int, max_len: int) -> List[KVCache]:
        s = self.spec
        H = s.num_heads
        return [
            KVCache.empty(batch, max_len, H, s.d_model // H, self.dtype)
            for _ in range(s.decoder_layers)
        ]

    def cross_kv_block(self, b, enc_out):
        """One decoder block's cross-attention K/V (dense paging computes
        these per paged block instead of over the whole stack)."""
        return self._kv(b["cross_attn"], enc_out)

    def cross_kv(self, params, enc_out):
        return [
            self.cross_kv_block(b, enc_out) for b in params["dec_blocks"]
        ]

    def decode_step(
        self, params, experts, dec_tokens, positions, kvs, kv_len,
        enc_mask, cross, for_layer, impl="ragged", row_offsets=None,
    ):
        """row_offsets [B] (optional, T must be 1): PER-ROW decode
        positions — each row writes its K/V at its own cache column and
        embeds its own sinusoidal position id (continuous seq2seq
        batching: slots at different decode depths share one step)."""
        s = self.spec
        B, T = dec_tokens.shape
        # kv_len tracks decoded length; sinusoidal ids derive from it
        x = self._embed(
            params, dec_tokens,
            past=kv_len if row_offsets is None else row_offsets[:, None],
        )
        cross_bias = jnp.where(
            enc_mask[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min
        )
        S = kvs[0].k.shape[1]
        new_kvs, trace = [], []
        for i, b in enumerate(params["dec_blocks"]):
            h = layer_norm(x, b["ln0_w"], b["ln0_b"], 1e-5)
            k, v = self._kv(b["self_attn"], h)
            if row_offsets is None:
                kv = kvs[i].update(k, v, kv_len)
                valid_len = kv_len + T
            else:
                kv = kvs[i].update_rows(k, v, row_offsets)
                valid_len = jnp.int32(S)  # causal mask bounds each row
            x = x + self._attn(
                b["self_attn"], h, kv.k, kv.v, positions, valid_len,
                causal=True,
            )
            h = layer_norm(x, b["lnc_w"], b["lnc_b"], 1e-5)
            ck, cv = cross[i]
            x = x + self._attn(
                b["cross_attn"], h, ck, cv, positions,
                jnp.int32(ck.shape[1]), causal=False, pad_bias=cross_bias,
            )
            h = layer_norm(x, b["lnf_w"], b["lnf_b"], 1e-5)
            mli = s.moe_layer_id(i, True) if s.is_sparse(i, True) else None
            x = x + self._ff(b, h, mli, experts, for_layer, impl, trace)
            new_kvs.append(kv)
        x = layer_norm(
            x, params["dec_final_ln_w"], params["dec_final_ln_b"], 1e-5
        )
        logits = linear(
            x.astype(jnp.float32), params["embed"].astype(jnp.float32)
        )
        # trace: [L_dec_moe, B, T, K] routed expert ids, decoder sparse
        # layers in order (consumed by the speculative whole-step decoder)
        return logits, new_kvs, jnp.stack(trace) if trace else []
