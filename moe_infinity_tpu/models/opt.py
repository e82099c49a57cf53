"""OPT — dense decoder-only family behind the same MoE facade.

Facade parity with the reference's MODEL_MAPPING_NAMES "opt" entry
(/root/reference/moe_infinity/common/constants.py:22): the reference
serves plain OPTForCausalLM by paging every layer as a dense offload
unit. Here OPT loads from the same ingest/dense-archive path and decodes
through the standard Stepper/Generator machinery — there are simply no
expert tensors to manage.

HF semantics mirrored (transformers modeling_opt.py): learned positional
embeddings with a +2 index offset (OPTLearnedPositionalEmbedding), biased
q/k/v/out and fc projections, pre-norm blocks (do_layer_norm_before=True
— the OPT-350m post-norm/projected variant is rejected at spec build),
final decoder LayerNorm, lm_head tied to the token embedding.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from moe_infinity_tpu.models.layers import (
    KVCache,
    attend,
    layer_norm,
    linear,
)

_EPS = 1e-5  # nn.LayerNorm default; OPTConfig carries no eps knob


@dataclass(frozen=True)
class OPTSpec:
    vocab_size: int
    hidden_size: int
    ffn_dim: int
    num_layers: int
    num_heads: int
    max_positions: int
    activation: str = "relu"

    @classmethod
    def from_hf(cls, cfg) -> "OPTSpec":
        if not getattr(cfg, "do_layer_norm_before", True):
            raise NotImplementedError(
                "OPT post-norm variant (350m) is not supported"
            )
        proj = getattr(cfg, "word_embed_proj_dim", cfg.hidden_size)
        if proj not in (None, cfg.hidden_size):
            raise NotImplementedError(
                "OPT word_embed_proj_dim != hidden_size is not supported"
            )
        return cls(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            ffn_dim=cfg.ffn_dim,
            num_layers=cfg.num_hidden_layers,
            num_heads=cfg.num_attention_heads,
            max_positions=cfg.max_position_embeddings,
            activation=getattr(cfg, "activation_function", "relu"),
        )

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


class OPTModel:
    arch = "opt"

    def __init__(self, spec: OPTSpec, compute_dtype=jnp.bfloat16):
        self.spec = spec
        self.dtype = compute_dtype

    # ---- cache -------------------------------------------------------------
    def init_cache(self, batch: int, max_len: int) -> List[KVCache]:
        s = self.spec
        return [
            KVCache.empty(batch, max_len, s.num_heads, s.head_dim, self.dtype)
            for _ in range(s.num_layers)
        ]

    def moe_layer_index(self, li: int):
        return None  # every layer is dense

    # ---- forward (Stepper protocol surface) ---------------------------------
    def forward(
        self,
        params: Dict[str, Any],
        experts,  # unused: dense model
        tokens: jax.Array,  # [B, T]
        positions: jax.Array,  # [B, T] absolute (0-based)
        kv_caches: List[KVCache],
        kv_len: jax.Array,  # scalar int32
        *,
        for_layer=None,  # unused
        impl: str = "ragged",  # unused
        pad_offsets=None,
    ):
        s = self.spec
        x = self.embed_step(params, tokens, positions, pad_offsets)
        new_kvs = []
        for li in range(s.num_layers):
            x, kv = self.dense_layer(
                params["layers"][li], x, kv_caches[li], positions, kv_len
            )
            new_kvs.append(kv)
        return self.head(params, x), new_kvs, None

    # ---- per-layer stage protocol (dense paging rides these) ---------------
    def embed_step(self, params, tokens, positions, pad_offsets=None):
        pos = positions
        if pad_offsets is not None:
            pos = positions - pad_offsets[:, None]
        # learned positions, HF's +2 offset
        return (
            params["embed"][tokens] + params["pos"][jnp.clip(pos, 0) + 2]
        ).astype(self.dtype)

    def dense_layer(self, pl, x, kv, positions, kv_len):
        s = self.spec
        B, T = x.shape[:2]
        H, Dh = s.num_heads, s.head_dim
        act = jax.nn.gelu if s.activation.startswith("gelu") else jax.nn.relu
        h = layer_norm(x, pl["ln0_w"], pl["ln0_b"], _EPS)
        q = linear(h, pl["q"], pl["qb"]).reshape(B, T, H, Dh)
        k = linear(h, pl["k"], pl["kb"]).reshape(B, T, H, Dh)
        v = linear(h, pl["v"], pl["vb"]).reshape(B, T, H, Dh)
        kv = kv.update(k, v, kv_len)
        a = attend(q, kv.k, kv.v, positions, kv_len + T, causal=True)
        x = x + linear(a.reshape(B, T, -1), pl["o"], pl["ob"])
        h = layer_norm(x, pl["lnf_w"], pl["lnf_b"], _EPS)
        x = x + linear(
            act(linear(h, pl["fc1"], pl["fc1b"])), pl["fc2"], pl["fc2b"]
        )
        return x, kv

    def head(self, params, x):
        x = layer_norm(x, params["final_ln_w"], params["final_ln_b"], _EPS)
        return linear(
            x.astype(jnp.float32), params["embed"].astype(jnp.float32)
        )

    # ---- params ------------------------------------------------------------
    def load_params(self, dense, device_put=jax.device_put) -> Dict[str, Any]:
        s = self.spec

        def get(name, dt=None):
            a = jnp.asarray(dense.get(name))
            if dt is None:
                dt = self.dtype if a.ndim >= 2 else jnp.float32
            return device_put(a.astype(dt))

        layers = []
        for i in range(s.num_layers):
            p = f"model.decoder.layers.{i}."
            layers.append(
                {
                    "ln0_w": get(p + "self_attn_layer_norm.weight"),
                    "ln0_b": get(p + "self_attn_layer_norm.bias"),
                    "q": get(p + "self_attn.q_proj.weight"),
                    "qb": get(p + "self_attn.q_proj.bias"),
                    "k": get(p + "self_attn.k_proj.weight"),
                    "kb": get(p + "self_attn.k_proj.bias"),
                    "v": get(p + "self_attn.v_proj.weight"),
                    "vb": get(p + "self_attn.v_proj.bias"),
                    "o": get(p + "self_attn.out_proj.weight"),
                    "ob": get(p + "self_attn.out_proj.bias"),
                    "lnf_w": get(p + "final_layer_norm.weight"),
                    "lnf_b": get(p + "final_layer_norm.bias"),
                    "fc1": get(p + "fc1.weight"),
                    "fc1b": get(p + "fc1.bias"),
                    "fc2": get(p + "fc2.weight"),
                    "fc2b": get(p + "fc2.bias"),
                }
            )
        return {
            "embed": get("model.decoder.embed_tokens.weight", self.dtype),
            "pos": get("model.decoder.embed_positions.weight", self.dtype),
            "final_ln_w": get("model.decoder.final_layer_norm.weight"),
            "final_ln_b": get("model.decoder.final_layer_norm.bias"),
            "layers": layers,
        }
