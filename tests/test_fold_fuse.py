"""Decode-path op-reduction transforms are exact: MLA weight folding
(w_uk/scale into the q projection, w_uv into o_proj) and fused gate+up
expert weights must reproduce the unfolded forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moe_infinity_tpu.models.deepseek_v2 import (
    DeepseekV2ModelJax,
    DeepseekV2Spec,
)
from moe_infinity_tpu.ops.moe import fuse_gateup, grouped_ffn
from moe_infinity_tpu.runtime.providers import ResidentProvider

BASE = dict(
    vocab_size=128, hidden_size=64, intermediate_size=96,
    moe_intermediate_size=48, num_layers=3, num_heads=4,
    kv_lora_rank=32, qk_nope_head_dim=32, qk_rope_head_dim=16,
    v_head_dim=32, num_experts=8, top_k=2, n_shared_experts=1,
    first_k_dense_replace=1, topk_method="greedy", n_group=None,
    topk_group=None, routed_scaling_factor=1.0, rms_eps=1e-6,
    rope_theta=10000.0, tie_embeddings=False,
)


def _fwd(model, params, experts, tokens, positions, kv, kv_len):
    return model.forward(
        params, experts, tokens, positions, kv, kv_len,
        for_layer=ResidentProvider.for_layer, impl="gather",
    )


@pytest.mark.slow  # >=9 s: fast-suite budget (VERDICT r4 item 8)
@pytest.mark.parametrize("q_lora", [None, 24])
def test_fold_mla_exact(q_lora):
    spec = DeepseekV2Spec(**BASE, q_lora_rank=q_lora)
    model = DeepseekV2ModelJax(spec, compute_dtype=jnp.float32)
    params, experts = model.init_random(jax.random.PRNGKey(7))
    folded = model.fold_mla_params(params)
    assert "w_uk" not in folded["layers"][0]
    assert "o_fold" in folded["layers"][0]

    tokens = jnp.asarray([[5, 9, 33, 2]], jnp.int32)
    positions = jnp.arange(4, dtype=jnp.int32)[None]
    kv1 = model.init_cache(1, 16)
    kv2 = model.init_cache(1, 16)
    l1, kv1, _ = jax.jit(_fwd, static_argnums=0)(
        model, params, experts, tokens, positions, kv1, jnp.int32(0)
    )
    l2, kv2, _ = jax.jit(_fwd, static_argnums=0)(
        model, folded, experts, tokens, positions, kv2, jnp.int32(0)
    )
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=2e-4, atol=2e-4)
    # greedy decode continues identically
    for step in range(4, 8):
        t1 = jnp.argmax(l1[:, -1:], -1).astype(jnp.int32)
        t2 = jnp.argmax(l2[:, -1:], -1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        pos = jnp.full((1, 1), step, jnp.int32)
        l1, kv1, _ = _fwd(model, params, experts, t1, pos, kv1, jnp.int32(step))
        l2, kv2, _ = _fwd(model, folded, experts, t2, pos, kv2, jnp.int32(step))


@pytest.mark.parametrize("impl", ["gather", "ragged", "dense"])
@pytest.mark.parametrize("quant", [False, True])
def test_fuse_gateup_exact(impl, quant):
    rng = np.random.default_rng(0)
    S, D, F, T, K = 6, 16, 24, 5, 2
    w = {
        "gate": jnp.asarray(rng.normal(size=(S, D, F)), jnp.float32),
        "up": jnp.asarray(rng.normal(size=(S, D, F)), jnp.float32),
        "down": jnp.asarray(rng.normal(size=(S, F, D)), jnp.float32),
    }
    if quant:
        w = {
            "gate": jnp.asarray(rng.integers(-127, 127, (S, D, F)), jnp.int8),
            "up": jnp.asarray(rng.integers(-127, 127, (S, D, F)), jnp.int8),
            "down": jnp.asarray(rng.integers(-127, 127, (S, F, D)), jnp.int8),
            "gate_scale": jnp.asarray(rng.uniform(1e-3, 2e-3, (S, F)), jnp.float32),
            "up_scale": jnp.asarray(rng.uniform(1e-3, 2e-3, (S, F)), jnp.float32),
            "down_scale": jnp.asarray(rng.uniform(1e-3, 2e-3, (S, D)), jnp.float32),
        }
    x = jnp.asarray(rng.normal(size=(T, D)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, S, (T, K)), jnp.int32)
    cw = jnp.asarray(rng.uniform(0, 1, (T, K)), jnp.float32)
    slot = jnp.arange(S, dtype=jnp.int32)

    ref = grouped_ffn(x, ids, cw, slot, w, "silu", impl=impl)
    fused = fuse_gateup(w)
    assert "gateup" in fused and "gate" not in fused
    got = grouped_ffn(x, ids, cw, slot, fused, "silu", impl=impl)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), rtol=1e-5, atol=1e-5
    )


def test_fold_and_fuse_stack():
    """Both transforms together through a greedy decode run."""
    spec = DeepseekV2Spec(**BASE, q_lora_rank=None)
    model = DeepseekV2ModelJax(spec, compute_dtype=jnp.float32)
    params, experts = model.init_random(jax.random.PRNGKey(3))
    folded = model.fold_mla_params(params)
    fused_experts = {
        "layers": [fuse_gateup(lt) for lt in experts["layers"]],
        "slot_map": experts["slot_map"],
    }
    tokens = jnp.asarray([[7, 3, 21]], jnp.int32)
    positions = jnp.arange(3, dtype=jnp.int32)[None]
    kv1, kv2 = model.init_cache(1, 16), model.init_cache(1, 16)
    l1, kv1, _ = _fwd(model, params, experts, tokens, positions, kv1, jnp.int32(0))
    l2, kv2, _ = _fwd(
        model, folded, fused_experts, tokens, positions, kv2, jnp.int32(0)
    )
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=2e-4, atol=2e-4)


def test_facade_fold_fuse_matches_hf(tmp_path):
    """MoE facade with fold_mla + fuse_gateup on a real DeepSeek checkpoint
    still matches HF greedy exactly."""
    import torch
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    from moe_infinity_tpu.entrypoints.api import MoE

    cfg = DeepseekV2Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4, q_lora_rank=None,
        kv_lora_rank=32, qk_nope_head_dim=32, qk_rope_head_dim=16,
        v_head_dim=32, head_dim=16, n_routed_experts=8,
        num_experts_per_tok=2, n_shared_experts=1, first_k_dense_replace=1,
        topk_method="greedy", n_group=None, topk_group=None,
        routed_scaling_factor=1.0, norm_topk_prob=False, aux_loss_alpha=0.0,
        seq_aux=False, max_position_embeddings=128,
        torch_dtype=torch.float32,
        architectures=["DeepseekV2ForCausalLM"], attention_bias=False,
    )
    torch.manual_seed(21)
    hf = DeepseekV2ForCausalLM(cfg).eval()
    ckpt = tmp_path / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)
    engine = MoE(
        str(ckpt),
        {"expert_dtype": "float32", "max_seq_len": 64,
         "fold_mla": True, "fuse_gateup": True,
         "offload_path": str(tmp_path / "store")},
    )
    assert "o_fold" in engine.params["layers"][0]
    prompt = np.array([[5, 31, 8, 77]])
    got = engine.generate(prompt, max_new_tokens=8)
    with __import__("torch").no_grad():
        want = hf.generate(
            __import__("torch").tensor(prompt), max_new_tokens=8,
            do_sample=False, pad_token_id=0,
        ).numpy()
    np.testing.assert_array_equal(got, want)
    engine.shutdown()
