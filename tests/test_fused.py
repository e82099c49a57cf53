"""Fused scan-over-layers path vs the reference per-layer path (tiny
DeepSeek-V2, CPU with Pallas interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moe_infinity_tpu.models.deepseek_v2 import DeepseekV2ModelJax, DeepseekV2Spec
from moe_infinity_tpu.runtime.fused import FusedRunner
from moe_infinity_tpu.runtime.providers import ResidentProvider

SPEC = DeepseekV2Spec(
    vocab_size=128, hidden_size=64, intermediate_size=96,
    moe_intermediate_size=128, num_layers=3, num_heads=4,
    q_lora_rank=None, kv_lora_rank=32, qk_nope_head_dim=32,
    qk_rope_head_dim=16, v_head_dim=32, num_experts=8, top_k=2,
    n_shared_experts=1, first_k_dense_replace=1, topk_method="greedy",
    n_group=None, topk_group=None, routed_scaling_factor=1.0,
    rms_eps=1e-6, rope_theta=10000.0, tie_embeddings=False,
)


@pytest.fixture(scope="module")
def setup():
    model = DeepseekV2ModelJax(SPEC, compute_dtype=jnp.float32)
    params, experts = model.init_random(jax.random.PRNGKey(5))
    pool = model.stack_experts(experts["layers"])
    runner = FusedRunner(model, params, pool, interpret=True)
    return model, params, experts, runner


def test_fused_prefill_matches_layer_path(setup):
    model, params, experts, runner = setup
    B, T, CAP = 1, 5, 16
    tokens = jnp.asarray([[3, 17, 42, 7, 99]], jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))

    kv = model.init_cache(B, CAP)
    want, _, _ = model.forward(
        params, experts, tokens, positions, kv, jnp.int32(0),
        for_layer=ResidentProvider.for_layer,
    )

    kv_state = runner.init_cache(B, CAP)
    got, _ = runner.prefill(tokens, positions, kv_state, jnp.int32(0))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_fused_gather_impl_matches(setup):
    model, params, experts, runner = setup
    pool_flat = model.stack_experts(experts["layers"], layout="flat")
    runner_g = FusedRunner(model, params, pool_flat, moe_impl="gather")
    B, T, CAP = 1, 5, 16
    tokens = jnp.asarray([[3, 17, 42, 7, 99]], jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    kv_state = runner.init_cache(B, CAP)
    want, _ = runner.prefill(tokens, positions, kv_state, jnp.int32(0))
    kv_state = runner_g.init_cache(B, CAP)
    got, _ = runner_g.prefill(tokens, positions, kv_state, jnp.int32(0))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_shared_in_pool_matches_default(setup):
    """Shared experts folded into the routed pool reproduce the default
    path exactly (down-proj decomposes over F-sized chunks)."""
    from moe_infinity_tpu.runtime.generate import Generator

    model, params, experts, _ = setup
    pooled_model = DeepseekV2ModelJax(
        SPEC, compute_dtype=jnp.float32, shared_in_pool=True
    )
    pooled_experts = pooled_model.pool_shared_experts(
        experts["layers"], params
    )
    gen_a = Generator(
        model, params, experts, ResidentProvider.for_layer, max_seq_len=32
    )
    gen_b = Generator(
        pooled_model, params, pooled_experts, ResidentProvider.for_layer,
        max_seq_len=32, impl="gather",
    )
    prompt = np.array([[5, 31, 8, 77]])
    a = gen_a.generate(prompt, max_new_tokens=6).sequences
    b = gen_b.generate(prompt, max_new_tokens=6).sequences
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow  # >=9 s: fast-suite budget (VERDICT r4 item 8)
def test_fused_decode_matches_stepwise(setup):
    model, params, experts, runner = setup
    B, T, CAP, N = 1, 4, 16, 5
    prompt = np.array([[5, 31, 8, 77]])
    from moe_infinity_tpu.runtime.generate import Generator

    gen = Generator(
        model, params, experts, ResidentProvider.for_layer, max_seq_len=CAP
    )
    want = gen.generate(prompt, max_new_tokens=N).sequences

    kv_state = runner.init_cache(B, CAP)
    tokens = jnp.asarray(prompt, jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    logits, kv_state = runner.prefill(tokens, positions, kv_state, jnp.int32(0))
    tok0 = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
    toks, _ = runner.decode(tok0, jnp.full((B,), T, jnp.int32), kv_state, N - 1)
    got = np.concatenate([prompt, np.asarray(tok0), np.asarray(toks)], axis=1)
    np.testing.assert_array_equal(got, want)
