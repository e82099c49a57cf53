"""HF-parity: our JAX DeepSeek-V2 (absorbed MLA + grouped MoE) vs
transformers' DeepseekV2ForCausalLM (f32, CPU).

Exercises: MLA attention with latent KV cache (mathematically equal to the
HF full-K/V form), interleaved rope, greedy + group-limited routing,
shared experts, first_k_dense_replace dense layers.
"""

import numpy as np
import pytest
import torch
from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

import jax.numpy as jnp

from moe_infinity_tpu.models.deepseek_v2 import DeepseekV2ModelJax, DeepseekV2Spec
from moe_infinity_tpu.runtime.generate import Generator
from moe_infinity_tpu.runtime.providers import ResidentProvider
from moe_infinity_tpu.store.blob import DenseArchive, ExpertStore
from moe_infinity_tpu.store.ingest import ingest_checkpoint


def _make(tmp, *, q_lora_rank=None, topk_method="greedy", n_group=None,
          topk_group=None, seed=11):
    cfg = DeepseekV2Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        moe_intermediate_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        q_lora_rank=q_lora_rank,
        kv_lora_rank=32,
        qk_nope_head_dim=32,
        qk_rope_head_dim=16,
        v_head_dim=32,
        head_dim=16,  # HF uses this for the rotary dim (= qk_rope_head_dim)
        n_routed_experts=8,
        num_experts_per_tok=2,
        n_shared_experts=1,
        first_k_dense_replace=1,
        topk_method=topk_method,
        n_group=n_group,
        topk_group=topk_group,
        routed_scaling_factor=1.0,
        norm_topk_prob=False,
        aux_loss_alpha=0.0,
        seq_aux=False,
        max_position_embeddings=128,
        torch_dtype=torch.float32,
        architectures=["DeepseekV2ForCausalLM"],
        attention_bias=False,
    )
    torch.manual_seed(seed)
    hf = DeepseekV2ForCausalLM(cfg).eval()
    ckpt = tmp / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)
    store_dir = str(tmp / "store")
    ingest_checkpoint(
        str(ckpt), store_dir, cfg, expert_dtype="float32", dense_dtype="float32"
    )
    model = DeepseekV2ModelJax(
        DeepseekV2Spec.from_hf(cfg), compute_dtype=jnp.float32
    )
    params = model.load_params(DenseArchive(store_dir))
    provider = ResidentProvider(ExpertStore(store_dir), dtype=jnp.float32)
    gen = Generator(
        model, params, provider.pytree(), ResidentProvider.for_layer,
        max_seq_len=64,
    )
    return cfg, hf, model, gen


@pytest.fixture(scope="module")
def lite_setup(tmp_path_factory):
    return _make(tmp_path_factory.mktemp("dsv2lite"))


def test_forward_logits_match(lite_setup):
    cfg, hf, model, gen = lite_setup
    ids = torch.tensor([[3, 17, 42, 7, 99]])
    with torch.no_grad():
        want = hf(ids).logits.numpy()
    prompt = ids.numpy()
    import jax
    import numpy as np

    kv = gen.stepper.init_cache(1, 16)
    logits, _, _ = gen.stepper.forward(
        jnp.asarray(prompt, jnp.int32),
        jnp.broadcast_to(jnp.arange(5, dtype=jnp.int32), (1, 5)),
        kv,
        jnp.int32(0),
    )
    got = np.asarray(logits)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_greedy_generation_matches(lite_setup):
    cfg, hf, model, gen = lite_setup
    prompt = np.array([[5, 31, 8, 77]])
    with torch.no_grad():
        want = hf.generate(
            torch.tensor(prompt), max_new_tokens=8, do_sample=False,
            pad_token_id=0,
        ).numpy()
    got = gen.generate(prompt, max_new_tokens=8).sequences
    np.testing.assert_array_equal(got, want)


def test_group_limited_routing_matches(tmp_path_factory):
    cfg, hf, model, gen = _make(
        tmp_path_factory.mktemp("dsv2grp"),
        q_lora_rank=32,
        topk_method="group_limited_greedy",
        n_group=4,
        topk_group=2,
        seed=23,
    )
    prompt = np.array([[9, 3, 55, 12]])
    with torch.no_grad():
        want = hf.generate(
            torch.tensor(prompt), max_new_tokens=6, do_sample=False,
            pad_token_id=0,
        ).numpy()
    got = gen.generate(prompt, max_new_tokens=6).sequences
    np.testing.assert_array_equal(got, want)
