"""HF-parity for DeepSeek-V3: sigmoid + noaux-tc routing (correction bias,
sum-of-top-2 group scores, norm_topk_prob), MLA with q_lora, f32 CPU."""

import numpy as np
import pytest
import torch
from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

import jax.numpy as jnp

from moe_infinity_tpu.models.deepseek_v2 import DeepseekV2ModelJax, DeepseekV2Spec
from moe_infinity_tpu.runtime.generate import Generator
from moe_infinity_tpu.runtime.providers import ResidentProvider
from moe_infinity_tpu.store.blob import DenseArchive, ExpertStore
from moe_infinity_tpu.store.ingest import ingest_checkpoint


@pytest.fixture(scope="module")
def v3_setup(tmp_path_factory):
    cfg = DeepseekV3Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        moe_intermediate_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        q_lora_rank=32,
        kv_lora_rank=32,
        qk_nope_head_dim=32,
        qk_rope_head_dim=16,
        v_head_dim=32,
        head_dim=16,
        n_routed_experts=8,
        num_experts_per_tok=2,
        n_shared_experts=1,
        n_group=4,
        topk_group=2,
        first_k_dense_replace=1,
        norm_topk_prob=True,
        routed_scaling_factor=2.5,
        max_position_embeddings=128,
        torch_dtype=torch.float32,
        architectures=["DeepseekV3ForCausalLM"],
        attention_bias=False,
        rope_interleave=True,
    )
    torch.manual_seed(31)
    hf = DeepseekV3ForCausalLM(cfg).eval()
    # give the correction bias nonzero values so the noaux path is exercised
    with torch.no_grad():
        for layer in hf.model.layers[1:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.2, 0.2)
    ckpt = tmp_path_factory.mktemp("dsv3") / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)
    store_dir = str(tmp_path_factory.mktemp("dsv3") / "store")
    ingest_checkpoint(
        str(ckpt), store_dir, cfg, expert_dtype="float32", dense_dtype="float32"
    )
    spec = DeepseekV2Spec.from_hf(cfg)
    assert spec.router_variant == "v3"
    model = DeepseekV2ModelJax(spec, compute_dtype=jnp.float32)
    params = model.load_params(DenseArchive(store_dir))
    provider = ResidentProvider(ExpertStore(store_dir), dtype=jnp.float32)
    gen = Generator(
        model, params, provider.pytree(), ResidentProvider.for_layer,
        max_seq_len=64,
    )
    return cfg, hf, gen


def test_v3_greedy_generation_matches(v3_setup):
    cfg, hf, gen = v3_setup
    prompt = np.array([[5, 31, 8, 77]])
    with torch.no_grad():
        want = hf.generate(
            torch.tensor(prompt), max_new_tokens=8, do_sample=False,
            pad_token_id=0,
        ).numpy()
    got = gen.generate(prompt, max_new_tokens=8).sequences
    np.testing.assert_array_equal(got, want)


def test_v3_logits_close(v3_setup):
    cfg, hf, gen = v3_setup
    ids = torch.tensor([[3, 17, 42, 7, 99]])
    with torch.no_grad():
        want = hf(ids).logits.numpy()
    import jax

    kv = gen.stepper.init_cache(1, 16)
    logits, _, _ = gen.stepper.forward(
        jnp.asarray(ids.numpy(), jnp.int32),
        jnp.broadcast_to(jnp.arange(5, dtype=jnp.int32), (1, 5)),
        kv,
        jnp.int32(0),
    )
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-3, atol=2e-3)
