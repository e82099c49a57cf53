"""HF-parity: our JAX Mixtral vs transformers' MixtralForCausalLM (f32, CPU).

This is BASELINE.json's parity gate at matched bit-width: logits close, greedy
tokens identical (SURVEY.md §4: single-chip parity tests vs HF CPU reference).
"""

import numpy as np
import pytest
import torch
from transformers import MixtralConfig, MixtralForCausalLM

import jax.numpy as jnp

from moe_infinity_tpu.models.mixtral import MixtralModel, MixtralSpec
from moe_infinity_tpu.runtime.generate import Generator
from moe_infinity_tpu.runtime.providers import ResidentProvider
from moe_infinity_tpu.store.blob import DenseArchive, ExpertStore
from moe_infinity_tpu.store.ingest import ingest_checkpoint


@pytest.fixture(scope="module")
def mixtral_setup(tmp_path_factory):
    cfg = MixtralConfig(
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=3,
        num_attention_heads=6,
        num_key_value_heads=2,
        num_local_experts=8,
        num_experts_per_tok=2,
        vocab_size=160,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        torch_dtype=torch.float32,
        architectures=["MixtralForCausalLM"],
    )
    torch.manual_seed(7)
    hf = MixtralForCausalLM(cfg).eval()
    ckpt = tmp_path_factory.mktemp("mixtral_parity") / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)
    store_dir = str(tmp_path_factory.mktemp("mixtral_parity") / "store")
    ingest_checkpoint(
        str(ckpt), store_dir, cfg, expert_dtype="float32", dense_dtype="float32"
    )
    model = MixtralModel(MixtralSpec.from_hf(cfg), compute_dtype=jnp.float32)
    params = model.load_params(DenseArchive(store_dir))
    provider = ResidentProvider(ExpertStore(store_dir), dtype=jnp.float32)
    gen = Generator(
        model,
        params,
        provider.pytree(),
        ResidentProvider.for_layer,
        impl="ragged",
        max_seq_len=128,
    )
    return cfg, hf, model, params, provider, gen


def test_forward_logits_match(mixtral_setup):
    cfg, hf, model, params, provider, gen = mixtral_setup
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 11))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.float().numpy()

    kv = model.init_cache(2, 16)
    tokens = jnp.asarray(ids, jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(11, dtype=jnp.int32), (2, 11))
    logits, _, trace = model.forward(
        params, provider.pytree(), tokens, pos, kv, jnp.int32(0),
        for_layer=ResidentProvider.for_layer, impl="ragged",
    )
    got = np.asarray(logits)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)
    ids_trace, w_trace = trace
    assert ids_trace.shape == (3, 2, 11, 2)


def test_greedy_tokens_match_hf(mixtral_setup):
    cfg, hf, model, params, provider, gen = mixtral_setup
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, cfg.vocab_size, size=(1, 7))
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor(prompt),
            attention_mask=torch.ones_like(torch.tensor(prompt)),
            max_new_tokens=8,
            do_sample=False,
            pad_token_id=0,
        ).numpy()
    got = gen.generate(prompt, max_new_tokens=8).sequences
    np.testing.assert_array_equal(got, ref)


def test_decode_incremental_matches_full_forward(mixtral_setup):
    """KV-cached decode must equal a from-scratch forward at each position."""
    cfg, hf, model, params, provider, gen = mixtral_setup
    rng = np.random.default_rng(2)
    seq = rng.integers(0, cfg.vocab_size, size=(1, 10))
    res = gen.generate(seq[:, :5], max_new_tokens=3)
    full = gen.generate(res.sequences[:, :7], max_new_tokens=1)
    np.testing.assert_array_equal(res.sequences[:, :8], full.sequences[:, :8])
