"""HF-parity: our JAX NLLB-MoE vs transformers (f32, CPU)."""

import numpy as np
import pytest
import torch
from transformers import NllbMoeConfig, NllbMoeForConditionalGeneration

import jax.numpy as jnp

from moe_infinity_tpu.models.nllb import NllbModel, NllbSpec
from moe_infinity_tpu.runtime.generate import Seq2SeqGenerator
from moe_infinity_tpu.runtime.providers import ResidentProvider
from moe_infinity_tpu.store.blob import DenseArchive, ExpertStore
from moe_infinity_tpu.store.ingest import ingest_checkpoint


@pytest.fixture(scope="module")
def nllb_setup(tmp_path_factory):
    cfg = NllbMoeConfig(
        vocab_size=96,
        d_model=32,
        encoder_layers=4,
        decoder_layers=4,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=64,
        decoder_ffn_dim=64,
        encoder_sparse_step=2,
        decoder_sparse_step=2,
        num_experts=4,
        max_position_embeddings=64,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        moe_token_dropout=0.0,
        router_jitter_noise=0.0,
        pad_token_id=1,
        bos_token_id=0,
        eos_token_id=2,
        decoder_start_token_id=2,
        torch_dtype=torch.float32,
        architectures=["NllbMoeForConditionalGeneration"],
    )
    torch.manual_seed(23)
    hf = NllbMoeForConditionalGeneration(cfg).eval()
    ckpt = tmp_path_factory.mktemp("nllb") / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)
    store_dir = str(tmp_path_factory.mktemp("nllb") / "store")
    ingest_checkpoint(
        str(ckpt), store_dir, cfg, expert_dtype="float32", dense_dtype="float32"
    )
    model = NllbModel(NllbSpec.from_hf(cfg), compute_dtype=jnp.float32)
    params = model.load_params(DenseArchive(store_dir))
    provider = ResidentProvider(ExpertStore(store_dir), dtype=jnp.float32)
    gen = Seq2SeqGenerator(
        model, params, provider.pytree(), ResidentProvider.for_layer
    )
    return cfg, hf, model, gen


def test_greedy_generation_matches(nllb_setup):
    cfg, hf, model, gen = nllb_setup
    prompt = np.array([[5, 31, 8, 77, 9, 2]])
    with torch.no_grad():
        want = hf.generate(
            torch.tensor(prompt), max_new_tokens=8, do_sample=False
        ).numpy()
    got = gen.generate(prompt, max_new_tokens=8, eos_token_id=2).sequences
    n = min(got.shape[1], want.shape[1])
    np.testing.assert_array_equal(got[:, :n], want[:, :n])


def test_batch_generation_matches(nllb_setup):
    cfg, hf, model, gen = nllb_setup
    prompt = np.array([[5, 31, 8, 77, 2], [9, 3, 44, 6, 2]])
    with torch.no_grad():
        want = hf.generate(
            torch.tensor(prompt), max_new_tokens=6, do_sample=False
        ).numpy()
    got = gen.generate(prompt, max_new_tokens=6, eos_token_id=2).sequences
    n = min(got.shape[1], want.shape[1])
    np.testing.assert_array_equal(got[:, :n], want[:, :n])


def test_init_random_matches_load_params_structure(nllb_setup):
    """init_random's tree (used by synthetic benches) must mirror
    load_params exactly — same keys, shapes, dtypes — and run end-to-end
    through the resident generator."""
    import jax

    _, _, model, gen = nllb_setup
    params = gen.params
    rp, experts = model.init_random(jax.random.PRNGKey(0))
    want = jax.tree.structure(params)
    got = jax.tree.structure(rp)
    assert got == want
    mismatches = [
        (path, a.shape, b.shape)
        for (path, a), (_, b) in zip(
            jax.tree.leaves_with_path(rp), jax.tree.leaves_with_path(params)
        )
        if a.shape != b.shape or a.dtype != b.dtype
    ]
    assert not mismatches, mismatches[:5]
    gen = Seq2SeqGenerator(
        model, rp, experts, ResidentProvider.for_layer
    )
    out = gen.generate(
        np.array([[5, 9, 3, 2]]), max_new_tokens=4, eos_token_id=None
    ).sequences
    assert out.shape[1] >= 4
