"""HF-parity: our JAX Switch Transformers vs transformers (f32, CPU).

Covers: T5 enc-dec stack with relative position bias, unscaled attention,
capacity-masked top-1 routing in both stacks, tied-embedding head scaling,
incremental decoder with cross-KV cache.
"""

import numpy as np
import pytest
import torch
from transformers import SwitchTransformersConfig, SwitchTransformersForConditionalGeneration

import jax.numpy as jnp

from moe_infinity_tpu.models.switch import SwitchModel, SwitchSpec
from moe_infinity_tpu.runtime.generate import Seq2SeqGenerator
from moe_infinity_tpu.runtime.providers import ResidentProvider
from moe_infinity_tpu.store.blob import DenseArchive, ExpertStore
from moe_infinity_tpu.store.ingest import ingest_checkpoint


@pytest.fixture(scope="module")
def switch_setup(tmp_path_factory):
    cfg = SwitchTransformersConfig(
        vocab_size=96,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=4,
        num_decoder_layers=4,
        num_heads=4,
        num_experts=4,
        expert_capacity=8,
        num_sparse_encoder_layers=2,  # HF derives sparse_step = 4 // 2 = 2
        num_sparse_decoder_layers=2,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
        dropout_rate=0.0,
        router_jitter_noise=0.0,
        decoder_start_token_id=0,
        eos_token_id=1,
        pad_token_id=0,
        torch_dtype=torch.float32,
        architectures=["SwitchTransformersForConditionalGeneration"],
    )
    torch.manual_seed(17)
    hf = SwitchTransformersForConditionalGeneration(cfg).eval()
    ckpt = tmp_path_factory.mktemp("switch") / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)
    store_dir = str(tmp_path_factory.mktemp("switch") / "store")
    ingest_checkpoint(
        str(ckpt), store_dir, cfg, expert_dtype="float32", dense_dtype="float32"
    )
    model = SwitchModel(SwitchSpec.from_hf(cfg), compute_dtype=jnp.float32)
    params = model.load_params(DenseArchive(store_dir))
    provider = ResidentProvider(ExpertStore(store_dir), dtype=jnp.float32)
    gen = Seq2SeqGenerator(
        model, params, provider.pytree(), ResidentProvider.for_layer
    )
    return cfg, hf, model, gen


def test_spec_geometry(switch_setup):
    cfg, hf, model, gen = switch_setup
    s = model.spec
    assert s.num_moe_layers == 4  # blocks 1,3 in each stack
    assert s.is_sparse(1, False) and s.is_sparse(3, True)
    assert not s.is_sparse(0, False) and not s.is_sparse(2, True)
    assert s.moe_layer_id(1, False) == 0
    assert s.moe_layer_id(3, True) == 3


def test_gated_switch_matches(tmp_path):
    """switch-large style: is_gated_act=True (gelu-gated experts)."""
    cfg = SwitchTransformersConfig(
        vocab_size=96, d_model=32, d_kv=8, d_ff=64,
        num_layers=2, num_decoder_layers=2, num_heads=4, num_experts=4,
        expert_capacity=8, num_sparse_encoder_layers=1,
        num_sparse_decoder_layers=1, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
        router_jitter_noise=0.0, decoder_start_token_id=0, eos_token_id=1,
        pad_token_id=0, is_gated_act=True, dense_act_fn="gelu_new",
        torch_dtype=torch.float32,
        architectures=["SwitchTransformersForConditionalGeneration"],
    )
    torch.manual_seed(29)
    hf = SwitchTransformersForConditionalGeneration(cfg).eval()
    ckpt = tmp_path / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)
    store_dir = str(tmp_path / "store")
    ingest_checkpoint(
        str(ckpt), store_dir, cfg, expert_dtype="float32", dense_dtype="float32"
    )
    model = SwitchModel(SwitchSpec.from_hf(cfg), compute_dtype=jnp.float32)
    params = model.load_params(DenseArchive(store_dir))
    provider = ResidentProvider(ExpertStore(store_dir), dtype=jnp.float32)
    gen = Seq2SeqGenerator(
        model, params, provider.pytree(), ResidentProvider.for_layer
    )
    prompt = np.array([[5, 31, 8, 77]])
    with torch.no_grad():
        want = hf.generate(
            torch.tensor(prompt), max_new_tokens=6, do_sample=False
        ).numpy()
    got = gen.generate(prompt, max_new_tokens=6).sequences
    n = min(got.shape[1], want.shape[1])
    np.testing.assert_array_equal(got[:, :n], want[:, :n])


def test_greedy_generation_matches(switch_setup):
    cfg, hf, model, gen = switch_setup
    prompt = np.array([[5, 31, 8, 77, 2, 9]])
    with torch.no_grad():
        want = hf.generate(
            torch.tensor(prompt), max_new_tokens=8, do_sample=False
        ).numpy()
    got = gen.generate(prompt, max_new_tokens=8).sequences
    n = min(got.shape[1], want.shape[1])
    np.testing.assert_array_equal(got[:, :n], want[:, :n])


def test_batch_generation_matches(switch_setup):
    cfg, hf, model, gen = switch_setup
    prompt = np.array([[5, 31, 8, 77], [9, 2, 44, 3]])
    with torch.no_grad():
        want = hf.generate(
            torch.tensor(prompt), max_new_tokens=6, do_sample=False
        ).numpy()
    got = gen.generate(prompt, max_new_tokens=6).sequences
    n = min(got.shape[1], want.shape[1])
    np.testing.assert_array_equal(got[:, :n], want[:, :n])


def test_decode_scan_matches_generate(switch_setup):
    """Device-side scan decode == host-loop greedy decode, token for token
    (the throughput bench path: zero host syncs inside the loop)."""
    cfg, hf, model, gen = switch_setup
    prompt = np.array([[5, 31, 8, 77], [9, 2, 44, 3]])
    want = gen.generate(prompt, max_new_tokens=6, eos_token_id=None).sequences
    toks, _ = gen.decode_scan(prompt, 6)
    got = np.asarray(toks)
    np.testing.assert_array_equal(got, want[:, 1:])


def test_init_random_decode_scan_smoke():
    """Synthetic-weight Switch (bench path): init_random tree drives the
    enc-dec stack and scan decode without a checkpoint."""
    import jax

    spec = SwitchSpec(
        vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_heads=4,
        num_encoder_layers=2, num_decoder_layers=2,
        encoder_sparse_step=2, decoder_sparse_step=2,
        num_experts=4, expert_capacity=8, rel_buckets=8,
        rel_max_distance=16, rms_eps=1e-6, tie_embeddings=True,
        is_gated=False, dense_act_gelu=False, decoder_start_token_id=0,
    )
    model = SwitchModel(spec, compute_dtype=jnp.float32)
    params, experts = model.init_random(jax.random.PRNGKey(0))
    assert len(experts["layers"]) == spec.num_moe_layers
    gen = Seq2SeqGenerator(
        model, params, experts, ResidentProvider.for_layer, impl="gather"
    )
    prompt = np.array([[3, 9, 1]])
    toks, _ = gen.decode_scan(prompt, 5)
    assert np.asarray(toks).shape == (1, 5)
    want = gen.generate(prompt, max_new_tokens=5, eos_token_id=None).sequences
    np.testing.assert_array_equal(np.asarray(toks), want[:, 1:])
