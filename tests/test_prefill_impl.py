"""Per-phase grouped-FFN impl selection: decode-sized steps (T=1) use
`impl`, prefill-sized steps (T>1) use `prefill_impl`. The selection happens
at trace time (token count is static per compiled shape), so mixing impls
never recompiles mid-decode and must be bit-compatible with a single-impl
run (all impls are exact).

Reference motivation: the gather path's expert-weight HBM traffic scales
with T*K while the grouped-GEMM paths (ragged / pallas gmm) read each
routed expert once — the right impl differs between prefill and decode
(SURVEY.md §3.3's hot path, re-planned for TPU).
"""

import numpy as np
import pytest
import torch
from transformers import MixtralConfig, MixtralForCausalLM

import jax
import jax.numpy as jnp

import moe_infinity_tpu.ops.moe as moe_ops
from moe_infinity_tpu.models.deepseek_v2 import (
    DeepseekV2ModelJax,
    DeepseekV2Spec,
)
from moe_infinity_tpu.runtime.generate import Generator, ResidentStepper
from moe_infinity_tpu.runtime.providers import ResidentProvider
from moe_infinity_tpu.utils.config import EngineConfig

BASE = dict(
    vocab_size=128, hidden_size=64, intermediate_size=96,
    moe_intermediate_size=48, num_layers=3, num_heads=4,
    kv_lora_rank=32, qk_nope_head_dim=32, qk_rope_head_dim=16,
    v_head_dim=32, num_experts=8, top_k=2, n_shared_experts=1,
    first_k_dense_replace=1, topk_method="greedy", n_group=None,
    topk_group=None, routed_scaling_factor=1.0, rms_eps=1e-6,
    rope_theta=10000.0, tie_embeddings=False, q_lora_rank=None,
)


@pytest.fixture
def impl_spy(monkeypatch):
    """Record which grouped-FFN impl traces at which token count."""
    calls = []
    orig_r, orig_g = moe_ops._gffn_ragged, moe_ops._gffn_gather

    def spy_r(x, *a, **k):
        calls.append(("ragged", int(x.shape[0])))
        return orig_r(x, *a, **k)

    def spy_g(x, *a, **k):
        calls.append(("gather", int(x.shape[0])))
        return orig_g(x, *a, **k)

    monkeypatch.setattr(moe_ops, "_gffn_ragged", spy_r)
    monkeypatch.setattr(moe_ops, "_gffn_gather", spy_g)
    return calls


def _run(stepper, tokens, steps=3):
    B, T = tokens.shape
    kv = stepper.init_cache(B, 16)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    logits, kv, _ = stepper.forward(tokens, positions, kv, jnp.int32(0))
    outs = [np.asarray(logits[:, -1])]
    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    for step in range(T, T + steps):
        pos = jnp.full((B, 1), step, jnp.int32)
        logits, kv, _ = stepper.forward(tok, pos, kv, jnp.int32(step))
        outs.append(np.asarray(logits[:, -1]))
        tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    return np.stack(outs)


def test_resident_stepper_mixed_impl_exact_and_selected(impl_spy):
    spec = DeepseekV2Spec(**BASE)
    model = DeepseekV2ModelJax(spec, compute_dtype=jnp.float32)
    params, experts = model.init_random(jax.random.PRNGKey(11))
    tokens = jnp.asarray([[5, 9, 33, 2]], jnp.int32)

    mixed = ResidentStepper(
        model, params, experts, ResidentProvider.for_layer,
        impl="gather", prefill_impl="ragged", donate_kv=False,
    )
    got = _run(mixed, tokens)
    # prefill (B*T = 4 token rows) traced ragged; decode (1 row) gather
    assert ("ragged", 4) in impl_spy and ("gather", 1) in impl_spy
    assert ("gather", 4) not in impl_spy and ("ragged", 1) not in impl_spy

    uniform = ResidentStepper(
        model, params, experts, ResidentProvider.for_layer,
        impl="gather", donate_kv=False,
    )
    want = _run(uniform, tokens)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_prefill_impl_defaults_to_impl(impl_spy):
    spec = DeepseekV2Spec(**BASE)
    model = DeepseekV2ModelJax(spec, compute_dtype=jnp.float32)
    params, experts = model.init_random(jax.random.PRNGKey(11))
    stepper = ResidentStepper(
        model, params, experts, ResidentProvider.for_layer,
        impl="gather", donate_kv=False,
    )
    _run(stepper, jnp.asarray([[5, 9, 33, 2]], jnp.int32), steps=1)
    assert all(name == "gather" for name, _ in impl_spy)


def test_config_validates_impls():
    assert EngineConfig(moe_impl="gather", prefill_impl="ragged")
    with pytest.raises(ValueError):
        EngineConfig(moe_impl="bogus")
    with pytest.raises(ValueError):
        EngineConfig(prefill_impl="bogus")


@pytest.fixture(scope="module")
def tiny_mixtral_store(tmp_path_factory):
    from moe_infinity_tpu.models.mixtral import MixtralModel, MixtralSpec
    from moe_infinity_tpu.store.blob import DenseArchive
    from moe_infinity_tpu.store.ingest import ingest_checkpoint

    cfg = MixtralConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=6, num_key_value_heads=2, num_local_experts=4,
        num_experts_per_tok=2, vocab_size=160,
        max_position_embeddings=128, torch_dtype=torch.float32,
        architectures=["MixtralForCausalLM"],
    )
    torch.manual_seed(5)
    hf = MixtralForCausalLM(cfg).eval()
    ckpt = tmp_path_factory.mktemp("pimpl") / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)
    store_dir = str(tmp_path_factory.mktemp("pimpl") / "store")
    ingest_checkpoint(
        str(ckpt), store_dir, cfg, expert_dtype="float32",
        dense_dtype="float32",
    )
    model = MixtralModel(MixtralSpec.from_hf(cfg), compute_dtype=jnp.float32)
    params = model.load_params(DenseArchive(store_dir))
    return model, params, store_dir


def test_offload_engine_mixed_impl_matches_uniform(tiny_mixtral_store):
    from moe_infinity_tpu.runtime.arena import ExpertArena
    from moe_infinity_tpu.runtime.engine import OffloadEngine
    from moe_infinity_tpu.store.blob import ExpertStore

    model, params, store_dir = tiny_mixtral_store
    prompt = np.array([[7, 31, 4, 90, 12]])

    def gen(**engine_kw):
        arena = ExpertArena(
            ExpertStore(store_dir), 8, compute_dtype=jnp.float32,
            num_threads=2,
        )
        try:
            engine = OffloadEngine(model, params, arena, **engine_kw)
            out = Generator(stepper=engine, max_seq_len=64).generate(
                prompt, max_new_tokens=6
            )
            return out.sequences
        finally:
            arena.shutdown()

    uniform = gen(impl="ragged")
    mixed = gen(impl="gather", prefill_impl="ragged")
    np.testing.assert_array_equal(uniform, mixed)
