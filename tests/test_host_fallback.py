"""Run-on-host escape hatch: misses never stall, output stays exact.

The reference only *observed* that experts can run on CPU
(task_scheduler.cpp:143-151, commented out); here a routed expert that
cannot be made resident within a deadline executes on the host from the
store record while the device program contributes 0 through the arena's
reserved zero slot (runtime/host_exec.py).
"""

import time

import numpy as np
import pytest
import torch
from transformers import MixtralConfig, MixtralForCausalLM

import jax.numpy as jnp

from moe_infinity_tpu.models.mixtral import MixtralModel, MixtralSpec
from moe_infinity_tpu.runtime.arena import ExpertArena
from moe_infinity_tpu.runtime.engine import OffloadEngine
from moe_infinity_tpu.runtime.generate import Generator
from moe_infinity_tpu.store.blob import DenseArchive, ExpertStore
from moe_infinity_tpu.store.ingest import ingest_checkpoint

L, E = 2, 4


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = MixtralConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=L,
        num_attention_heads=4, num_key_value_heads=2, num_local_experts=E,
        num_experts_per_tok=2, vocab_size=128, max_position_embeddings=64,
        torch_dtype=torch.float32, architectures=["MixtralForCausalLM"],
    )
    torch.manual_seed(5)
    hf = MixtralForCausalLM(cfg).eval()
    ckpt = tmp_path_factory.mktemp("hostfb") / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)
    store_dir = str(tmp_path_factory.mktemp("hostfb") / "store")
    ingest_checkpoint(
        str(ckpt), store_dir, cfg, expert_dtype="float32",
        dense_dtype="float32",
    )
    model = MixtralModel(MixtralSpec.from_hf(cfg), compute_dtype=jnp.float32)
    params = model.load_params(DenseArchive(store_dir))
    return hf, model, params, store_dir


class SlowStore(ExpertStore):
    """Delays fetches so a short deadline forces the host path."""

    delay = 0.0

    def get_expert(self, layer, expert, prio=0, gen=0):
        if self.delay:
            time.sleep(self.delay)
        return super().get_expert(layer, expert, prio=prio, gen=gen)


def _engine(store_dir, hf=False, timeout=0.25, slow=0.0, slots=E):
    cls = SlowStore if slow else ExpertStore
    store = cls(store_dir)
    if slow:
        store.delay = slow
    arena = ExpertArena(
        store, slots, compute_dtype=jnp.float32, num_threads=2,
        reserve_zero_slot=hf,
    )
    return arena


def test_all_misses_run_on_host_exactly(tiny):
    hf_model, model, params, store_dir = tiny
    prompt = np.array([[5, 9, 33, 7]])
    want = hf_model.generate(
        torch.tensor(prompt), max_new_tokens=6, do_sample=False,
        eos_token_id=None, pad_token_id=0,
    ).numpy()

    # deadline 0 + slow store: every cold expert takes the host path
    arena = _engine(store_dir, hf=True, slow=0.05)
    eng = OffloadEngine(
        model, params, arena, prefetch=False,
        host_fallback=True, host_fallback_timeout=0.0,
    )
    try:
        gen = Generator(stepper=eng, max_seq_len=64)
        got = gen.generate(prompt, max_new_tokens=6).sequences
        np.testing.assert_array_equal(got, want)
        assert eng.host_exec_count > 0
    finally:
        arena.shutdown()


def test_partial_misses_mix_device_and_host(tiny):
    hf_model, model, params, store_dir = tiny
    prompt = np.array([[3, 14, 15, 9, 2]])
    want = hf_model.generate(
        torch.tensor(prompt), max_new_tokens=5, do_sample=False,
        eos_token_id=None, pad_token_id=0,
    ).numpy()

    # generous deadline: everything resident in time -> pure device path
    arena = _engine(store_dir, hf=True)
    eng = OffloadEngine(
        model, params, arena, prefetch=False,
        host_fallback=True, host_fallback_timeout=30.0,
    )
    try:
        gen = Generator(stepper=eng, max_seq_len=64)
        got = gen.generate(prompt, max_new_tokens=5).sequences
        np.testing.assert_array_equal(got, want)
        assert eng.host_exec_count == 0
    finally:
        arena.shutdown()

    # tight-but-nonzero deadline against a slowed store: some experts land
    # in time (warm hits), the rest run on host — still exact
    arena = _engine(store_dir, hf=True, slow=0.03)
    arena.warm([(0, e) for e in range(E)])
    eng = OffloadEngine(
        model, params, arena, prefetch=False,
        host_fallback=True, host_fallback_timeout=0.01,
    )
    try:
        gen = Generator(stepper=eng, max_seq_len=64)
        got = gen.generate(prompt, max_new_tokens=5).sequences
        np.testing.assert_array_equal(got, want)
    finally:
        arena.shutdown()


def test_host_fallback_requires_zero_slot(tiny):
    _, model, params, store_dir = tiny
    arena = _engine(store_dir, hf=False)
    try:
        with pytest.raises(ValueError, match="reserve_zero_slot"):
            OffloadEngine(model, params, arena, host_fallback=True)
    finally:
        arena.shutdown()


def test_host_executor_matches_device_ffn(tiny):
    """HostExpertExecutor.ffn == the model's own expert FFN on device."""
    from moe_infinity_tpu.runtime.host_exec import (
        HostExpertExecutor,
        activation_for,
    )
    from moe_infinity_tpu.runtime.providers import ResidentProvider

    _, model, params, store_dir = tiny
    store = ExpertStore(store_dir)
    ex = HostExpertExecutor(store, activation_for(store.meta))
    provider = ResidentProvider(store, dtype=jnp.float32)
    tree = provider.pytree()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, model.spec.hidden_size)).astype(np.float32)
    for (l, e) in [(0, 0), (1, 3)]:
        got = ex.ffn(l, e, x)
        w = tree["layers"][l]
        gate = np.asarray(w["gate"][e])
        up = np.asarray(w["up"][e])
        down = np.asarray(w["down"][e])
        s = x @ gate
        ref = ((s / (1 + np.exp(-s))) * (x @ up)) @ down
        np.testing.assert_allclose(got, ref, atol=1e-4)


def test_seq2seq_host_fallback_exact(tmp_path):
    """NLLB (biased experts): all-miss host path matches the HF oracle."""
    from transformers import NllbMoeConfig, NllbMoeForConditionalGeneration

    from moe_infinity_tpu.entrypoints.api import MoE

    cfg = NllbMoeConfig(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_ffn_dim=48, decoder_ffn_dim=48, encoder_attention_heads=4,
        decoder_attention_heads=4, encoder_sparse_step=2,
        decoder_sparse_step=2, num_experts=4, max_position_embeddings=64,
        torch_dtype=torch.float32, pad_token_id=1, bos_token_id=0,
        eos_token_id=2, decoder_start_token_id=2,
        architectures=["NllbMoeForConditionalGeneration"],
        router_bias=False, moe_token_dropout=0.0,
    )
    torch.manual_seed(7)
    hf = NllbMoeForConditionalGeneration(cfg).eval()
    ckpt = tmp_path / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)

    prompt = np.array([[5, 9, 33, 7, 2]])
    want = hf.generate(
        torch.tensor(prompt), max_new_tokens=5, do_sample=False,
        eos_token_id=None,
    ).numpy()

    eng = MoE(str(ckpt), {
        "expert_dtype": "float32", "max_seq_len": 64,
        "device_memory_bytes": 1, "num_slots": 4,
        "host_fallback": True, "host_fallback_timeout_s": 0.0,
        "prefetch": False, "speculative_decode": False,
    })
    try:
        got = eng.generate(prompt, max_new_tokens=5, eos_token_id=None)
        np.testing.assert_array_equal(got, want)
        assert eng.stats().get("host_exec_count", 0) > 0
    finally:
        eng.shutdown()
