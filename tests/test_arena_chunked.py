"""Chunked-parallel H2D uploads in the expert arena.

Large expert records are split row-wise, device_put on a thread pool, and
each chunk written straight into its arena rows. On the measurement relay
4 threads x 16 MB chunks sustain ~4.4 GB/s vs ~1.6 GB/s for one serial
whole-record copy; these tests force tiny chunk sizes so the multi-chunk
code path runs on CPU and must be byte-identical to the whole-record path
(reference counterpart: the AIO thread pool + caching allocator copies of
core/prefetch/task_scheduler.cpp, re-planned as parallel XLA transfers)."""

import numpy as np
import pytest
import torch
from transformers import MixtralConfig, MixtralForCausalLM

import jax.numpy as jnp

from moe_infinity_tpu.runtime.arena import ExpertArena
from moe_infinity_tpu.store.blob import ExpertStore
from moe_infinity_tpu.store.ingest import ingest_checkpoint

L, E = 2, 4


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    cfg = MixtralConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=L,
        num_attention_heads=4, num_key_value_heads=2, num_local_experts=E,
        num_experts_per_tok=2, vocab_size=96, max_position_embeddings=64,
        torch_dtype=torch.float32, architectures=["MixtralForCausalLM"],
    )
    torch.manual_seed(11)
    hf = MixtralForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("chunked") / "ckpt"
    hf.save_pretrained(d, safe_serialization=True)
    return str(d), cfg


@pytest.fixture(scope="module")
def f32_store(ckpt_dir, tmp_path_factory):
    ckpt, cfg = ckpt_dir
    d = str(tmp_path_factory.mktemp("chunked") / "store_f32")
    ingest_checkpoint(ckpt, d, cfg, expert_dtype="float32", dense_dtype="float32")
    return d


@pytest.fixture(scope="module")
def int8_store(ckpt_dir, tmp_path_factory):
    ckpt, cfg = ckpt_dir
    d = str(tmp_path_factory.mktemp("chunked") / "store_i8")
    ingest_checkpoint(ckpt, d, cfg, expert_dtype="int8", dense_dtype="float32")
    return d


def _all_slots_match(arena, store_dir, keys, tails=("w1.weight",)):
    store = ExpertStore(store_dir)
    role_of = {"w1.weight": "gate", "w3.weight": "up", "w2.weight": "down"}
    for (layer, expert) in keys:
        slot = arena.key_to_slot[(layer, expert)]
        for tail in tails:
            got = np.asarray(
                arena.pytree()[role_of[tail]][slot], np.float32
            )
            want = np.asarray(store.get_tensor(layer, expert, tail), np.float32)
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_chunked_upload_matches_whole_record(f32_store):
    # 2 KB chunks on 8 KB roles → ~4 chunks per role, parallel uploads
    arena = ExpertArena(
        ExpertStore(f32_store), 6, compute_dtype=jnp.float32,
        num_threads=2, upload_chunk_bytes=2048, upload_threads=3,
    )
    try:
        keys = [(l, e) for l in range(L) for e in range(3)]
        for l in range(L):
            arena.acquire([(l, e) for e in range(3)], l)
            arena.release([(l, e) for e in range(3)])
        _all_slots_match(
            arena, f32_store, keys,
            tails=("w1.weight", "w3.weight", "w2.weight"),
        )
        assert arena.fetch_seconds_ewma is not None
    finally:
        arena.shutdown()


def test_chunked_upload_disabled_path_unchanged(f32_store):
    arena = ExpertArena(
        ExpertStore(f32_store), 4, compute_dtype=jnp.float32,
        num_threads=2, upload_chunk_bytes=0,
    )
    try:
        assert arena._upload_pool is None
        arena.acquire([(0, 1)], 0)
        arena.release([(0, 1)])
        _all_slots_match(arena, f32_store, [(0, 1)])
    finally:
        arena.shutdown()


def test_chunked_dequant_on_write(int8_store):
    """Quantized bytes ride the chunked uploads; the per-chunk write fuses
    the dequant, so the slot holds compute dtype identical to a host-side
    dequant of the stored record."""
    arena = ExpertArena(
        ExpertStore(int8_store), 4, compute_dtype=jnp.float32,
        num_threads=2, dequant_on_write=True,
        upload_chunk_bytes=1024, upload_threads=3,
    )
    try:
        arena.acquire([(1, 2)], 1)
        slot = arena.key_to_slot[(1, 2)]
        store = ExpertStore(int8_store)
        rec = store.get_expert(1, 2)
        for tail, role in (
            ("w1.weight", "gate"), ("w3.weight", "up"), ("w2.weight", "down")
        ):
            got = np.asarray(arena.pytree()[role][slot])
            want = (
                np.asarray(rec[tail], np.float32)
                * np.asarray(rec[tail + ".scale"], np.float32)[None, :]
            )
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
        assert "gate_scale" not in arena.pytree()
    finally:
        arena.shutdown()


def test_chunked_quantized_slots_keep_scales(int8_store):
    """Non-dequant mode: int8 bytes land chunked, scales land whole; the
    grouped FFN dequants per step."""
    arena = ExpertArena(
        ExpertStore(int8_store), 4, compute_dtype=jnp.float32,
        num_threads=2, upload_chunk_bytes=1024, upload_threads=3,
    )
    try:
        arena.acquire([(0, 3)], 0)
        slot = arena.key_to_slot[(0, 3)]
        store = ExpertStore(int8_store)
        rec = store.get_expert(0, 3)
        np.testing.assert_array_equal(
            np.asarray(arena.pytree()["gate"][slot]),
            np.asarray(rec["w1.weight"]),
        )
        np.testing.assert_allclose(
            np.asarray(arena.pytree()["gate_scale"][slot]),
            np.asarray(rec["w1.weight.scale"], np.float32),
            rtol=1e-6, atol=1e-6,
        )
    finally:
        arena.shutdown()


def test_adaptive_prefetch_budget():
    from moe_infinity_tpu.memory.prefetch_plan import adaptive_prefetch_budget

    # no measurements yet → static cap
    assert adaptive_prefetch_budget(None, None, 4, 3, 16) == 16
    assert adaptive_prefetch_budget(0.01, None, 4, 3, 16) == 16
    # 3-layer window of 10ms, 4 workers, 20ms per fetch → 6 fetches land
    assert adaptive_prefetch_budget(0.010, 0.020, 4, 3, 16) == 6
    # slow link: can land <1 → floor of 1
    assert adaptive_prefetch_budget(0.001, 1.0, 1, 1, 16) == 1
    # fast link: capped at the static budget
    assert adaptive_prefetch_budget(0.1, 0.001, 8, 4, 16) == 16


def test_engine_budget_shrinks_with_measured_rates(f32_store):
    """OffloadEngine plumbs measured layer/fetch rates into the plan cap."""
    from moe_infinity_tpu.models.mixtral import MixtralModel, MixtralSpec
    from moe_infinity_tpu.runtime.engine import OffloadEngine
    from moe_infinity_tpu.store.blob import DenseArchive
    from transformers import MixtralConfig

    cfg = MixtralConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=L,
        num_attention_heads=4, num_key_value_heads=2, num_local_experts=E,
        num_experts_per_tok=2, vocab_size=96, max_position_embeddings=64,
    )
    model = MixtralModel(MixtralSpec.from_hf(cfg), compute_dtype=jnp.float32)
    params = model.load_params(DenseArchive(f32_store))
    arena = ExpertArena(
        ExpertStore(f32_store), E, compute_dtype=jnp.float32, num_threads=2
    )
    try:
        eng = OffloadEngine(model, params, arena, prefetch_budget=16)
        assert eng._current_budget() == 16  # nothing measured yet
        eng._layer_seconds = 0.010
        arena.fetch_seconds_ewma = 0.020
        # 2 workers, lookahead 3: 3*0.01*2/0.02 = 3
        assert eng._current_budget() == 3
        eng.adaptive_budget = False
        assert eng._current_budget() == 16
    finally:
        arena.shutdown()
