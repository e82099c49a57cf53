"""Encoder-decoder offload engine: Switch with a constrained expert arena
matches the resident path exactly, with live hit accounting across the
encoder→decoder layer sequence."""

import numpy as np
import pytest
import torch
from transformers import SwitchTransformersConfig, SwitchTransformersForConditionalGeneration

import jax.numpy as jnp

from moe_infinity_tpu.memory import ExpertPredictor, ExpertTracer
from moe_infinity_tpu.models.switch import SwitchModel, SwitchSpec
from moe_infinity_tpu.runtime.arena import ExpertArena
from moe_infinity_tpu.runtime.engine_seq2seq import Seq2SeqOffloadEngine
from moe_infinity_tpu.runtime.generate import Seq2SeqGenerator
from moe_infinity_tpu.runtime.providers import ResidentProvider
from moe_infinity_tpu.store.blob import DenseArchive, ExpertStore
from moe_infinity_tpu.store.ingest import ingest_checkpoint

pytestmark = pytest.mark.slow  # e2e-heavy; fast path: -m 'not slow'


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = SwitchTransformersConfig(
        vocab_size=96, d_model=32, d_kv=8, d_ff=64,
        num_layers=4, num_decoder_layers=4, num_heads=4, num_experts=4,
        expert_capacity=8, num_sparse_encoder_layers=2,
        num_sparse_decoder_layers=2, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
        router_jitter_noise=0.0, decoder_start_token_id=0, eos_token_id=1,
        pad_token_id=0, torch_dtype=torch.float32,
        architectures=["SwitchTransformersForConditionalGeneration"],
    )
    torch.manual_seed(13)
    hf = SwitchTransformersForConditionalGeneration(cfg).eval()
    ckpt = tmp_path_factory.mktemp("s2so") / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)
    store_dir = str(tmp_path_factory.mktemp("s2so") / "store")
    ingest_checkpoint(
        str(ckpt), store_dir, cfg, expert_dtype="float32", dense_dtype="float32"
    )
    model = SwitchModel(SwitchSpec.from_hf(cfg), compute_dtype=jnp.float32)
    params = model.load_params(DenseArchive(store_dir))
    provider = ResidentProvider(ExpertStore(store_dir), dtype=jnp.float32)
    gen_res = Seq2SeqGenerator(
        model, params, provider.pytree(), ResidentProvider.for_layer
    )
    return model, params, store_dir, gen_res


def test_offload_matches_resident(setup):
    model, params, store_dir, gen_res = setup
    # 4 slots for 16 (layer, expert) pairs — heavy eviction across the
    # encoder->decoder sequence
    arena = ExpertArena(
        ExpertStore(store_dir), 4, compute_dtype=jnp.float32, num_threads=2
    )
    tracer = ExpertTracer(16, 4, 4, num_encoder_layers=2)
    engine = Seq2SeqOffloadEngine(
        model, params, arena,
        tracer=tracer, predictor=ExpertPredictor(tracer), prefetch=True,
    )
    try:
        prompt = np.array([[5, 31, 8, 77, 2, 9]])
        want = gen_res.generate(prompt, max_new_tokens=8).sequences
        got = engine.generate(prompt, max_new_tokens=8).sequences
        n = min(got.shape[1], want.shape[1])
        np.testing.assert_array_equal(got[:, :n], want[:, :n])
        s = engine.stats()
        assert s["visits"] > 0 and s["evictions"] > 0
        assert not tracer.trace  # sequences finished
    finally:
        arena.shutdown()


def test_nllb_offload_matches_resident(tmp_path):
    from transformers import NllbMoeConfig, NllbMoeForConditionalGeneration

    from moe_infinity_tpu.models.nllb import NllbModel, NllbSpec

    cfg = NllbMoeConfig(
        vocab_size=96, d_model=32, encoder_layers=4, decoder_layers=4,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, encoder_sparse_step=2,
        decoder_sparse_step=2, num_experts=4, max_position_embeddings=64,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        moe_token_dropout=0.0, router_jitter_noise=0.0, pad_token_id=1,
        bos_token_id=0, eos_token_id=2, decoder_start_token_id=2,
        torch_dtype=torch.float32,
        architectures=["NllbMoeForConditionalGeneration"],
    )
    torch.manual_seed(27)
    hf = NllbMoeForConditionalGeneration(cfg).eval()
    ckpt = tmp_path / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)
    store_dir = str(tmp_path / "store")
    ingest_checkpoint(
        str(ckpt), store_dir, cfg, expert_dtype="float32", dense_dtype="float32"
    )
    model = NllbModel(NllbSpec.from_hf(cfg), compute_dtype=jnp.float32)
    params = model.load_params(DenseArchive(store_dir))
    provider = ResidentProvider(ExpertStore(store_dir), dtype=jnp.float32)
    gen_res = Seq2SeqGenerator(
        model, params, provider.pytree(), ResidentProvider.for_layer
    )
    arena = ExpertArena(
        ExpertStore(store_dir), 4, compute_dtype=jnp.float32, num_threads=2
    )
    tracer = ExpertTracer(16, 4, 4, num_encoder_layers=2)
    engine = Seq2SeqOffloadEngine(
        model, params, arena,
        tracer=tracer, predictor=ExpertPredictor(tracer), prefetch=True,
    )
    try:
        prompt = np.array([[5, 31, 8, 77, 2]])
        want = gen_res.generate(prompt, max_new_tokens=6, eos_token_id=2).sequences
        got = engine.generate(prompt, max_new_tokens=6, eos_token_id=2).sequences
        n = min(got.shape[1], want.shape[1])
        np.testing.assert_array_equal(got[:, :n], want[:, :n])
        assert engine.stats()["visits"] > 0
    finally:
        arena.shutdown()


def test_nllb_speculative_decode_matches_resident(tmp_path):
    """Speculative whole-step decode: each step runs as ONE jitted program
    against the arena's current slots, verified + replayed on miss. Exact
    vs the resident path under heavy eviction pressure (arena holds 4 of
    16 (layer, expert) pairs), with replays actually happening."""
    from transformers import NllbMoeConfig, NllbMoeForConditionalGeneration

    from moe_infinity_tpu.models.nllb import NllbModel, NllbSpec

    cfg = NllbMoeConfig(
        vocab_size=96, d_model=32, encoder_layers=4, decoder_layers=4,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, encoder_sparse_step=2,
        decoder_sparse_step=2, num_experts=4, max_position_embeddings=64,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        moe_token_dropout=0.0, router_jitter_noise=0.0, pad_token_id=1,
        bos_token_id=0, eos_token_id=2, decoder_start_token_id=2,
        torch_dtype=torch.float32,
        architectures=["NllbMoeForConditionalGeneration"],
    )
    torch.manual_seed(31)
    hf = NllbMoeForConditionalGeneration(cfg).eval()
    ckpt = tmp_path / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)
    store_dir = str(tmp_path / "store")
    ingest_checkpoint(
        str(ckpt), store_dir, cfg, expert_dtype="float32",
        dense_dtype="float32",
    )
    model = NllbModel(NllbSpec.from_hf(cfg), compute_dtype=jnp.float32)
    params = model.load_params(DenseArchive(store_dir))
    provider = ResidentProvider(ExpertStore(store_dir), dtype=jnp.float32)
    gen_res = Seq2SeqGenerator(
        model, params, provider.pytree(), ResidentProvider.for_layer
    )
    # 8 slots: enough for one step's union across the 2 decoder MoE
    # layers (2 x 4), small enough that the encoder pass evicts the
    # decoder hot set between requests
    arena = ExpertArena(
        ExpertStore(store_dir), 8, compute_dtype=jnp.float32, num_threads=2
    )
    engine = Seq2SeqOffloadEngine(
        model, params, arena, prefetch=False, speculative=True,
    )
    try:
        prompt = np.array([[5, 31, 8, 77, 2], [9, 4, 61, 12, 3]])
        want = gen_res.generate(
            prompt, max_new_tokens=6, eos_token_id=None
        ).sequences
        got = engine.generate(
            prompt, max_new_tokens=6, eos_token_id=None
        ).sequences
        np.testing.assert_array_equal(got, want)
        assert engine.replay_counts, "speculative path not exercised"
        # cold decoder slots after the encoder pass: at least one step
        # needed >1 execution
        assert max(engine.replay_counts) > 1
        assert engine.stats()["visits"] > 0
    finally:
        arena.shutdown()


def test_switch_speculative_decode_matches_resident(setup):
    """Switch family through the speculative whole-step decoder (its
    decode_step already returns the routed-ids trace)."""
    model, params, store_dir, gen_res = setup
    arena = ExpertArena(
        ExpertStore(store_dir), 8, compute_dtype=jnp.float32, num_threads=2
    )
    engine = Seq2SeqOffloadEngine(
        model, params, arena, prefetch=False, speculative=True,
    )
    try:
        prompt = np.array([[5, 31, 8, 77, 2, 9]])
        want = gen_res.generate(
            prompt, max_new_tokens=8, eos_token_id=None
        ).sequences
        got = engine.generate(
            prompt, max_new_tokens=8, eos_token_id=None
        ).sequences
        np.testing.assert_array_equal(got, want)
        assert engine.replay_counts and max(engine.replay_counts) > 1
    finally:
        arena.shutdown()

def test_switch_speculative_block_decode_matches_resident(setup):
    """Multi-step speculative blocks: k greedy decode steps run as ONE
    compiled lax.scan program with partial prefix acceptance. Exact vs
    the resident path under eviction pressure, including the quantized
    tail (8 tokens with k=3 -> halving-chain blocks of 3, 3, 1, 1 — only
    sizes {3, 1} ever compile)."""
    model, params, store_dir, gen_res = setup
    arena = ExpertArena(
        ExpertStore(store_dir), 8, compute_dtype=jnp.float32, num_threads=2
    )
    engine = Seq2SeqOffloadEngine(
        model, params, arena, prefetch=False, speculative=True,
        spec_block=3,
    )
    try:
        prompt = np.array([[5, 31, 8, 77, 2, 9], [3, 50, 7, 2, 88, 4]])
        want = gen_res.generate(
            prompt, max_new_tokens=8, eos_token_id=None
        ).sequences
        got = engine.generate(
            prompt, max_new_tokens=8, eos_token_id=None
        ).sequences
        np.testing.assert_array_equal(got, want)
        # never CAPACITY-downgraded (the cost hill-climb may probe
        # any halving-chain size; a capacity error would cap _k_cap)
        assert engine._k_cap == 3
        assert engine.replay_counts and max(engine.replay_counts) > 1
        # 4 quantized blocks per request (3+3+1+1), not 8 per-step
        # programs; tail sizes come from the halving chain {3, 1}
        assert len(engine.replay_counts) == 4
    finally:
        arena.shutdown()


def test_speculative_block_eos_mid_block(setup):
    """EOS landing mid-block: rows finishing inside a block stop
    recording tokens at the same step the per-step path would."""
    model, params, store_dir, gen_res = setup
    arena = ExpertArena(
        ExpertStore(store_dir), 8, compute_dtype=jnp.float32, num_threads=2
    )
    engine = Seq2SeqOffloadEngine(
        model, params, arena, prefetch=False, speculative=True,
        spec_block=4,
    )
    try:
        prompt = np.array([[5, 31, 8, 77, 2, 9]])
        want = gen_res.generate(prompt, max_new_tokens=8).sequences
        got = engine.generate(prompt, max_new_tokens=8).sequences
        n = min(got.shape[1], want.shape[1])
        np.testing.assert_array_equal(got[:, :n], want[:, :n])
    finally:
        arena.shutdown()


def test_continuous_offload_batcher_matches_resident(setup):
    """Seq2seq CONTINUOUS batching in the OFFLOAD regime: joins encode
    through the engine's per-layer path, shared decode steps run as ONE
    verified speculative program over the arena; staggered concurrent
    requests match the resident generator exactly."""
    import time

    from moe_infinity_tpu.runtime.continuous_s2s import (
        Seq2SeqContinuousBatcher,
    )

    model, params, store_dir, gen_res = setup
    # 6 slots of 16 (L x E): a decode step's union (<= 2 rows x 1 expert
    # x 2 sparse decoder layers + encoder traffic) fits; residency churns
    arena = ExpertArena(
        ExpertStore(store_dir), 6, compute_dtype=jnp.float32, num_threads=2
    )
    tracer = ExpertTracer(16, 4, 4, num_encoder_layers=2)
    engine = Seq2SeqOffloadEngine(
        model, params, arena,
        tracer=tracer, predictor=ExpertPredictor(tracer), prefetch=True,
        speculative=True,
    )
    batcher = Seq2SeqContinuousBatcher(
        model, params, None, None, engine=engine,
        max_batch_size=2, max_src_len=16, max_decode_len=16,
    )
    try:
        p1 = np.array([5, 31, 8, 77, 2, 9])
        p2 = np.array([9, 4, 61])
        want1 = gen_res.generate(
            p1[None], max_new_tokens=6, eos_token_id=None
        ).sequences[0]
        want2 = gen_res.generate(
            p2[None], max_new_tokens=5, eos_token_id=None
        ).sequences[0]
        f1 = batcher.submit(p1, max_new_tokens=6, eos_token_id=None)
        time.sleep(0.4)  # request 2 joins mid-decode
        f2 = batcher.submit(p2, max_new_tokens=5, eos_token_id=None)
        np.testing.assert_array_equal(f1.result(timeout=180), want1)
        np.testing.assert_array_equal(f2.result(timeout=180), want2)
        assert batcher.replay_counts, "speculative path not exercised"
        s = batcher.stats()
        assert s["speculative_steps"] == len(batcher.replay_counts)
        assert s["visits"] > 0
    finally:
        batcher.shutdown()
        arena.shutdown()


def test_direct_tier_dispatch_matches_resident(setup):
    """DIRECT-TIER dispatch: a layer-aligned pinned tier (align_rows = E)
    makes every fully-staged MoE layer compute straight from its tier
    segment with an identity slot row — no arena slots, no fetches, no
    speculative replays for those layers. Output must match the resident
    path exactly, the engine must report the direct layers, and the
    arena must see ZERO visits for them (the per-layer hit accounting
    only covers slot-managed layers)."""
    from moe_infinity_tpu.store.pinned import PinnedExpertTier

    model, params, store_dir, gen_res = setup
    store = ExpertStore(store_dir)
    tier = PinnedExpertTier(
        store, shared_record=False, align_rows=store.num_experts
    )
    arena = ExpertArena(
        store, 4, compute_dtype=jnp.float32, num_threads=1,
        pinned_tier=tier,
    )
    engine = Seq2SeqOffloadEngine(model, params, arena, prefetch=False)
    try:
        # every layer fully staged and aligned -> all direct
        assert engine._direct_mlis == set(range(store.num_layers))
        prompt = np.array([[5, 31, 8, 77, 2, 9]])
        want = gen_res.generate(prompt, max_new_tokens=8).sequences
        got = engine.generate(prompt, max_new_tokens=8).sequences
        n = min(got.shape[1], want.shape[1])
        np.testing.assert_array_equal(got[:, :n], want[:, :n])
        assert engine.stats()["visits"] == 0  # nothing slot-managed
    finally:
        arena.shutdown()


def test_direct_tier_partial_staging_mixes_paths(setup):
    """Under a byte budget only SOME layers stage fully: those dispatch
    direct, the rest stream through the arena — still exact."""
    from moe_infinity_tpu.store.pinned import PinnedExpertTier

    model, params, store_dir, gen_res = setup
    store = ExpertStore(store_dir)
    rec = sum(
        int(np.prod(f.shape)) * np.dtype("float32").itemsize
        for f in store.fields
    )
    # budget for ~1.5 layers of 4 experts: exactly one full segment
    tier = PinnedExpertTier(
        store, shared_record=False, align_rows=store.num_experts,
        max_bytes=6 * rec,
    )
    arena = ExpertArena(
        store, 4, compute_dtype=jnp.float32, num_threads=1,
        pinned_tier=tier,
    )
    engine = Seq2SeqOffloadEngine(model, params, arena, prefetch=False)
    try:
        assert 0 < len(engine._direct_mlis) < store.num_layers
        prompt = np.array([[5, 31, 8, 77, 2, 9]])
        want = gen_res.generate(prompt, max_new_tokens=8).sequences
        got = engine.generate(prompt, max_new_tokens=8).sequences
        n = min(got.shape[1], want.shape[1])
        np.testing.assert_array_equal(got[:, :n], want[:, :n])
        assert engine.stats()["visits"] > 0  # arena still in play
    finally:
        arena.shutdown()


def test_direct_tier_speculative_blocks_no_replays(setup):
    """Speculative block decode over an all-direct tier: every layer is
    resident in place, so every block must accept on dispatch 1
    (mean_step_executions == 1.0) while staying exact."""
    from moe_infinity_tpu.store.pinned import PinnedExpertTier

    model, params, store_dir, gen_res = setup
    store = ExpertStore(store_dir)
    tier = PinnedExpertTier(
        store, shared_record=False, align_rows=store.num_experts
    )
    arena = ExpertArena(
        store, 4, compute_dtype=jnp.float32, num_threads=1,
        pinned_tier=tier,
    )
    engine = Seq2SeqOffloadEngine(
        model, params, arena, prefetch=False,
        speculative=True, spec_block=4,
    )
    try:
        prompt = np.array([[5, 31, 8, 77, 2, 9]])
        want = gen_res.generate(prompt, max_new_tokens=8).sequences
        got = engine.generate(prompt, max_new_tokens=8).sequences
        n = min(got.shape[1], want.shape[1])
        np.testing.assert_array_equal(got[:, :n], want[:, :n])
        assert engine.replay_counts, "blocks never ran"
        assert all(e == 1 for e in engine.replay_counts), (
            engine.replay_counts
        )
    finally:
        arena.shutdown()


def test_stream_decode_matches_resident(setup):
    """STREAM decode: blocks gather routed experts from the pinned tier
    inside the program (no decoder arena residency at all). Greedy
    output must match the resident oracle exactly; replay counts stay 1
    (no verify/replay loop) unless U escalates."""
    from moe_infinity_tpu.store.pinned import PinnedExpertTier

    model, params, store_dir, gen_res = setup
    store = ExpertStore(store_dir)
    tier = PinnedExpertTier(store, shared_record=False)
    arena = ExpertArena(
        store, 4, compute_dtype=jnp.float32, num_threads=1,
        pinned_tier=tier,
    )
    engine = Seq2SeqOffloadEngine(
        model, params, arena, prefetch=False,
        speculative=True, spec_block=4, stream_decode=True,
        stream_unique=4,
    )
    try:
        prompt = np.array([[5, 31, 8, 77, 2, 9]])
        want = gen_res.generate(prompt, max_new_tokens=8).sequences
        got = engine.generate(prompt, max_new_tokens=8).sequences
        n = min(got.shape[1], want.shape[1])
        np.testing.assert_array_equal(got[:, :n], want[:, :n])
        assert engine.replay_counts  # stream blocks ran
    finally:
        arena.shutdown()


def test_stream_decode_overflow_escalates_exactly(setup):
    """U starts BELOW the per-step unique count: the first dispatch
    zero-masks overflow, the host check catches it exactly, U doubles,
    and the final output is still exact."""
    from moe_infinity_tpu.store.pinned import PinnedExpertTier

    model, params, store_dir, gen_res = setup
    store = ExpertStore(store_dir)
    tier = PinnedExpertTier(store, shared_record=False)
    arena = ExpertArena(
        store, 4, compute_dtype=jnp.float32, num_threads=1,
        pinned_tier=tier,
    )
    engine = Seq2SeqOffloadEngine(
        model, params, arena, prefetch=False,
        speculative=True, spec_block=4, stream_decode=True,
        stream_unique=2,  # E=4: likely too small for a 6-token batch row
    )
    try:
        prompt = np.array([[5, 31, 8, 77, 2, 9], [9, 4, 61, 3, 2, 8]])
        want = gen_res.generate(prompt, max_new_tokens=6).sequences
        got = engine.generate(prompt, max_new_tokens=6).sequences
        n = min(got.shape[1], want.shape[1])
        np.testing.assert_array_equal(got[:, :n], want[:, :n])
        assert engine._stream_U >= 2
    finally:
        arena.shutdown()


def test_stream_decode_k1_whole_step_program(setup):
    """Stream decode at spec_block=1: the stream path must still take
    the block route (one whole-decoder-step program with the in-program
    tier gather), NOT the arena's verify/replay step — the chunked shape
    that lands the design on attachments where the k=4 full program is
    too large to compile (VERDICT r4 item 3)."""
    from moe_infinity_tpu.store.pinned import PinnedExpertTier

    model, params, store_dir, gen_res = setup
    store = ExpertStore(store_dir)
    tier = PinnedExpertTier(store, shared_record=False)
    arena = ExpertArena(
        store, 4, compute_dtype=jnp.float32, num_threads=1,
        pinned_tier=tier,
    )
    engine = Seq2SeqOffloadEngine(
        model, params, arena, prefetch=False,
        speculative=True, spec_block=1, stream_decode=True,
        stream_unique=4,
    )
    try:
        prompt = np.array([[5, 31, 8, 77, 2, 9]])
        want = gen_res.generate(prompt, max_new_tokens=8).sequences
        got = engine.generate(prompt, max_new_tokens=8).sequences
        n = min(got.shape[1], want.shape[1])
        np.testing.assert_array_equal(got[:, :n], want[:, :n])
        # one stream dispatch per token, no U escalation needed
        assert len(engine.replay_counts) == 8
        assert all(e == 1 for e in engine.replay_counts)
        # only the k=1 stream block ever compiled
        assert set(engine._stream_block_cache) == {1}
    finally:
        arena.shutdown()


def test_stream_decode_disables_on_compile_failure(setup):
    """A stream program that cannot compile on a backend (the axon
    concatenate RET_CHECK at full NLLB depth) must disable stream ONCE
    and serve through the arena path — not re-attempt the compile every
    block (round-5 chip run: ~80 s per re-attempt)."""
    from moe_infinity_tpu.store.pinned import PinnedExpertTier

    model, params, store_dir, gen_res = setup
    store = ExpertStore(store_dir)
    tier = PinnedExpertTier(store, shared_record=False)
    arena = ExpertArena(
        store, 8, compute_dtype=jnp.float32, num_threads=1,
        pinned_tier=tier,
    )
    engine = Seq2SeqOffloadEngine(
        model, params, arena, prefetch=False,
        speculative=True, spec_block=2, stream_decode=True,
        stream_unique=4,
    )

    def boom(k):
        raise RuntimeError("INTERNAL: AOT PJRT error: RET_CHECK failure")

    engine._stream_block_fn = boom
    try:
        prompt = np.array([[5, 31, 8, 77, 2, 9]])
        want = gen_res.generate(prompt, max_new_tokens=6).sequences
        got = engine.generate(prompt, max_new_tokens=6).sequences
        n = min(got.shape[1], want.shape[1])
        np.testing.assert_array_equal(got[:, :n], want[:, :n])
        assert engine._stream is False  # disabled once, permanently
    finally:
        arena.shutdown()
