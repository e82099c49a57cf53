"""Expert arena + offload engine tests.

Covers SURVEY.md §7 step 3: deterministic residency tests against the real
store (tiny shapes), offload-vs-resident parity, hit-rate accounting, and
concurrency of the fetch queue.
"""

import numpy as np
import pytest
import torch
from transformers import MixtralConfig, MixtralForCausalLM

import jax
import jax.numpy as jnp

from moe_infinity_tpu.memory import ExpertPredictor, ExpertTracer
from moe_infinity_tpu.models.mixtral import MixtralModel, MixtralSpec
from moe_infinity_tpu.runtime.arena import ExpertArena
from moe_infinity_tpu.runtime.engine import OffloadEngine
from moe_infinity_tpu.runtime.generate import Generator
from moe_infinity_tpu.runtime.providers import ResidentProvider
from moe_infinity_tpu.store.blob import DenseArchive, ExpertStore
from moe_infinity_tpu.store.ingest import ingest_checkpoint

pytestmark = pytest.mark.slow  # e2e-heavy; fast path: -m 'not slow'

L, E = 3, 8


@pytest.fixture(scope="module")
def tiny_mixtral(tmp_path_factory):
    cfg = MixtralConfig(
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=L,
        num_attention_heads=6,
        num_key_value_heads=2,
        num_local_experts=E,
        num_experts_per_tok=2,
        vocab_size=160,
        max_position_embeddings=128,
        torch_dtype=torch.float32,
        architectures=["MixtralForCausalLM"],
    )
    torch.manual_seed(3)
    hf = MixtralForCausalLM(cfg).eval()
    ckpt = tmp_path_factory.mktemp("arena") / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)
    store_dir = str(tmp_path_factory.mktemp("arena") / "store")
    ingest_checkpoint(
        str(ckpt), store_dir, cfg, expert_dtype="float32", dense_dtype="float32"
    )
    model = MixtralModel(MixtralSpec.from_hf(cfg), compute_dtype=jnp.float32)
    params = model.load_params(DenseArchive(store_dir))
    return cfg, model, params, store_dir


def make_arena(store_dir, num_slots, **kw):
    store = ExpertStore(store_dir)
    kw.setdefault("compute_dtype", jnp.float32)
    kw.setdefault("num_threads", 2)
    return ExpertArena(store, num_slots, **kw)


class TestArena:
    def test_acquire_loads_and_counts_miss_then_hit(self, tiny_mixtral):
        _, _, _, store_dir = tiny_mixtral
        arena = make_arena(store_dir, num_slots=4)
        try:
            arena.acquire([(0, 1), (0, 2)], layer=0)
            assert arena.is_resident((0, 1)) and arena.is_resident((0, 2))
            arena.release([(0, 1), (0, 2)])
            arena.acquire([(0, 1)], layer=0)
            arena.release([(0, 1)])
            s = arena.hit_stats()
            assert s["visits"] == 3 and s["misses"] == 2 and s["hits"] == 1
        finally:
            arena.shutdown()

    def test_slot_content_matches_store(self, tiny_mixtral):
        _, _, _, store_dir = tiny_mixtral
        arena = make_arena(store_dir, num_slots=2)
        try:
            arena.acquire([(1, 3)], layer=1)
            slot = arena.key_to_slot[(1, 3)]
            got = np.asarray(arena.pytree()["gate"][slot])
            want = ExpertStore(store_dir).get_tensor(1, 3, "w1.weight")
            np.testing.assert_allclose(got, np.asarray(want, np.float32))
        finally:
            arena.shutdown()

    def test_eviction_when_full(self, tiny_mixtral):
        _, _, _, store_dir = tiny_mixtral
        arena = make_arena(store_dir, num_slots=2, policy="lru")
        try:
            arena.acquire([(0, 0)], 0)
            arena.release([(0, 0)])
            arena.acquire([(0, 1)], 0)
            arena.release([(0, 1)])
            arena.acquire([(0, 2)], 0)  # must evict (0,0) (oldest)
            arena.release([(0, 2)])
            assert not arena.is_resident((0, 0))
            assert arena.is_resident((0, 1)) and arena.is_resident((0, 2))
            assert arena.hit_stats()["evictions"] == 1
        finally:
            arena.shutdown()

    def test_exhaustion_raises_in_caller(self, tiny_mixtral):
        _, _, _, store_dir = tiny_mixtral
        arena = make_arena(store_dir, num_slots=1)
        try:
            with pytest.raises(RuntimeError, match="exhausted"):
                arena.acquire([(0, 0), (0, 1)], 0)  # 2 protected, 1 slot
        finally:
            arena.shutdown()

    def test_swap_policy_preserves_state_and_reconciles(self, tiny_mixtral):
        """swap_policy (interleaved A/B windows, VERDICT r3 item 3): the
        incoming policy keeps its learned counters across swaps, its
        residency picture is reconciled to the arena's CURRENT slots, and
        silent reconciliation never counts as an eviction."""
        from moe_infinity_tpu.memory.cache_policy import ExpertCachePolicy

        _, _, _, store_dir = tiny_mixtral
        arena = make_arena(store_dir, num_slots=2, policy="lru")
        try:
            pol_a = arena.policy
            pol_b = ExpertCachePolicy(
                arena.num_layers, arena.num_experts, policy="priority"
            )
            arena.acquire([(0, 0), (0, 1)], 0)
            arena.release([(0, 0), (0, 1)])
            freq_a = pol_a.frequency.copy()
            # swap B in: it must learn the current residency silently
            out = arena.swap_policy(pol_b)
            assert out is pol_a
            assert set(pol_b.resident) == {(0, 0), (0, 1)}
            assert pol_b.stats.evictions == 0
            # B accumulates its own stats; evict (0, 0) by touching others
            arena.acquire([(0, 2)], 0)
            arena.release([(0, 2)])
            assert pol_b.stats.visits == 1
            evicted = {(0, 0), (0, 1)} - set(arena.key_to_slot)
            assert len(evicted) == 1 and pol_b.stats.evictions == 1
            # swap A back: frequency preserved, residency reconciled,
            # the OTHER policy's eviction not charged to A
            arena.swap_policy(pol_a)
            np.testing.assert_array_equal(pol_a.frequency, freq_a)
            assert set(pol_a.resident) == set(arena.key_to_slot)
            assert pol_a.stats.evictions == 0
        finally:
            arena.shutdown()

    def test_prefetch_then_acquire_is_hit(self, tiny_mixtral):
        _, _, _, store_dir = tiny_mixtral
        arena = make_arena(store_dir, num_slots=4)
        try:
            arena.warm([(2, 5)])
            arena.acquire([(2, 5)], 2)
            arena.release([(2, 5)])
            s = arena.hit_stats()
            assert s["hits"] == 1 and s["prefetches"] == 1
            assert s["prefetch_hits"] == 1
        finally:
            arena.shutdown()

    def test_concurrent_acquires(self, tiny_mixtral):
        import threading

        _, _, _, store_dir = tiny_mixtral
        arena = make_arena(store_dir, num_slots=E, num_threads=3)
        errs = []

        def worker(e):
            try:
                for l in range(L):
                    arena.acquire([(l, e)], l)
                    arena.release([(l, e)])
            except Exception as ex:  # pragma: no cover
                errs.append(ex)

        try:
            ts = [threading.Thread(target=worker, args=(e,)) for e in range(4)]
            for t in ts:
                t.start()
            for t in ts:
                t.join(timeout=60)
            assert not errs
            assert arena.hit_stats()["visits"] == 12
        finally:
            arena.shutdown()


class TestOffloadEngine:
    def _build(self, tiny_mixtral, num_slots, prefetch=True, **arena_kw):
        cfg, model, params, store_dir = tiny_mixtral
        arena = make_arena(store_dir, num_slots, **arena_kw)
        tracer = ExpertTracer(16, L, E)
        engine = OffloadEngine(
            model,
            params,
            arena,
            tracer=tracer,
            predictor=ExpertPredictor(tracer),
            prefetch=prefetch,
        )
        return engine, arena

    def test_offload_matches_resident(self, tiny_mixtral):
        cfg, model, params, store_dir = tiny_mixtral
        provider = ResidentProvider(ExpertStore(store_dir), dtype=jnp.float32)
        gen_res = Generator(
            model, params, provider.pytree(), ResidentProvider.for_layer,
            max_seq_len=64,
        )
        engine, arena = self._build(tiny_mixtral, num_slots=2 * E)
        try:
            gen_off = Generator(stepper=engine, max_seq_len=64)
            prompt = np.array([[5, 17, 31, 7]])
            want = gen_res.generate(prompt, max_new_tokens=8).sequences
            got = gen_off.generate(prompt, max_new_tokens=8).sequences
            np.testing.assert_array_equal(got, want)
        finally:
            arena.shutdown()

    def test_constrained_arena_still_correct_and_counts(self, tiny_mixtral):
        cfg, model, params, store_dir = tiny_mixtral
        provider = ResidentProvider(ExpertStore(store_dir), dtype=jnp.float32)
        gen_res = Generator(
            model, params, provider.pytree(), ResidentProvider.for_layer,
            max_seq_len=64,
        )
        # only 8 slots (one layer's worth) for 24 experts — heavy eviction
        engine, arena = self._build(tiny_mixtral, num_slots=8, policy="priority")
        try:
            gen_off = Generator(stepper=engine, max_seq_len=64)
            prompt = np.array([[9, 3, 42]])
            want = gen_res.generate(prompt, max_new_tokens=6).sequences
            got = gen_off.generate(prompt, max_new_tokens=6).sequences
            np.testing.assert_array_equal(got, want)
            s = engine.stats()
            assert s["visits"] > 0 and s["misses"] > 0
            assert s["evictions"] > 0
        finally:
            arena.shutdown()

    def test_tracer_records_and_finishes(self, tiny_mixtral):
        engine, arena = self._build(tiny_mixtral, num_slots=E * L)
        try:
            gen = Generator(stepper=engine, max_seq_len=64)
            gen.generate(np.array([[1, 2, 3]]), max_new_tokens=4)
            tr = engine.tracer
            assert not tr.trace  # finished
            assert tr.trace_collection.sum() > 0
        finally:
            arena.shutdown()

    def test_prefetch_improves_hits_vs_no_prefetch(self, tiny_mixtral):
        # with lookahead prefetch on a repeated workload, hit rate should be
        # decent even with a small arena
        engine, arena = self._build(tiny_mixtral, num_slots=12, prefetch=True)
        try:
            gen = Generator(stepper=engine, max_seq_len=64)
            for _ in range(3):
                gen.generate(np.array([[7, 7, 7]]), max_new_tokens=6)
            assert engine.hit_rate() > 0.2
        finally:
            arena.shutdown()


def test_speculative_decode_matches_resident(tiny_mixtral):
    """Decoder-only speculative whole-step decode: each step is ONE
    compiled forward over the arena's current slots, verified + replayed
    on miss — exact vs the resident path, with replays happening (the
    12-slot arena holds one step's union (3 layers x <=4 routed at B=2)
    but not the cross-step hot set, so replays happen)."""
    cfg, model, params, store_dir = tiny_mixtral
    provider = ResidentProvider(ExpertStore(store_dir), dtype=jnp.float32)
    gen_res = Generator(
        model, params, provider.pytree(), ResidentProvider.for_layer,
        max_seq_len=64,
    )
    arena = make_arena(store_dir, 12)
    tracer = ExpertTracer(16, L, E)
    engine = OffloadEngine(
        model, params, arena, tracer=tracer,
        predictor=ExpertPredictor(tracer), prefetch=False, speculative=True,
    )
    try:
        gen_off = Generator(stepper=engine, max_seq_len=64)
        prompt = np.array([[5, 17, 31, 7], [9, 4, 2, 61]])
        want = gen_res.generate(prompt, max_new_tokens=8).sequences
        got = gen_off.generate(prompt, max_new_tokens=8).sequences
        np.testing.assert_array_equal(got, want)
        assert engine.replay_counts, "speculative decode not exercised"
        assert max(engine.replay_counts) > 1  # cold slots force replays
        assert engine.stats()["visits"] > 0
    finally:
        arena.shutdown()


def test_speculative_block_decode_matches_resident(tiny_mixtral):
    """Multi-step speculative blocks through the Generator: k greedy
    decode steps per compiled program (lax.scan), verified + replayed as
    a unit — exact vs resident, including the ragged tail (8 tokens with
    spec_block=3: prefill + blocks of 3, 3, 1->single-step)."""
    cfg, model, params, store_dir = tiny_mixtral
    provider = ResidentProvider(ExpertStore(store_dir), dtype=jnp.float32)
    gen_res = Generator(
        model, params, provider.pytree(), ResidentProvider.for_layer,
        max_seq_len=64,
    )
    # a 3-step block's expert union can reach 3 layers x 4 routed x 3
    # steps; 20 slots hold realistic unions while cold starts still replay
    arena = make_arena(store_dir, 20)
    tracer = ExpertTracer(16, L, E)
    engine = OffloadEngine(
        model, params, arena, tracer=tracer,
        predictor=ExpertPredictor(tracer), prefetch=False, speculative=True,
        spec_block=3,
    )
    try:
        gen_off = Generator(stepper=engine, max_seq_len=64)
        prompt = np.array([[5, 17, 31, 7], [9, 4, 2, 61]])
        want = gen_res.generate(
            prompt, max_new_tokens=8, eos_token_id=None
        ).sequences
        got = gen_off.generate(
            prompt, max_new_tokens=8, eos_token_id=None
        ).sequences
        np.testing.assert_array_equal(got, want)
        assert engine.spec_block == 3  # never downgraded
        assert engine.replay_counts and max(engine.replay_counts) > 1
        # sampled decode must bypass blocks (needs per-step logits) and
        # still be exact under the single-step speculative path
        want_s = gen_res.generate(
            prompt, max_new_tokens=6, eos_token_id=None,
            temperature=0.8, top_k=4, seed=11,
        ).sequences
        got_s = gen_off.generate(
            prompt, max_new_tokens=6, eos_token_id=None,
            temperature=0.8, top_k=4, seed=11,
        ).sequences
        np.testing.assert_array_equal(got_s, want_s)
    finally:
        arena.shutdown()


def test_speculative_with_prefetch_matches(tiny_mixtral):
    """speculative + prefetch: next-step warming runs concurrently with
    verification; the dispatch-time residency snapshot keeps it exact."""
    cfg, model, params, store_dir = tiny_mixtral
    provider = ResidentProvider(ExpertStore(store_dir), dtype=jnp.float32)
    gen_res = Generator(
        model, params, provider.pytree(), ResidentProvider.for_layer,
        max_seq_len=64,
    )
    arena = make_arena(store_dir, 12)
    tracer = ExpertTracer(16, L, E)
    engine = OffloadEngine(
        model, params, arena, tracer=tracer,
        predictor=ExpertPredictor(tracer), prefetch=True, speculative=True,
    )
    try:
        gen_off = Generator(stepper=engine, max_seq_len=64)
        prompt = np.array([[5, 17, 31, 7], [9, 4, 2, 61]])
        want = gen_res.generate(prompt, max_new_tokens=10).sequences
        got = gen_off.generate(prompt, max_new_tokens=10).sequences
        np.testing.assert_array_equal(got, want)
        assert engine.replay_counts
        # next-step warming actually issued prefetch orders
        assert engine.stats()["prefetches"] > 0
    finally:
        arena.shutdown()


def test_speculative_falls_back_when_union_exceeds_arena(tiny_mixtral):
    """An arena smaller than one step's expert union can't satisfy the
    replay protocol: the engine must disable speculation and finish the
    request exactly on the per-layer path."""
    cfg, model, params, store_dir = tiny_mixtral
    provider = ResidentProvider(ExpertStore(store_dir), dtype=jnp.float32)
    gen_res = Generator(
        model, params, provider.pytree(), ResidentProvider.for_layer,
        max_seq_len=64,
    )
    # E=8 slots (engine minimum) < 3 layers x 4 routed at B=2
    arena = make_arena(store_dir, E)
    engine = OffloadEngine(
        model, params, arena, prefetch=False, speculative=True,
    )
    try:
        gen_off = Generator(stepper=engine, max_seq_len=64)
        prompt = np.array([[5, 17, 31, 7], [9, 4, 2, 61]])
        want = gen_res.generate(prompt, max_new_tokens=6).sequences
        got = gen_off.generate(prompt, max_new_tokens=6).sequences
        np.testing.assert_array_equal(got, want)
        assert engine.speculative is False  # fell back
    finally:
        arena.shutdown()


def test_deepseek_speculative_decode_matches_resident(tmp_path):
    """Speculative whole-step decode on the DeepSeek family: dense
    first_k_dense layers + shared experts ride inside the same compiled
    step; only the routed-moe trace drives verification."""
    from moe_infinity_tpu.models.deepseek_v2 import (
        DeepseekV2ModelJax,
        DeepseekV2Spec,
    )
    from moe_infinity_tpu.store.blob import SyntheticStore

    spec = DeepseekV2Spec(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, num_layers=3, num_heads=4,
        kv_lora_rank=32, qk_nope_head_dim=32, qk_rope_head_dim=16,
        v_head_dim=32, num_experts=8, top_k=2, n_shared_experts=1,
        first_k_dense_replace=1, topk_method="greedy", n_group=None,
        topk_group=None, routed_scaling_factor=1.0, rms_eps=1e-6,
        rope_theta=10000.0, tie_embeddings=False, q_lora_rank=None,
    )
    model = DeepseekV2ModelJax(spec, compute_dtype=jnp.float32)
    params, experts = model.init_random(jax.random.PRNGKey(8))
    gen_res = Generator(
        model, params, experts, ResidentProvider.for_layer, max_seq_len=64
    )

    # a real store carrying the SAME expert values as the resident tree
    # (2 MoE layers x 8 experts); speculative offload must match exactly
    from moe_infinity_tpu.store.blob import ExpertStoreWriter, ExpertStore

    D, F = spec.hidden_size, spec.moe_intermediate_size
    fields = [
        ("gate_proj.weight", (D, F), "float32"),
        ("up_proj.weight", (D, F), "float32"),
        ("down_proj.weight", (F, D), "float32"),
    ]
    store_dir = str(tmp_path / "store")
    w = ExpertStoreWriter(
        store_dir, 2, 8, fields, meta={"arch": "deepseek"}
    )
    for mli, lt in enumerate(experts["layers"]):
        for e in range(8):
            w.write_tensor(
                mli, e, "gate_proj.weight", np.asarray(lt["gate"][e])
            )
            w.write_tensor(mli, e, "up_proj.weight", np.asarray(lt["up"][e]))
            w.write_tensor(
                mli, e, "down_proj.weight", np.asarray(lt["down"][e])
            )
    w.finalize()
    arena = ExpertArena(
        ExpertStore(store_dir), 8, compute_dtype=jnp.float32, num_threads=2
    )
    engine = OffloadEngine(
        model, params, arena, prefetch=False, speculative=True,
    )
    try:
        gen_off = Generator(stepper=engine, max_seq_len=64)
        prompt = np.array([[5, 17, 31, 7]])
        want = gen_res.generate(prompt, max_new_tokens=8).sequences
        got = gen_off.generate(prompt, max_new_tokens=8).sequences
        np.testing.assert_array_equal(got, want)
        assert engine.replay_counts
    finally:
        arena.shutdown()
