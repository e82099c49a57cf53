"""Continuous batching: requests joining mid-decode produce exactly the
same tokens as isolated runs (masked column-timeline correctness)."""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moe_infinity_tpu.models.mixtral import MixtralModel, MixtralSpec
from moe_infinity_tpu.runtime.continuous import ContinuousBatcher
from moe_infinity_tpu.runtime.generate import Generator
from moe_infinity_tpu.runtime.providers import ResidentProvider

pytestmark = pytest.mark.slow  # e2e-heavy; fast path: -m 'not slow'

SPEC = MixtralSpec(
    vocab_size=128, hidden_size=48, intermediate_size=96, num_layers=2,
    num_heads=6, num_kv_heads=2, head_dim=8, num_experts=4, top_k=2,
    rms_eps=1e-6, rope_theta=1e4, tie_embeddings=False,
)


@pytest.fixture(scope="module")
def setup():
    model = MixtralModel(SPEC, compute_dtype=jnp.float32)
    params, experts = model.init_random(jax.random.PRNGKey(4))
    gen = Generator(
        model, params, experts, ResidentProvider.for_layer, max_seq_len=64
    )
    batcher = ContinuousBatcher(
        model, params, experts, ResidentProvider.for_layer,
        max_batch_size=3, page_size=8, num_pages=48, max_cols=96,
    )
    yield model, gen, batcher
    batcher.shutdown()


def test_staggered_requests_match_isolated(setup):
    model, gen, batcher = setup
    p1 = np.array([5, 31, 8])
    p2 = np.array([9, 3, 44, 6])
    want1 = gen.generate(p1[None], max_new_tokens=8).sequences[0]
    want2 = gen.generate(p2[None], max_new_tokens=6).sequences[0]

    f1 = batcher.submit(p1, max_new_tokens=8)
    time.sleep(0.3)  # let request 1 start decoding before 2 joins
    f2 = batcher.submit(p2, max_new_tokens=6)
    got1 = f1.result(timeout=120)
    got2 = f2.result(timeout=120)
    np.testing.assert_array_equal(got1, want1)
    np.testing.assert_array_equal(got2, want2)


def test_slot_reuse_after_completion(setup):
    model, gen, batcher = setup
    prompts = [np.array([7, 11]), np.array([13, 17, 19]), np.array([23]),
               np.array([29, 31]), np.array([37])]
    futures = [batcher.submit(p, max_new_tokens=5) for p in prompts]
    results = [f.result(timeout=120) for f in futures]
    for p, got in zip(prompts, results):
        want = gen.generate(p[None], max_new_tokens=5).sequences[0]
        np.testing.assert_array_equal(got, want)


def test_continuous_deepseek(setup_unused=None):
    """pad_offsets path on the MLA/DeepSeek family."""
    from moe_infinity_tpu.models.deepseek_v2 import (
        DeepseekV2ModelJax,
        DeepseekV2Spec,
    )

    spec = DeepseekV2Spec(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, num_layers=2, num_heads=4,
        q_lora_rank=None, kv_lora_rank=32, qk_nope_head_dim=32,
        qk_rope_head_dim=16, v_head_dim=32, num_experts=8, top_k=2,
        n_shared_experts=1, first_k_dense_replace=1, topk_method="greedy",
        n_group=None, topk_group=None, routed_scaling_factor=1.0,
        rms_eps=1e-6, rope_theta=10000.0, tie_embeddings=False,
    )
    model = DeepseekV2ModelJax(spec, compute_dtype=jnp.float32)
    params, experts = model.init_random(jax.random.PRNGKey(6))
    gen = Generator(
        model, params, experts, ResidentProvider.for_layer, max_seq_len=64
    )
    batcher = ContinuousBatcher(
        model, params, experts, ResidentProvider.for_layer,
        max_batch_size=2, page_size=8, num_pages=32, max_cols=64,
    )
    try:
        p1 = np.array([5, 31, 8])
        p2 = np.array([9, 3, 44, 6])
        want1 = gen.generate(p1[None], max_new_tokens=6).sequences[0]
        want2 = gen.generate(p2[None], max_new_tokens=5).sequences[0]
        f1 = batcher.submit(p1, max_new_tokens=6)
        time.sleep(0.3)
        f2 = batcher.submit(p2, max_new_tokens=5)
        np.testing.assert_array_equal(f1.result(120), want1)
        np.testing.assert_array_equal(f2.result(120), want2)
    finally:
        batcher.shutdown()


def test_eos_frees_slot_early(setup):
    model, gen, batcher = setup
    p = np.array([5, 31, 8])
    ref = gen.generate(p[None], max_new_tokens=8).sequences[0]
    eos = int(ref[5])  # stop at the 3rd generated token
    got = batcher.submit(p, max_new_tokens=8, eos_token_id=eos).result(120)
    np.testing.assert_array_equal(got, ref[:6])


class TestChunkedPrefill:
    """prefill_chunk > 1: prompts are ingested chunk-at-a-time while other
    slots decode through masked hole columns — outputs must stay exact."""

    @pytest.fixture(scope="class")
    def chunked(self):
        model = MixtralModel(SPEC, compute_dtype=jnp.float32)
        params, experts = model.init_random(jax.random.PRNGKey(4))
        gen = Generator(
            model, params, experts, ResidentProvider.for_layer, max_seq_len=64
        )
        batcher = ContinuousBatcher(
            model, params, experts, ResidentProvider.for_layer,
            max_batch_size=3, page_size=8, num_pages=64, max_cols=128,
            prefill_chunk=4,
        )
        yield gen, batcher
        batcher.shutdown()

    def test_single_request_exact(self, chunked):
        gen, batcher = chunked
        p = np.array([5, 31, 8, 77, 12, 9, 3])  # 7 tokens: 4+3 chunks
        want = gen.generate(p[None], max_new_tokens=8).sequences[0]
        got = batcher.submit(p, max_new_tokens=8).result(timeout=120)
        np.testing.assert_array_equal(got, want)

    def test_join_mid_decode_exact(self, chunked):
        """A long prompt joining mid-decode punches hole columns into the
        decoding row's timeline; both outputs must stay exact."""
        gen, batcher = chunked
        p1 = np.array([5, 31, 8])
        p2 = np.array([9, 3, 44, 6, 21, 2, 17, 8, 4, 11])  # 10-token prompt
        want1 = gen.generate(p1[None], max_new_tokens=10).sequences[0]
        want2 = gen.generate(p2[None], max_new_tokens=6).sequences[0]
        f1 = batcher.submit(p1, max_new_tokens=10)
        time.sleep(0.3)  # request 1 decodes before 2 joins
        f2 = batcher.submit(p2, max_new_tokens=6)
        np.testing.assert_array_equal(f1.result(timeout=120), want1)
        np.testing.assert_array_equal(f2.result(timeout=120), want2)

    def test_three_way_staggered(self, chunked):
        gen, batcher = chunked
        prompts = [
            np.array([7, 11, 13, 17, 19, 23]),
            np.array([29, 31, 37]),
            np.array([41, 43, 47, 53, 59, 61, 67, 71]),
        ]
        wants = [
            gen.generate(p[None], max_new_tokens=5).sequences[0]
            for p in prompts
        ]
        futures = []
        for p in prompts:
            futures.append(batcher.submit(p, max_new_tokens=5))
            time.sleep(0.15)
        for f, want in zip(futures, wants):
            np.testing.assert_array_equal(f.result(timeout=120), want)


class TestBatchedSampling:
    """Per-request sampling params inside the shared batch: mixed greedy +
    sampled requests, per-request determinism independent of co-tenants."""

    @pytest.fixture(scope="class")
    def batcher(self):
        from moe_infinity_tpu.runtime.continuous import RequestSampling  # noqa

        model = MixtralModel(SPEC, compute_dtype=jnp.float32)
        params, experts = model.init_random(jax.random.PRNGKey(4))
        gen = Generator(
            model, params, experts, ResidentProvider.for_layer, max_seq_len=64
        )
        b = ContinuousBatcher(
            model, params, experts, ResidentProvider.for_layer,
            max_batch_size=3, page_size=8, num_pages=64, max_cols=128,
            prefill_chunk=4,
        )
        yield gen, b
        b.shutdown()

    def test_greedy_request_unaffected_by_sampled_cotenant(self, batcher):
        gen, b = batcher
        p1 = np.array([5, 31, 8])
        want = gen.generate(p1[None], max_new_tokens=8).sequences[0]
        f1 = b.submit(p1, max_new_tokens=8)
        f2 = b.submit(
            np.array([9, 3, 44]), max_new_tokens=8,
            temperature=0.9, top_p=0.9, seed=11,
        )
        np.testing.assert_array_equal(f1.result(timeout=120), want)
        f2.result(timeout=120)

    def test_sampled_deterministic_regardless_of_batch(self, batcher):
        """Same sampled request alone vs with co-tenants: identical draws
        (keys derive from (seed, own progress), not batch state)."""
        gen, b = batcher
        p = np.array([7, 11, 13])
        kw = dict(max_new_tokens=6, temperature=0.8, top_k=12, seed=5)
        alone = b.submit(p, **kw).result(timeout=120)
        f1 = b.submit(p, **kw)
        f2 = b.submit(np.array([1, 2, 3, 4, 5]), max_new_tokens=6)
        f3 = b.submit(np.array([6]), max_new_tokens=6, temperature=1.2, seed=9)
        together = f1.result(timeout=120)
        f2.result(timeout=120)
        f3.result(timeout=120)
        np.testing.assert_array_equal(alone, together)

    def test_repetition_penalty_in_batch(self, batcher):
        """Greedy + strong repetition penalty through the batcher must not
        repeat any token while unpenalized greedy repeats (tiny random
        models loop quickly)."""
        gen, b = batcher
        p = np.array([5, 31])
        free = b.submit(p, max_new_tokens=12).result(timeout=120)
        # the tiny model loops on one token without a penalty
        assert any(a == b2 for a, b2 in zip(free[2:], free[3:]))
        pen = b.submit(
            p, max_new_tokens=12, repetition_penalty=10.0, seed=0
        ).result(timeout=120)
        gen_pen = pen[len(p):]
        # penalized generation never emits the same token twice in a row
        assert all(a != b2 for a, b2 in zip(gen_pen, gen_pen[1:]))
        assert pen.shape == free.shape


@pytest.mark.parametrize("family", ["grok", "arctic"])
def test_continuous_grok_arctic(family):
    """Continuous batching with chunked prefill on the Grok and Arctic
    families (per-row timeline support)."""
    if family == "grok":
        from moe_infinity_tpu.models.grok import GrokModel, GrokSpec

        spec = GrokSpec(
            vocab_size=96, hidden_size=48, intermediate_size=64,
            num_layers=2, num_heads=6, num_kv_heads=2, head_dim=8,
            num_experts=4, top_k=2, rms_eps=1e-6,
            embedding_multiplier_scale=1.0, output_multiplier_scale=1.0,
            attn_output_multiplier=0.12, max_attn_value=30.0,
        )
        model = GrokModel(spec, compute_dtype=jnp.float32)
    else:
        from moe_infinity_tpu.models.arctic import ArcticModel, ArcticSpec

        spec = ArcticSpec(
            vocab_size=96, hidden_size=48, intermediate_size=64,
            num_layers=2, num_heads=6, num_kv_heads=2, head_dim=8,
            num_experts=4, top_k=2, rms_eps=1e-6, rope_theta=1e4,
            moe_layer_frequency=1, parallel_attn_mlp_res=True,
        )
        model = ArcticModel(spec, compute_dtype=jnp.float32)
    params, experts = model.init_random(jax.random.PRNGKey(6))
    gen = Generator(
        model, params, experts, ResidentProvider.for_layer, max_seq_len=64
    )
    batcher = ContinuousBatcher(
        model, params, experts, ResidentProvider.for_layer,
        max_batch_size=2, page_size=8, num_pages=48, max_cols=96,
        prefill_chunk=3,
    )
    try:
        p1 = np.array([5, 31, 8, 7, 2])
        p2 = np.array([9, 3, 44])
        want1 = gen.generate(p1[None], max_new_tokens=6).sequences[0]
        want2 = gen.generate(p2[None], max_new_tokens=5).sequences[0]
        f1 = batcher.submit(p1, max_new_tokens=6)
        time.sleep(0.2)
        f2 = batcher.submit(p2, max_new_tokens=5)
        np.testing.assert_array_equal(f1.result(timeout=120), want1)
        np.testing.assert_array_equal(f2.result(timeout=120), want2)
    finally:
        batcher.shutdown()

class TestOffloadSpeculativeBatcher:
    """Continuous batching over an ExpertArena: every shared step runs as
    ONE speculative program over the arena's slots (verify + replay), so
    concurrent serving works in the offload regime with zero per-layer
    host sync. Output must match the resident generator exactly."""

    @pytest.fixture(scope="class")
    def offload_setup(self, tmp_path_factory):
        import torch
        from transformers import MixtralConfig, MixtralForCausalLM

        from moe_infinity_tpu.memory import ExpertPredictor, ExpertTracer
        from moe_infinity_tpu.runtime.arena import ExpertArena
        from moe_infinity_tpu.store.blob import DenseArchive, ExpertStore
        from moe_infinity_tpu.store.ingest import ingest_checkpoint

        cfg = MixtralConfig(
            hidden_size=48, intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=6, num_key_value_heads=2,
            num_local_experts=8, num_experts_per_tok=2, vocab_size=160,
            max_position_embeddings=128, torch_dtype=torch.float32,
            architectures=["MixtralForCausalLM"],
        )
        torch.manual_seed(11)
        hf = MixtralForCausalLM(cfg).eval()
        ckpt = tmp_path_factory.mktemp("cbo") / "ckpt"
        hf.save_pretrained(ckpt, safe_serialization=True)
        store_dir = str(tmp_path_factory.mktemp("cbo") / "store")
        ingest_checkpoint(
            str(ckpt), store_dir, cfg,
            expert_dtype="float32", dense_dtype="float32",
        )
        model = MixtralModel(
            MixtralSpec.from_hf(cfg), compute_dtype=jnp.float32
        )
        params = model.load_params(DenseArchive(store_dir))
        experts = ResidentProvider(
            ExpertStore(store_dir), dtype=jnp.float32
        ).pytree()
        gen = Generator(
            model, params, experts, ResidentProvider.for_layer,
            max_seq_len=64,
        )
        # 13 slots of 16 (2 layers x 8 experts): a step's union (<= 12 =
        # B*K*L) always fits, but residency churns between steps
        arena = ExpertArena(
            ExpertStore(store_dir), 13,
            compute_dtype=jnp.float32, num_threads=2,
        )
        tracer = ExpertTracer(64, 2, 8)
        batcher = ContinuousBatcher(
            model, params, None, None,
            arena=arena, tracer=tracer, predictor=ExpertPredictor(tracer),
            max_batch_size=3, page_size=8, num_pages=48, max_cols=96,
        )
        yield gen, batcher, arena
        batcher.shutdown()
        arena.shutdown()

    def test_staggered_offload_matches_resident(self, offload_setup):
        gen, batcher, arena = offload_setup
        p1 = np.array([5, 31, 8])
        p2 = np.array([9, 3, 44, 6])
        want1 = gen.generate(p1[None], max_new_tokens=8).sequences[0]
        want2 = gen.generate(p2[None], max_new_tokens=6).sequences[0]
        f1 = batcher.submit(p1, max_new_tokens=8)
        time.sleep(0.3)  # request 2 joins mid-decode
        f2 = batcher.submit(p2, max_new_tokens=6)
        np.testing.assert_array_equal(f1.result(timeout=180), want1)
        np.testing.assert_array_equal(f2.result(timeout=180), want2)
        assert batcher.replay_counts, "speculative path not exercised"
        s = batcher.stats()
        assert s["speculative_steps"] == len(batcher.replay_counts)

    def test_offload_batcher_slot_reuse(self, offload_setup):
        gen, batcher, arena = offload_setup
        prompts = [np.array([7, 11]), np.array([13, 17, 19]),
                   np.array([23]), np.array([29, 31]), np.array([37])]
        futures = [batcher.submit(p, max_new_tokens=5) for p in prompts]
        results = [f.result(timeout=180) for f in futures]
        for p, got in zip(prompts, results):
            want = gen.generate(p[None], max_new_tokens=5).sequences[0]
            np.testing.assert_array_equal(got, want)

    def test_offload_batcher_survives_step_failure(self, offload_setup):
        """An injected step failure fails the in-flight futures but the
        scheduler thread survives, rebuilds the pools, and serves
        subsequent requests correctly."""
        gen, batcher, arena = offload_setup
        orig = batcher._program
        state = {"armed": True}

        def poisoned(W):
            prog = orig(W)

            def wrapper(*a, **k):
                if state["armed"]:
                    state["armed"] = False
                    raise RuntimeError("injected step failure")
                return prog(*a, **k)

            return wrapper

        batcher._program = poisoned
        try:
            f = batcher.submit(np.array([5, 31]), max_new_tokens=4)
            with pytest.raises(RuntimeError, match="injected"):
                f.result(timeout=120)
        finally:
            batcher._program = orig
        # the batcher still works after the failure
        p = np.array([9, 3, 44])
        want = gen.generate(p[None], max_new_tokens=5).sequences[0]
        got = batcher.submit(p, max_new_tokens=5).result(timeout=120)
        np.testing.assert_array_equal(got, want)


def test_resident_batcher_survives_step_failure(setup):
    """Resident mode donates the KV pools; after a failed step the pools
    are rebuilt and serving continues."""
    model, gen, batcher = setup
    orig = batcher._program
    state = {"armed": True}

    def poisoned(W):
        prog = orig(W)

        def wrapper(*a, **k):
            if state["armed"]:
                state["armed"] = False
                raise RuntimeError("injected step failure")
            return prog(*a, **k)

        return wrapper

    batcher._program = poisoned
    try:
        f = batcher.submit(np.array([5, 31, 8]), max_new_tokens=4)
        with pytest.raises(RuntimeError, match="injected"):
            f.result(timeout=120)
    finally:
        batcher._program = orig
    p = np.array([7, 11, 13])
    want = gen.generate(p[None], max_new_tokens=5).sequences[0]
    got = batcher.submit(p, max_new_tokens=5).result(timeout=120)
    np.testing.assert_array_equal(got, want)

def test_fuzz_staggered_workload_matches_isolated(setup):
    """Randomized staggered workload (seeded): many requests with random
    prompts/lengths/budgets submitted at random times through the shared
    batch must each match their isolated run exactly."""
    import time

    model, gen, batcher = setup
    rng = np.random.default_rng(42)
    prompts = [
        rng.integers(1, 127, size=int(rng.integers(1, 9)))
        for _ in range(10)
    ]
    budgets = [int(rng.integers(1, 9)) for _ in range(10)]
    wants = [
        gen.generate(p[None], max_new_tokens=m).sequences[0]
        for p, m in zip(prompts, budgets)
    ]
    futures = []
    for p, m in zip(prompts, budgets):
        futures.append(batcher.submit(p, max_new_tokens=m))
        time.sleep(float(rng.uniform(0.0, 0.15)))
    for f, want in zip(futures, wants):
        np.testing.assert_array_equal(f.result(timeout=240), want)
