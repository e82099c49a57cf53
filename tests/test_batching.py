"""Dynamic batching: concurrent mixed-length requests batched in one wave
produce exactly the same tokens as individual unbatched runs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moe_infinity_tpu.models.mixtral import MixtralModel, MixtralSpec
from moe_infinity_tpu.runtime.batching import DynamicBatcher
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
    params, experts = model.init_random(jax.random.PRNGKey(2))
    gen = Generator(
        model, params, experts, ResidentProvider.for_layer, max_seq_len=64
    )
    batcher = DynamicBatcher(
        model, params, experts, ResidentProvider.for_layer,
        max_batch_size=4, max_wait_s=0.2, max_seq_len=64,
    )
    yield model, gen, batcher
    batcher.shutdown()


def test_batched_matches_individual(setup):
    model, gen, batcher = setup
    prompts = [
        np.array([5, 31, 8]),
        np.array([9, 3, 44, 6, 17]),  # different length -> left padding
        np.array([77]),
    ]
    futures = [batcher.submit(p, max_new_tokens=6) for p in prompts]
    got = [f.result(timeout=120) for f in futures]
    for p, g in zip(prompts, got):
        want = gen.generate(p[None], max_new_tokens=6).sequences[0]
        np.testing.assert_array_equal(g, want)


def test_eos_stops_per_sequence(setup):
    model, gen, batcher = setup
    p = np.array([5, 31, 8])
    ref = gen.generate(p[None], max_new_tokens=8).sequences[0]
    eos = int(ref[4])  # force an early stop at the 2nd generated token
    f = batcher.submit(p, max_new_tokens=8, eos_token_id=eos)
    got = f.result(timeout=120)
    np.testing.assert_array_equal(got, ref[:5])


# ---- seq2seq wave batching ---------------------------------------------


@pytest.fixture(scope="module")
def s2s_setup():
    from moe_infinity_tpu.models.nllb import NllbModel, NllbSpec
    from moe_infinity_tpu.runtime.generate import Seq2SeqGenerator

    spec = NllbSpec(
        vocab_size=96, d_model=32, num_heads=4, encoder_layers=2,
        decoder_layers=2, encoder_ffn_dim=64, decoder_ffn_dim=64,
        encoder_sparse_step=2, decoder_sparse_step=2, num_experts=4,
        pad_token_id=1, decoder_start_token_id=2, max_positions=64,
        scale_embedding=True,
    )
    model = NllbModel(spec, compute_dtype=jnp.float32)
    params, experts = model.init_random(jax.random.PRNGKey(6))
    gen = Seq2SeqGenerator(
        model, params, experts, ResidentProvider.for_layer
    )
    return model, params, experts, gen


def test_s2s_batched_matches_individual(s2s_setup):
    """Ragged-length sources batched in one wave == serial generation
    (right-padding under the mask is position-transparent)."""
    from moe_infinity_tpu.runtime.batching import Seq2SeqDynamicBatcher

    model, params, experts, gen = s2s_setup
    batcher = Seq2SeqDynamicBatcher(
        model, params, experts, ResidentProvider.for_layer,
        max_batch_size=4, max_wait_s=0.2,
    )
    try:
        prompts = [
            np.array([5, 31, 8, 77, 2]),
            np.array([9, 4, 61]),
            np.array([12, 3, 44, 7, 90, 15, 2]),
        ]
        wants = [
            gen.generate(
                p[None], max_new_tokens=6, eos_token_id=None
            ).sequences[0]
            for p in prompts
        ]
        futs = [
            batcher.submit(p, max_new_tokens=6, eos_token_id=None)
            for p in prompts
        ]
        for f, want in zip(futs, wants):
            np.testing.assert_array_equal(f.result(timeout=120), want)
    finally:
        batcher.shutdown()


def test_s2s_eos_stops_per_request(s2s_setup):
    from moe_infinity_tpu.runtime.batching import Seq2SeqDynamicBatcher

    model, params, experts, gen = s2s_setup
    # learn what each prompt greedily emits, then stop one row on its
    # first generated token while the other runs to its budget
    p1, p2 = np.array([5, 31, 8]), np.array([9, 4, 61, 7])
    g1 = gen.generate(p1[None], max_new_tokens=5, eos_token_id=None).sequences[0]
    batcher = Seq2SeqDynamicBatcher(
        model, params, experts, ResidentProvider.for_layer,
        max_batch_size=2, max_wait_s=0.2,
    )
    try:
        f1 = batcher.submit(p1, max_new_tokens=5, eos_token_id=int(g1[1]))
        f2 = batcher.submit(p2, max_new_tokens=5, eos_token_id=None)
        r1, r2 = f1.result(timeout=120), f2.result(timeout=120)
        assert len(r1) == 2 and r1[1] == g1[1]  # stopped at its eos
        assert len(r2) == 6  # ran to budget
    finally:
        batcher.shutdown()

# ---- seq2seq CONTINUOUS batching -----------------------------------------


def test_s2s_continuous_staggered_matches_isolated(s2s_setup):
    """Requests joining MID-DECODE produce exactly the isolated outputs:
    per-row decode positions (row_offsets), per-slot cross K/V rows, and
    slot reuse behind the causal horizon."""
    from moe_infinity_tpu.runtime.continuous_s2s import (
        Seq2SeqContinuousBatcher,
    )

    model, params, experts, gen = s2s_setup
    batcher = Seq2SeqContinuousBatcher(
        model, params, experts, ResidentProvider.for_layer,
        max_batch_size=3, max_src_len=16, max_decode_len=16,
    )
    try:
        p1 = np.array([5, 31, 8, 77, 2])
        p2 = np.array([9, 4, 61])
        want1 = gen.generate(
            p1[None], max_new_tokens=8, eos_token_id=None
        ).sequences[0]
        want2 = gen.generate(
            p2[None], max_new_tokens=6, eos_token_id=None
        ).sequences[0]
        f1 = batcher.submit(p1, max_new_tokens=8, eos_token_id=None)
        import time as _t

        _t.sleep(0.4)  # request 2 joins while 1 is mid-decode
        f2 = batcher.submit(p2, max_new_tokens=6, eos_token_id=None)
        np.testing.assert_array_equal(f1.result(timeout=120), want1)
        np.testing.assert_array_equal(f2.result(timeout=120), want2)
    finally:
        batcher.shutdown()


def test_s2s_continuous_slot_reuse(s2s_setup):
    """More requests than slots: completed slots reseat new requests;
    stale K/V from prior occupants never leaks (causal horizon)."""
    from moe_infinity_tpu.runtime.continuous_s2s import (
        Seq2SeqContinuousBatcher,
    )

    model, params, experts, gen = s2s_setup
    batcher = Seq2SeqContinuousBatcher(
        model, params, experts, ResidentProvider.for_layer,
        max_batch_size=2, max_src_len=16, max_decode_len=16,
    )
    try:
        prompts = [
            np.array([5, 31, 8]), np.array([9, 4, 61, 7]),
            np.array([12, 3]), np.array([44, 7, 90, 15, 2]),
            np.array([77]),
        ]
        wants = [
            gen.generate(
                p[None], max_new_tokens=5, eos_token_id=None
            ).sequences[0]
            for p in prompts
        ]
        futs = [
            batcher.submit(p, max_new_tokens=5, eos_token_id=None)
            for p in prompts
        ]
        for f, want in zip(futs, wants):
            np.testing.assert_array_equal(f.result(timeout=120), want)
    finally:
        batcher.shutdown()


def test_s2s_continuous_switch_family(rng=None):
    """Switch (T5 relative bias + capacity router): per-row bias path."""
    from moe_infinity_tpu.models.switch import SwitchModel, SwitchSpec
    from moe_infinity_tpu.runtime.continuous_s2s import (
        Seq2SeqContinuousBatcher,
    )
    from moe_infinity_tpu.runtime.generate import Seq2SeqGenerator

    spec = SwitchSpec(
        vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_heads=4,
        num_encoder_layers=2, num_decoder_layers=2, encoder_sparse_step=2,
        decoder_sparse_step=2, num_experts=4, expert_capacity=8,
        rel_buckets=8, rel_max_distance=16, rms_eps=1e-6,
        tie_embeddings=True, is_gated=False, dense_act_gelu=False,
        decoder_start_token_id=0,
    )
    model = SwitchModel(spec, compute_dtype=jnp.float32)
    params, experts = model.init_random(jax.random.PRNGKey(3))
    gen = Seq2SeqGenerator(
        model, params, experts, ResidentProvider.for_layer
    )
    batcher = Seq2SeqContinuousBatcher(
        model, params, experts, ResidentProvider.for_layer,
        max_batch_size=2, max_src_len=16, max_decode_len=16,
    )
    try:
        p1, p2 = np.array([5, 31, 8, 7]), np.array([9, 4, 61])
        want1 = gen.generate(
            p1[None], max_new_tokens=6, eos_token_id=None
        ).sequences[0]
        want2 = gen.generate(
            p2[None], max_new_tokens=5, eos_token_id=None
        ).sequences[0]
        f1 = batcher.submit(p1, max_new_tokens=6, eos_token_id=None)
        import time as _t

        _t.sleep(0.4)
        f2 = batcher.submit(p2, max_new_tokens=5, eos_token_id=None)
        np.testing.assert_array_equal(f1.result(timeout=120), want1)
        np.testing.assert_array_equal(f2.result(timeout=120), want2)
    finally:
        batcher.shutdown()

def test_s2s_continuous_survives_step_failure(s2s_setup):
    """A failed shared decode step aborts in-flight futures, rebuilds the
    decode caches, and the scheduler keeps serving."""
    from moe_infinity_tpu.runtime.continuous_s2s import (
        Seq2SeqContinuousBatcher,
    )

    model, params, experts, gen = s2s_setup
    batcher = Seq2SeqContinuousBatcher(
        model, params, experts, ResidentProvider.for_layer,
        max_batch_size=2, max_src_len=16, max_decode_len=16,
    )
    orig = batcher._step
    state = {"armed": True}

    def poisoned(*a, **k):
        if state["armed"]:
            state["armed"] = False
            raise RuntimeError("injected step failure")
        return orig(*a, **k)

    batcher._step = poisoned
    try:
        f = batcher.submit(
            np.array([5, 31]), max_new_tokens=4, eos_token_id=None
        )
        with pytest.raises(RuntimeError, match="injected"):
            f.result(timeout=120)
        batcher._step = orig
        p = np.array([9, 4, 61])
        want = gen.generate(
            p[None], max_new_tokens=5, eos_token_id=None
        ).sequences[0]
        got = batcher.submit(
            p, max_new_tokens=5, eos_token_id=None
        ).result(timeout=120)
        np.testing.assert_array_equal(got, want)
    finally:
        batcher.shutdown()
