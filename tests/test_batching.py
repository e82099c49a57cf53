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
