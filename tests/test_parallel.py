"""Multi-chip sharding tests on the 8-device virtual CPU mesh:
expert-parallel grouped FFN == single-device reference; fully sharded
dp/tp/ep forward == unsharded forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from moe_infinity_tpu.models.mixtral import MixtralModel, MixtralSpec
from moe_infinity_tpu.ops.moe import grouped_ffn, grouped_ffn_ep
from moe_infinity_tpu.parallel import (
    MeshPlan,
    expert_shardings,
    make_mesh,
    mixtral_param_shardings,
    shard_params,
)
from moe_infinity_tpu.runtime.providers import ResidentProvider

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

SPEC = MixtralSpec(
    vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
    num_heads=8, num_kv_heads=4, head_dim=8, num_experts=8, top_k=2,
    rms_eps=1e-6, rope_theta=1e6, tie_embeddings=False,
)


def test_grouped_ffn_ep_matches_single_device(rng):
    mesh = make_mesh(MeshPlan(data=2, model=1, expert=4))
    T, D, F, E, K = 16, 64, 128, 8, 2
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    weights = {
        "gate": jnp.asarray(rng.standard_normal((E, D, F)) * 0.1, jnp.float32),
        "up": jnp.asarray(rng.standard_normal((E, D, F)) * 0.1, jnp.float32),
        "down": jnp.asarray(rng.standard_normal((E, F, D)) * 0.1, jnp.float32),
    }
    ids = jnp.asarray(rng.integers(0, E, (T, K)), jnp.int32)
    cw = jnp.asarray(rng.uniform(0, 1, (T, K)), jnp.float32)
    slot = jnp.arange(E, dtype=jnp.int32)

    want = np.asarray(grouped_ffn(x, ids, cw, slot, weights, "silu"))

    w_sharded = {
        k: jax.device_put(v, NamedSharding(mesh, P("expert", None, None)))
        for k, v in weights.items()
    }
    x_s = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    got = np.asarray(
        jax.jit(
            lambda x, i, c, s, w: grouped_ffn_ep(
                x, i, c, s, w, "silu", mesh=mesh
            )
        )(x_s, ids, cw, slot, w_sharded)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # >=9 s: fast-suite budget (VERDICT r4 item 8)
def test_sharded_forward_matches_unsharded(rng):
    mesh = make_mesh(MeshPlan(data=2, model=2, expert=2))
    model_single = MixtralModel(SPEC, compute_dtype=jnp.float32)
    params, experts = model_single.init_random(jax.random.PRNGKey(0))
    B, T, CAP = 2, 8, 16

    tokens = jnp.asarray(rng.integers(0, 128, (B, T)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    kv = model_single.init_cache(B, CAP)
    want, _, _ = model_single.forward(
        params, experts, tokens, positions, kv, jnp.int32(0),
        for_layer=ResidentProvider.for_layer,
    )

    model_sharded = MixtralModel(SPEC, compute_dtype=jnp.float32, mesh=mesh)
    p_s = shard_params(params, mixtral_param_shardings(mesh, params))
    e_s = shard_params(experts, expert_shardings(mesh, experts))
    kv = model_sharded.init_cache(B, CAP)
    kv = [
        type(c)(
            jax.device_put(c.k, NamedSharding(mesh, P("data", None, None, None))),
            jax.device_put(c.v, NamedSharding(mesh, P("data", None, None, None))),
        )
        for c in kv
    ]
    tok_s = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    got, _, _ = jax.jit(
        lambda p, e, t, pos, kv: model_sharded.forward(
            p, e, t, pos, kv, jnp.int32(0),
            for_layer=ResidentProvider.for_layer,
        )
    )(p_s, e_s, tok_s, positions, kv)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )
