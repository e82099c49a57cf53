"""Routing + grouped FFN: impl cross-check, slot indirection, quantization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moe_infinity_tpu.ops.moe import grouped_ffn, topk_router
from moe_infinity_tpu.store.quant import quantize_rowwise


def make_weights(rng, S=6, D=16, F=32, gated=True, quant=None):
    w = {
        "gate": jnp.asarray(rng.normal(size=(S, D, F)) * 0.1, jnp.float32),
        "down": jnp.asarray(rng.normal(size=(S, F, D)) * 0.1, jnp.float32),
    }
    if gated:
        w["up"] = jnp.asarray(rng.normal(size=(S, D, F)) * 0.1, jnp.float32)
    if quant:
        out = {}
        for k in list(w):
            qs, ss = [], []
            for s in range(S):
                q, sc = quantize_rowwise(np.asarray(w[k][s]).T, quant)
                qs.append(q.T)
                ss.append(sc)
            out[k] = jnp.asarray(np.stack(qs))
            out[k + "_scale"] = jnp.asarray(np.stack(ss))
        w = out
    return w


def test_topk_router_shapes_and_norm():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(5, 8)), jnp.float32)
    w, ids, probs = topk_router(logits, 2, normalize=True)
    assert w.shape == (5, 2) and ids.shape == (5, 2)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-6)
    # ids are the argmax-2 of softmax == argmax-2 of logits
    ref = np.argsort(-np.asarray(logits), axis=-1)[:, :2]
    np.testing.assert_array_equal(np.sort(ids, -1), np.sort(ref, -1))


@pytest.mark.parametrize("gated", [True, False])
@pytest.mark.parametrize("k", [1, 2])
def test_ragged_matches_dense(gated, k):
    rng = np.random.default_rng(1)
    S, D, F, T, E = 6, 16, 32, 9, 6
    w = make_weights(rng, S, D, F, gated)
    x = jnp.asarray(rng.normal(size=(T, D)), jnp.float32)
    logits = jnp.asarray(rng.normal(size=(T, E)), jnp.float32)
    cw, ids, _ = topk_router(logits, k)
    slot_map = jnp.arange(E, dtype=jnp.int32)
    act = "silu" if gated else "relu"
    y_r = grouped_ffn(x, ids, cw, slot_map, w, act, impl="ragged")
    y_d = grouped_ffn(x, ids, cw, slot_map, w, act, impl="dense")
    np.testing.assert_allclose(np.asarray(y_r), np.asarray(y_d), atol=2e-5)


def test_slot_indirection_is_a_permutation():
    """Routing through a permuted slot table with permuted weights must give
    identical results to the identity layout."""
    rng = np.random.default_rng(2)
    S, D, F, T, E = 6, 16, 32, 7, 6
    w = make_weights(rng, S, D, F, True)
    x = jnp.asarray(rng.normal(size=(T, D)), jnp.float32)
    logits = jnp.asarray(rng.normal(size=(T, E)), jnp.float32)
    cw, ids, _ = topk_router(logits, 2)

    identity = jnp.arange(E, dtype=jnp.int32)
    y0 = grouped_ffn(x, ids, cw, identity, w, "silu", impl="ragged")

    perm = np.random.default_rng(3).permutation(S)
    slot_map = jnp.asarray(np.argsort(perm), jnp.int32)  # expert e -> slot
    w_perm = {k: v[perm] for k, v in w.items()}
    # expert e lives at slot argsort(perm)[e]; check inverse relation
    slot_map = jnp.zeros(E, jnp.int32).at[jnp.asarray(perm)].set(jnp.arange(S))
    y1 = grouped_ffn(x, ids, cw, slot_map, w_perm, "silu", impl="ragged")
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)


def test_quantized_int8_close_to_fp():
    rng = np.random.default_rng(4)
    S, D, F, T, E = 4, 16, 32, 8, 4
    w_fp = make_weights(rng, S, D, F, True)
    rng = np.random.default_rng(4)
    w_q = make_weights(rng, S, D, F, True, quant="int8")
    x = jnp.asarray(np.random.default_rng(5).normal(size=(T, D)), jnp.float32)
    logits = jnp.asarray(np.random.default_rng(6).normal(size=(T, E)), jnp.float32)
    cw, ids, _ = topk_router(logits, 2)
    slot_map = jnp.arange(E, dtype=jnp.int32)
    y_fp = grouped_ffn(x, ids, cw, slot_map, w_fp, "silu", impl="ragged")
    y_q = grouped_ffn(x, ids, cw, slot_map, w_q, "silu", impl="ragged")
    rel = np.abs(np.asarray(y_q - y_fp)).max() / (np.abs(np.asarray(y_fp)).max() + 1e-9)
    assert rel < 0.05, rel


def test_grouped_ffn_under_jit_and_empty_experts():
    """Some experts receive zero tokens; result must still be exact."""
    rng = np.random.default_rng(7)
    S, D, F, T = 8, 16, 32, 3
    w = make_weights(rng, S, D, F, True)
    x = jnp.asarray(rng.normal(size=(T, D)), jnp.float32)
    ids = jnp.asarray([[0, 7], [0, 7], [3, 0]], jnp.int32)
    cw = jnp.full((T, 2), 0.5, jnp.float32)
    slot_map = jnp.arange(S, dtype=jnp.int32)
    f = jax.jit(lambda x: grouped_ffn(x, ids, cw, slot_map, w, "silu", impl="ragged"))
    y = f(x)
    y_ref = grouped_ffn(x, ids, cw, slot_map, w, "silu", impl="dense")
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)
