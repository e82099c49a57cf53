"""int4 packed expert weights: pack/unpack roundtrips, grouped_ffn parity
against the unpacked-int8 path on every impl, fused gate+up packing, and
the store-side row-wise int4 quantizer. The reference reaches 4-bit only
via GPTQ conversion at load (reference runtime/model_offload.py:452-467);
here int4 is a first-class arena dtype whose gather decode path reads half
the routed bytes of int8."""

import numpy as np

import jax
import jax.numpy as jnp

from moe_infinity_tpu.ops.moe import (
    fuse_gateup,
    grouped_ffn,
    pack_int4,
    topk_router,
    unpack_int4,
)
from moe_infinity_tpu.store.quant import (
    pack_int4_np,
    quantize_rowwise,
    unpack_int4_np,
)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    v = rng.integers(-8, 8, (3, 5, 16)).astype(np.int8)
    packed = pack_int4(jnp.asarray(v))
    assert packed.shape == (3, 5, 8) and packed.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(unpack_int4(packed)), v)
    # numpy twins agree with the jax ops
    np.testing.assert_array_equal(np.asarray(packed), pack_int4_np(v))
    np.testing.assert_array_equal(unpack_int4_np(pack_int4_np(v)), v)


def _int4_weight_sets(rng, S, D, F):
    """Build (packed-int4 dict, equivalent unpacked-int8 dict)."""
    q = {
        "gate": rng.integers(-8, 8, (S, D, F)).astype(np.int8),
        "up": rng.integers(-8, 8, (S, D, F)).astype(np.int8),
        "down": rng.integers(-8, 8, (S, F, D)).astype(np.int8),
    }
    scales = {
        "gate_scale": rng.uniform(0.01, 0.03, (S, F)).astype(np.float32),
        "up_scale": rng.uniform(0.01, 0.03, (S, F)).astype(np.float32),
        "down_scale": rng.uniform(0.01, 0.03, (S, D)).astype(np.float32),
    }
    w4 = {k + "4": pack_int4(jnp.asarray(v)) for k, v in q.items()}
    w4.update({k: jnp.asarray(v) for k, v in scales.items()})
    w8 = {k: jnp.asarray(v) for k, v in q.items()}
    w8.update({k: jnp.asarray(v) for k, v in scales.items()})
    return w4, w8


def test_grouped_ffn_int4_matches_int8_all_impls():
    rng = np.random.default_rng(1)
    S, D, F, T, E, K = 4, 16, 32, 8, 4, 2
    w4, w8 = _int4_weight_sets(rng, S, D, F)
    x = jnp.asarray(rng.normal(size=(T, D)), jnp.float32)
    logits = jnp.asarray(rng.normal(size=(T, E)), jnp.float32)
    cw, ids, _ = topk_router(logits, K)
    slot = jnp.arange(E, dtype=jnp.int32)
    want = np.asarray(grouped_ffn(x, ids, cw, slot, w8, "silu", impl="dense"))
    # the gather decode path intentionally computes in bf16 (same as int8)
    tol = {"gather": 5e-3, "ragged": 2e-4, "dense": 1e-6}
    for impl in ("gather", "ragged", "dense"):
        got = np.asarray(
            jax.jit(
                lambda x, w: grouped_ffn(x, ids, cw, slot, w, "silu", impl=impl)
            )(x, w4)
        )
        np.testing.assert_allclose(got, want, rtol=tol[impl], atol=tol[impl])


def test_grouped_ffn_int4_fused_gateup():
    rng = np.random.default_rng(2)
    S, D, F, T, E, K = 4, 16, 32, 6, 4, 2
    w4, w8 = _int4_weight_sets(rng, S, D, F)
    fused = fuse_gateup(w4)
    assert "gateup4" in fused and "gate4" not in fused
    x = jnp.asarray(rng.normal(size=(T, D)), jnp.float32)
    logits = jnp.asarray(rng.normal(size=(T, E)), jnp.float32)
    cw, ids, _ = topk_router(logits, K)
    slot = jnp.arange(E, dtype=jnp.int32)
    want = np.asarray(grouped_ffn(x, ids, cw, slot, w8, "silu", impl="dense"))
    tol = {"gather": 5e-3, "ragged": 2e-4}
    for impl in ("gather", "ragged"):
        got = np.asarray(grouped_ffn(x, ids, cw, slot, fused, "silu", impl=impl))
        np.testing.assert_allclose(got, want, rtol=tol[impl], atol=tol[impl])


def test_quantize_rowwise_int4():
    rng = np.random.default_rng(3)
    w = rng.normal(size=(32, 24)).astype(np.float32) * 0.1
    q, scale = quantize_rowwise(w, "int4")
    assert q.shape == (16, 24) and q.dtype == np.int8
    assert scale.shape == (32,)
    # unpack along the packed (out) axis and dequantize
    wq = unpack_int4_np(q.T).T.astype(np.float32) * scale[:, None]
    # row-wise error bounded by half a quantization step
    assert np.abs(wq - w).max() <= (scale.max() / 2) + 1e-6
