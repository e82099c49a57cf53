"""Pallas grouped-matmul kernel numerics vs jnp reference (interpret mode on
CPU; the real-TPU path is exercised by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moe_infinity_tpu.ops.gmm import gffn_pallas, gmm
from moe_infinity_tpu.ops.moe import grouped_ffn


def _ref_gmm(x, w, group_sizes, scale=None):
    """Dense reference: per-group matmul."""
    T, D = x.shape
    S, _, F = w.shape
    out = np.zeros((T, F), np.float32)
    start = 0
    for g in range(S):
        n = int(group_sizes[g])
        if n:
            wg = np.asarray(w[g], np.float32)
            if scale is not None:
                pass  # dequant after dot below
            seg = np.asarray(x[start : start + n], np.float32) @ wg
            if scale is not None:
                seg = seg * np.asarray(scale[g], np.float32)[None, :]
            out[start : start + n] = seg
        start += n
    return out


def _make_case(rng, T, D, F, S, dtype=jnp.bfloat16):
    x = jnp.asarray(rng.standard_normal((T, D)), dtype)
    w = jnp.asarray(rng.standard_normal((S, D, F)) * 0.1, dtype)
    sizes = rng.multinomial(T, np.ones(S) / S)
    return x, w, jnp.asarray(sizes, jnp.int32)


@pytest.mark.parametrize(
    "T,D,F,S",
    [(8, 128, 256, 4), (64, 256, 512, 8), (33, 128, 384, 5)],
)
def test_gmm_bf16_matches_reference(rng, T, D, F, S):
    x, w, sizes = _make_case(rng, T, D, F, S)
    got = np.asarray(gmm(x, w, sizes, interpret=True))
    want = _ref_gmm(np.asarray(x, np.float32), np.asarray(w, np.float32), sizes)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_gmm_empty_groups(rng):
    T, D, F, S = 16, 128, 256, 6
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((S, D, F)) * 0.1, jnp.bfloat16)
    sizes = jnp.asarray([0, 10, 0, 0, 6, 0], jnp.int32)
    got = np.asarray(gmm(x, w, sizes, interpret=True))
    want = _ref_gmm(np.asarray(x, np.float32), np.asarray(w, np.float32), sizes)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_gmm_int8_dequant(rng):
    T, D, F, S = 16, 128, 256, 4
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-127, 127, (S, D, F)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.02, (S, F)), jnp.float32)
    sizes = jnp.asarray([4, 4, 4, 4], jnp.int32)
    got = np.asarray(gmm(x, wq, sizes, scale, interpret=True))
    want = _ref_gmm(
        np.asarray(x, np.float32), np.asarray(wq, np.float32), sizes,
        scale=np.asarray(scale),
    )
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_gmm_tiled_layout_matches(rng):
    from moe_infinity_tpu.ops.gmm import pack_tiled

    T, D, F, S = 16, 128, 384, 5
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((S, D, F)) * 0.1, jnp.bfloat16)
    sizes = jnp.asarray([4, 0, 6, 3, 3], jnp.int32)
    want = np.asarray(gmm(x, w, sizes, interpret=True))
    got = np.asarray(gmm(x, pack_tiled(w, 128), sizes, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)


def test_gmm_tiled_with_offset_and_scale(rng):
    from moe_infinity_tpu.ops.gmm import pack_tiled

    T, D, F = 8, 128, 256
    S_act, L = 4, 3
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-127, 127, (L * S_act, D, F)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.02, (L * S_act, F)), jnp.float32)
    sizes = jnp.asarray([2, 2, 2, 2], jnp.int32)
    for li in range(L):
        off = jnp.int32(li * S_act)
        want = _ref_gmm(
            np.asarray(x, np.float32),
            np.asarray(wq[li * S_act : (li + 1) * S_act], np.float32),
            sizes,
            scale=np.asarray(scale[li * S_act : (li + 1) * S_act]),
        )
        got = np.asarray(
            gmm(x, pack_tiled(wq, 128), sizes, scale, off,
                num_groups=S_act, interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_gffn_pallas_matches_ragged(rng):
    T, D, F, S, K = 12, 128, 256, 4, 2
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    weights = {
        "gate": jnp.asarray(rng.standard_normal((S, D, F)) * 0.1, jnp.float32),
        "up": jnp.asarray(rng.standard_normal((S, D, F)) * 0.1, jnp.float32),
        "down": jnp.asarray(rng.standard_normal((S, F, D)) * 0.1, jnp.float32),
    }
    ids = jnp.asarray(rng.integers(0, S, (T, K)), jnp.int32)
    cw = jnp.asarray(rng.uniform(0, 1, (T, K)), jnp.float32)
    slot = jnp.arange(S, dtype=jnp.int32)
    want = np.asarray(
        grouped_ffn(x, ids, cw, slot, weights, "silu", impl="ragged")
    )
    got = np.asarray(
        gffn_pallas(x, ids, cw, slot, weights, "silu", interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_gmm_packed_int4_matches_unpacked(rng):
    """Native packed path == unpack-then-int8 path (exact: same ints)."""
    from moe_infinity_tpu.ops.moe import pack_int4, unpack_int4

    T, D, F, S = 16, 128, 256, 4
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.integers(-8, 8, (S, D, F)), jnp.int8)
    wp = pack_int4(v)  # [S, D, F//2]
    assert wp.shape == (S, D, F // 2)
    np.testing.assert_array_equal(np.asarray(unpack_int4(wp)), np.asarray(v))
    scale = jnp.asarray(rng.uniform(0.01, 0.05, (S, F)), jnp.float32)
    sizes = jnp.asarray([4, 4, 4, 4], jnp.int32)
    want = np.asarray(gmm(x, v, sizes, scale, interpret=True))
    got = np.asarray(gmm(x, wp, sizes, scale, interpret=True, packed=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_gmm_packed_int4_empty_groups_no_scale(rng):
    from moe_infinity_tpu.ops.moe import pack_int4

    T, D, F, S = 16, 128, 256, 5
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.integers(-8, 8, (S, D, F)), jnp.int8)
    sizes = jnp.asarray([0, 9, 0, 7, 0], jnp.int32)
    want = np.asarray(gmm(x, v, sizes, interpret=True))
    got = np.asarray(gmm(x, pack_int4(v), sizes, interpret=True, packed=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_gffn_pallas_packed_int4_matches_gather(rng):
    """gate4/up4/down4 weights through the native packed kernel == the XLA
    gather reference on the same ints."""
    from moe_infinity_tpu.ops.moe import pack_int4

    T, D, F, S, K = 16, 128, 256, 4, 2
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, S, (T, K)), jnp.int32)
    cw = jnp.asarray(rng.uniform(0, 1, (T, K)), jnp.float32)
    slot = jnp.arange(S, dtype=jnp.int32)
    vg = jnp.asarray(rng.integers(-8, 8, (S, D, F)), jnp.int8)
    vu = jnp.asarray(rng.integers(-8, 8, (S, D, F)), jnp.int8)
    vd = jnp.asarray(rng.integers(-8, 8, (S, F, D)), jnp.int8)
    packed = {
        "gate4": pack_int4(vg),
        "up4": pack_int4(vu),
        "down4": pack_int4(vd),
        "gate_scale": jnp.asarray(rng.uniform(0.01, 0.05, (S, F)), jnp.float32),
        "up_scale": jnp.asarray(rng.uniform(0.01, 0.05, (S, F)), jnp.float32),
        "down_scale": jnp.asarray(rng.uniform(0.01, 0.05, (S, D)), jnp.float32),
    }
    want = np.asarray(
        grouped_ffn(x, ids, cw, slot, packed, "silu", impl="gather")
    )
    got = np.asarray(
        gffn_pallas(x, ids, cw, slot, packed, "silu", interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_gffn_pallas_packed_gateup4_matches(rng):
    """A packed fused gateup4's low nibbles ARE gate and high nibbles up:
    one packed gmm emits [gate | up]."""
    from moe_infinity_tpu.ops.moe import fuse_gateup, pack_int4

    T, D, F, S, K = 16, 128, 256, 4, 2
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, S, (T, K)), jnp.int32)
    cw = jnp.asarray(rng.uniform(0, 1, (T, K)), jnp.float32)
    slot = jnp.arange(S, dtype=jnp.int32)
    vg = jnp.asarray(rng.integers(-8, 8, (S, D, F)), jnp.int8)
    vu = jnp.asarray(rng.integers(-8, 8, (S, D, F)), jnp.int8)
    vd = jnp.asarray(rng.integers(-8, 8, (S, F, D)), jnp.int8)
    split = {
        "gate4": pack_int4(vg),
        "up4": pack_int4(vu),
        "down4": pack_int4(vd),
        "gate_scale": jnp.asarray(rng.uniform(0.01, 0.05, (S, F)), jnp.float32),
        "up_scale": jnp.asarray(rng.uniform(0.01, 0.05, (S, F)), jnp.float32),
        "down_scale": jnp.asarray(rng.uniform(0.01, 0.05, (S, D)), jnp.float32),
    }
    fused = fuse_gateup(split)
    assert "gateup4" in fused
    want = np.asarray(
        grouped_ffn(x, ids, cw, slot, split, "silu", impl="gather")
    )
    got = np.asarray(
        gffn_pallas(x, ids, cw, slot, fused, "silu", interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_gffn_pallas_nllb_biases_nongated(rng):
    """NLLB-shaped case: non-gated relu FFN with fc biases through the
    packed kernel == the ragged reference."""
    from moe_infinity_tpu.ops.moe import pack_int4

    T, D, F, S, K = 12, 128, 256, 4, 2
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, S, (T, K)), jnp.int32)
    cw = jnp.asarray(rng.uniform(0, 1, (T, K)), jnp.float32)
    slot = jnp.arange(S, dtype=jnp.int32)
    vg = jnp.asarray(rng.integers(-8, 8, (S, D, F)), jnp.int8)
    vd = jnp.asarray(rng.integers(-8, 8, (S, F, D)), jnp.int8)
    weights = {
        "gate4": pack_int4(vg),
        "down4": pack_int4(vd),
        "gate_scale": jnp.asarray(rng.uniform(0.01, 0.05, (S, F)), jnp.float32),
        "down_scale": jnp.asarray(rng.uniform(0.01, 0.05, (S, D)), jnp.float32),
    }
    biases = {
        "gate_bias": jnp.asarray(rng.standard_normal((S, F)) * 0.1, jnp.float32),
        "down_bias": jnp.asarray(rng.standard_normal((S, D)) * 0.1, jnp.float32),
    }
    want = np.asarray(
        grouped_ffn(x, ids, cw, slot, weights, "relu", biases=biases,
                    impl="gather")
    )
    got = np.asarray(
        gffn_pallas(x, ids, cw, slot, weights, "relu", biases=biases,
                    interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_gffn_pallas_group_compaction(rng):
    """S >> T*K engages the active-group grid compaction (grid over
    min(S, T*K) groups, scalar-prefetched group->slot ids). Slot 0 is
    forced active so the zero-count padding groups (fill_value=0)
    duplicate a REAL slot's id — they must contribute nothing. Also pins
    gmm(group_ids=...) == gmm(identity) on the same routing."""
    from moe_infinity_tpu.ops.gmm import gmm
    from moe_infinity_tpu.ops.moe import pack_int4

    T, D, F, S, K = 8, 128, 256, 64, 2  # G = 16 << S
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, S, (T, K)), jnp.int32)
    ids = ids.at[0, 0].set(0)  # slot 0 active alongside the padding dupes
    cw = jnp.asarray(rng.uniform(0, 1, (T, K)), jnp.float32)
    slot = jnp.arange(S, dtype=jnp.int32)
    vg = jnp.asarray(rng.integers(-8, 8, (S, D, 2 * F)), jnp.int8)
    vd = jnp.asarray(rng.integers(-8, 8, (S, F, D)), jnp.int8)
    weights = {
        "gateup4": pack_int4(vg),
        "gateup_scale": jnp.asarray(
            rng.uniform(0.01, 0.05, (S, 2 * F)), jnp.float32
        ),
        "down4": pack_int4(vd),
        "down_scale": jnp.asarray(
            rng.uniform(0.01, 0.05, (S, D)), jnp.float32
        ),
    }
    want = np.asarray(
        grouped_ffn(x, ids, cw, slot, weights, "silu", impl="gather")
    )
    got = np.asarray(
        gffn_pallas(x, ids, cw, slot, weights, "silu", interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)

    # gmm-level: compacted grid == identity grid on one routed matmul
    xs = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    active = jnp.asarray(sorted(rng.choice(S, T, replace=False)), jnp.int32)
    sizes_full = jnp.zeros(S, jnp.int32).at[active].set(1)
    sizes_cmp = jnp.ones(T, jnp.int32)
    w = jnp.asarray(rng.standard_normal((S, D, F)), jnp.bfloat16)
    full = np.asarray(gmm(xs, w, sizes_full, interpret=True))
    cmp_ = np.asarray(
        gmm(xs, w, sizes_cmp, group_ids=active, num_groups=T,
            interpret=True)
    )
    np.testing.assert_allclose(cmp_, full, rtol=1e-5, atol=1e-5)
