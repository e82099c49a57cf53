"""Flash attention kernels vs the einsum oracle (attend_reference).

Kernels run in interpret mode on the CPU backend; the dispatcher routes to
them for real only on TPU. Tolerances are loose-ish because the kernels
cast p to the V dtype for the MXU (the oracle keeps f32 throughout).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moe_infinity_tpu.models.layers import attend_reference
from moe_infinity_tpu.ops import flash_attention as fa

fa.set_flash_interpret(True)


def _rand_qkv(rng, B, T, H, Hkv, Dh, S, dtype=jnp.float32):
    q = jnp.asarray(rng.normal(size=(B, T, H, Dh)), dtype)
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, Dh)), dtype)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, Dh)), dtype)
    return q, k, v


def _check(out, ref, atol=2e-3):
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=atol
    )


def test_prefill_causal_gqa(rng):
    B, T, H, Hkv, Dh, S = 2, 20, 8, 2, 64, 48
    q, k, v = _rand_qkv(rng, B, T, H, Hkv, Dh, S)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    kv_len = jnp.int32(T)
    out = fa.flash_attend(q, k, v, pos, kv_len)
    ref = attend_reference(q, k, v, pos, kv_len)
    _check(out, ref)


def test_prefill_larger_than_tile(rng):
    # T, S > 128 exercise multi-tile grids and the online-softmax carry
    B, T, H, Hkv, Dh, S = 1, 150, 4, 4, 64, 300
    q, k, v = _rand_qkv(rng, B, T, H, Hkv, Dh, S)
    # queries appended at offset 100 (decode continuation of a prefill)
    pos = 100 + jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    kv_len = jnp.int32(250)
    out = fa.flash_attend(q, k, v, pos, kv_len)
    ref = attend_reference(q, k, v, pos, kv_len)
    _check(out, ref)


def test_prefill_bias_and_mask(rng):
    B, T, H, Hkv, Dh, S = 2, 12, 4, 4, 32, 16
    q, k, v = _rand_qkv(rng, B, T, H, Hkv, Dh, S)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    kv_len = jnp.int32(14)
    bias = jnp.asarray(rng.normal(size=(1, H, T, S)), jnp.float32)
    pad = jnp.asarray(rng.random((B, S)) > 0.3)
    for b in (bias, jnp.broadcast_to(bias, (B, H, T, S))):
        out = fa.flash_attend(
            q, k, v, pos, kv_len, bias=b, pad_mask=pad, causal=False
        )
        ref = attend_reference(
            q, k, v, pos, kv_len, bias=b, pad_mask=pad, causal=False
        )
        _check(out, ref)


def test_prefill_softcap(rng):
    B, T, H, Hkv, Dh, S = 1, 8, 2, 2, 16, 8
    q, k, v = _rand_qkv(rng, B, T, H, Hkv, Dh, S)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    out = fa.flash_attend(
        q, k, v, pos, jnp.int32(T), logit_softcap=30.0, scale=0.25
    )
    ref = attend_reference(
        q, k, v, pos, jnp.int32(T), logit_softcap=30.0, scale=0.25
    )
    _check(out, ref)


def test_decode_gqa_per_row_positions(rng):
    B, H, Hkv, Dh, S = 3, 8, 2, 128, 64
    q, k, v = _rand_qkv(rng, B, 1, H, Hkv, Dh, S)
    # rows decode at different positions (continuous batching)
    pos = jnp.asarray([[5], [31], [63]], jnp.int32)
    kv_len = jnp.int32(S)
    out = fa.flash_decode(q, k, v, pos, kv_len)
    ref = attend_reference(q, k, v, pos, kv_len)
    _check(out, ref)


def test_decode_partial_tile_and_mask(rng):
    # S=96 exercises a non-128 tile (bs=32 divides 96)
    B, H, Hkv, Dh, S = 2, 4, 4, 128, 96
    q, k, v = _rand_qkv(rng, B, 1, H, Hkv, Dh, S)
    pos = jnp.asarray([[99], [70]], jnp.int32)
    pad = jnp.asarray(rng.random((B, S)) > 0.2)
    out = fa.flash_decode(q, k, v, pos, jnp.int32(S), pad_mask=pad)
    ref = attend_reference(q, k, v, pos, jnp.int32(S), pad_mask=pad)
    _check(out, ref)


def test_decode_softcap(rng):
    B, H, Hkv, Dh, S = 1, 2, 1, 128, 32
    q, k, v = _rand_qkv(rng, B, 1, H, Hkv, Dh, S)
    pos = jnp.asarray([[20]], jnp.int32)
    out = fa.flash_decode(q, k, v, pos, jnp.int32(S), logit_softcap=50.0)
    ref = attend_reference(q, k, v, pos, jnp.int32(S), logit_softcap=50.0)
    _check(out, ref)


def test_paged_decode_matches_contiguous(rng):
    B, H, Hkv, Dh = 2, 4, 2, 128
    page, n_pages_per_seq, pool_pages = 8, 6, 32
    S = page * n_pages_per_seq
    q = jnp.asarray(rng.normal(size=(B, H, Dh)), jnp.float32)
    pool_k = jnp.asarray(
        rng.normal(size=(pool_pages, page, Hkv, Dh)), jnp.float32
    )
    pool_v = jnp.asarray(
        rng.normal(size=(pool_pages, page, Hkv, Dh)), jnp.float32
    )
    # shuffled non-contiguous page tables
    table = np.stack([
        rng.permutation(pool_pages)[:n_pages_per_seq] for _ in range(B)
    ]).astype(np.int32)
    lengths = jnp.asarray([S - 3, 17], jnp.int32)

    out = fa.paged_flash_decode(
        q, pool_k, pool_v, jnp.asarray(table), lengths
    )

    # oracle: materialize the gathered contiguous view per row
    k_c = pool_k[table].reshape(B, S, Hkv, Dh)
    v_c = pool_v[table].reshape(B, S, Hkv, Dh)
    ref = attend_reference(
        q[:, None], k_c, v_c,
        (lengths - 1)[:, None], jnp.int32(S), causal=True,
    )[:, 0]
    # causal with q_position = len-1 == "attend to first `len` keys"
    _check(out, ref)


def test_dispatcher_routes_and_matches(rng):
    from moe_infinity_tpu.models import layers

    B, T, H, Hkv, Dh, S = 1, 6, 4, 2, 32, 16
    q, k, v = _rand_qkv(rng, B, T, H, Hkv, Dh, S)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    layers.set_attention_impl("flash")
    try:
        out = layers.attend(q, k, v, pos, jnp.int32(T))
    finally:
        layers.set_attention_impl("auto")
    ref = attend_reference(q, k, v, pos, jnp.int32(T))
    _check(out, ref)


def test_bf16_paths(rng):
    B, T, H, Hkv, Dh, S = 1, 16, 4, 2, 64, 32
    q, k, v = _rand_qkv(rng, B, T, H, Hkv, Dh, S, dtype=jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    out = fa.flash_attend(q, k, v, pos, jnp.int32(T))
    ref = attend_reference(q, k, v, pos, jnp.int32(T))
    _check(out, ref, atol=3e-2)
    qd = q[:, :1]
    out = fa.flash_decode(qd, k, v, pos[:, :1] + 10, jnp.int32(S))
    assert out is None  # Dh=64 outside the decode envelope
    out = fa.flash_attend(qd, k, v, pos[:, :1] + 10, jnp.int32(S))
    ref = attend_reference(qd, k, v, pos[:, :1] + 10, jnp.int32(S))
    _check(out, ref, atol=3e-2)


def test_decode_unsupported_shapes_return_none(rng):
    # S=100 has no power-of-two tile; Dh=64 is lane-unaligned
    q = jnp.zeros((1, 1, 4, 128)); k = v = jnp.zeros((1, 100, 4, 128))
    pos = jnp.zeros((1, 1), jnp.int32)
    assert fa.flash_decode(q, k, v, pos, jnp.int32(1)) is None
    q = jnp.zeros((1, 1, 4, 64)); k = v = jnp.zeros((1, 64, 4, 64))
    assert fa.flash_decode(q, k, v, pos, jnp.int32(1)) is None


def test_paged_decode_with_hole_mask(rng):
    B, H, Hkv, Dh = 2, 4, 2, 128
    page, P, pool_pages = 8, 4, 16
    S = page * P
    q = jnp.asarray(rng.normal(size=(B, H, Dh)), jnp.float32)
    pool_k = jnp.asarray(
        rng.normal(size=(pool_pages, page, Hkv, Dh)), jnp.float32
    )
    pool_v = jnp.asarray(
        rng.normal(size=(pool_pages, page, Hkv, Dh)), jnp.float32
    )
    table = np.stack([
        rng.permutation(pool_pages)[:P] for _ in range(B)
    ]).astype(np.int32)
    lengths = jnp.asarray([S, 20], jnp.int32)
    holes = jnp.asarray(rng.random((B, S)) > 0.25)  # hole columns

    out = fa.paged_flash_decode(
        q, pool_k, pool_v, jnp.asarray(table), lengths, pad_mask=holes
    )
    k_c = pool_k[table].reshape(B, S, Hkv, Dh)
    v_c = pool_v[table].reshape(B, S, Hkv, Dh)
    ref = attend_reference(
        q[:, None], k_c, v_c,
        (lengths - 1)[:, None], jnp.int32(S), causal=True, pad_mask=holes,
    )[:, 0]
    _check(out, ref)


def test_prefill_broadcast_pad_bias(rng):
    # NLLB-style [B, 1, 1, S] additive pad bias
    B, T, H, Hkv, Dh, S = 2, 5, 4, 4, 32, 5
    q, k, v = _rand_qkv(rng, B, T, H, Hkv, Dh, S)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    bias = jnp.where(
        jnp.asarray(rng.random((B, 1, 1, S)) > 0.3), 0.0, -1e9
    ).astype(jnp.float32)
    out = fa.flash_attend(q, k, v, pos, jnp.int32(T), bias=bias, causal=False)
    ref = attend_reference(
        q, k, v, pos, jnp.int32(T), bias=bias, causal=False
    )
    _check(out, ref)


def test_attend_cache_paged_routes(rng):
    from moe_infinity_tpu.models import layers
    from moe_infinity_tpu.runtime.paged_kv import PagedKVCache

    B, H, Hkv, Dh = 2, 4, 2, 128
    page, P, pool_pages = 8, 4, 16
    S = page * P
    pool_k = jnp.asarray(
        rng.normal(size=(pool_pages, page, Hkv, Dh)), jnp.float32
    )
    pool_v = jnp.asarray(
        rng.normal(size=(pool_pages, page, Hkv, Dh)), jnp.float32
    )
    table = jnp.asarray(np.stack([
        rng.permutation(pool_pages)[:P] for _ in range(B)
    ]).astype(np.int32))
    kv = PagedKVCache(pool_k, pool_v, table)
    q = jnp.asarray(rng.normal(size=(B, 1, H, Dh)), jnp.float32)
    pos = jnp.asarray([[S - 1], [13]], jnp.int32)
    layers.set_attention_impl("flash")
    try:
        out = layers.attend_cache(q, kv, pos, jnp.int32(S))
    finally:
        layers.set_attention_impl("auto")
    ref = attend_reference(q, kv.k, kv.v, pos, jnp.int32(S))
    _check(out, ref)


def test_mla_decode_matches_einsum(rng):
    """mla_flash_decode == DeepSeek's absorbed-MLA decode einsums."""
    B, H, R, P, S = 2, 4, 128, 32, 64
    q_lat = jnp.asarray(rng.normal(size=(B, H, R)), jnp.float32)
    q_pe = jnp.asarray(rng.normal(size=(B, H, P)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(B, S, R)), jnp.float32)
    kpe = jnp.asarray(rng.normal(size=(B, S, P)), jnp.float32)
    pos = jnp.asarray([40, 63], jnp.int32)
    kv_len = jnp.int32(S)
    scale = (R + P) ** -0.5
    holes = jnp.asarray(rng.random((B, S)) > 0.2)

    out = fa.mla_flash_decode(
        q_lat, q_pe, c, kpe, pos, kv_len, scale=scale, pad_mask=holes
    )

    # oracle: the model's einsum form (deepseek_v2.py attention core)
    logits = (
        jnp.einsum("bhr,bsr->bhs", q_lat, c)
        + jnp.einsum("bhp,bsp->bhs", q_pe, kpe)
    ) * scale
    key_pos = jnp.arange(S)[None, None, :]
    valid = (key_pos <= pos[:, None, None]) & holes[:, None, :]
    logits = jnp.where(valid, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    ref = jnp.einsum("bhs,bsr->bhr", probs, c)
    _check(out, ref)


@pytest.mark.slow  # >=9 s: fast-suite budget (VERDICT r4 item 8)
def test_mla_flash_through_model_decode(rng):
    """DeepSeek decode step with the MLA kernel forced == einsum path."""
    from moe_infinity_tpu.models import layers
    from moe_infinity_tpu.models.deepseek_v2 import (
        DeepseekV2ModelJax,
        DeepseekV2Spec,
    )
    from moe_infinity_tpu.runtime.providers import ResidentProvider

    spec = DeepseekV2Spec(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=32, num_layers=2, num_heads=2,
        q_lora_rank=None, kv_lora_rank=16, qk_nope_head_dim=8,
        qk_rope_head_dim=8, v_head_dim=8, num_experts=4, top_k=2,
        n_shared_experts=1, first_k_dense_replace=1, topk_method="greedy",
        n_group=None, topk_group=None, routed_scaling_factor=1.0,
        rms_eps=1e-6, rope_theta=10000.0, tie_embeddings=True,
    )
    model = DeepseekV2ModelJax(spec, compute_dtype=jnp.float32)
    params, experts = model.init_random(jax.random.PRNGKey(0))
    B, T = 2, 6
    tokens = jnp.asarray(rng.integers(0, 120, (B, T)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    dtok = jnp.asarray(rng.integers(0, 120, (B, 1)), jnp.int32)

    def run():
        kvs = model.init_cache(B, 32)
        logits, kvs, _ = model.forward(
            params, experts, tokens, positions, kvs, jnp.int32(0),
            for_layer=ResidentProvider.for_layer, impl="gather",
        )
        # one decode step at position T
        dp = jnp.full((B, 1), T, jnp.int32)
        logits2, _, _ = model.forward(
            params, experts, dtok, dp, kvs, jnp.int32(T),
            for_layer=ResidentProvider.for_layer, impl="gather",
        )
        return logits2

    layers.set_attention_impl("naive")
    try:
        want = run()
    finally:
        layers.set_attention_impl("auto")
    layers.set_attention_impl("flash")
    fa.set_flash_interpret(True)
    try:
        got = run()
    finally:
        layers.set_attention_impl("auto")
    _check(got, want, atol=5e-3)
