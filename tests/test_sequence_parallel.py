"""Sequence/context parallelism on the 8-device virtual mesh: ring
attention == dense causal attention; sequence-parallel full-model prefill
== single-device prefill; decode continues from SP caches exactly.

Beyond-reference capability (SURVEY.md §5: the reference has no sequence
parallelism; prompts bounded by one device's activation memory)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moe_infinity_tpu.models.layers import attend
from moe_infinity_tpu.models.mixtral import MixtralModel, MixtralSpec
from moe_infinity_tpu.ops.ring_attention import ring_attend
from moe_infinity_tpu.parallel import MeshPlan, make_mesh
from moe_infinity_tpu.parallel.sequence import caches_from_sp, sp_prefill
from moe_infinity_tpu.runtime.providers import ResidentProvider

pytestmark = [
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs 8 virtual devices"
    ),
    pytest.mark.slow,  # ~5 min of ring-attention sweeps
]

SPEC = MixtralSpec(
    vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
    num_heads=8, num_kv_heads=4, head_dim=8, num_experts=8, top_k=2,
    rms_eps=1e-6, rope_theta=1e6, tie_embeddings=False,
)


@pytest.mark.parametrize("ring,hkv", [(8, 8), (8, 4), (4, 2)])
def test_ring_attention_matches_dense(rng, ring, hkv):
    mesh = make_mesh(MeshPlan(seq=ring))
    B, T, H, Dh = 2, 32, 8, 16
    q = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, hkv, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, hkv, Dh)), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    want = np.asarray(attend(q, k, v, positions, jnp.int32(T)))
    got = np.asarray(ring_attend(q, k, v, mesh))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_ring_attention_ragged_softmax_stability(rng):
    """Large logit spread: the online-softmax accumulation must stay
    finite and match the dense reference."""
    mesh = make_mesh(MeshPlan(seq=4))
    B, T, H, Dh = 1, 16, 2, 8
    q = jnp.asarray(rng.standard_normal((B, T, H, Dh)) * 8, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, Dh)) * 8, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    want = np.asarray(attend(q, k, v, positions, jnp.int32(T)))
    got = np.asarray(ring_attend(q, k, v, mesh))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.fixture(scope="module")
def tiny_model():
    model = MixtralModel(SPEC, compute_dtype=jnp.float32)
    params, experts = model.init_random(jax.random.PRNGKey(0))
    return model, params, experts


def _reference_prefill(model, params, experts, tokens, cap):
    B, T = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    kv = model.init_cache(B, cap)
    return model.forward(
        params, experts, tokens, positions, kv, jnp.int32(0),
        for_layer=ResidentProvider.for_layer, impl="gather",
    )


def test_sp_prefill_matches_single_device(rng, tiny_model):
    model, params, experts = tiny_model
    mesh = make_mesh(MeshPlan(seq=8))
    B, T = 2, 16
    tokens = jnp.asarray(rng.integers(0, 128, (B, T)), jnp.int32)
    want, _, _ = _reference_prefill(model, params, experts, tokens, T)
    got, kvs = sp_prefill(
        model, params, experts, tokens, mesh,
        for_layer=ResidentProvider.for_layer,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )
    assert len(kvs) == SPEC.num_layers
    assert kvs[0].k.shape == (B, T, SPEC.num_kv_heads, SPEC.head_dim)


def test_decode_continues_from_sp_caches(rng, tiny_model):
    """Greedy decode after SP prefill == greedy decode after normal
    prefill: the time-sharded K/V scatter into standard caches exactly."""
    model, params, experts = tiny_model
    mesh = make_mesh(MeshPlan(seq=4))
    B, T, CAP, STEPS = 1, 8, 32, 4
    tokens = jnp.asarray(rng.integers(0, 128, (B, T)), jnp.int32)

    # reference: normal prefill + greedy decode
    ref_logits, ref_kv, _ = _reference_prefill(
        model, params, experts, tokens, CAP
    )
    # pad reference caches out to CAP columns happens inside init_cache
    def decode(logits, kvs, start):
        toks = []
        cur = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)[:, None]
        kv_len = start
        for i in range(STEPS):
            toks.append(int(cur[0, 0]))
            pos = jnp.full((B, 1), kv_len, jnp.int32)
            logits, kvs, _ = model.forward(
                params, experts, cur, pos, kvs, jnp.int32(kv_len),
                for_layer=ResidentProvider.for_layer, impl="gather",
            )
            cur = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)[:, None]
            kv_len += 1
        return toks

    want = decode(ref_logits, ref_kv, T)

    sp_logits, sp_kvs = sp_prefill(
        model, params, experts, tokens, mesh,
        for_layer=ResidentProvider.for_layer,
    )
    got = decode(sp_logits, caches_from_sp(sp_kvs, CAP), T)
    assert got == want


def test_sp_prefill_rejects_ragged_length(tiny_model):
    model, params, experts = tiny_model
    mesh = make_mesh(MeshPlan(seq=8))
    with pytest.raises(ValueError, match="not divisible"):
        sp_prefill(
            model, params, experts, jnp.zeros((1, 12), jnp.int32), mesh,
            for_layer=ResidentProvider.for_layer,
        )


# ---- DeepSeek / MLA family -------------------------------------------------

DS_BASE = dict(
    vocab_size=128, hidden_size=64, intermediate_size=96,
    moe_intermediate_size=48, num_layers=3, num_heads=4,
    kv_lora_rank=32, qk_nope_head_dim=32, qk_rope_head_dim=16,
    v_head_dim=32, num_experts=8, top_k=2, n_shared_experts=1,
    first_k_dense_replace=1, topk_method="greedy", n_group=None,
    topk_group=None, routed_scaling_factor=1.0, rms_eps=1e-6,
    rope_theta=10000.0, tie_embeddings=False, q_lora_rank=None,
)


@pytest.fixture(scope="module")
def tiny_mla():
    from moe_infinity_tpu.models.deepseek_v2 import (
        DeepseekV2ModelJax,
        DeepseekV2Spec,
    )

    model = DeepseekV2ModelJax(
        DeepseekV2Spec(**DS_BASE), compute_dtype=jnp.float32
    )
    params, experts = model.init_random(jax.random.PRNGKey(2))
    return model, params, experts


@pytest.mark.parametrize("q_lora", [None, 24])
def test_mla_sp_prefill_matches_single_device(rng, tiny_mla, q_lora):
    """The latent ring: [q_lat | q_pe]·[c | k_pe] logits with c as values
    reduces MLA to the standard ring primitive. Exact vs the dense path,
    including first_k_dense layers and shared experts."""
    from moe_infinity_tpu.models.deepseek_v2 import (
        DeepseekV2ModelJax,
        DeepseekV2Spec,
    )

    if q_lora is None:
        model, params, experts = tiny_mla
    else:
        model = DeepseekV2ModelJax(
            DeepseekV2Spec(**{**DS_BASE, "q_lora_rank": q_lora}),
            compute_dtype=jnp.float32,
        )
        params, experts = model.init_random(jax.random.PRNGKey(3))
    mesh = make_mesh(MeshPlan(seq=4))
    B, T = 2, 8
    tokens = jnp.asarray(rng.integers(0, 128, (B, T)), jnp.int32)
    want, _, _ = _reference_prefill(model, params, experts, tokens, T)
    got, kvs = sp_prefill(
        model, params, experts, tokens, mesh,
        for_layer=ResidentProvider.for_layer,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )
    # MLA caches hold (latent, rope-key) per layer
    s = model.spec
    assert kvs[0].k.shape == (B, T, 1, s.kv_lora_rank)
    assert kvs[0].v.shape == (B, T, 1, s.qk_rope_head_dim)


def test_mla_decode_continues_from_sp_caches(rng, tiny_mla):
    model, params, experts = tiny_mla
    mesh = make_mesh(MeshPlan(seq=4))
    B, T, CAP, STEPS = 1, 8, 32, 4
    tokens = jnp.asarray(rng.integers(0, 128, (B, T)), jnp.int32)

    ref_logits, ref_kv, _ = _reference_prefill(
        model, params, experts, tokens, CAP
    )

    def decode(logits, kvs, start):
        toks = []
        cur = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)[:, None]
        kv_len = start
        for _ in range(STEPS):
            toks.append(int(cur[0, 0]))
            pos = jnp.full((B, 1), kv_len, jnp.int32)
            logits, kvs, _ = model.forward(
                params, experts, cur, pos, kvs, jnp.int32(kv_len),
                for_layer=ResidentProvider.for_layer, impl="gather",
            )
            cur = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)[:, None]
            kv_len += 1
        return toks

    want = decode(ref_logits, ref_kv, T)
    sp_logits, sp_kvs = sp_prefill(
        model, params, experts, tokens, mesh,
        for_layer=ResidentProvider.for_layer,
    )
    got = decode(sp_logits, caches_from_sp(sp_kvs, CAP), T)
    assert got == want


def test_ring_attention_bidirectional(rng):
    """causal=False: encoder-side (bidirectional) ring == dense attention
    with no causal mask — the building block for encoder SP on the
    seq2seq families."""
    mesh = make_mesh(MeshPlan(seq=4))
    B, T, H, Dh = 2, 16, 4, 8
    q = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    want = np.asarray(
        attend(q, k, v, positions, jnp.int32(T), causal=False)
    )
    got = np.asarray(ring_attend(q, k, v, mesh, causal=False))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


# ---- encoder-side SP (seq2seq families) -------------------------------------


def test_sp_encode_nllb_matches(rng):
    """Bidirectional ring encoder == NllbModel.encode (unpadded)."""
    from moe_infinity_tpu.models.nllb import NllbModel, NllbSpec
    from moe_infinity_tpu.parallel.sequence import sp_encode

    spec = NllbSpec(
        vocab_size=96, d_model=32, num_heads=4, encoder_layers=4,
        decoder_layers=4, encoder_ffn_dim=64, decoder_ffn_dim=64,
        encoder_sparse_step=2, decoder_sparse_step=2, num_experts=4,
        pad_token_id=1, decoder_start_token_id=2, max_positions=64,
        scale_embedding=True,
    )
    model = NllbModel(spec, compute_dtype=jnp.float32)
    params, experts = model.init_random(jax.random.PRNGKey(4))
    mesh = make_mesh(MeshPlan(seq=4))
    B, T = 2, 16
    tokens = jnp.asarray(rng.integers(2, 96, (B, T)), jnp.int32)
    want = np.asarray(
        model.encode(
            params, experts, tokens, jnp.ones((B, T), jnp.float32),
            ResidentProvider.for_layer, "gather",
        )
    )
    got = np.asarray(
        sp_encode(
            model, params, experts, tokens, mesh,
            for_layer=ResidentProvider.for_layer,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_sp_encode_switch_capacity_exact(rng):
    """Switch encoder over the ring: T5 relative bias rides bias_fn, and
    the capacity-masked router stays exact via the cross-shard prefix sum
    — with capacity=2 and T=16 the mask BINDS, so any shard-local
    counting would diverge."""
    from moe_infinity_tpu.models.switch import SwitchModel, SwitchSpec
    from moe_infinity_tpu.parallel.sequence import sp_encode

    spec = SwitchSpec(
        vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_heads=4,
        num_encoder_layers=4, num_decoder_layers=4,
        encoder_sparse_step=2, decoder_sparse_step=2, num_experts=4,
        expert_capacity=2, rel_buckets=8, rel_max_distance=16,
        rms_eps=1e-6, tie_embeddings=True, is_gated=False,
        dense_act_gelu=False, decoder_start_token_id=0,
    )
    model = SwitchModel(spec, compute_dtype=jnp.float32)
    params, experts = model.init_random(jax.random.PRNGKey(5))
    mesh = make_mesh(MeshPlan(seq=4))
    B, T = 2, 16
    tokens = jnp.asarray(rng.integers(0, 96, (B, T)), jnp.int32)
    want = np.asarray(
        model.encode(
            params, experts, tokens, jnp.ones((B, T), jnp.float32),
            ResidentProvider.for_layer, "gather",
        )
    )
    got = np.asarray(
        sp_encode(
            model, params, experts, tokens, mesh,
            for_layer=ResidentProvider.for_layer,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# ---- Grok / Arctic families --------------------------------------------


@pytest.mark.parametrize("family", ["grok", "arctic", "arctic_seq"])
def test_sp_prefill_grok_arctic(rng, family):
    """SP prefill for the remaining decoder families: Grok (softcapped
    attention, post-attn/post-moe norms, unnormalized gelu experts) and
    Arctic (parallel-residual MLP; also the sequential variant)."""
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
            moe_layer_frequency=1,
            parallel_attn_mlp_res=(family == "arctic"),
        )
        model = ArcticModel(spec, compute_dtype=jnp.float32)
    params, experts = model.init_random(jax.random.PRNGKey(6))
    mesh = make_mesh(MeshPlan(seq=4))
    B, T = 2, 8
    tokens = jnp.asarray(rng.integers(0, 96, (B, T)), jnp.int32)
    want, _, _ = _reference_prefill(model, params, experts, tokens, T)
    got, kvs = sp_prefill(
        model, params, experts, tokens, mesh,
        for_layer=ResidentProvider.for_layer,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4
    )
    assert kvs[0].k.shape == (B, T, spec.num_kv_heads, spec.head_dim)

# ---- SP decode: frozen shards + replicated tail -----------------------------


def test_sp_decode_attention_matches_dense(rng):
    """Distributed flash decoding (shard partials + pmax/psum merge +
    replicated tail) == dense attention over the concatenated context."""
    from functools import partial

    from moe_infinity_tpu.ops.ring_attention import sp_decode_attention

    mesh = make_mesh(MeshPlan(seq=4))
    B, T, C, H, HKV, Dh = 2, 16, 8, 8, 4, 16
    g = 3  # valid tail columns
    q = jnp.asarray(rng.standard_normal((B, 1, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, HKV, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, HKV, Dh)), jnp.float32)
    tk = jnp.asarray(rng.standard_normal((B, C, HKV, Dh)), jnp.float32)
    tv = jnp.asarray(rng.standard_normal((B, C, HKV, Dh)), jnp.float32)

    # dense reference over [prefill | valid tail]
    kf = jnp.concatenate([k, tk[:, :g]], axis=1)
    vf = jnp.concatenate([v, tv[:, :g]], axis=1)
    positions = jnp.full((B, 1), T + g - 1, jnp.int32)
    want = np.asarray(attend(q, kf, vf, positions, jnp.int32(T + g)))

    import jax as _jax
    from jax.sharding import PartitionSpec as P

    shard = P(None, "seq", None, None)
    rep = P()
    fn = _jax.shard_map(
        partial(sp_decode_attention, axis_name="seq"),
        mesh=mesh,
        in_specs=(rep, shard, shard, rep, rep, rep),
        out_specs=rep,
        check_vma=False,
    )
    got = np.asarray(fn(q, k, v, tk, tv, jnp.int32(g)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def _greedy_reference(model, params, experts, tokens, cap, steps):
    ref_logits, ref_kv, _ = _reference_prefill(
        model, params, experts, tokens, cap
    )
    toks = []
    cur = jnp.argmax(ref_logits[:, -1, :], -1).astype(jnp.int32)[:, None]
    kv_len = tokens.shape[1]
    for _ in range(steps):
        toks.append(int(cur[0, 0]))
        pos = jnp.full((tokens.shape[0], 1), kv_len, jnp.int32)
        ref_logits, ref_kv, _ = model.forward(
            params, experts, cur, pos, ref_kv, jnp.int32(kv_len),
            for_layer=ResidentProvider.for_layer, impl="gather",
        )
        cur = jnp.argmax(ref_logits[:, -1, :], -1).astype(jnp.int32)[:, None]
        kv_len += 1
    return toks


def test_sp_decoder_matches_single_device(rng, tiny_model):
    """SPDecoder: prefill shards stay frozen in place, decode merges
    shard partials + replicated tail — greedy tokens identical to the
    standard single-device path."""
    from moe_infinity_tpu.parallel.sequence import SPDecoder

    model, params, experts = tiny_model
    mesh = make_mesh(MeshPlan(seq=4))
    B, T, STEPS = 1, 8, 6
    tokens = jnp.asarray(rng.integers(0, 128, (B, T)), jnp.int32)
    want = _greedy_reference(model, params, experts, tokens, 32, STEPS)

    dec = SPDecoder(
        model, params, experts, mesh,
        for_layer=ResidentProvider.for_layer, tail_cap=16,
    )
    got = dec.generate(np.asarray(tokens), max_new_tokens=STEPS)
    assert list(got[T:]) == want


def test_sp_decoder_mla_matches_single_device(rng, tiny_mla):
    """MLA SP decode: the latent shard serves as both key ([c | k_pe])
    and value (c); dense leading layers + shared experts included."""
    from moe_infinity_tpu.parallel.sequence import SPDecoder

    model, params, experts = tiny_mla
    mesh = make_mesh(MeshPlan(seq=4))
    B, T, STEPS = 1, 8, 6
    tokens = jnp.asarray(rng.integers(0, 128, (B, T)), jnp.int32)
    want = _greedy_reference(model, params, experts, tokens, 32, STEPS)

    dec = SPDecoder(
        model, params, experts, mesh,
        for_layer=ResidentProvider.for_layer, tail_cap=16,
    )
    got = dec.generate(np.asarray(tokens), max_new_tokens=STEPS)
    assert list(got[T:]) == want

@pytest.mark.parametrize("family", ["grok", "arctic", "arctic_seq"])
def test_sp_decoder_grok_arctic(rng, family):
    """SP decode for the remaining decoder families (softcap / parallel
    residual): greedy tokens identical to the single-device path."""
    from moe_infinity_tpu.parallel.sequence import SPDecoder

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
            moe_layer_frequency=1,
            parallel_attn_mlp_res=(family == "arctic"),
        )
        model = ArcticModel(spec, compute_dtype=jnp.float32)
    params, experts = model.init_random(jax.random.PRNGKey(6))
    mesh = make_mesh(MeshPlan(seq=4))
    B, T, STEPS = 1, 8, 5
    tokens = jnp.asarray(rng.integers(0, 96, (B, T)), jnp.int32)
    want = _greedy_reference(model, params, experts, tokens, 32, STEPS)
    dec = SPDecoder(
        model, params, experts, mesh,
        for_layer=ResidentProvider.for_layer, tail_cap=16,
    )
    got = dec.generate(np.asarray(tokens), max_new_tokens=STEPS)
    assert list(got[T:]) == want

def test_sp_decoder_ragged_prompt(rng, tiny_model):
    """Prompt length NOT divisible by the ring: the remainder rides the
    decode path into the tail — still exact vs the single-device run."""
    from moe_infinity_tpu.parallel.sequence import SPDecoder

    model, params, experts = tiny_model
    mesh = make_mesh(MeshPlan(seq=4))
    B, T, STEPS = 1, 11, 5  # 11 % 4 == 3 remainder tokens
    tokens = jnp.asarray(rng.integers(0, 128, (B, T)), jnp.int32)
    want = _greedy_reference(model, params, experts, tokens, 32, STEPS)
    dec = SPDecoder(
        model, params, experts, mesh,
        for_layer=ResidentProvider.for_layer, tail_cap=16,
    )
    got = dec.generate(np.asarray(tokens), max_new_tokens=STEPS)
    assert list(got[T:]) == want
