"""Sampling parity: our jittable logit processors vs transformers'
LogitsProcessor/Warper implementations (the reference delegates sampling to
HF generate — reference protocol.py:90-131 — so HF semantics are the parity
oracle), plus end-to-end sampled generation through the Generator."""

import numpy as np
import pytest
import torch
from transformers.generation.logits_process import (
    RepetitionPenaltyLogitsProcessor,
    TemperatureLogitsWarper,
    TopKLogitsWarper,
    TopPLogitsWarper,
)

import jax
import jax.numpy as jnp

from moe_infinity_tpu.runtime.sampling import (
    Sampler,
    SamplingParams,
    apply_presence_frequency,
    apply_repetition_penalty,
    init_state,
    params_from_kwargs,
    process_logits,
    sample_step,
    top_k_filter,
    top_p_filter,
)


def _rand_logits(b=3, v=50, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(b, v)).astype(np.float32) * 3.0


def _hf_mask(scores: torch.Tensor) -> np.ndarray:
    return torch.isinf(scores).numpy()


class TestWarperParity:
    def test_top_k(self):
        logits = _rand_logits()
        for k in (1, 5, 17, 50, 100):
            ours = np.asarray(top_k_filter(jnp.asarray(logits), k))
            hf = TopKLogitsWarper(top_k=k)(None, torch.tensor(logits)).numpy()
            np.testing.assert_allclose(ours, hf, rtol=1e-6)

    def test_top_p(self):
        logits = _rand_logits(seed=1)
        for p in (0.1, 0.5, 0.9, 0.95, 0.999):
            ours = np.asarray(top_p_filter(jnp.asarray(logits), p))
            hf = TopPLogitsWarper(top_p=p)(None, torch.tensor(logits)).numpy()
            # masks must match exactly; surviving values unchanged
            np.testing.assert_array_equal(np.isinf(ours), np.isinf(hf))
            np.testing.assert_allclose(
                np.where(np.isinf(ours), 0, ours),
                np.where(np.isinf(hf), 0, hf), rtol=1e-6,
            )

    def test_top_p_keeps_at_least_one(self):
        # one dominant token, tiny p: the dominant token must survive
        logits = np.full((1, 10), -10.0, np.float32)
        logits[0, 3] = 10.0
        ours = np.asarray(top_p_filter(jnp.asarray(logits), 0.0001))
        assert np.isfinite(ours[0, 3])

    def test_repetition_penalty(self):
        logits = _rand_logits(b=2, v=30, seed=2)
        input_ids = np.array([[1, 5, 5, 9], [0, 2, 29, 2]])
        counts = np.zeros((2, 30), np.int32)
        for b in range(2):
            for t in input_ids[b]:
                counts[b, t] += 1
        ours = np.asarray(
            apply_repetition_penalty(jnp.asarray(logits), jnp.asarray(counts), 1.7)
        )
        hf = RepetitionPenaltyLogitsProcessor(penalty=1.7)(
            torch.tensor(input_ids), torch.tensor(logits)
        ).numpy()
        np.testing.assert_allclose(ours, hf, rtol=1e-6)

    def test_presence_frequency(self):
        logits = _rand_logits(b=1, v=8, seed=3)
        counts = np.array([[0, 1, 3, 0, 2, 0, 0, 1]], np.int32)
        out = np.asarray(
            apply_presence_frequency(
                jnp.asarray(logits), jnp.asarray(counts), 0.5, 0.25
            )
        )
        want = logits - 0.25 * counts - 0.5 * (counts > 0)
        np.testing.assert_allclose(out, want, rtol=1e-6)

    def test_full_chain_matches_hf_order(self):
        """temperature -> top_k -> top_p, after repetition penalty."""
        logits = _rand_logits(b=2, v=40, seed=4)
        input_ids = np.array([[3, 7], [11, 11]])
        params = params_from_kwargs(
            temperature=0.8, do_sample=True, top_k=10, top_p=0.9,
            repetition_penalty=1.3,
        )
        state = init_state(params, 2, 40, prompt_ids=input_ids)
        ours = np.asarray(process_logits(jnp.asarray(logits), state, params))

        t = RepetitionPenaltyLogitsProcessor(penalty=1.3)(
            torch.tensor(input_ids), torch.tensor(logits)
        )
        t = TemperatureLogitsWarper(temperature=0.8)(None, t)
        t = TopKLogitsWarper(top_k=10)(None, t)
        t = TopPLogitsWarper(top_p=0.9)(None, t)
        hf = t.numpy()
        np.testing.assert_array_equal(np.isinf(ours), np.isinf(hf))
        np.testing.assert_allclose(
            np.where(np.isinf(ours), 0, ours),
            np.where(np.isinf(hf), 0, hf), rtol=1e-5,
        )


class TestSampleStep:
    def test_greedy_ignores_filters(self):
        params = params_from_kwargs(temperature=0.0, top_k=5, top_p=0.9)
        assert params.greedy
        logits = jnp.asarray(_rand_logits(b=2, v=20))
        state = init_state(params, 2, 20)
        out, _ = sample_step(logits, state, params)
        np.testing.assert_array_equal(
            np.asarray(out.token), np.argmax(np.asarray(logits), -1)
        )

    def test_top_k_one_is_greedy(self):
        params = params_from_kwargs(temperature=1.0, do_sample=True, top_k=1)
        logits = jnp.asarray(_rand_logits(b=4, v=33, seed=5))
        state = init_state(params, 4, 33, seed=7)
        out, _ = sample_step(logits, state, params)
        np.testing.assert_array_equal(
            np.asarray(out.token), np.argmax(np.asarray(logits), -1)
        )

    def test_deterministic_given_seed(self):
        params = params_from_kwargs(temperature=1.0, do_sample=True, top_p=0.9)
        logits = jnp.asarray(_rand_logits(b=2, v=64, seed=6))
        a = sample_step(logits, init_state(params, 2, 64, seed=3), params)[0]
        b = sample_step(logits, init_state(params, 2, 64, seed=3), params)[0]
        np.testing.assert_array_equal(np.asarray(a.token), np.asarray(b.token))

    def test_counts_update(self):
        params = params_from_kwargs(
            temperature=0.0, presence_penalty=0.5, repetition_penalty=1.2
        )
        logits = jnp.asarray(_rand_logits(b=1, v=10, seed=8))
        prompt = np.array([[2, 2, 4]])
        state = init_state(params, 1, 10, prompt_ids=prompt)
        assert int(state.counts_full[0, 2]) == 2
        out, state = sample_step(logits, state, params)
        tok = int(out.token[0])
        assert int(state.counts_full[0, tok]) >= 1
        assert int(state.counts_gen[0, tok]) == 1

    def test_repetition_penalty_discourages_repeat(self):
        # token 0 slightly ahead; after it is "generated" once, a strong
        # penalty must flip the argmax to token 1
        logits = jnp.asarray(np.array([[1.0, 0.9, -5.0]], np.float32))
        params = params_from_kwargs(temperature=0.0, repetition_penalty=2.0)
        counts = jnp.asarray(np.array([[1, 0, 0]], np.int32))
        state = init_state(params, 1, 3)._replace(counts_full=counts)
        out, _ = sample_step(logits, state, params)
        assert int(out.token[0]) == 1

    def test_logprobs(self):
        params = params_from_kwargs(temperature=0.0, logprobs=3)
        logits = jnp.asarray(_rand_logits(b=2, v=12, seed=9))
        state = init_state(params, 2, 12)
        out, _ = sample_step(logits, state, params)
        lp = jax.nn.log_softmax(logits, axis=-1)
        np.testing.assert_allclose(
            np.asarray(out.logprob),
            np.asarray(lp)[np.arange(2), np.asarray(out.token)], rtol=1e-6,
        )
        assert out.top_logprobs.shape == (2, 3)
        # greedy chosen token is the top-1
        np.testing.assert_array_equal(
            np.asarray(out.top_tokens)[:, 0], np.asarray(out.token)
        )

    def test_sampler_state_is_scan_carry_compatible(self):
        """State must round-trip through lax.scan (device-side loops)."""
        params = params_from_kwargs(
            temperature=1.0, do_sample=True, top_k=4, presence_penalty=0.3
        )
        logits = jnp.asarray(_rand_logits(b=2, v=16, seed=10))

        def body(state, _):
            out, state = sample_step(logits, state, params)
            return state, out.token

        state = init_state(params, 2, 16, seed=1)
        _, toks = jax.lax.scan(body, state, None, length=5)
        assert toks.shape == (5, 2)


class TestGeneratorIntegration:
    @pytest.fixture(scope="class")
    def mixtral_setup(self, tmp_path_factory):
        from transformers import MixtralConfig, MixtralForCausalLM

        from moe_infinity_tpu.models.mixtral import MixtralModel, MixtralSpec
        from moe_infinity_tpu.runtime.generate import Generator
        from moe_infinity_tpu.runtime.providers import ResidentProvider
        from moe_infinity_tpu.store.blob import DenseArchive, ExpertStore
        from moe_infinity_tpu.store.ingest import ingest_checkpoint

        tmp = tmp_path_factory.mktemp("sampling_mixtral")
        cfg = MixtralConfig(
            vocab_size=64, hidden_size=32, intermediate_size=56,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            num_local_experts=4, num_experts_per_tok=2,
            max_position_embeddings=128, torch_dtype=torch.float32,
            architectures=["MixtralForCausalLM"],
        )
        torch.manual_seed(11)
        hf = MixtralForCausalLM(cfg).eval()
        ckpt = tmp / "ckpt"
        hf.save_pretrained(ckpt, safe_serialization=True)
        store = str(tmp / "store")
        ingest_checkpoint(str(ckpt), store, cfg, expert_dtype="float32",
                          dense_dtype="float32")
        model = MixtralModel(MixtralSpec.from_hf(cfg), compute_dtype=jnp.float32)
        params = model.load_params(DenseArchive(store))
        provider = ResidentProvider(ExpertStore(store), dtype=jnp.float32)
        gen = Generator(model, params, provider.pytree(),
                        ResidentProvider.for_layer)
        return gen

    def test_sampled_generation_runs(self, mixtral_setup):
        gen = mixtral_setup
        ids = np.array([[5, 9, 3]])
        r = gen.generate(
            ids, max_new_tokens=8, temperature=0.9, do_sample=True,
            top_k=10, top_p=0.95, repetition_penalty=1.1,
            presence_penalty=0.2, frequency_penalty=0.1, seed=4,
        )
        assert r.sequences.shape[1] == 3 + 8
        # deterministic given the seed
        r2 = mixtral_setup.generate(
            ids, max_new_tokens=8, temperature=0.9, do_sample=True,
            top_k=10, top_p=0.95, repetition_penalty=1.1,
            presence_penalty=0.2, frequency_penalty=0.1, seed=4,
        )
        np.testing.assert_array_equal(r.sequences, r2.sequences)

    def test_logprobs_collection(self, mixtral_setup):
        ids = np.array([[5, 9, 3], [2, 7, 1]])
        r = mixtral_setup.generate(ids, max_new_tokens=4, logprobs=5)
        assert r.token_logprobs.shape == (2, 4)
        assert r.top_logprobs.shape == (2, 4, 5)
        assert r.top_tokens.shape == (2, 4, 5)
        # greedy: chosen == top-1 and logprob == its top logprob
        np.testing.assert_array_equal(
            r.top_tokens[:, :, 0],
            r.sequences[:, 3:].astype(r.top_tokens.dtype),
        )
        np.testing.assert_allclose(
            r.token_logprobs, r.top_logprobs[:, :, 0], rtol=1e-5
        )

    def test_greedy_unchanged_by_sampler_rewrite(self, mixtral_setup):
        ids = np.array([[5, 9, 3]])
        a = mixtral_setup.generate(ids, max_new_tokens=6).sequences
        b = mixtral_setup.generate(ids, max_new_tokens=6, temperature=0.0).sequences
        np.testing.assert_array_equal(a, b)


class TestSampledDecodeScan:
    def test_scan_matches_stepwise(self, mixtral_setup=None):
        """Device-side sampled scan reproduces host-loop sampling when the
        draw sequence aligns (same params/seed, split-chain keys)."""
        import jax
        from moe_infinity_tpu.models.mixtral import MixtralModel, MixtralSpec
        from moe_infinity_tpu.runtime.generate import ResidentStepper
        from moe_infinity_tpu.runtime.providers import ResidentProvider

        spec = MixtralSpec(
            vocab_size=96, hidden_size=32, intermediate_size=64, num_layers=2,
            num_heads=4, num_kv_heads=2, head_dim=8, num_experts=4, top_k=2,
            rms_eps=1e-6, rope_theta=1e4, tie_embeddings=False,
        )
        model = MixtralModel(spec, compute_dtype=jnp.float32)
        params_m, experts = model.init_random(jax.random.PRNGKey(2))
        st = ResidentStepper(model, params_m, experts,
                             ResidentProvider.for_layer, donate_kv=False)
        sp = params_from_kwargs(
            temperature=0.9, do_sample=True, top_k=8,
            presence_penalty=0.3, repetition_penalty=1.1,
        )
        # host loop using the same primitives
        kv = st.init_cache(1, 32)
        tok = jnp.zeros((1, 1), jnp.int32)
        pos = jnp.full((1,), 0, jnp.int32)
        state = init_state(sp, 1, spec.vocab_size, seed=5)
        want = []
        for i in range(6):
            logits, kv, _ = st.forward(tok, pos[:, None], kv, pos[0])
            out, state = sample_step(logits[:, -1, :], state, sp)
            want.append(int(out.token[0]))
            tok = out.token[:, None]
            pos = pos + 1
        # device scan
        kv2 = st.init_cache(1, 32)
        toks, _ = st.decode_scan(
            jnp.zeros((1, 1), jnp.int32), jnp.full((1,), 0, jnp.int32),
            kv2, 6, sampling=sp, seed=5,
        )
        assert np.asarray(toks)[0].tolist() == want

    def test_greedy_scan_unchanged(self):
        import jax
        from moe_infinity_tpu.models.mixtral import MixtralModel, MixtralSpec
        from moe_infinity_tpu.runtime.generate import ResidentStepper
        from moe_infinity_tpu.runtime.providers import ResidentProvider

        spec = MixtralSpec(
            vocab_size=96, hidden_size=32, intermediate_size=64, num_layers=2,
            num_heads=4, num_kv_heads=2, head_dim=8, num_experts=4, top_k=2,
            rms_eps=1e-6, rope_theta=1e4, tie_embeddings=False,
        )
        model = MixtralModel(spec, compute_dtype=jnp.float32)
        params_m, experts = model.init_random(jax.random.PRNGKey(2))
        st = ResidentStepper(model, params_m, experts,
                             ResidentProvider.for_layer, donate_kv=False)
        kv = st.init_cache(1, 32)
        a, _ = st.decode_scan(
            jnp.zeros((1, 1), jnp.int32), jnp.full((1,), 0, jnp.int32), kv, 6
        )
        kv2 = st.init_cache(1, 32)
        b, _ = st.decode_scan(
            jnp.zeros((1, 1), jnp.int32), jnp.full((1,), 0, jnp.int32), kv2, 6,
            sampling=params_from_kwargs(temperature=0.0),
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestMinP:
    def test_min_p_matches_hf(self):
        from transformers.generation.logits_process import MinPLogitsWarper

        from moe_infinity_tpu.runtime.sampling import min_p_filter

        logits = _rand_logits(b=3, v=40, seed=12)
        for p in (0.02, 0.1, 0.3, 0.7):
            ours = np.asarray(min_p_filter(jnp.asarray(logits), p))
            hf = MinPLogitsWarper(min_p=p)(None, torch.tensor(logits)).numpy()
            np.testing.assert_array_equal(np.isinf(ours), np.isinf(hf))
            np.testing.assert_allclose(
                np.where(np.isinf(ours), 0, ours),
                np.where(np.isinf(hf), 0, hf), rtol=1e-6,
            )

    def test_min_p_keeps_top1(self):
        from moe_infinity_tpu.runtime.sampling import min_p_filter

        logits = jnp.asarray(_rand_logits(b=2, v=16, seed=13))
        out = np.asarray(min_p_filter(logits, 0.99))
        assert np.isfinite(out[np.arange(2), np.argmax(out, -1)]).all()

    def test_min_p_in_row_sampler(self):
        """Huge per-row min_p forces the sampled token to the argmax."""
        from moe_infinity_tpu.runtime.sampling import RowParams, sample_rows

        logits = jnp.asarray(_rand_logits(b=2, v=24, seed=14))
        rp = RowParams.from_lists(
            [1.0, 1.0], [0, 0], [1.0, 1.0], [0.999, 0.0], [1.0, 1.0],
            [0.0, 0.0], [0.0, 0.0],
        )
        toks = sample_rows(
            logits, jnp.asarray([1, 2], jnp.int32),
            jnp.asarray([0, 0], jnp.int32),
            jnp.zeros((2, 24), jnp.int32), jnp.zeros((2, 24), jnp.int32), rp,
        )
        assert int(toks[0]) == int(np.argmax(np.asarray(logits)[0]))


class TestLogitBias:
    """OpenAI logit_bias: added to raw logits before penalties/warpers.
    Oracle: HF SequenceBiasLogitsProcessor with single-token sequences
    (identical semantics — a flat additive bias per token id)."""

    def test_bias_matches_hf_sequence_bias(self):
        from transformers.generation.logits_process import (
            SequenceBiasLogitsProcessor,
        )

        logits = _rand_logits(b=2, v=30, seed=21)
        bias = {3: 4.5, 17: -2.0, 29: 0.75}
        sp = params_from_kwargs(temperature=1.0, logit_bias=bias)
        ours = np.asarray(
            process_logits(
                jnp.asarray(logits), init_state(sp, 2, 30), sp
            )
        )
        hf = SequenceBiasLogitsProcessor(
            sequence_bias={(t,): v for t, v in bias.items()}
        )(torch.zeros((2, 1), dtype=torch.long), torch.tensor(logits)).numpy()
        np.testing.assert_allclose(ours, hf, rtol=1e-6)

    def test_bias_forces_and_bans_greedy(self):
        logits = _rand_logits(b=1, v=20, seed=22)
        base_arg = int(np.argmax(logits[0]))
        forced = (base_arg + 7) % 20
        sp = params_from_kwargs(
            temperature=0.0, logit_bias={forced: 100.0, base_arg: -100.0}
        )
        assert not sp.trivial  # bias must not take the argmax fast path
        out, _ = sample_step(
            jnp.asarray(logits), init_state(sp, 1, 20), sp
        )
        assert int(out.token[0]) == forced

    def test_bias_in_row_sampler(self):
        """Per-row bias matrix: row 0 forced to token 5, row 1 unbiased."""
        from moe_infinity_tpu.runtime.sampling import RowParams, sample_rows

        logits = jnp.asarray(_rand_logits(b=2, v=24, seed=23))
        bias = np.zeros((2, 24), np.float32)
        bias[0, 5] = 100.0
        rp = RowParams.from_lists(
            [0.0, 0.0], [0, 0], [1.0, 1.0], [0.0, 0.0], [1.0, 1.0],
            [0.0, 0.0], [0.0, 0.0],
        )
        toks = np.asarray(
            sample_rows(
                logits, jnp.asarray([0, 0], jnp.int32),
                jnp.asarray([0, 0], jnp.int32),
                jnp.zeros((2, 24), jnp.int32), jnp.zeros((2, 24), jnp.int32),
                rp, jnp.asarray(bias),
            )
        )
        assert int(toks[0]) == 5
        assert int(toks[1]) == int(np.argmax(np.asarray(logits)[1]))

    def test_params_normalization_is_hashable(self):
        a = params_from_kwargs(logit_bias={7: 1.0, 2: -1.0})
        b = params_from_kwargs(logit_bias={2: -1.0, 7: 1.0})
        assert a == b and hash(a) == hash(b)
        assert params_from_kwargs(logit_bias={}).logit_bias is None
