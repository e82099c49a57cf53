"""run_speculative_block: partial prefix acceptance mechanics.

A step whose routed experts (and all predecessors') were resident at
dispatch is exact — its tokens commit and only the suffix re-dispatches.
These tests drive the runner with a scripted dispatch function over a
real arena, so the acceptance logic, suffix quantization, union
protection, and id accounting are checked without a model in the loop.
"""

import numpy as np

import jax.numpy as jnp

from moe_infinity_tpu.runtime.arena import ExpertArena
from moe_infinity_tpu.runtime.engine import (
    quantize_block,
    run_speculative_block,
)
from moe_infinity_tpu.store.blob import SyntheticStore

MLIS = [0, 1]
E = 4
B = 1


def _arena(slots=8):
    store = SyntheticStore(
        2, E,
        [("fc1.weight", (4, 8), "float32"), ("fc2.weight", (8, 4), "float32")],
        meta={"arch": "nllb"},
    )
    return ExpertArena(store, slots, compute_dtype=jnp.float32, num_threads=1)


def _dispatch(calls):
    """Scripted block: step j (global) routes expert j % E at every MoE
    layer and emits token j."""

    def dispatch(tree, rows, cur, j0, kk, kvs):
        calls.append((j0, kk))
        toks = jnp.asarray(
            np.arange(j0, j0 + kk, dtype=np.int32)[None, :]
        )
        ids = jnp.asarray(
            np.stack(
                [
                    [[[(j0 + j) % E] for j in range(kk)]]
                    for _ in MLIS
                ]
            )
        )  # [L, B, kk, 1]
        return toks, kvs, ids

    return dispatch


def test_quantize_block_halving_chain():
    assert [quantize_block(r, 4) for r in (4, 3, 2, 1)] == [4, 2, 2, 1]
    assert [quantize_block(r, 3) for r in (8, 3, 2, 1)] == [3, 3, 1, 1]
    assert quantize_block(0, 4) == 1


def test_cold_block_accepts_after_union_load():
    arena = _arena()
    calls = []
    try:
        toks, _, execs, ids = run_speculative_block(
            arena, MLIS, _dispatch(calls), 4, 20, jnp.zeros((B, 1)), None
        )
        np.testing.assert_array_equal(toks[0], [0, 1, 2, 3])
        assert execs == 2  # cold miss at step 0, then all resident
        assert calls == [(0, 4), (0, 4)]
        assert ids.shape == (2, 1, 4, 1)
        # protections released on exit
        assert not arena.policy.protected_ondemand
    finally:
        arena.shutdown()


def test_warm_prefix_accepted_suffix_redispatched():
    arena = _arena()
    calls = []
    try:
        # steps 0 and 1 resident up front: the first dispatch commits two
        # tokens and only the suffix (quantized to size 2) re-runs
        arena.warm([(li, e) for li in MLIS for e in (0, 1)])
        toks, _, execs, ids = run_speculative_block(
            arena, MLIS, _dispatch(calls), 4, 20, jnp.zeros((B, 1)), None
        )
        np.testing.assert_array_equal(toks[0], [0, 1, 2, 3])
        assert execs == 2
        assert calls == [(0, 4), (2, 2)]  # prefix accepted, suffix only
        assert ids.shape == (2, 1, 4, 1)
    finally:
        arena.shutdown()


def test_nonconvergence_raises_capacity_error():
    from moe_infinity_tpu.runtime.engine import is_spec_capacity_error

    arena = _arena(slots=8)

    def never_resident(tree, rows, cur, j0, kk, kvs):
        toks = jnp.zeros((B, kk), jnp.int32)
        # route a DIFFERENT expert every call so verification never sees
        # the dispatched set resident
        never_resident.n += 1
        e = never_resident.n % E
        ids = jnp.full((len(MLIS), B, kk, 1), e, jnp.int32)
        return toks, kvs, ids

    never_resident.n = 0
    try:
        try:
            run_speculative_block(
                arena, MLIS, never_resident, 4, 3, jnp.zeros((B, 1)), None
            )
        except RuntimeError as e:
            assert is_spec_capacity_error(e)
        else:
            raise AssertionError("expected non-convergence error")
        assert not arena.policy.protected_ondemand
    finally:
        arena.shutdown()


# ---- acceptance-gated adaptive block sizing (engine_seq2seq) -----------


def _adapt_stub(cfg=4):
    """Bare attribute carrier for Seq2SeqOffloadEngine._adapt_spec_block
    (unit-tests the adaptation policy without building an engine)."""
    import types

    return types.SimpleNamespace(
        replay_counts=[], spec_block=cfg, _spec_block_cfg=cfg,
        _spec_clean_streak=0, adaptive_spec=True, _accept_ewma=None,
        _k_trace=[],
    )


def _adapt(stub):
    from moe_infinity_tpu.runtime.engine_seq2seq import Seq2SeqOffloadEngine

    Seq2SeqOffloadEngine._adapt_spec_block(stub)


def test_adaptive_block_shrinks_on_zero_acceptance():
    """Round-4 regime: accept_at_1 = 0.062 — blocks nearly never accept
    on the first dispatch. k must walk down the halving chain to 1."""
    s = _adapt_stub(cfg=4)
    for _ in range(24):
        s.replay_counts.append(5)  # many replays per block
        _adapt(s)
    assert s.spec_block == 1
    # and the trace records the walk for the bench diagnostics
    assert 4 in s._k_trace and 2 in s._k_trace and 1 in s._k_trace


def test_adaptive_block_regrows_on_clean_streak():
    """Skewed-locality regime: steady-state dispatches accept — k must
    re-grow toward the configured size."""
    s = _adapt_stub(cfg=4)
    for _ in range(24):
        s.replay_counts.append(5)
        _adapt(s)
    assert s.spec_block == 1
    for _ in range(40):
        s.replay_counts.append(1)  # clean
        _adapt(s)
    assert s.spec_block == 4


def test_adaptive_block_stable_at_high_acceptance():
    s = _adapt_stub(cfg=4)
    for _ in range(50):
        s.replay_counts.append(1)
        _adapt(s)
    assert s.spec_block == 4


def test_adaptive_block_respects_disable_flag():
    s = _adapt_stub(cfg=4)
    s.adaptive_spec = False
    for _ in range(24):
        s.replay_counts.append(6)
        _adapt(s)
    assert s.spec_block == 4


def test_adaptive_block_survives_mixed_workload_without_thrash():
    """Alternating accept/miss (EWMA ~0.5): k must not collapse — the
    shrink threshold is deliberately far below the mixed regime."""
    s = _adapt_stub(cfg=4)
    for i in range(60):
        s.replay_counts.append(1 if i % 2 == 0 else 4)
        _adapt(s)
    assert s.spec_block >= 2
