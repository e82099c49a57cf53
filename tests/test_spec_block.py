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


# ---- measured-cost adaptive block sizing (engine_seq2seq) --------------


def _adapt_stub(cfg=4):
    """Bare attribute carrier for Seq2SeqOffloadEngine._adapt_spec_block
    (unit-tests the hill-climb policy without building an engine)."""
    import types

    from moe_infinity_tpu.runtime.engine_seq2seq import Seq2SeqOffloadEngine

    s = types.SimpleNamespace(
        replay_counts=[], spec_block=cfg, _spec_block_cfg=cfg,
        adaptive_spec=True, _k_trace=[], _ppt_ewma={},
        _probe_queue=None, _chosen=None, _blocks_since_probe=0,
        _k_cap=cfg,
    )
    s._halving_chain = lambda: Seq2SeqOffloadEngine._halving_chain(s)
    s._PROBE_BLOCKS = Seq2SeqOffloadEngine._PROBE_BLOCKS
    s._REPROBE_EVERY = Seq2SeqOffloadEngine._REPROBE_EVERY
    return s


def _adapt(stub, execs, k=None, tokens=None):
    """Record one block of `execs` dispatches at the stub's current size
    and run the adaptation step (the engine's own call pattern)."""
    from moe_infinity_tpu.runtime.engine_seq2seq import Seq2SeqOffloadEngine

    k = k if k is not None else stub.spec_block
    stub.replay_counts.append(execs)
    Seq2SeqOffloadEngine._adapt_spec_block(stub, k=k, tokens=tokens)


def _execs_uniform(k):
    """Round-4 chip regime: programs/token ~1.7 at k=4, ~2.2 at k=2,
    ~2.3 at k=1 — larger blocks amortize replays even at ~0 acceptance."""
    return {4: 7, 2: 5, 1: 2}[k]


def _execs_skewed(k):
    """High-hit regime: blocks mostly accept -> ppt ~1/k."""
    return 1


def test_hill_climb_picks_large_k_on_uniform_drift():
    """The acceptance-gated first cut collapsed k to 1 here and the chip
    measured it WORSE (ppt 2.77 vs 1.7); the cost hill-climb must pick
    the measured-cheapest size instead."""
    s = _adapt_stub(cfg=4)
    for _ in range(12):
        _adapt(s, _execs_uniform(s.spec_block))
    assert s._chosen is not None and s._chosen[0] == 4
    assert s.spec_block == 4
    # every chain size was probed
    assert {4, 2, 1} <= set(s._k_trace)


def test_hill_climb_picks_small_k_when_small_wins():
    """A regime where replays scale with k (e.g. an arena barely holding
    one step's union): ppt(4)=2.5, ppt(2)=2, ppt(1)=1.5 -> k=1 wins."""
    costs = {4: 10, 2: 4, 1: 1.5}

    s = _adapt_stub(cfg=4)
    for _ in range(12):
        _adapt(s, costs[s.spec_block])
    assert s._chosen is not None and s._chosen[0] == 1


def test_hill_climb_reprobes_on_regime_shift():
    """Uniform drift -> skew appears (the bench's skewed leg): the
    periodic re-probe must discover that large k now costs ~1/k and
    re-grow."""
    s = _adapt_stub(cfg=4)
    for _ in range(12):
        _adapt(s, _execs_uniform(s.spec_block))
    chosen_before = s._chosen[0]
    # regime shifts: every size now accepts first-dispatch; the
    # periodic re-probe lands within _REPROBE_EVERY + one probe sweep
    for _ in range(2 * s._REPROBE_EVERY + 12 * s._PROBE_BLOCKS):
        _adapt(s, _execs_skewed(s.spec_block))
        if s._chosen is not None and s._chosen[0] == 4:
            break
    assert s._chosen is not None and s._chosen[0] == 4, (
        chosen_before, s._chosen, s._ppt_ewma
    )


def test_hill_climb_reprobes_on_cost_drift():
    """The chosen size degrading 1.5x triggers an EARLY re-probe (not
    just the periodic one)."""
    s = _adapt_stub(cfg=4)
    for _ in range(12):
        _adapt(s, _execs_uniform(s.spec_block))
    assert s._chosen[0] == 4
    n_trace = len(s._k_trace)
    for _ in range(8):
        _adapt(s, 16)  # chosen size's cost explodes
        if s._chosen is None:
            break
    assert s._chosen is None  # re-probing
    assert len(s._k_trace) < n_trace + s._REPROBE_EVERY


def test_hill_climb_respects_capacity_cap():
    """After a capacity error capped k (engine sets _k_cap), the probe
    chain must not offer capped-out sizes."""
    s = _adapt_stub(cfg=4)
    s._k_cap = 2
    s.spec_block = 2  # the engine sets spec_block to the cap when capping
    for _ in range(10):
        assert s.spec_block <= 2
        _adapt(s, 1)
    assert s._chosen[0] <= 2
    assert 4 not in s._ppt_ewma


def test_hill_climb_respects_disable_flag():
    s = _adapt_stub(cfg=4)
    s.adaptive_spec = False
    for _ in range(20):
        _adapt(s, 7)
    assert s.spec_block == 4
    assert s._probe_queue is None


def test_hill_climb_skips_dominated_probe_sizes():
    """ppt(s) >= 1/s by construction: when the largest size measures
    ppt(4) ~ 0.3 (high-hit regime), probing k=2 and k=1 cannot win and
    must be skipped — probe blocks at bad sizes cost real decode
    throughput (chip r5: ~3 programs for 1 token per k=1 probe)."""
    s = _adapt_stub(cfg=4)
    for _ in range(12):
        _adapt(s, 1 if s.spec_block == 4 else 99)  # ppt(4)=0.25
    assert s._chosen is not None and s._chosen[0] == 4
    # k=2 / k=1 were never dispatched
    assert set(s._k_trace) == {4}
    assert 1 not in s._ppt_ewma and 2 not in s._ppt_ewma
