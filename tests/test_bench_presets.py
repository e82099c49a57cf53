"""CPU smoke tests for the bench presets' wiring (tiny geometry overrides).

The real measurements run on the TPU; these guard the preset plumbing —
synthetic stores, arena sizing, speculative engines, metric math — so a
relay-side outage can't hide a broken preset until the driver's bench run.
"""

import sys
import types

import pytest

pytestmark = pytest.mark.slow  # e2e-heavy; fast path: -m 'not slow'


def _args(**over):
    # Derive defaults from bench.py's own argparse parser so a new preset
    # flag can never drift out of sync with this test again (round-1
    # regression: spec_block was added to presets but not here).
    sys.path.insert(0, "/root/repo")
    import bench as bench_mod

    base = vars(bench_mod.build_parser().parse_args([]))
    base.update(
        tokens=4, prompt=4, layers=4, threads=2, lookahead=2, batch=2,
        moe_impl="gather",
    )
    base.update(over)
    return types.SimpleNamespace(**base)


@pytest.fixture(scope="module")
def bench():
    sys.path.insert(0, "/root/repo")
    import bench as bench_mod

    return bench_mod


def test_nllb_offload_preset_smoke(bench, monkeypatch):
    """Full preset path at 4+4 layers, B=2: synthetic int4 store, arena
    sized for the speculative union, speculative decode, differenced
    throughput metric. Geometry shrunk (the real 256k-vocab head is far
    too slow for one CPU core); the preset derives everything from the
    spec dict, so the plumbing under test is identical."""
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "vocab_size", 512)
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "d_model", 64)
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "num_heads", 4)
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "encoder_ffn_dim", 128)
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "decoder_ffn_dim", 128)
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "num_experts", 8)
    # explicit ragged: the preset's pallas default can't run on the CPU
    # backend (interpret-only); an explicit non-gather impl is honored
    args = _args(slots=40, moe_impl="ragged")
    out = bench.bench_nllb_offload(args)
    assert out["metric"] == "nllb_moe_54b_offload_decode_throughput"
    assert out["unit"] == "tokens/s"
    assert out["arena_dtype"] == "int4"
    assert out["hit_rate"] > 0
    assert out["mean_step_executions"] is None or (
        out["mean_step_executions"] >= 1.0
    )


def test_mixtral_offload_preset_smoke(bench):
    args = _args(layers=2, tokens=3, slots=16, arena_dtype="int8")
    out = bench.bench_mixtral_offload(args)
    assert out["metric"] == "mixtral_8x7b_int8_offload_decode_latency"
    assert out["value"] > 0
    assert out["hit_rate"] > 0


def test_nllb_pressure_preset_smoke(bench, monkeypatch):
    """Policy A/B plumbing: same engine, arena.reset_policy between legs,
    per-leg decode stats deltas."""
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "vocab_size", 512)
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "d_model", 64)
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "num_heads", 4)
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "encoder_ffn_dim", 128)
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "decoder_ffn_dim", 128)
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "num_experts", 8)
    args = _args(moe_impl="ragged", pressure_tokens=4)
    out = bench.bench_nllb_pressure(args)
    out.pop("_build", None)
    assert out["metric"] == "nllb_moe_54b_pressure_decode_throughput"
    assert set(out["policy_legs"]) == {"lru", "priority"}
    for leg in out["policy_legs"].values():
        assert leg["tokens_per_s"] > 0
        assert leg["decode_hit_rate"] is None or 0 <= leg["decode_hit_rate"] <= 1
        # interleaved windows: one timed window per round per policy
        assert len(leg["window_tokens_per_s"]) == out["rounds"]
    # the drift-robust paired statistic exists and has a verdict
    assert out["paired_tput_ratio_median"] is not None
    assert out["priority_beats_lru_tput"] in (True, False)
    import json
    json.dumps(out)  # payload must be JSON-serializable


def test_switch_servable_preset_smoke(bench, monkeypatch):
    monkeypatch.setitem(bench.SWITCH_LARGE_128_SPEC, "vocab_size", 512)
    monkeypatch.setitem(bench.SWITCH_LARGE_128_SPEC, "d_model", 64)
    monkeypatch.setitem(bench.SWITCH_LARGE_128_SPEC, "d_kv", 16)
    monkeypatch.setitem(bench.SWITCH_LARGE_128_SPEC, "d_ff", 128)
    monkeypatch.setitem(bench.SWITCH_LARGE_128_SPEC, "num_heads", 4)
    monkeypatch.setitem(bench.SWITCH_LARGE_128_SPEC, "num_experts", 8)
    args = _args(slots=16, moe_impl="ragged")
    out = bench.bench_switch_servable(args)
    out.pop("_build", None)
    assert out["metric"] == "switch_large_128_servable_decode_throughput"
    assert out["value"] > 0
    # a layer-aligned tier can make every layer DIRECT at tiny geometry:
    # the arena then sees zero traffic and hit_rate is legitimately 0
    assert out["hit_rate"] > 0 or out.get("direct_tier_layers")
    assert out["records"] > out["num_slots"] or out["records"] >= 8
    import json
    json.dumps(out)


def test_default_preset_is_offload(bench):
    assert bench.build_parser().parse_args([]).preset == "nllb-offload"


def test_nllb_pressure_reuses_headline_engine(bench, monkeypatch):
    """The secondary path swaps a constrained arena into the HEADLINE
    engine (reset_arena) instead of recompiling a fresh per-layer stack."""
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "vocab_size", 512)
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "d_model", 64)
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "num_heads", 4)
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "encoder_ffn_dim", 128)
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "decoder_ffn_dim", 128)
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "num_experts", 8)
    args = _args(moe_impl="ragged", pressure_tokens=4)
    build = bench._nllb_build(args)
    engine_before = build["engine"]
    out = bench.bench_nllb_pressure(args, shared=build)
    b = out.pop("_build", None)
    assert b is build  # reused, not rebuilt
    assert build["engine"] is engine_before
    assert not engine_before.speculative  # pressure runs per-layer
    assert set(out["policy_legs"]) == {"lru", "priority"}
    build["arena"].shutdown()


def test_real_ckpt_ppl_gate(bench, tmp_path):
    """--real-ckpt computes a teacher-forced NLL under the served config
    and a ppl-delta vs the fp32 HF reference (the matched-accuracy gate,
    exercised here on a tiny checkpoint; ~0 delta at float32)."""
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    cfg = MixtralConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, num_local_experts=4,
        num_experts_per_tok=2, vocab_size=128, max_position_embeddings=64,
        torch_dtype=torch.float32, architectures=["MixtralForCausalLM"],
    )
    torch.manual_seed(3)
    hf = MixtralForCausalLM(cfg).eval()
    ckpt = tmp_path / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)
    args = _args(real_ckpt=str(ckpt), tokens=6)
    # facade defaults to bfloat16; float32 keeps the gate's delta ~0
    import moe_infinity_tpu.entrypoints.api  # noqa: F401

    out = bench.bench_real_ckpt(args)
    assert out["metric"] == "real_ckpt_e2e"
    assert out["value"] > 0
    assert "nll" in out, out
    if "ppl_delta" in out:
        assert abs(out["ppl_delta"]) < 5.0  # bf16-vs-f32 drift bound


def test_nllb_skewed_leg_smoke(bench, monkeypatch):
    """The realistic-locality companion leg (VERDICT r4 item 2): runs on
    the headline's engine with Zipf-biased decoder routers, states its
    generator parameters, and concentrates routing (distinct routed
    experts must not exceed the uniform leg's)."""
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "vocab_size", 512)
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "d_model", 64)
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "num_heads", 4)
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "encoder_ffn_dim", 128)
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "decoder_ffn_dim", 128)
    monkeypatch.setitem(bench.NLLB_54B_SPEC, "num_experts", 8)
    args = _args(slots=40, moe_impl="ragged", tokens=8)
    out = bench.bench_nllb_offload(args)
    out.pop("_build", None)
    assert "nllb_offload_uniform" in out
    assert "nllb_offload_skewed" in out
    # the realistic-locality leg IS the headline (round-5 promotion: the
    # baseline comes from real skewed workloads); the uniform leg reports
    # beside it at full detail
    assert out["headline_leg"] == "skewed_realistic_locality"
    sk = out["nllb_offload_skewed"]
    assert sk["promoted_to_headline"] is True
    assert out["value"] == sk["value"]
    # generator parameters stated IN the artifact (stub AND top level)
    assert sk["skew_alpha"] == out["skew_alpha"] == args.skew_alpha
    assert sk["skew_tau"] == args.skew_tau
    assert sk["sigma_logit"] > 0
    assert "rank" in sk["bias_formula"]
    assert sk["value"] > 0
    uni = out["nllb_offload_uniform"]
    assert uni["value"] > 0 and "note" in uni
    if (
        sk.get("decode_distinct_routed") is not None
        and uni.get("decode_distinct_routed") is not None
    ):
        assert (
            sk["decode_distinct_routed"] <= uni["decode_distinct_routed"]
        )
    # --no-skewed-leg suppresses the companion (the int8 sibling path)
    args2 = _args(slots=40, moe_impl="ragged", tokens=3,
                  no_skewed_leg=True)
    out2 = bench.bench_nllb_offload(args2)
    out2.pop("_build", None)
    assert "nllb_offload_skewed" not in out2
