"""The driver artifact contract (VERDICT r4 item 1).

The driver captures a bounded tail of bench.py's stdout and parses the
LAST line as the round's result. Round 4 lost its entire headline because
the final enriched JSON line outgrew that window and arrived truncated
(BENCH_r04.json `parsed: null`). These tests pin the contract: whatever
the full payload grows to, the last emitted line parses and fits
bench.COMPACT_BUDGET, with the headline fields always present.
"""

import json
import sys

import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def _round4_sized_result():
    """A payload at least as bloated as the round-4 artifact that
    truncated: full per-layer attribution, spec diagnostics, verbose
    notes, three secondaries with nested legs."""
    return {
        "metric": "nllb_moe_54b_offload_decode_throughput",
        "value": 146.7,
        "unit": "tokens/s",
        "vs_baseline": 4.842,
        "model_flops_util": 0.0012,
        "hbm_bw_util": 0.031,
        "chip_peak_tflops_bf16": 197.0,
        "chip_peak_gbps": 819.0,
        "dispatch_ms_per_program": 24.65,
        "batch": 32,
        "decode_steps": 36,
        "step_ms": 218.2,
        "decode_tput_incl_cliff": 120.9,
        "rewarm_cliff_s": 18.2,
        "prefill_s": 41.3,
        "hit_rate": 0.5231,
        "num_slots": 384,
        "arena_dtype": "int4",
        "policy": "priority",
        "warm_s": 94.4,
        "enc_layers": 24,
        "dec_layers": 24,
        "mean_step_executions": 6.69,
        "decode_hit_rate": 0.824,
        "decode_misses": 829,
        "decode_evictions": 3336,
        "decode_miss_by_layer": [118, 131, 140, 145, 148, 147],
        "decode_miss_churn": 793,
        "decode_miss_fresh": 36,
        "decode_distinct_routed": 563,
        "decode_evict_hot": 2575,
        "decode_evict_cold": 761,
        "spec_diag": {
            "blocks": 16, "accept_at_1": 0.062, "accept_at_2": 0.0,
            "mean_union": 44.1,
            "mean_miss_at_dispatch": [16.4, 11.9, 7.9, 6.9],
            "k_trace": [4, 4, 2, 2, 1, 1, 1, 2, 2, 4],
            "k_final": 4,
        },
        "pinned_tier_staged_records": 891,
        "pinned_tier_total_records": 1536,
        "pinned_tier_gb": 13.99,
        "tier_aliased": False,
        "direct_tier_layers": [],
        "bw_gap": "offload decode is dispatch/replay bound on this "
                  "attachment (24.65 ms per program round-trip through the "
                  "measurement relay; ~0.1 ms directly attached) — "
                  "hbm_bw_util reflects the relay, not the design",
        "cache_pressure": {
            "value": 146.7, "vs_baseline": 4.842, "batch": 32,
            "num_slots": 192, "hot_set": 384, "slots_frac_of_hot": 0.5,
            "rounds": 3, "decode_steps_per_window": 16, "prefetch": False,
            "note": "interleaved lru/priority windows, paired per-round; "
                    "policy state persists across windows (swap_policy) "
                    "and each timed window follows an untimed SELF-warm "
                    "window (the other policy shaped the arena in "
                    "between); paired_tput_ratio_median is the "
                    "drift-robust statistic (median over per-round "
                    "priority/lru throughput ratios)",
            "policy_legs": {
                "lru": {
                    "tokens_per_s": 140.87, "decode_hit_rate": 0.12,
                    "misses": 924, "evictions": 924,
                    "window_tokens_per_s": [144.98, 140.87, 132.11],
                },
                "priority": {
                    "tokens_per_s": 146.7, "decode_hit_rate": 0.5124,
                    "misses": 512, "evictions": 512,
                    "window_tokens_per_s": [142.55, 149.12, 146.7],
                },
            },
            "paired_tput_ratio_median": 1.059,
            "priority_beats_lru_tput": True,
            "priority_beats_lru_hit_rate": True,
            "warm_s": 94.4,
        },
        "switch_servable": {
            "value": 906.8, "vs_baseline": 13.1, "hit_rate": 0.74,
            "num_slots": 2748, "records": 3072, "step_ms": 35.3,
            "pinned_tier_gb": 4.0, "mean_step_executions": 1.18,
            "isolated_subprocess": True, "tier_stage_s": 31.2,
            "dispatch_ms_probe_pre": 24.1, "dispatch_ms_probe_post": 26.9,
        },
        "nllb_offload_skewed": {
            "value": 402.2, "vs_baseline": 13.27, "decode_hit_rate": 0.93,
            "skew_alpha": 1.2, "skew_tau": 2.0, "spec_k_final": 4,
        },
        "dtype_siblings": {
            "int8": {
                "value": 12.2, "vs_baseline": 0.4, "hit_rate": 0.61,
                "num_slots": 196, "step_ms": 640.1, "batch": 8,
                "pinned_tier_gb": 6.0, "isolated_subprocess": True,
                "bw_note": "link-bound on this measurement relay (~32 "
                           "MB/s host link; int8 = 2x offloaded "
                           "bytes/expert vs the int4 headline) — compare "
                           "hit_rate and step structure, not absolute "
                           "tok/s",
            },
        },
        "secondaries_skipped": [
            "dtype-sibling-int8: RuntimeError: subprocess nllb-offload "
            "failed: ['nllb-offload: JaxRuntimeError: RESOURCE_EXHAUSTED: "
            "TPU backend error (ResourceExhausted).']",
        ],
    }


def test_compact_line_fits_budget_and_parses():
    full = _round4_sized_result()
    line = json.dumps(bench.compact_result(full, "/tmp/bench_detail.json"))
    assert len(line) <= bench.COMPACT_BUDGET
    back = json.loads(line)
    # the four driver-required fields never drop
    assert back["metric"] == full["metric"]
    assert back["value"] == full["value"]
    assert back["unit"] == "tokens/s"
    assert back["vs_baseline"] == full["vs_baseline"]
    assert back["detail_file"] == "/tmp/bench_detail.json"


def test_compact_line_keeps_secondary_headlines():
    back = json.loads(json.dumps(
        bench.compact_result(_round4_sized_result(), "d.json")
    ))
    # each secondary keeps (value, vs_baseline) — the claims the README
    # cites must be driver-captured, one level deep
    for name in ("cache_pressure", "switch_servable",
                 "nllb_offload_skewed"):
        assert back[name]["value"] is not None, name
        assert back[name]["vs_baseline"] is not None, name
    assert back["dtype_siblings"]["int8"]["value"] == 12.2
    # the pressure A/B verdicts survive compaction
    assert back["cache_pressure"]["paired_tput_ratio_median"] == 1.059
    assert back["cache_pressure"]["priority_beats_lru_tput"] is True
    assert back["cache_pressure"]["lru_hit"] == 0.12
    assert back["cache_pressure"]["pri_hit"] == 0.5124


def test_compact_drops_low_priority_first_under_tiny_budget():
    out = bench.compact_result(_round4_sized_result(), "d.json", budget=200)
    line = json.dumps(out)
    assert len(line) <= 200
    back = json.loads(line)
    for k in ("metric", "value", "unit", "vs_baseline"):
        assert k in back


def test_failure_payload_compacts():
    out = bench.compact_result({
        "metric": "bench_failed", "value": 0.0, "unit": "none",
        "vs_baseline": 0.0,
        "errors": ["nllb-offload: JaxRuntimeError: " + "x" * 400,
                   "switch-throughput: Timeout" + "y" * 400,
                   "third: dropped"],
    })
    line = json.dumps(out)
    assert len(line) <= bench.COMPACT_BUDGET
    back = json.loads(line)
    assert back["metric"] == "bench_failed"
    assert len(back["errors"]) == 2
    assert all(len(e) <= 80 for e in back["errors"])


def test_emit_result_writes_detail_and_compact_stdout(tmp_path, capsys):
    import types

    full = _round4_sized_result()
    args = types.SimpleNamespace(detail_file=str(tmp_path / "detail.json"))
    bench.emit_result(dict(full), args)
    captured = capsys.readouterr()
    last = captured.out.strip().splitlines()[-1]
    assert len(last) <= bench.COMPACT_BUDGET
    back = json.loads(last)
    assert back["value"] == full["value"]
    assert back["detail_file"] == str(tmp_path / "detail.json")
    with open(tmp_path / "detail.json") as f:
        detail = json.load(f)
    # the detail file carries the FULL payload, attribution included
    assert detail["decode_miss_by_layer"] == full["decode_miss_by_layer"]
    assert detail["cache_pressure"]["note"].startswith("interleaved")


def test_emit_result_survives_unwritable_detail_path(capsys):
    import types

    args = types.SimpleNamespace(detail_file="/nonexistent/dir/d.json")
    bench.emit_result({
        "metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 1.0,
    }, args)
    captured = capsys.readouterr()
    back = json.loads(captured.out.strip().splitlines()[-1])
    assert back["value"] == 1.0
    assert "detail_file" not in back


@pytest.mark.parametrize("budget_gb,layers,batch", [(10, 12, 8)])
def test_int8_sibling_geometry_fits(budget_gb, layers, batch):
    """The dtype-sibling stage OOM'd two rounds running; pin its new
    reduced geometry against the same budget math the preset uses so the
    committed flags provably fit a 16 GiB chip before the driver runs
    them (VERDICT r4 item 5)."""
    import numpy as np

    spec = dict(bench.NLLB_54B_SPEC)
    spec["encoder_layers"] = spec["decoder_layers"] = layers
    D, F, E = spec["d_model"], spec["encoder_ffn_dim"], spec["num_experts"]
    n_moe_per_stack = layers // spec["encoder_sparse_step"]
    # int8 record stride (fc1+fc2 weights + scales + biases)
    stride = D * F + F * D + 4 * (F + D) + 4 * (F + D)
    # dense side: NLLB bf16 dense params dominate at the embed matrix
    dense_gb = (spec["vocab_size"] * D * 2 + layers * 2 * (
        4 * D * D * 2 + 2 * D * F * 2
    )) / 2**30
    kv_gb = 1.4
    union = n_moe_per_stack * min(E, batch * 2)
    slots_bytes = union * stride
    total = dense_gb + kv_gb + slots_bytes / 2**30
    # the budget-derived slot count the preset will choose is capped by
    # (budget - dense - kv); assert the UNION fits with >= 2 GB headroom
    # under the 16 GiB chip even before XLA workspace
    assert total < budget_gb - 1.5, (
        f"int8 sibling geometry oversubscribes: {total:.1f} GB "
        f"(dense {dense_gb:.1f} + kv {kv_gb} + union slots "
        f"{slots_bytes / 2**30:.1f})"
    )
    # and the stage flags in bench.run_pre_stages match this geometry
    import inspect

    src = inspect.getsource(bench.run_pre_stages)
    assert '"--layers", "12"' in src
    assert '"--hbm-gb", "10"' in src
    assert '"--tier-gb", "13"' in src
    assert np.isfinite(total)
