"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline is the speedup over the reference MoE-Infinity's published
number for the same model/metric on its 1xA5000 setup (BASELINE.md):
baseline_latency / our_latency, so > 1.0 means we beat the reference.

Presets (``--preset``):
  tiny                  resident tiny Mixtral, decode tok/s (CI sanity)
  mixtral-offload       Mixtral-8x7B geometry, int8 experts offloaded to a
                        synthetic host store, per-token decode latency
                        (baseline 0.735 s/tok, BASELINE.md)
Default: tiny (headline preset lands with the Pallas kernel work).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _build_mixtral(spec_kw, dtype=None):
    import jax.numpy as jnp

    from moe_infinity_tpu.models.mixtral import MixtralModel, MixtralSpec

    spec = MixtralSpec(**spec_kw)
    return MixtralModel(spec, compute_dtype=dtype or jnp.bfloat16)


TINY_SPEC = dict(
    vocab_size=256, hidden_size=128, intermediate_size=256, num_layers=2,
    num_heads=8, num_kv_heads=4, head_dim=16, num_experts=8, top_k=2,
    rms_eps=1e-6, rope_theta=1e6, tie_embeddings=False,
)

MIXTRAL_8X7B_SPEC = dict(
    vocab_size=32000, hidden_size=4096, intermediate_size=14336,
    num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
    num_experts=8, top_k=2, rms_eps=1e-5, rope_theta=1e6,
    tie_embeddings=False,
)


def bench_tiny(args):
    import jax

    from moe_infinity_tpu.runtime.generate import Generator
    from moe_infinity_tpu.runtime.providers import ResidentProvider

    model = _build_mixtral(TINY_SPEC)
    params, experts = model.init_random(jax.random.PRNGKey(0))
    gen = Generator(
        model, params, experts, ResidentProvider.for_layer, max_seq_len=256
    )
    prompt = np.arange(16, dtype=np.int64)[None] % 250
    gen.generate(prompt, max_new_tokens=4)  # warm/compile
    n = 32
    t0 = time.perf_counter()
    gen.generate(prompt, max_new_tokens=n)
    dt = time.perf_counter() - t0
    return {
        "metric": "tiny_mixtral_decode_throughput",
        "value": round(n / dt, 3),
        "unit": "tokens/s",
        "vs_baseline": 1.0,
    }


def bench_mixtral_offload(args):
    import jax
    import jax.numpy as jnp

    from moe_infinity_tpu.memory import ExpertPredictor, ExpertTracer
    from moe_infinity_tpu.runtime.arena import ExpertArena
    from moe_infinity_tpu.runtime.engine import OffloadEngine
    from moe_infinity_tpu.runtime.generate import Generator
    from moe_infinity_tpu.store.blob import SyntheticStore

    spec = dict(MIXTRAL_8X7B_SPEC)
    if args.layers:
        spec["num_layers"] = args.layers
    model = _build_mixtral(spec)
    L, E = spec["num_layers"], spec["num_experts"]
    D, F = spec["hidden_size"], spec["intermediate_size"]

    params, _ = model.init_random(jax.random.PRNGKey(0), with_experts=False)

    fields = [
        ("w1.weight", (D, F), "int8"), ("w1.weight.scale", (F,), "float32"),
        ("w3.weight", (D, F), "int8"), ("w3.weight.scale", (F,), "float32"),
        ("w2.weight", (F, D), "int8"), ("w2.weight.scale", (D,), "float32"),
    ]
    store = SyntheticStore(
        L, E, fields,
        meta={"arch": "mixtral", "gated": True, "num_encoder_moe_layers": 0},
    )

    # HBM budget: dense params + KV are already resident; size the arena
    # from what's left. v5e = 16 GiB; leave headroom for XLA workspace.
    budget = args.hbm_gb * 2**30
    dense_bytes = sum(
        a.size * a.dtype.itemsize for a in jax.tree.leaves(params)
    )
    slot_bytes = sum(
        int(np.prod(s)) * (1 if dt == "int8" else 4) for _, s, dt in fields
    )
    if args.arena_dtype == "bf16":
        slot_bytes = sum(int(np.prod(s)) * 2 for _, s, dt in fields if dt == "int8")
    num_slots = max(E, int((budget - dense_bytes) // slot_bytes))
    if args.slots:
        num_slots = args.slots

    arena = ExpertArena(
        store, num_slots,
        policy=args.policy,
        compute_dtype=jnp.bfloat16,
        num_threads=args.threads,
        dequant_on_write=(args.arena_dtype == "bf16"),
    )
    tracer = ExpertTracer(256, L, E)
    engine = OffloadEngine(
        model, params, arena,
        tracer=tracer, predictor=ExpertPredictor(tracer),
        prefetch=not args.no_prefetch, lookahead=args.lookahead,
    )
    gen = Generator(stepper=engine, max_seq_len=256)

    prompt = (np.arange(args.prompt, dtype=np.int64)[None] * 37) % 31999
    t_start = time.perf_counter()
    gen.generate(prompt, max_new_tokens=2)  # compile + warm cache
    warm_s = time.perf_counter() - t_start

    n = args.tokens
    t0 = time.perf_counter()
    gen.generate(prompt, max_new_tokens=n)
    dt = time.perf_counter() - t0
    per_tok = dt / (n + 1)  # prefill re-runs too; count it as one step
    stats = engine.stats()
    baseline = 0.735  # s/token, MoE-Infinity Mixtral-8x7B on 1xA5000
    return {
        "metric": "mixtral_8x7b_int8_offload_decode_latency",
        "value": round(per_tok, 4),
        "unit": "s/token",
        "vs_baseline": round(baseline / per_tok, 3),
        "hit_rate": round(stats["hit_rate"], 4),
        "num_slots": num_slots,
        "arena_dtype": args.arena_dtype,
        "policy": args.policy,
        "warm_s": round(warm_s, 1),
        "layers": L,
    }


PRESETS = {
    "tiny": bench_tiny,
    "mixtral-offload": bench_mixtral_offload,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="tiny", choices=PRESETS)
    p.add_argument("--tokens", type=int, default=8)
    p.add_argument("--prompt", type=int, default=16)
    p.add_argument("--layers", type=int, default=0, help="override num_layers")
    p.add_argument("--slots", type=int, default=0, help="override arena slots")
    p.add_argument("--hbm-gb", type=float, default=13.0)
    p.add_argument("--threads", type=int, default=4)
    p.add_argument("--lookahead", type=int, default=3)
    p.add_argument("--policy", default="priority")
    p.add_argument("--arena-dtype", default="bf16", choices=("bf16", "int8"))
    p.add_argument("--no-prefetch", action="store_true")
    args = p.parse_args()
    result = PRESETS[args.preset](args)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
