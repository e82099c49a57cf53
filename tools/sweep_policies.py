"""Expert-cache policy sweep: hit rate vs arena size for each eviction
policy, on a deterministic synthetic workload (CPU-runnable).

The analogue of the reference's offline ExpertCache simulator
(/root/reference/moe_infinity/memory/expert_cache.py — never wired into
its runtime), but driven through the REAL arena + engine + EAMC stack.

  python tools/sweep_policies.py [--layers 8] [--experts 16] [--tokens 24]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=6)
    p.add_argument("--experts", type=int, default=16)
    p.add_argument("--tokens", type=int, default=16)
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    from moe_infinity_tpu.memory import ExpertPredictor, ExpertTracer
    from moe_infinity_tpu.models.mixtral import MixtralModel, MixtralSpec
    from moe_infinity_tpu.runtime.arena import ExpertArena
    from moe_infinity_tpu.runtime.engine import OffloadEngine
    from moe_infinity_tpu.runtime.generate import Generator
    from moe_infinity_tpu.store.blob import SyntheticStore

    L, E = args.layers, args.experts
    spec = MixtralSpec(
        vocab_size=256, hidden_size=64, intermediate_size=128, num_layers=L,
        num_heads=8, num_kv_heads=4, head_dim=8, num_experts=E, top_k=2,
        rms_eps=1e-6, rope_theta=1e4, tie_embeddings=False,
    )
    model = MixtralModel(spec, compute_dtype=jnp.float32)
    params, _ = model.init_random(jax.random.PRNGKey(0), with_experts=False)
    D, F = spec.hidden_size, spec.intermediate_size
    fields = [
        ("w1.weight", (D, F), "float32"),
        ("w3.weight", (D, F), "float32"),
        ("w2.weight", (F, D), "float32"),
    ]

    prompts = [
        (np.arange(6, dtype=np.int64)[None] * s + 3) % 255
        for s in (7, 13, 29, 7, 13)  # repeating workload -> learnable trace
    ]

    print(f"{'policy':<10} {'slots':>5} {'hit_rate':>9} {'prefetch_hits':>14}")
    for policy in ("lru", "lru_layers", "lfu", "priority"):
        for slots in (E, 2 * E, 3 * E):
            store = SyntheticStore(
                L, E, fields,
                meta={"arch": "mixtral", "gated": True,
                      "num_encoder_moe_layers": 0},
            )
            arena = ExpertArena(
                store, slots, policy=policy, compute_dtype=jnp.float32,
                num_threads=2,
            )
            tracer = ExpertTracer(64, L, E)
            engine = OffloadEngine(
                model, params, arena, tracer=tracer,
                predictor=ExpertPredictor(tracer), prefetch=True,
            )
            gen = Generator(stepper=engine, max_seq_len=64)
            for _ in range(args.repeats):
                for prompt in prompts:
                    gen.generate(prompt, max_new_tokens=args.tokens)
            s = engine.stats()
            print(
                f"{policy:<10} {slots:>5} {s['hit_rate']:>9.3f} "
                f"{s['prefetch_hits']:>14}"
            )
            arena.shutdown()


if __name__ == "__main__":
    main()
