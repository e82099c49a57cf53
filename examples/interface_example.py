"""Interface example: load an MoE checkpoint and generate, with per-phase
timing (the analogue of the reference's examples/interface_example.py
StopWatch harness).

Usage:
  python examples/interface_example.py --model <hf checkpoint or local dir> \
      [--offload-path /ssd/store] [--expert-dtype int8] [--tokens 64]
"""

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--offload-path", default="")
    p.add_argument("--expert-dtype", default="bfloat16")
    p.add_argument("--tokens", type=int, default=64)
    p.add_argument("--prompt", default="The history of mixture-of-experts models")
    args = p.parse_args()

    from transformers import AutoTokenizer

    from moe_infinity_tpu import MoE

    t0 = time.perf_counter()
    engine = MoE(
        args.model,
        {
            "offload_path": args.offload_path,
            "expert_dtype": args.expert_dtype,
        },
    )
    print(f"engine ready in {time.perf_counter() - t0:.1f}s "
          f"(plan: {'offload' if engine.engine else 'resident'})")

    tok = AutoTokenizer.from_pretrained(args.model)
    ids = tok(args.prompt, return_tensors="np").input_ids

    t0 = time.perf_counter()
    out = engine.generate(ids, max_new_tokens=2)  # compile + warm
    warm = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = engine.generate(
        ids, max_new_tokens=args.tokens, eos_token_id=tok.eos_token_id
    )
    dt = time.perf_counter() - t0
    n = out.shape[1] - ids.shape[1]
    print(tok.decode(out[0], skip_special_tokens=True))
    print(
        f"\nwarm {warm:.1f}s | {n} tokens in {dt:.2f}s = "
        f"{dt / max(n, 1) * 1e3:.1f} ms/token"
    )
    if engine.engine:
        print("expert cache:", engine.stats())


if __name__ == "__main__":
    main()
