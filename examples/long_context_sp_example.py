"""Long-context sequence parallelism example.

Shards a prompt over the mesh's `seq` axis: every device runs the full
layer stack on 1/s of the tokens, attention crosses shards via ring
ppermute, and decode continues from the SP-built caches. Activation
memory scales 1/s — an s-device ring prefills an s-times-longer prompt
than one device could (the reference truncates prompts at one GPU's
activation memory, reference examples/interface_example.py:122-132).

Runs anywhere via virtual devices:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/long_context_sp_example.py [--ring 8] [--tokens 64]
"""

import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ring", type=int, default=8, help="seq-axis size")
    p.add_argument("--tokens", type=int, default=64, help="prompt length")
    p.add_argument("--decode", type=int, default=8)
    args = p.parse_args()

    import jax

    if len(jax.devices()) < args.ring:
        raise SystemExit(
            f"need {args.ring} devices; set XLA_FLAGS="
            f"--xla_force_host_platform_device_count={args.ring}"
        )
    import jax.numpy as jnp
    import numpy as np

    from moe_infinity_tpu.models.mixtral import MixtralModel, MixtralSpec
    from moe_infinity_tpu.parallel import (
        MeshPlan,
        caches_from_sp,
        make_mesh,
        sp_prefill,
    )
    from moe_infinity_tpu.runtime.providers import ResidentProvider

    spec = MixtralSpec(
        vocab_size=1024, hidden_size=256, intermediate_size=512,
        num_layers=4, num_heads=8, num_kv_heads=4, head_dim=32,
        num_experts=8, top_k=2, rms_eps=1e-6, rope_theta=1e6,
        tie_embeddings=False,
    )
    model = MixtralModel(spec, compute_dtype=jnp.float32)
    params, experts = model.init_random(jax.random.PRNGKey(0))
    mesh = make_mesh(MeshPlan(seq=args.ring))
    print(f"mesh: {dict(mesh.shape)}")

    if args.tokens < args.ring:
        raise SystemExit(f"--tokens must be >= --ring ({args.ring})")
    T = args.tokens - args.tokens % args.ring
    tokens = jnp.asarray(
        (np.arange(T)[None] * 7) % spec.vocab_size, jnp.int32
    )
    t0 = time.perf_counter()
    logits, sp_kvs = sp_prefill(
        model, params, experts, tokens, mesh,
        for_layer=ResidentProvider.for_layer,
    )
    print(
        f"SP prefill of {T} tokens over a {args.ring}-device ring: "
        f"{time.perf_counter() - t0:.2f}s, logits {logits.shape}"
    )

    # Path A (prompt fits one device after all): gather the SP caches and
    # decode on the standard single-program path
    cap = T + args.decode
    kvs = caches_from_sp(sp_kvs, cap)
    cur = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)[:, None]
    out = [int(cur[0, 0])]
    for step in range(T, T + args.decode - 1):
        pos = jnp.full((1, 1), step, jnp.int32)
        logits, kvs, _ = model.forward(
            params, experts, cur, pos, kvs, jnp.int32(step),
            for_layer=ResidentProvider.for_layer, impl="gather",
        )
        cur = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)[:, None]
        out.append(int(cur[0, 0]))
    print(f"decode continuation from gathered SP caches: {out}")

    # Path B (prompt does NOT fit one device — the point of SP): the
    # prefill K/V stays sharded in place; each decode step merges the
    # per-shard flash partials with two tiny collectives. Same tokens.
    from moe_infinity_tpu.parallel import SPDecoder

    dec = SPDecoder(
        model, params, experts, mesh,
        for_layer=ResidentProvider.for_layer, tail_cap=args.decode,
    )
    t0 = time.perf_counter()
    seq = dec.generate(np.asarray(tokens), max_new_tokens=args.decode)
    sp_out = [int(t) for t in seq[T : T + len(out)]]
    print(
        f"SP decode over frozen shards ({time.perf_counter() - t0:.2f}s "
        f"incl. its own prefill): {sp_out}"
    )
    assert sp_out == out, "SP decode must match the gathered-cache path"


if __name__ == "__main__":
    main()
