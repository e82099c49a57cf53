"""Fused single-dispatch serving runner.

Wraps a model's `fused_forward` (lax.scan over layers + stacked expert
pool, Pallas gmm) into two entry points:

* prefill(tokens)            — one jit call
* decode(tok0, pos0, kv, n)  — n greedy steps as ONE jitted lax.scan
                               (zero host round-trips inside the loop)

This is the latency path for hardware where host syncs are expensive; the
per-layer OffloadEngine remains the path when experts exceed HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class FusedRunner:
    def __init__(
        self, model, params, pool, *, moe_impl: str = "gmm",
        interpret: bool = False,
    ):
        self.model = model
        self.params = params
        self.pool = pool
        self.stacked = model.stack_moe_layers(params)
        self.interpret = interpret

        def fwd(params, stacked, pool, tokens, positions, kv_state, kv_len):
            return model.fused_forward(
                params, stacked, pool, tokens, positions, kv_state, kv_len,
                moe_impl=moe_impl, interpret=interpret,
            )

        self._raw_fwd = fwd
        self._prefill = jax.jit(fwd)
        self._decode_cache = {}

    def init_cache(self, batch: int, max_len: int):
        return self.model.init_fused_cache(batch, max_len)

    def prefill(self, tokens, positions, kv_state, kv_len):
        return self._prefill(
            self.params, self.stacked, self.pool, tokens, positions,
            kv_state, kv_len,
        )

    def decode(self, tok0, pos0, kv_state, num_steps: int):
        """Greedy-decode num_steps tokens on device. Returns ([B, N], kv)."""
        fwd = self._raw_fwd

        def scan_fn(params, stacked, pool, tok0, pos0, kv_state):
            def body(carry, _):
                tok, pos, kv = carry
                logits, kv = fwd(
                    params, stacked, pool, tok, pos[:, None], kv, pos[0]
                )
                nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
                return (nxt[:, None], pos + 1, kv), nxt

            (_, _, kv_state), toks = jax.lax.scan(
                body, (tok0, pos0, kv_state), None, length=num_steps
            )
            return toks.T, kv_state

        if num_steps not in self._decode_cache:
            self._decode_cache[num_steps] = jax.jit(
                scan_fn, donate_argnums=(5,)
            )
        return self._decode_cache[num_steps](
            self.params, self.stacked, self.pool, tok0, pos0, kv_state
        )
