"""Probe gmm perf anomalies: ordering, group patterns, repeat stability."""
import time

import numpy as np

import jax
import jax.numpy as jnp

from moe_infinity_tpu.ops.gmm import gmm

rng = np.random.default_rng(0)
D, F, S = 4096, 14336, 8
xq = jnp.asarray(rng.standard_normal((16, D)), jnp.bfloat16)
wq = jax.device_put(jnp.asarray(rng.integers(-127, 127, (S, D, F)), jnp.int8))
sc = jnp.asarray(rng.uniform(0.001, 0.02, (S, F)), jnp.float32)
f = jax.jit(lambda x, w, g, s: gmm(x, w, g, s, out_dtype=jnp.bfloat16))

cases = [
    ("8/8", jnp.asarray([2] * 8, jnp.int32)),
    ("2/8 mid", jnp.asarray([0, 8, 0, 0, 8, 0, 0, 0], jnp.int32)),
    ("2/8 first", jnp.asarray([8, 8, 0, 0, 0, 0, 0, 0], jnp.int32)),
    ("1/8 all-in-0", jnp.asarray([16, 0, 0, 0, 0, 0, 0, 0], jnp.int32)),
    ("8/8 again", jnp.asarray([2] * 8, jnp.int32)),
]
for name, gs in cases:
    o = f(xq, wq, gs, sc)
    o.block_until_ready()
    active = int(np.count_nonzero(np.asarray(gs)))
    for rep in range(2):
        t0 = time.perf_counter()
        x2 = xq
        N = 10
        for i in range(N):
            o = f(x2, wq, gs, sc)
            x2 = (x2 + o[:, :D] * 0.001).astype(jnp.bfloat16)
        x2.block_until_ready()
        dt = (time.perf_counter() - t0) / N
        print(
            f"{name} rep{rep}: {dt*1e3:.2f}ms -> "
            f"{active*D*F/dt/1e9:.0f} GB/s"
        )
