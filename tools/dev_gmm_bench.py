"""Dev microbench: gmm numerics + streaming bandwidth on the real chip."""
import time

import numpy as np

import jax
import jax.numpy as jnp

from moe_infinity_tpu.ops.gmm import gmm

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((16, 256)), jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((4, 256, 512)) * 0.1, jnp.bfloat16)
sizes = jnp.asarray([6, 2, 0, 8], jnp.int32)
got = np.asarray(gmm(x, w, sizes))
ref = np.zeros((16, 512), np.float32)
s = 0
for g in range(4):
    n = int(sizes[g])
    ref[s : s + n] = np.asarray(x[s : s + n], np.float32) @ np.asarray(w[g], np.float32)
    s += n
print("device max err:", np.abs(got - ref).max())

D, F, S = 4096, 14336, 8
xq = jnp.asarray(rng.standard_normal((16, D)), jnp.bfloat16)
wq = jax.device_put(jnp.asarray(rng.integers(-127, 127, (S, D, F)), jnp.int8))
sc = jnp.asarray(rng.uniform(0.001, 0.02, (S, F)), jnp.float32)
f = jax.jit(lambda x, w, g, s: gmm(x, w, g, s, out_dtype=jnp.bfloat16))

for name, gs in [
    ("2/8 experts", jnp.asarray([0, 8, 0, 0, 8, 0, 0, 0], jnp.int32)),
    ("8/8 experts", jnp.asarray([2] * 8, jnp.int32)),
]:
    o = f(xq, wq, gs, sc)
    o.block_until_ready()
    active = int(np.count_nonzero(np.asarray(gs)))
    t0 = time.perf_counter()
    x2 = xq
    N = 20
    for i in range(N):
        o = f(x2, wq, gs, sc)
        x2 = (x2 + o[:, :D] * 0.001).astype(jnp.bfloat16)
    x2.block_until_ready()
    dt = (time.perf_counter() - t0) / N
    print(
        f"gmm mixtral-layer {name} int8: {dt*1e3:.2f}ms -> "
        f"{active*D*F/dt/1e9:.0f} GB/s effective"
    )
