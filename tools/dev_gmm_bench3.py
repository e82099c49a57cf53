"""Isolate gmm fixed overhead: dense-XLA baseline, grid-size scaling."""
import time

import numpy as np

import jax
import jax.numpy as jnp

from moe_infinity_tpu.ops.gmm import gmm

rng = np.random.default_rng(0)
D, F = 4096, 14336
xq = jnp.asarray(rng.standard_normal((16, D)), jnp.bfloat16)


def chain(fn, x, n=20):
    o = fn(x)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for i in range(n):
        o = fn(x)
        x = (x + o[:, :D] * 0.001).astype(jnp.bfloat16)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / n


# dense XLA bf16 matmul baseline
wd = jnp.asarray(rng.standard_normal((D, F)) * 0.02, jnp.bfloat16)
f_dense = jax.jit(lambda x: jnp.dot(x, wd, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
print(f"dense XLA [16x{D}]@[{D}x{F}]: {chain(f_dense, xq)*1e3:.2f}ms")

# gmm with S=2, both active (same FLOPs as dense roughly)
for S in (2, 8, 64):
    wq = jnp.asarray(rng.integers(-127, 127, (S, D, F)), jnp.int8)
    sc = jnp.asarray(rng.uniform(0.001, 0.02, (S, F)), jnp.float32)
    gs = np.zeros(S, np.int64)
    gs[0] = 8
    gs[S // 2] = 8
    gsj = jnp.asarray(gs, jnp.int32)
    f_g = jax.jit(lambda x, w=wq, g=gsj, s=sc: gmm(x, w, g, s, out_dtype=jnp.bfloat16))
    print(f"gmm S={S} (2 active): {chain(f_g, xq)*1e3:.2f}ms")

# gmm bf16 unquantized S=8
wb = jnp.asarray(rng.standard_normal((8, D, F)) * 0.02, jnp.bfloat16)
gs8 = jnp.asarray([8, 0, 0, 0, 8, 0, 0, 0], jnp.int32)
f_b = jax.jit(lambda x: gmm(x, wb, gs8, out_dtype=jnp.bfloat16))
print(f"gmm bf16 S=8 (2 active): {chain(f_b, xq)*1e3:.2f}ms")
