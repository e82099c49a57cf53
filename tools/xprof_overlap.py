"""Measure overlap of arena H2D expert uploads with decode compute.

ROADMAP item: verify that slot-arena uploads (prefetch traffic) overlap
on-device compute instead of serializing behind it. The reference hides
H2D behind compute with dedicated CUDA streams (stream_pool.h,
task_scheduler.cpp GPUThreadFunc); on TPU the equivalent is XLA's async
dispatch — a host thread issuing donated `device_put`s while the main
thread keeps the chip busy with jitted steps.

Method (no profiler dependency, works through any transport):
  1. time N jitted matmul "decode steps" alone            -> t_compute
  2. time M arena-style expert uploads alone              -> t_upload
  3. run both concurrently (uploader on a thread)         -> t_both
  overlap = (t_compute + t_upload - t_both) / min(t_compute, t_upload)
  1.0 = perfect overlap (the smaller stream fully hidden), 0.0 = fully
  serialized. Optionally wraps the concurrent phase in a
  jax.profiler trace (--trace DIR) for xprof inspection.

Usage:  python tools/xprof_overlap.py [--mb 16] [--steps 30] [--uploads 20]
                                      [--dim 4096] [--trace DIR]
"""

from __future__ import annotations

import argparse
import sys
import threading
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--mb", type=int, default=16, help="upload size (MB) per expert record")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--uploads", type=int, default=20)
    p.add_argument("--dim", type=int, default=4096, help="matmul dim for the compute step")
    p.add_argument("--trace", default=None, help="jax.profiler trace output dir")
    p.add_argument(
        "--pinned", action="store_true",
        help="uploads are device-side DMA programs from a pinned_host "
             "tier into a donated arena (the store/pinned.py fetch path) "
             "instead of host device_puts — the transfer leg XLA can "
             "schedule alongside compute",
    )
    args = p.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    # compute step: a chained matmul big enough to keep the MXU busy
    @jax.jit
    def step(x):
        for _ in range(4):
            x = jnp.tanh(x @ x)
        return x

    x = jax.device_put(
        jnp.asarray(np.random.default_rng(0).standard_normal(
            (args.dim, args.dim), dtype=np.float32) * 0.01)
    )
    step(x).block_until_ready()  # compile

    # upload payload: one pinned-host int8 record per upload, like an
    # arena slot write (fresh buffer each time so no caching)
    rec = np.random.default_rng(1).integers(
        -127, 127, size=(args.mb << 20,), dtype=np.int8
    )

    def run_compute(n):
        y = x
        for _ in range(n):
            y = step(y)
        # force a host readback: on some transports block_until_ready
        # resolves before the device work drains
        np.asarray(y[:1, :1])

    if args.pinned:
        # pinned-host tier -> donated arena slot: the store/pinned.py
        # fetch path, all device-side
        from jax.sharding import SingleDeviceSharding

        pinned = SingleDeviceSharding(dev, memory_kind="pinned_host")
        hbm = SingleDeviceSharding(dev, memory_kind="device")
        n_rec = 16
        tier = jax.device_put(
            np.broadcast_to(rec, (n_rec,) + rec.shape).copy(), pinned
        )
        arena = {"a": jax.device_put(np.zeros((4,) + rec.shape, np.int8), hbm)}

        def _w(a, t, i, s):
            r = jax.lax.dynamic_slice_in_dim(t, i, 1, 0)
            r = jax.device_put(r, hbm)
            return {"a": jax.lax.dynamic_update_slice(a["a"], r, (s, 0))}

        writer = jax.jit(_w, donate_argnums=0)
        arena = writer(arena, tier, jnp.int32(0), jnp.int32(0))  # compile
        jax.block_until_ready(arena["a"])
        state = {"arena": arena}

        def run_uploads(m, out):
            a = state["arena"]
            for i in range(m):
                a = writer(a, tier, jnp.int32(i % n_rec), jnp.int32(i % 4))
            np.asarray(a["a"][:1, :1])  # landed
            state["arena"] = a
            out.append(m)
    else:
        def run_uploads(m, out):
            bufs = []
            for _ in range(m):
                bufs.append(jax.device_put(rec, dev))
            for b in bufs:
                np.asarray(b[:1])  # host readback = upload actually landed
            out.append(len(bufs))

    # 1) compute alone
    t0 = time.perf_counter()
    run_compute(args.steps)
    t_compute = time.perf_counter() - t0

    # 2) uploads alone
    sink: list = []
    t0 = time.perf_counter()
    run_uploads(args.uploads, sink)
    t_upload = time.perf_counter() - t0

    # 3) concurrent
    ctx = None
    if args.trace:
        ctx = jax.profiler.trace(args.trace)
        ctx.__enter__()
    sink = []
    th = threading.Thread(target=run_uploads, args=(args.uploads, sink))
    t0 = time.perf_counter()
    th.start()
    run_compute(args.steps)
    th.join()
    t_both = time.perf_counter() - t0
    if ctx is not None:
        ctx.__exit__(None, None, None)
        print(f"profiler trace written to {args.trace}", file=sys.stderr)

    hidden = t_compute + t_upload - t_both
    overlap = hidden / max(min(t_compute, t_upload), 1e-9)
    bw = args.uploads * args.mb / max(t_upload, 1e-9)
    import json

    print(json.dumps({
        "metric": "h2d_compute_overlap",
        "mode": "pinned_tier_dma" if args.pinned else "host_device_put",
        "value": round(max(0.0, min(1.0, overlap)), 3),
        "unit": "fraction_hidden",
        "t_compute_s": round(t_compute, 3),
        "t_upload_s": round(t_upload, 3),
        "t_concurrent_s": round(t_both, 3),
        "h2d_MBps": round(bw, 1),
        "steps": args.steps,
        "uploads": args.uploads,
        "upload_mb": args.mb,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
