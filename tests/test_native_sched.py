"""Native priority fetch scheduler (csrc/sched.cc): correctness of reads,
priority ordering with block-granular preemption of prefetch reads,
escalation of in-flight reads, stale-generation purge, and the e2e
`load_mode="sched"` store mode through the full MoE offload stack.

Reference semantics being mirrored: ArcherTaskPool priority queue
(task_scheduler.cpp:82-118) + ArcherPrioAioContext block-granular
scheduling (archer_prio_aio_handle.cpp:123-169).
"""

import os
import threading
import time

import numpy as np
import pytest

from moe_infinity_tpu.store.native import (
    NativeFetchScheduler,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable"
)


@pytest.fixture
def blob(tmp_path):
    """A blob of 32 records x 1 MiB with recognizable contents."""
    n, rec = 32, 1 << 20
    path = tmp_path / "blob.bin"
    buf = np.repeat(np.arange(n, dtype=np.uint8), rec)
    buf.tofile(path)
    return str(path), n, rec


def test_sched_reads_correct_bytes(blob):
    path, n, rec = blob
    s = NativeFetchScheduler(path, block_bytes=64 << 10, threads=2)
    try:
        for i in (0, 7, 31):
            s.submit(0, i, i * rec, rec, prio=1, gen=0)
        for i in (0, 7, 31):
            out = s.wait(0, i)
            assert out.shape == (rec,)
            assert (out == i).all(), i
        assert s.pending() == 0
    finally:
        s.close()


def test_on_demand_preempts_prefetch(blob):
    """One service thread, a long prefetch in flight: an on-demand request
    submitted afterwards must complete FIRST (the prefetch yields at block
    granularity)."""
    path, n, rec = blob
    # one big "prefetch": 24 records as one read, tiny blocks = many yields
    s = NativeFetchScheduler(path, block_bytes=32 << 10, threads=1)
    done_order = []
    try:
        s.submit(0, 100, 0, 24 * rec, prio=1, gen=0)
        s.submit(0, 200, 31 * rec, rec, prio=0, gen=0)  # on-demand

        def waiter(eid):
            s.wait(0, eid)
            done_order.append(eid)

        ts = [threading.Thread(target=waiter, args=(e,)) for e in (100, 200)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=60)
        assert done_order == [200, 100], done_order
    finally:
        s.close()


def test_escalate_inflight_read(blob):
    """Two queued prefetches on one thread; escalating the second makes it
    beat the first (which yields at its next block boundary)."""
    path, n, rec = blob
    s = NativeFetchScheduler(path, block_bytes=32 << 10, threads=1)
    done_order = []
    try:
        s.submit(0, 1, 0, 16 * rec, prio=1, gen=0)
        s.submit(0, 2, 16 * rec, 8 * rec, prio=1, gen=0)
        s.escalate(0, 2)

        def waiter(eid):
            s.wait(0, eid)
            done_order.append(eid)

        ts = [threading.Thread(target=waiter, args=(e,)) for e in (1, 2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=60)
        assert done_order == [2, 1], done_order
    finally:
        s.close()


def test_set_gen_cancels_queued_prefetch(blob):
    path, n, rec = blob
    s = NativeFetchScheduler(path, block_bytes=32 << 10, threads=1)
    try:
        s.submit(0, 1, 0, 16 * rec, prio=1, gen=1)  # occupies the thread
        s.submit(0, 2, 16 * rec, rec, prio=1, gen=1)  # queued
        s.set_gen(2)
        # poll sees the cancellation (the occupied read may or may not have
        # noticed yet; the queued one is cancelled immediately)
        deadline = time.time() + 10
        st = 0
        while time.time() < deadline:
            st = s._lib.mtsched_poll(s._h, s._key(0, 2))
            if st == -2:
                break
            time.sleep(0.005)
        assert st == -2, st
        s.wait(0, 1)  # in-service read still completes
    finally:
        s.close()


def test_wait_revives_cancelled_request(blob):
    """A waiter on a cancelled prefetch means the bytes are needed NOW:
    wait() revives it at on-demand priority instead of failing."""
    path, n, rec = blob
    s = NativeFetchScheduler(path, block_bytes=32 << 10, threads=1)
    try:
        s.submit(0, 5, 3 * rec, rec, prio=1, gen=1)
        s.set_gen(2)
        out = s.wait(0, 5)  # revived, completes
        assert (out == 3).all()
    finally:
        s.close()


def test_store_sched_mode_matches_mmap(tmp_path):
    """ExpertStore(load_mode='sched') returns identical records to mmap."""
    from moe_infinity_tpu.store.blob import ExpertStore, ExpertStoreWriter

    fields = [("w", (8, 16), "bfloat16"), ("w.scale", (16,), "float32")]
    w = ExpertStoreWriter(str(tmp_path), 2, 3, fields, meta={"arch": "mixtral"})
    rng = np.random.default_rng(0)
    import ml_dtypes

    for l in range(2):
        for e in range(3):
            w.write_tensor(l, e, "w", rng.standard_normal((8, 16)).astype(ml_dtypes.bfloat16))
            w.write_tensor(l, e, "w.scale", rng.standard_normal(16).astype(np.float32))
    w.finalize()

    ref = ExpertStore(str(tmp_path), load_mode="mmap")
    sch = ExpertStore(str(tmp_path), load_mode="sched")
    for l in range(2):
        for e in range(3):
            a = ref.get_expert(l, e)
            b = sch.get_expert(l, e, prio=1, gen=0)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])
    sch.escalate(0, 0)  # no-op when nothing is in flight


def test_moe_offload_sched_mode_e2e(tmp_path):
    """Full stack: tiny Mixtral through the offload plan with the native
    scheduler as the host tier — output matches the mmap tier exactly."""
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    from moe_infinity_tpu.entrypoints.api import MoE

    cfg = MixtralConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, num_local_experts=4,
        num_experts_per_tok=2, vocab_size=128, max_position_embeddings=128,
        torch_dtype=torch.float32, architectures=["MixtralForCausalLM"],
    )
    torch.manual_seed(3)
    MixtralForCausalLM(cfg).eval().save_pretrained(tmp_path / "ckpt")
    prompt = np.array([[5, 9, 33, 17]])
    outs = {}
    for mode in ("mmap", "sched"):
        engine = MoE(
            str(tmp_path / "ckpt"),
            {
                "expert_dtype": "float32",
                "max_seq_len": 64,
                "device_memory_bytes": 1,
                "num_slots": 5,
                "load_mode": mode,
                "offload_path": str(tmp_path / f"store_{mode}"),
            },
        )
        outs[mode] = engine.generate(prompt, max_new_tokens=6)
    np.testing.assert_array_equal(outs["mmap"], outs["sched"])
