"""Concurrency stress for the ExpertArena's waiter/error/lease protocol.

The arena's fetch protocol (acquire/prefetch/evict + dispatch leases that
defer donated landings) is the most concurrency-subtle code in the repo;
the reference has no analogous test at all (SURVEY.md §4). These tests run
many client threads against a tiny arena with slow synthetic fetches and
assert liveness (no deadlock / lost wakeup inside a time budget) and
safety (acquired keys are resident; leases exclude landings).
"""

import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from moe_infinity_tpu.runtime.arena import ExpertArena
from moe_infinity_tpu.store.blob import SyntheticStore

L, E = 4, 8
FIELDS = [
    ("fc1.weight", (16, 32), "float32"),
    ("fc2.weight", (32, 16), "float32"),
]


class SlowStore(SyntheticStore):
    """SyntheticStore with a per-record delay to widen race windows."""

    def __init__(self, *a, delay=0.002, **kw):
        super().__init__(*a, **kw)
        self._delay = delay

    def get_expert(self, layer, expert, prio=0, gen=0):
        time.sleep(self._delay)
        return super().get_expert(layer, expert, prio=prio, gen=gen)


@pytest.fixture
def arena():
    store = SlowStore(L, E, FIELDS, meta={"arch": "nllb"})
    a = ExpertArena(store, num_slots=6, num_threads=3)
    yield a
    a.shutdown()


def test_concurrent_acquire_release_liveness(arena):
    """Many threads acquiring overlapping key sets against a 6-slot arena
    (each set fits; the union does not) must all complete: the per-thread
    protected sets are released between rounds, so eviction always finds
    victims eventually."""
    errors = []
    rng = np.random.default_rng(0)
    plans = [
        [
            sorted(
                {(int(rng.integers(L)), int(rng.integers(E))) for _ in range(3)}
            )
            for _ in range(8)
        ]
        for _ in range(4)
    ]

    def client(tid):
        try:
            for keys in plans[tid]:
                # executors serialize their protected windows on
                # client_lock (the documented protocol): two clients
                # pinning key sets concurrently could together exceed the
                # slot count and deadlock/exhaust by design
                with arena.client_lock:
                    arena.acquire(keys, keys[0][0])
                    for k in keys:
                        assert arena.is_resident(k), (tid, k)
                    arena.release(keys)
        except Exception as e:  # noqa: BLE001
            errors.append((tid, e))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
        assert not t.is_alive(), "client thread deadlocked"
    assert not errors, errors


def test_prefetch_storm_with_acquires(arena):
    """Continuous prefetch-plan replacement while another thread acquires:
    generation purging must never drop an escalated (acquired) key."""
    stop = threading.Event()
    errors = []

    def prefetcher():
        rng = np.random.default_rng(1)
        while not stop.is_set():
            orders = [
                (int(rng.integers(L)), int(rng.integers(E)))
                for _ in range(4)
            ]
            arena.prefetch(orders)
            time.sleep(0.001)

    def acquirer():
        rng = np.random.default_rng(2)
        try:
            for _ in range(30):
                keys = sorted(
                    {(int(rng.integers(L)), int(rng.integers(E)))
                     for _ in range(2)}
                )
                arena.acquire(keys, keys[0][0])
                arena.release(keys)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    pt = threading.Thread(target=prefetcher)
    at = threading.Thread(target=acquirer)
    pt.start(); at.start()
    at.join(timeout=60)
    stop.set()
    pt.join(timeout=10)
    assert not at.is_alive() and not pt.is_alive(), "deadlock"
    assert not errors, errors


def test_lease_defers_landings(arena):
    """While a dispatch lease is held, fetched records must not land (the
    donated write would invalidate the dispatched buffers); they land
    promptly once the lease drops."""
    key = (0, 0)
    with arena.locked_tree():
        arena.prefetch([key])
        # fetch (2ms) + upload happen concurrently, but the landing must
        # defer to the lease
        time.sleep(0.2)
        assert not arena.is_resident(key)
    deadline = time.time() + 10
    while not arena.is_resident(key) and time.time() < deadline:
        time.sleep(0.005)
    assert arena.is_resident(key), "landing lost after lease release"


def test_acquire_proceeds_during_lease_of_other_thread(arena):
    """A long dispatch lease must not block another executor's residency
    bookkeeping: acquire() on a different thread completes as soon as the
    lease drops (the fetch itself overlaps the lease)."""
    done = threading.Event()
    err = []

    def client():
        try:
            arena.acquire([(1, 1)], 1)
            arena.release([(1, 1)])
            done.set()
        except Exception as e:  # noqa: BLE001
            err.append(e)
            done.set()

    t = threading.Thread(target=client)
    with arena.locked_tree():
        t.start()
        time.sleep(0.25)  # fetch+upload overlap the lease window
    assert done.wait(timeout=30), "acquire starved by dispatch lease"
    t.join(timeout=5)
    assert not err, err


def test_snapshot_consistency_under_churn(arena):
    """dispatch_snapshot's (slot_rows, resident) pair must be internally
    consistent: every key in the resident set maps to the slot the rows
    claim, even while workers churn the arena."""
    stop = threading.Event()

    def churner():
        rng = np.random.default_rng(3)
        while not stop.is_set():
            ks = [(int(rng.integers(L)), int(rng.integers(E)))]
            arena.prefetch(ks)
            time.sleep(0.0005)

    ct = threading.Thread(target=churner)
    ct.start()
    try:
        for _ in range(50):
            with arena.dispatch_snapshot() as (tree, slot_rows, resident):
                for (layer, expert) in resident:
                    slot = slot_rows[layer, expert]
                    assert 0 <= slot < arena.num_slots
            time.sleep(0.001)
    finally:
        stop.set()
        ct.join(timeout=10)
    assert not ct.is_alive()
