"""HBM expert slot arena + host-side fetch controller.

The TPU-native replacement for the reference's residency machinery
(ArcherTaskPool priority threads + memory pools + per-tensor set_data swaps,
/root/reference/core/prefetch/task_scheduler.cpp:20-583 and
core/model/model_topology.cpp:53-136). XLA cannot mutate tensor storage, so
residency is an *indirection*, not a pointer swap:

* one fixed-shape stacked array per FFN role — ``[num_slots, in, out]`` —
  lives in HBM for the whole process; expert residency changes are jitted
  ``dynamic_update_slice`` calls with the arena **donated**, which XLA turns
  into an in-place write (no reallocation, no recompilation);
* a host-side slot table maps (moe_layer, expert) → slot; the per-layer
  ``expert_to_slot[E]`` row is passed to the grouped-FFN kernel as a tiny
  int32 argument each step;
* a priority fetch queue (on-demand = 0 beats prefetch = 1, mirroring the
  reference's NUM_PRIORITY deques) drained by worker threads that read
  expert records from the host store and issue async H2D updates;
* eviction is delegated to memory/cache_policy.py (activation-aware), with
  on-demand + prefetch-candidate protection.

Thread model: N fetch workers overlap host reads (page-cache faults / RAM
copies); the device-side update sequence is serialized under a lock —
device queues make the copies themselves async with compute.
"""

from __future__ import annotations

import functools
import heapq
import itertools
import threading
import time as _time
from contextlib import contextmanager
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from moe_infinity_tpu.memory.cache_policy import ExpertCachePolicy
from moe_infinity_tpu.runtime.providers import _BIAS_TAILS, _ROLE_KEYS, role_map_for
from moe_infinity_tpu.store.blob import ExpertStore
from moe_infinity_tpu.utils.dtypes import np_dtype
from moe_infinity_tpu.utils.logger import get_logger

logger = get_logger("arena")

Key = Tuple[int, int]  # (moe_layer, expert)

PRIO_ONDEMAND = 0
PRIO_PREFETCH = 1


@functools.partial(jax.jit, donate_argnums=0)
def _write_rows(buf: jax.Array, v: jax.Array, slot, row_off):
    """In-place (donated) write of a row-chunk of one expert record into
    arena slot `slot` at row offset `row_off` (both traced: one compile per
    chunk shape, not per offset)."""
    idx = (slot, row_off) + (0,) * (buf.ndim - 2)
    return jax.lax.dynamic_update_slice(buf, v[None], idx)


@functools.partial(jax.jit, donate_argnums=0)
def _write_rows_dq(buf: jax.Array, v: jax.Array, scale: jax.Array, slot, row_off):
    """Chunked write with fused dequant: quantized bytes ride the
    interconnect, the arena slot holds compute dtype. int4-packed chunks
    (half the buf's out axis) unpack on device — packed bytes on the wire,
    detected at trace time from the static shapes."""
    if v.ndim == 2 and v.shape[-1] * 2 == buf.shape[-1]:
        from moe_infinity_tpu.ops.moe import unpack_int4

        v = unpack_int4(v)
    v = (v.astype(jnp.float32) * scale[None, :]).astype(buf.dtype)
    return jax.lax.dynamic_update_slice(buf, v[None], (slot, row_off, 0))


@functools.partial(jax.jit, donate_argnums=0)
def _write_slot(arena: Dict[str, jax.Array], new: Dict[str, jax.Array], slot):
    """In-place (donated) write of one expert into arena slot `slot`.

    If `new` carries `<role>_scale` entries absent from the arena, the role
    is dequantized on write (host uploads quantized bytes — half the
    interconnect traffic — while the arena holds compute dtype)."""
    out = {}
    for k, a in arena.items():
        v = new[k]
        scale = new.get(k + "_scale")
        if scale is not None and (k + "_scale") not in arena:
            if v.ndim == 2 and v.shape[-1] * 2 == a.shape[-1]:
                from moe_infinity_tpu.ops.moe import unpack_int4

                v = unpack_int4(v)  # int4-packed upload, compute-dtype slot
            v = (v.astype(jnp.float32) * scale[None, :]).astype(a.dtype)
        else:
            v = v.astype(a.dtype)
        idx = (slot,) + (0,) * (a.ndim - 1)
        out[k] = jax.lax.dynamic_update_slice(a, v[None], idx)
    return out


class ExpertArena:
    """Fixed-slot HBM arena over a host ExpertStore."""

    def __init__(
        self,
        store: ExpertStore,
        num_slots: int,
        *,
        policy: str = "priority",
        compute_dtype=jnp.bfloat16,
        device: Optional[jax.Device] = None,
        num_threads: int = 2,
        dequant_on_write: bool = False,
        upload_chunk_bytes: int = 16 << 20,
        upload_threads: int = 4,
        reserve_zero_slot: bool = False,
        pinned_tier=None,
        tp_mirrors=None,
    ):
        """dequant_on_write: upload quantized bytes but store compute-dtype
        slots (no per-step dequant on the jnp path; the Pallas kernel path
        instead keeps slots quantized and fuses dequant into the GEMM).

        upload_chunk_bytes/upload_threads: expert records larger than the
        chunk size are split row-wise and device_put in parallel, each chunk
        written straight into its arena rows (no whole-record device
        staging). Measured on the serial-link relay: 4 threads x 16 MB
        sustains ~4.4 GB/s vs ~1.6 GB/s for one whole-record copy, cutting
        the blocking latency of a single on-demand miss ~2.7x.
        upload_chunk_bytes=0 disables chunking.

        pinned_tier: a store.pinned.PinnedExpertTier. Fetches then skip the
        host read + upload entirely: one jitted program slices the record
        out of the pinned_host tier and writes the slot as a device-side
        DMA (~1 ms vs ~100s of ms per record on a relay link), fully
        overlapping compute.

        tp_mirrors: ``[(device, column_store), ...]`` — tensor-parallel
        column buffers (parallel/pod.py TP x EP). `store` must then be
        column 0's ColumnShardStore view; each mirror holds the SAME slot
        layout on its own device with its own column's weight slices, so
        ONE residency decision (this arena's policy/bookkeeping) governs
        all tp columns and the jointly-sharded weights view stays
        coherent by construction. Fetch workers land every column of a
        record under the same lock/lease discipline; reads share one
        base-store read (store.column._BaseRecordCache)."""
        if num_slots < 1:
            raise ValueError("num_slots must be >= 1")
        self.store = store
        self.num_slots = num_slots
        # reserved all-zeros row past the allocatable slots: the engine's
        # run-on-host escape hatch points missing experts here so the
        # device program contributes exactly 0 for them (host_exec.py)
        self.zero_slot: Optional[int] = num_slots if reserve_zero_slot else None
        rows = num_slots + (1 if reserve_zero_slot else 0)
        self.num_layers = store.num_layers
        self.num_experts = store.num_experts
        self.dtype = compute_dtype
        self.device = device or jax.local_devices()[0]  # local: global [0] may be another process's
        self.policy = ExpertCachePolicy(
            self.num_layers,
            self.num_experts,
            num_encoder_layers=store.meta.get("num_encoder_moe_layers", 0),
            policy=policy,
        )

        # ---- arena array construction -----------------------------------
        roles = role_map_for(store.meta)
        field_names = set(store.field_names)
        self._role_to_tail: Dict[str, str] = {}
        arena: Dict[str, jax.Array] = {}
        self._arena_np_dtype: Dict[str, np.dtype] = {}
        for role, tail in roles.items():
            if tail is None:
                continue
            key = _ROLE_KEYS[role]
            f = store._field_by_name[tail]
            is4 = f.dtype == "int4"
            shape = f.shape
            if f.dtype in ("int8", "int4"):
                adt = jnp.int8
            elif f.dtype == "float8_e4m3fn":
                adt = jnp.float8_e4m3fn
            else:
                adt = compute_dtype
            if dequant_on_write:
                adt = compute_dtype
                if is4:  # slot holds unpacked compute dtype; upload packed
                    shape = (shape[0], shape[1] * 2)
            elif is4:
                # slot stays packed ('<role>4' key, ops.moe unpacks after
                # the row gather); scale keeps the base-role key
                key = key + "4"
            self._role_to_tail[key] = tail
            self._arena_np_dtype[key] = np_dtype(f.dtype)
            arena[key] = jnp.zeros((rows,) + shape, dtype=adt)
            base = key[:-1] if key.endswith("4") else key
            if tail + ".scale" in field_names:
                fs = store._field_by_name[tail + ".scale"]
                self._role_to_tail[base + "_scale"] = tail + ".scale"
                self._arena_np_dtype[base + "_scale"] = np_dtype(fs.dtype)
                if not dequant_on_write:
                    arena[base + "_scale"] = jnp.zeros(
                        (rows,) + fs.shape, dtype=jnp.float32
                    )
        for tail, key in _BIAS_TAILS.items():
            if tail in field_names:
                f = store._field_by_name[tail]
                self._role_to_tail[key] = tail
                self._arena_np_dtype[key] = np_dtype(f.dtype)
                arena[key] = jnp.zeros((rows,) + f.shape, dtype=jnp.float32)
        self._arena = jax.device_put(arena, self.device)
        self._mirrors: List[Tuple[jax.Device, object]] = list(tp_mirrors or [])
        if self._mirrors and pinned_tier is not None:
            raise NotImplementedError(
                "tp_mirrors and pinned_tier are mutually exclusive (the "
                "tier DMA writer lands whole records on one device)"
            )
        # mirror columns share the primary's field shapes (ColumnShardStore
        # requires d_ff % tp == 0), so the zero templates are reusable
        self._mirror_arenas: List[Dict[str, jax.Array]] = [
            jax.device_put(arena, dev) for dev, _ in self._mirrors
        ]
        self._tier = pinned_tier
        self._tier_write = self._make_tier_writer() if pinned_tier else None

        # ---- residency state (host) --------------------------------------
        self.slot_to_key: List[Optional[Key]] = [None] * num_slots
        self.key_to_slot: Dict[Key, int] = {}
        self.expert_to_slot = np.full(
            (self.num_layers, self.num_experts), -1, dtype=np.int32
        )  # -1 = not resident; grouped_ffn masks those to a zero
        # contribution, so a speculative dispatch approximates a miss as
        # expert dropout instead of gathering a stale slot's weights
        self._free_slots: List[int] = list(range(num_slots - 1, -1, -1))

        # ---- fetch machinery ---------------------------------------------
        self._lock = threading.Lock()  # protects all residency state
        self._leases = 0  # active dispatch leases (see locked_tree)
        # dispatch priority: a landing's donated write holds _lock across
        # a (relay-slow) program dispatch; when the ENGINE wants to
        # dispatch a step, queued landings yield first — otherwise a
        # prefetch storm serializes ahead of every step dispatch
        # (measured: multi-second step stalls on a congested relay)
        self._intent_lock = threading.Lock()
        self._dispatch_intent = 0
        # serializes EXECUTORS (a continuous batcher's steps vs a direct
        # engine.generate): two clients protecting key sets concurrently
        # could together pin more than num_slots and deadlock acquire —
        # one executor at a time keeps every protected set satisfiable
        self.client_lock = threading.RLock()
        self._cv = threading.Condition(self._lock)
        self._queue: List[Tuple[int, int, int, Key]] = []  # (prio, gen, seq, key)
        self._seq = itertools.count()
        self._gen = 0  # prefetch generation; stale orders are dropped
        self._in_flight: Dict[Key, threading.Event] = {}
        self._escalated: set = set()  # keys a caller is blocked on
        self._errors: Dict[Key, Exception] = {}
        self._pending_fetches = 0  # slots allocated but not yet registered
        self._fetching: set = set()  # keys a worker is actively fetching
        self.current_layer = 0
        self._decoder_matrix: Optional[np.ndarray] = None
        self._shutdown = False
        self.upload_chunk_bytes = int(upload_chunk_bytes)
        self._upload_pool = None
        if self.upload_chunk_bytes > 0 and upload_threads > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._upload_pool = ThreadPoolExecutor(
                max_workers=upload_threads,
                thread_name_prefix="arena-upload",
            )
        # EWMA of end-to-end per-expert fetch seconds (host read + upload +
        # write dispatch) — the engine's adaptive prefetch budget reads this
        self.fetch_seconds_ewma: Optional[float] = None
        self._workers = [
            threading.Thread(target=self._worker, daemon=True, name=f"arena-fetch-{i}")
            for i in range(max(1, num_threads))
        ]
        for w in self._workers:
            w.start()

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def pytree(self) -> Dict[str, jax.Array]:
        """The arena arrays, to be threaded through jit each step."""
        return self._arena

    def column_pytrees(self) -> List[Dict[str, jax.Array]]:
        """Primary + TP-mirror column arrays (one dict per model column,
        each on its column's device, identical shapes and slot layout).
        Consume under locked_tree(), like pytree()."""
        return [self._arena] + list(self._mirror_arenas)

    @property
    def num_workers(self) -> int:
        return len(self._workers)

    @contextmanager
    def locked_tree(self):
        """Yield the arena pytree under a DISPATCH LEASE. Dispatch any
        computation consuming the arena inside this scope: slot writes
        donate the arena buffers, so a worker donation between reading
        `pytree()` and dispatching would hand jit a deleted array.

        Leases are reader-style: they exclude only the donated landing
        writes (deferred until no lease is active), NOT the residency
        bookkeeping — acquire/prefetch/release and the fetch workers' host
        reads + H2D device_put copies all proceed concurrently with a long
        dispatch (round-1 held the residency lock across the whole
        dispatch, stalling every landing for exactly the window prefetch
        should be using). INVARIANT: never block on a fetch (acquire/warm)
        while holding a lease — the landing you would wait for waits for
        your lease."""
        with self._intent_lock:
            self._dispatch_intent += 1
        try:
            with self._lock:
                tree = self._arena
                self._leases += 1
        finally:
            with self._intent_lock:
                self._dispatch_intent -= 1
        try:
            yield tree
        finally:
            with self._cv:
                self._leases -= 1
                if self._leases == 0:
                    self._cv.notify_all()

    @contextmanager
    def dispatch_snapshot(self):
        """locked_tree plus a consistent (slot_rows, resident-set) snapshot
        taken in the same lock scope — what speculative verification needs:
        judge the slot state the program actually consumed, not one a
        concurrently landing prefetch produced."""
        with self._intent_lock:
            self._dispatch_intent += 1
        try:
            with self._lock:
                tree = self._arena
                slot_rows = self.expert_to_slot.copy()
                resident = set(self.key_to_slot)
                self._leases += 1
        finally:
            with self._intent_lock:
                self._dispatch_intent -= 1
        try:
            yield tree, slot_rows, resident
        finally:
            with self._cv:
                self._leases -= 1
                if self._leases == 0:
                    self._cv.notify_all()

    def slot_map(self, moe_layer: int) -> np.ndarray:
        """int32 [E] expert→slot row for one layer (host array; caller
        device_puts it as a step argument)."""
        return self.expert_to_slot[moe_layer]

    def is_resident(self, key: Key) -> bool:
        return key in self.key_to_slot

    def hit_stats(self) -> dict:
        return self.policy.stats.as_dict()

    def node_stats(self) -> dict:
        """Per-(layer, expert) counter planes + hit-rate matrix (the
        reference's GetHitRate per-node export, model_topology.cpp:246-268)."""
        out = {k: v.copy() for k, v in self.policy.node_stats.items()}
        out["hit_rate_matrix"] = self.policy.hit_rate_matrix()
        return out

    def set_context(self, layer: int, decoder_matrix: Optional[np.ndarray] = None):
        """Update the eviction-scoring context (current layer + the active
        sequence's decoder activation matrix)."""
        self.current_layer = layer
        if decoder_matrix is not None:
            self._decoder_matrix = decoder_matrix

    def acquire(self, keys: Sequence[Key], layer: int) -> None:
        """Block until every key is resident. On-demand misses are fetched
        at top priority. Marks keys protected until release()."""
        events = []
        with self._cv:
            self.current_layer = layer
            for key in keys:
                self.policy.protect(key)
                hit = key in self.key_to_slot
                self.policy.record_visit(key, hit=hit)
                if hit:
                    continue
                # a fresh fetch supersedes any error a PREVIOUS failed
                # acquire left for this key (e.g. exhaustion while a
                # speculative step over-protected; by now the protections
                # are released and the retry can succeed)
                self._errors.pop(key, None)
                ev = self._in_flight.get(key)
                if ev is None:
                    ev = threading.Event()
                    self._in_flight[key] = ev
                # (re-)enqueue at top priority; a duplicate entry is fine,
                # the worker skips already-resident keys
                self._escalated.add(key)
                if key in self._fetching:
                    # a worker already started a (prefetch-priority) read:
                    # boost the in-flight native read to on-demand
                    esc = getattr(self.store, "escalate", None)
                    if esc is not None:
                        esc(*key)
                heapq.heappush(
                    self._queue,
                    (PRIO_ONDEMAND, self._gen, next(self._seq), key),
                )
                self._cv.notify_all()
                events.append((key, ev))
        for key, ev in events:
            if not ev.wait(timeout=300.0):
                raise TimeoutError(f"expert fetch timed out for {key}")
            # resolve under the lock: a concurrent acquire for the same key
            # may have consumed our error and re-enqueued a fresh fetch —
            # follow the new in-flight event instead of mis-reading the
            # missing error as success
            while True:
                with self._lock:
                    if key in self.key_to_slot:
                        break
                    err = self._errors.pop(key, None)
                    nxt = self._in_flight.get(key)
                if err is not None:
                    raise err
                if nxt is None:
                    raise RuntimeError(
                        f"expert fetch for {key} neither landed nor errored"
                    )
                if not nxt.wait(timeout=300.0):
                    raise TimeoutError(f"expert fetch timed out for {key}")

    def try_acquire(
        self, keys: Sequence[Key], layer: int, timeout: float
    ) -> Tuple[List[Key], List[Key]]:
        """acquire() with a deadline: returns (resident, missing). Missing
        keys are unprotected and NOT resident — their fetches continue in
        the background for future steps. The caller must release() only
        the resident list. Powers the run-on-host escape hatch
        (runtime/host_exec.py): a miss bounds the step's latency at
        `timeout` + a small host GEMM instead of a full fetch."""
        events = []
        with self._cv:
            self.current_layer = layer
            for key in keys:
                self.policy.protect(key)
                hit = key in self.key_to_slot
                self.policy.record_visit(key, hit=hit)
                if hit:
                    continue
                self._errors.pop(key, None)
                ev = self._in_flight.get(key)
                if ev is None:
                    ev = threading.Event()
                    self._in_flight[key] = ev
                self._escalated.add(key)
                if key in self._fetching:
                    esc = getattr(self.store, "escalate", None)
                    if esc is not None:
                        esc(*key)
                heapq.heappush(
                    self._queue,
                    (PRIO_ONDEMAND, self._gen, next(self._seq), key),
                )
                self._cv.notify_all()
                events.append((key, ev))
        deadline = _time.perf_counter() + timeout
        missing: List[Key] = []
        for key, ev in events:
            remaining = deadline - _time.perf_counter()
            landed = ev.wait(max(0.0, remaining))
            with self._lock:
                if landed and key in self.key_to_slot:
                    continue
                # timed out or errored (e.g. exhaustion): hand to the host
                self.policy.unprotect(key)
                self._escalated.discard(key)
                self._errors.pop(key, None)
                missing.append(key)
        resident = [k for k in keys if k not in set(missing)]
        return resident, missing

    def release(self, keys: Sequence[Key]) -> None:
        with self._lock:
            for key in keys:
                self.policy.unprotect(key)

    def reset_policy(self, policy: str) -> None:
        """Swap the eviction policy in place: fresh stats/counters, same
        residency (resident keys re-registered in the new policy). For
        A/B policy comparisons on one engine — the jitted programs and the
        warmed slots carry over, so the second leg measures the POLICY,
        not a recompile. Call only between steps (no active protections
        or in-flight fetches the caller still waits on)."""
        with self._lock:
            new = ExpertCachePolicy(
                self.num_layers,
                self.num_experts,
                num_encoder_layers=self.store.meta.get(
                    "num_encoder_moe_layers", 0
                ),
                policy=policy,
            )
            for key in self.key_to_slot:
                new.on_insert(key, prefetched=False)
            self.policy = new

    def swap_policy(self, new_policy) -> "ExpertCachePolicy":
        """Swap in a PREVIOUSLY BUILT policy object, preserving its learned
        state (frequency counters, per-node stats, clock) and reconciling
        its residency picture with the arena's current slots. Returns the
        outgoing policy object (equally preserved) so the caller can swap
        it back later.

        This is what interleaved A/B/A/B policy measurement needs
        (VERDICT r3 item 3): `reset_policy` starts the incoming policy
        COLD every swap, so alternating windows would re-pay the
        frequency warm-up each time and the comparison would measure the
        warm-up, not the policy. With swap, each policy accumulates its
        own state across its windows while relay-load drift cancels in
        the pairing. Live protections and prefetch candidates carry over
        (they describe the ARENA's current clients, not the policy)."""
        from moe_infinity_tpu.memory.cache_policy import ExpertCachePolicy

        assert isinstance(new_policy, ExpertCachePolicy)
        with self._lock:
            old = self.policy
            resident_now = set(self.key_to_slot)
            known = set(new_policy.resident)
            for key in resident_now - known:
                new_policy.on_insert(key, prefetched=False)
            for key in known - resident_now:
                # silent removal: the OTHER policy evicted it; counting it
                # as this policy's eviction would poison the A/B stats
                new_policy.resident.pop(key, None)
                new_policy._was_prefetched.discard(key)
            new_policy.protected_ondemand = dict(old.protected_ondemand)
            new_policy.candidates = set(old.candidates)
            self.policy = new_policy
            return old

    def prefetch(self, orders: Sequence[Key], protect: Sequence[Key] = ()) -> None:
        """Replace the prefetch plan: new candidate protection set, stale
        queued prefetches dropped (reference ReplaceCacheCandidates +
        EnqueuePrefetch, archer_prefetch_handle.cpp:195-218).

        protect: additional keys to candidate-protect WITHOUT fetching —
        the speculative engines pass the accepted block's expert union so
        a prefetch landing can never evict the live hot set (the round-4
        chip diagnosis measured 2x more decode evictions than misses: at
        hot-set≈capacity every speculative insert displaced a hot expert,
        which came back as a miss one block later)."""
        with self._cv:
            self._gen += 1
            self.policy.replace_candidates(list(orders) + list(protect))
            for key in orders:
                if key in self.key_to_slot or key in self._in_flight:
                    continue
                self._in_flight[key] = threading.Event()
                heapq.heappush(
                    self._queue, (PRIO_PREFETCH, self._gen, next(self._seq), key)
                )
            self._cv.notify_all()

    def warm(self, keys: Sequence[Key]) -> None:
        """Synchronously load keys (initial placement / tests)."""
        self.prefetch(keys)
        with self._cv:
            events = [self._in_flight[k] for k in keys if k in self._in_flight]
        for ev in events:
            ev.wait(timeout=300.0)

    def shutdown(self) -> None:
        with self._cv:
            self._shutdown = True
            self._cv.notify_all()
        for w in self._workers:
            w.join(timeout=5.0)
        if self._upload_pool is not None:
            self._upload_pool.shutdown(wait=False)

    # ------------------------------------------------------------------
    # worker internals
    # ------------------------------------------------------------------
    def _make_tier_writer(self):
        """One jitted program: slice a record out of the pinned_host tier
        and write every role into arena slot `slot` (donated) — the whole
        fetch is device-side DMA. Mirrors _write_slot's dequant-on-write
        and int4 semantics."""
        hbm = self._tier.hbm_sharding()
        role_to_tail = dict(self._role_to_tail)
        arena_keys = list(self._arena)

        def write(arena, tier, rec_idx, slot):
            out = {}
            for akey in arena_keys:
                a = arena[akey]
                rec = jax.lax.dynamic_slice_in_dim(
                    tier[role_to_tail[akey]], rec_idx, 1, 0
                )
                rec = jax.device_put(rec, hbm)
                base = akey[:-1] if akey.endswith("4") else akey
                dq_tail = role_to_tail.get(base + "_scale")
                if dq_tail is not None and (base + "_scale") not in arena:
                    sc = jax.device_put(
                        jax.lax.dynamic_slice_in_dim(
                            tier[dq_tail], rec_idx, 1, 0
                        ),
                        hbm,
                    )
                    v = rec
                    if v.ndim == 3 and v.shape[-1] * 2 == a.shape[-1]:
                        from moe_infinity_tpu.ops.moe import unpack_int4

                        v = unpack_int4(v)
                    v = (v.astype(jnp.float32) * sc).astype(a.dtype)
                else:
                    v = rec.astype(a.dtype)
                idx = (0,) * a.ndim
                out[akey] = jax.lax.dynamic_update_slice(
                    a, v, (slot,) + idx[1:]
                )
            return out

        return jax.jit(write, donate_argnums=0)

    def _yield_to_dispatch(self) -> None:
        """Landings defer while an engine dispatch is waiting for the
        residency lock (the landing's donated write holds it across a
        relay program dispatch; the engine's step must not queue behind a
        prefetch storm). Bounded: intent is held only while ACQUIRING the
        lock, never across the engine's own dispatch."""
        while True:
            with self._intent_lock:
                if self._dispatch_intent == 0:
                    return
            _time.sleep(0.001)

    def _worker(self) -> None:
        while True:
            with self._cv:
                while not self._queue and not self._shutdown:
                    self._cv.wait()
                if self._shutdown:
                    return
                prio, gen, _, key = heapq.heappop(self._queue)
                if (
                    key in self.key_to_slot
                    or key not in self._in_flight
                    or key in self._fetching
                ):
                    # resident, stale, or another worker is already fetching
                    # it (the waiter shares the same in-flight event)
                    continue
                if (
                    prio == PRIO_PREFETCH
                    and gen != self._gen
                    and key not in self._escalated
                ):
                    # stale prefetch plan and no caller blocked on it — drop
                    del self._in_flight[key]
                    continue
                ondemand = (
                    prio == PRIO_ONDEMAND or key in self._escalated
                )
                slot = self._allocate_slot_locked(key, ondemand)
                if slot is None and self._pending_fetches > 0:
                    # other fetches hold allocated-but-unregistered slots;
                    # once they land their nodes become evictable — retry
                    heapq.heappush(
                        self._queue, (prio, gen, next(self._seq), key)
                    )
                    self._cv.wait(timeout=0.02)
                    continue
                if slot is None:
                    if prio == PRIO_ONDEMAND or key in self._escalated:
                        # surface in the blocked caller, keep the worker alive
                        self._errors[key] = RuntimeError(
                            f"arena exhausted: no evictable slot for {key} "
                            f"({self.num_slots} slots, "
                            f"{len(self.policy.protected_ondemand)} protected)"
                        )
                        self._escalated.discard(key)
                        ev = self._in_flight.pop(key, None)
                        if ev is not None:
                            ev.set()
                        continue
                    # prefetch can't find a victim — drop the order
                    del self._in_flight[key]
                    continue
                self._pending_fetches += 1
                self._fetching.add(key)
            t_fetch = _time.perf_counter()
            layer, expert = key
            tier_row = (
                self._tier.record_index(layer, expert)
                if self._tier is not None
                else None
            )
            if tier_row is not None:
                # pinned-host tier: the whole fetch is one device-side DMA
                # program (no host read, no relay crossing). tier_row is
                # None for records that didn't fit the tier's byte budget —
                # those fall through to the host-read store path below.
                seg_fields, local_idx = self._tier.segment_for(tier_row)
                self._yield_to_dispatch()
                with self._cv:
                    while self._leases > 0:  # donation must not race
                        self._cv.wait()
                    self._arena = self._tier_write(
                        self._arena, seg_fields, jnp.int32(local_idx),
                        jnp.int32(slot),
                    )
                self._finish_fetch(key, slot, prio, t_fetch)
                continue
            # host read + cast outside the lock (page-cache fault / RAM
            # copy; sched mode orders reads by priority with block-granular
            # preemption in the native scheduler)
            record = self.store.get_expert(layer, expert, prio=prio, gen=gen)
            new = self._cast_record(record)
            # TP column mirrors: the 1/tp slices of the same base record
            # (shared base read via _BaseRecordCache) land on each
            # column's device at the SAME slot
            mirror_new = [
                self._cast_record(
                    mstore.get_expert(layer, expert, prio=prio, gen=gen)
                )
                for _dev, mstore in self._mirrors
            ]
            # H2D copies dispatch + proceed outside the lock so concurrent
            # workers' uploads overlap on the interconnect
            self._land_record(new, slot, mirror_new)
            self._finish_fetch(key, slot, prio, t_fetch)

    def _finish_fetch(self, key: Key, slot: int, prio: int, t_fetch: float):
        dt = _time.perf_counter() - t_fetch
        with self._lock:
            self.fetch_seconds_ewma = (
                dt
                if self.fetch_seconds_ewma is None
                else 0.8 * self.fetch_seconds_ewma + 0.2 * dt
            )
            self.slot_to_key[slot] = key
            self.key_to_slot[key] = slot
            self.expert_to_slot[key] = slot
            self.policy.on_insert(key, prefetched=(prio == PRIO_PREFETCH))
            self._escalated.discard(key)
            self._pending_fetches -= 1
            self._fetching.discard(key)
            ev = self._in_flight.pop(key, None)
            self._cv.notify_all()  # wake workers waiting on pending slots
        if ev is not None:
            ev.set()

    def _cast_record(self, record: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        new = {}
        for akey, tail in self._role_to_tail.items():
            a = record[tail]
            base = akey[:-1] if akey.endswith("4") else akey
            quantized = (base + "_scale") in self._role_to_tail
            if quantized and not akey.endswith("_scale"):
                pass  # upload quantized bytes exactly as stored
            elif akey in self._arena:
                # unquantized role / arena-held scale: cast on host so
                # the upload already carries arena-dtype bytes
                target_np = np_dtype(jnp.dtype(self._arena[akey].dtype).name)
                if a.dtype != target_np:
                    a = a.astype(target_np)
            new[akey] = a
        return new

    def _land_record(
        self,
        new: Dict[str, np.ndarray],
        slot: int,
        mirror_new: Optional[List[Dict[str, np.ndarray]]] = None,
    ) -> None:
        """Upload one expert record and write it into arena slot `slot`.

        Roles larger than `upload_chunk_bytes` are split row-wise and
        device_put in parallel on the upload pool; each chunk is written
        straight into its arena rows (no whole-record device staging
        buffer). Small records keep the proven whole-record path. Scales of
        dequant-on-write roles ride along and are fused into the write."""
        pool = self._upload_pool
        chunked = pool is not None and any(
            a.ndim == 2 and a.nbytes > self.upload_chunk_bytes
            for akey, a in new.items()
            if akey in self._arena
        )
        slot_i = jnp.int32(slot)
        # TP mirror columns: 1/tp-sized records, whole-record path; copies
        # dispatch outside the lock, writes join the same lease window
        dev_mirror = [
            jax.device_put(mn, self._mirrors[m][0])
            for m, mn in enumerate(mirror_new or [])
        ]
        if not chunked:
            dev_new = jax.device_put(new, self.device)
            self._yield_to_dispatch()
            with self._cv:
                while self._leases > 0:  # donation must not race a dispatch
                    self._cv.wait()
                self._arena = _write_slot(self._arena, dev_new, slot_i)
                for m, dn in enumerate(dev_mirror):
                    self._mirror_arenas[m] = _write_slot(
                        self._mirror_arenas[m], dn, slot_i
                    )
            return

        def put(h):
            return pool.submit(jax.device_put, h, self.device)

        uploads = []  # (akey, row_off, future, dequant_scale_future)
        for akey, a in new.items():
            if akey not in self._arena:
                continue  # scale consumed by a dequant-on-write role
            dq = None
            if (akey + "_scale") in new and (akey + "_scale") not in self._arena:
                dq = put(new[akey + "_scale"])
            if a.ndim == 2 and a.nbytes > self.upload_chunk_bytes:
                rows = max(1, self.upload_chunk_bytes // (a.nbytes // a.shape[0]))
                for off in range(0, a.shape[0], rows):
                    uploads.append(
                        (akey, off, put(np.ascontiguousarray(a[off : off + rows])), dq)
                    )
            else:
                uploads.append((akey, 0, put(a), dq))
        self._yield_to_dispatch()
        with self._cv:
            while self._leases > 0:  # donation must not race a dispatch
                self._cv.wait()
            arena = dict(self._arena)
            for akey, off, fut, dq in uploads:
                if dq is not None:
                    arena[akey] = _write_rows_dq(
                        arena[akey], fut.result(), dq.result(),
                        slot_i, jnp.int32(off),
                    )
                else:
                    arena[akey] = _write_rows(
                        arena[akey], fut.result(), slot_i, jnp.int32(off)
                    )
            self._arena = arena
            for m, dn in enumerate(dev_mirror):
                self._mirror_arenas[m] = _write_slot(
                    self._mirror_arenas[m], dn, slot_i
                )

    def _allocate_slot_locked(
        self, key: Key, ondemand: bool = True
    ) -> Optional[int]:
        if self._free_slots:
            return self._free_slots.pop()
        victims = self.policy.pick_victims(
            1, self.current_layer, self._decoder_matrix
        )
        if not victims:
            if not ondemand:
                # a PREFETCH must never displace candidate-protected keys
                # (the live hot set): drop the order instead
                return None
            # fall back: evict anything not on-demand-protected
            for cand, slot in self.key_to_slot.items():
                if cand not in self.policy.protected_ondemand:
                    victims = [cand]
                    break
            if not victims:
                return None
        victim = victims[0]
        slot = self.key_to_slot.pop(victim)
        self.slot_to_key[slot] = None
        self.expert_to_slot[victim] = -1  # masked to zero contribution
        self.policy.on_evict(victim)
        return slot
