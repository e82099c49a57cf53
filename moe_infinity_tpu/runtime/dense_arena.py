"""Dense-layer paging: a slot arena for whole transformer blocks.

The reference pages DENSE (non-expert) layers from SSD→GPU exactly like
experts — dense nodes are Nodes in the same topology, placed and evicted
by the task scheduler (/root/reference/core/model/model_topology.cpp:
402-548, 518-530; RemoveCachedDenseNode task_scheduler.cpp:319-378) —
which is how it serves OPT-66B-class models on a 24 GB GPU. Round 1
required the full dense side resident; this arena removes that ceiling.

TPU-native design (same indirection trick as the expert arena): one
fixed-shape device array per layer-tree leaf — ``[num_slots, *leaf]`` —
and a host slot table layer→slot. A jitted stage takes (arena_leaves,
slot) and rebuilds the layer pytree with ``leaf[slot]`` inside the trace:
dynamic-slice on the major axis is an offset view XLA reads in place, so
ONE compiled program serves every layer at any residency state.

Access is strictly sequential (0,1,…,L-1 every step), so the policy is a
cyclic-distance ring: evict the resident layer whose next use is furthest
away ((li - current) mod L maximal — i.e. the block just behind the
clock), prefetch ``ahead`` layers past the clock. Donated landings defer
to dispatch leases exactly like ExpertArena.locked_tree.

Heterogeneous stacks (e.g. DeepSeek's leading dense-FFN block vs its MoE
blocks) are handled by grouping layers on their (treedef, shapes, dtypes)
signature; each group gets its own arena arrays and the engine keys its
jit cache on the group id.
"""

from __future__ import annotations

import functools
import heapq
import itertools
import threading
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from moe_infinity_tpu.utils.logger import get_logger

logger = get_logger("dense_arena")

PRIO_ONDEMAND = 0
PRIO_PREFETCH = 1


@functools.partial(jax.jit, donate_argnums=0)
def _write_leaf(buf: jax.Array, v: jax.Array, slot) -> jax.Array:
    idx = (slot,) + (0,) * (buf.ndim - 1)
    return jax.lax.dynamic_update_slice(buf, v[None].astype(buf.dtype), idx)


def _signature(tree) -> Tuple:
    leaves, treedef = jax.tree.flatten(tree)
    return (
        str(treedef),
        tuple((tuple(l.shape), str(jnp.asarray(l).dtype)) for l in leaves),
    )


class DenseLayerArena:
    """Slot arena over host-resident per-layer parameter trees."""

    def __init__(
        self,
        layers_host: List[Any],  # list of per-layer pytrees (host arrays)
        num_slots: int,
        *,
        device: Optional[jax.Device] = None,
        num_threads: int = 2,
        ahead: Optional[int] = None,
    ):
        if num_slots < 2:
            raise ValueError("dense paging needs num_slots >= 2")
        self.L = len(layers_host)
        self.device = device or jax.local_devices()[0]  # local: global [0] may be another process's
        self.ahead = ahead if ahead is not None else max(1, num_slots - 2)

        # ---- group layers by structure signature ------------------------
        self._group_of: List[int] = []
        self._groups: List[dict] = []  # {treedef, leaves_shape, arena, slots}
        sig_to_gid: Dict[Tuple, int] = {}
        self._host: List[List[np.ndarray]] = []
        for li, lt in enumerate(layers_host):
            leaves, treedef = jax.tree.flatten(lt)
            self._host.append([np.asarray(l) for l in leaves])
            sig = _signature(lt)
            gid = sig_to_gid.get(sig)
            if gid is None:
                gid = len(self._groups)
                sig_to_gid[sig] = gid
                self._groups.append({"treedef": treedef, "members": []})
            self._group_of.append(gid)
            self._groups[gid]["members"].append(li)

        # slots are split across groups proportionally to membership, with
        # a minimum of 2 each (the ring must be able to advance) and no
        # more than the group's layer count; overshoot from the minimums
        # is shaved off the largest groups
        wants = [
            max(2, min(len(g["members"]),
                       round(num_slots * len(g["members"]) / self.L)))
            for g in self._groups
        ]
        while sum(wants) > max(num_slots, 2 * len(self._groups)):
            i = int(np.argmax(wants))
            if wants[i] <= 2:
                break
            wants[i] -= 1
        for g, want in zip(self._groups, wants):
            leaves = self._host[g["members"][0]]
            g["arena"] = [
                jax.device_put(
                    jnp.zeros((want,) + l.shape, l.dtype), self.device
                )
                for l in leaves
            ]
            g["num_slots"] = want
            g["free"] = list(range(want - 1, -1, -1))
        self.num_slots = sum(g["num_slots"] for g in self._groups)

        # ---- residency state ---------------------------------------------
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._leases = 0
        # serializes executors (same contract as ExpertArena.client_lock)
        self.client_lock = threading.RLock()
        self.layer_to_slot: Dict[int, int] = {}
        self._protected: set = set()
        self._queue: List[Tuple[int, int, int]] = []  # (prio, seq, layer)
        self._seq = itertools.count()
        self._in_flight: Dict[int, threading.Event] = {}
        self._fetching: set = set()
        self._errors: Dict[int, Exception] = {}
        self._clock = 0  # current layer
        self._shutdown = False
        self.hits = 0
        self.misses = 0
        self._workers = [
            threading.Thread(
                target=self._worker, daemon=True, name=f"dense-fetch-{i}"
            )
            for i in range(max(1, num_threads))
        ]
        for w in self._workers:
            w.start()

    # ------------------------------------------------------------------
    def group_of(self, li: int) -> int:
        return self._group_of[li]

    def treedef(self, gid: int):
        return self._groups[gid]["treedef"]

    def tree(self, gid: int) -> List[jax.Array]:
        """The group's arena leaves (pass into jit each step)."""
        return self._groups[gid]["arena"]

    def lease(self):
        """Dispatch-lease context (see ExpertArena.locked_tree): donated
        landings defer until no lease is active. Never block on acquire()
        while holding a lease."""
        return _Lease(self)

    def acquire(self, li: int) -> int:
        """Block until layer li is resident; returns its slot and protects
        it until release(). Also advances the prefetch clock."""
        with self._cv:
            self._clock = li
            self._protected.add(li)
            slot = self.layer_to_slot.get(li)
            if slot is not None:
                self.hits += 1
            else:
                self.misses += 1
                self._errors.pop(li, None)
                ev = self._in_flight.get(li)
                if ev is None:
                    ev = self._in_flight[li] = threading.Event()
                heapq.heappush(
                    self._queue, (PRIO_ONDEMAND, next(self._seq), li)
                )
                self._cv.notify_all()
            # schedule the window ahead
            for d in range(1, self.ahead + 1):
                nxt = (li + d) % self.L
                if (
                    nxt not in self.layer_to_slot
                    and nxt not in self._in_flight
                ):
                    self._in_flight[nxt] = threading.Event()
                    heapq.heappush(
                        self._queue, (PRIO_PREFETCH, next(self._seq), nxt)
                    )
                    self._cv.notify_all()
            if slot is not None:
                return slot
            ev = self._in_flight.get(li) or threading.Event()
        if not ev.wait(timeout=300.0):
            raise TimeoutError(f"dense layer fetch timed out for {li}")
        with self._lock:
            slot = self.layer_to_slot.get(li)
            if slot is None:
                err = self._errors.pop(li, None)
                raise err or RuntimeError(
                    f"dense layer {li} neither landed nor errored"
                )
            return slot

    def release(self, li: int) -> None:
        with self._lock:
            self._protected.discard(li)

    def shutdown(self) -> None:
        with self._cv:
            self._shutdown = True
            self._cv.notify_all()
        for w in self._workers:
            w.join(timeout=5.0)

    def stats(self) -> dict:
        total = self.hits + self.misses
        return {
            "dense_hits": self.hits,
            "dense_misses": self.misses,
            "dense_hit_rate": self.hits / total if total else 1.0,
        }

    # ------------------------------------------------------------------
    def _worker(self) -> None:
        while True:
            with self._cv:
                while not self._queue and not self._shutdown:
                    self._cv.wait()
                if self._shutdown:
                    return
                prio, _, li = heapq.heappop(self._queue)
                if (
                    li in self.layer_to_slot
                    or li in self._fetching
                    or li not in self._in_flight
                ):
                    continue
                slot = self._allocate_slot_locked(li)
                if slot is None:
                    if prio == PRIO_ONDEMAND:
                        # wait for a landing/release to free something
                        heapq.heappush(
                            self._queue, (prio, next(self._seq), li)
                        )
                        self._cv.wait(timeout=0.02)
                        continue
                    del self._in_flight[li]  # prefetch: drop the order
                    continue
                self._fetching.add(li)
            gid = self._group_of[li]
            try:
                dev_leaves = jax.device_put(self._host[li], self.device)
                with self._cv:
                    while self._leases > 0:
                        self._cv.wait()
                    arena = self._groups[gid]["arena"]
                    self._groups[gid]["arena"] = [
                        _write_leaf(a, v, jnp.int32(slot))
                        for a, v in zip(arena, dev_leaves)
                    ]
                    self.layer_to_slot[li] = slot
                    self._fetching.discard(li)
                    ev = self._in_flight.pop(li, None)
                    self._cv.notify_all()
                if ev is not None:
                    ev.set()
            except Exception as e:  # noqa: BLE001 — surface in the waiter
                with self._cv:
                    self._errors[li] = e
                    self._fetching.discard(li)
                    self._groups[gid]["free"].append(slot)
                    ev = self._in_flight.pop(li, None)
                    self._cv.notify_all()
                if ev is not None:
                    ev.set()

    def _allocate_slot_locked(self, li: int) -> Optional[int]:
        g = self._groups[self._group_of[li]]
        if g["free"]:
            return g["free"].pop()
        # evict the group member whose next use is furthest in the cyclic
        # layer order (the block just behind the clock)
        victim, best = None, -1
        for cand, slot in self.layer_to_slot.items():
            if self._group_of[cand] != self._group_of[li]:
                continue
            if cand in self._protected or cand in self._fetching:
                continue
            dist = (cand - self._clock) % self.L
            if dist > best:
                victim, best = cand, dist
        if victim is None:
            return None
        return self.layer_to_slot.pop(victim)


class _Lease:
    def __init__(self, arena: DenseLayerArena):
        self._a = arena

    def __enter__(self):
        a = self._a
        with a._lock:
            a._leases += 1
        return self

    def __exit__(self, *exc):
        a = self._a
        with a._cv:
            a._leases -= 1
            if a._leases == 0:
                a._cv.notify_all()
        return False


class PagedDenseEngine:
    """Stepper for dense-only models (OPT) whose layer stack exceeds the
    HBM budget: every block pages through a DenseLayerArena with
    layer-ahead prefetch. ONE compiled program per layer-structure group
    serves all layers (the slot index is data). The reference's dense-node
    paging regime (model_topology.cpp:518-530) for OPT-66B-class serving."""

    speculative = False

    def __init__(self, model, resident_params, arena: DenseLayerArena):
        self.model = model
        self.params = resident_params  # top-level params; layers live in
        self.arena = arena             # the arena
        self._embed = jax.jit(model.embed_step)
        self._head = jax.jit(model.head)
        self._layer_jits: Dict[int, Any] = {}

    def _layer_fn(self, gid: int):
        fn = self._layer_jits.get(gid)
        if fn is None:
            treedef = self.arena.treedef(gid)
            model = self.model

            def step(arena_leaves, slot, x, kv, positions, kv_len):
                pl = jax.tree.unflatten(
                    treedef, [a[slot] for a in arena_leaves]
                )
                return model.dense_layer(pl, x, kv, positions, kv_len)

            fn = self._layer_jits[gid] = jax.jit(step, donate_argnums=(3,))
        return fn

    # ---- Stepper protocol -------------------------------------------------
    def init_cache(self, batch: int, max_len: int):
        return self.model.init_cache(batch, max_len)

    def begin_sequences(self, batch: int):
        return None

    def end_sequences(self, seq_ids) -> None:
        pass

    def forward(self, tokens, positions, kv_caches, kv_len, seq_ids=None):
        x = self._embed(self.params, tokens, positions)
        for li in range(self.model.spec.num_layers):
            slot = self.arena.acquire(li)
            gid = self.arena.group_of(li)
            try:
                with self.arena.lease():
                    x, kv_caches[li] = self._layer_fn(gid)(
                        self.arena.tree(gid), jnp.int32(slot), x,
                        kv_caches[li], positions, kv_len,
                    )
            finally:
                self.arena.release(li)
        return self._head(self.params, x), kv_caches, None

    def stats(self) -> dict:
        return self.arena.stats()

    def hit_rate(self) -> float:
        return self.arena.stats()["dense_hit_rate"]
