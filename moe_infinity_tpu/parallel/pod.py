"""Pod-scale expert-parallel offload coordination.

SURVEY.md §7's hard part: with experts sharded over the `expert` mesh axis
AND offloaded per host, an expert miss on ONE host stalls the collective
for EVERY host. Three pieces close the gap:

* **Host-affine placement** (PodExpertPlan): each host's arena holds only
  the experts whose shard rows live on its local devices, so host RAM and
  fetch bandwidth scale with the pod instead of replicating the store.
* **Prefetch consensus** (PodPrefetchCoordinator): the host that runs the
  predictor publishes each step's expert set through the jax.distributed
  KV store (PrefetchHints); every host warms its shard and joins a named
  barrier BEFORE dispatching the collective step — a miss is discovered
  host-locally, never inside the all-to-all.
* **Run-on-host escape hatch** (runtime/host_exec.py, engine
  host_fallback): a host that cannot land its shard in time contributes
  the expert from its own CPU, bounding the barrier wait.

The reference's cross-node story is dormant torch-RPC
(/root/reference/moe_infinity/distributed/, README.md:18); it has no
consensus protocol at all.
"""

from __future__ import annotations

from typing import Callable, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from moe_infinity_tpu.parallel.multihost import PrefetchHints

Key = Tuple[int, int]


class PodExpertPlan:
    """Which experts belong to THIS process under an `expert`-axis mesh.

    Experts stack on dim 0 and shard over the `expert` axis, so expert e
    lives at expert-coordinate ``e // (E // ep)``. A process owns the
    coordinates its local devices occupy."""

    def __init__(self, mesh, num_experts: int):
        ep = mesh.shape.get("expert", 1)
        if num_experts % ep != 0:
            raise ValueError(
                f"num_experts={num_experts} must divide over the expert "
                f"axis ({ep})"
            )
        self.num_experts = num_experts
        self.block = num_experts // ep
        axis = list(mesh.axis_names).index("expert")
        grid = np.asarray(mesh.devices)
        local = {d.id for d in mesh.local_devices}
        coords = set()
        it = np.nditer(
            np.vectorize(lambda d: d.id)(grid), flags=["multi_index"]
        )
        for v in it:
            if int(v) in local:
                coords.add(it.multi_index[axis])
        self.local_coords = frozenset(coords)

    def owner_coord(self, expert: int) -> int:
        return expert // self.block

    def is_local(self, key: Key) -> bool:
        return self.owner_coord(key[1]) in self.local_coords

    def filter_local(self, keys: Iterable[Key]) -> List[Key]:
        return [k for k in keys if self.is_local(k)]

    def local_experts(self) -> List[int]:
        return [
            e
            for e in range(self.num_experts)
            if self.owner_coord(e) in self.local_coords
        ]


class PodPrefetchCoordinator:
    """Step-synchronized prefetch across hosts.

    Protocol per step: the LEADER (the host running the tracer/predictor)
    calls ``lead(step, keys)``; every host (leader included) then calls
    ``ensure(step)`` which fetches the published set, warms its own shard
    in its arena, and joins the step barrier. When every host returns from
    ensure(), every routed expert's shard is resident somewhere — the
    collective step can dispatch without a mid-all-to-all stall."""

    def __init__(
        self,
        arena,
        plan: PodExpertPlan,
        *,
        hints: Optional[PrefetchHints] = None,
        barrier_timeout_ms: int = 120_000,
        namespace: str = "moe_pod",
    ):
        self.arena = arena
        self.plan = plan
        self.hints = hints or PrefetchHints(namespace=f"{namespace}/hints")
        self.namespace = namespace
        self.barrier_timeout_ms = barrier_timeout_ms
        try:
            from jax._src.distributed import global_state

            self._client = global_state.client
        except Exception:  # noqa: BLE001 — single-process fallback
            self._client = None

    def lead(self, step: int, keys: Sequence[Key]) -> None:
        self.hints.publish(step, keys)

    def ensure(self, step: int, on_miss: Optional[Callable] = None) -> List[Key]:
        """Warm this host's shard of the step's expert set, then join the
        step barrier. Returns the local keys that were warmed. on_miss:
        called with keys that could not be made resident (the caller wires
        them into the host-exec escape hatch instead of failing)."""
        keys = self.hints.fetch(step)
        mine = self.plan.filter_local(keys)
        if mine:
            try:
                self.arena.warm(mine)
            except Exception:  # noqa: BLE001 — degraded is not fatal here
                pass  # residency re-checked below
        failed = [k for k in mine if not self.arena.is_resident(k)]
        if failed and on_miss is not None:
            on_miss(failed)
        self.barrier(step)
        return mine

    def barrier(self, step: int) -> None:
        if self._client is None:
            return
        self._client.wait_at_barrier(
            f"{self.namespace}/step/{step}", self.barrier_timeout_ms
        )
