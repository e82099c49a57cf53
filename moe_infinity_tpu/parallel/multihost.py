"""Multi-host initialization and pod-wide prefetch coordination.

The reference's cross-node story is dormant torch-RPC
(/root/reference/moe_infinity/distributed/, README.md:18 "distributed
inference is currently not supported"). Here multi-host is the same SPMD
program: every host runs the identical jitted step over a global
(data, model, expert) mesh; XLA routes collectives over ICI within a slice
and DCN across slices. Host-side coordination (which experts to prefetch
into each host's arena) rides jax.distributed's built-in KV store.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

import jax

from moe_infinity_tpu.parallel.mesh import MeshPlan, make_mesh


def init_multihost(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op if already initialized or single
    process). On TPU pods the arguments auto-detect from the metadata
    server; pass them explicitly for CPU multi-process tests."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized


def global_mesh(plan: MeshPlan):
    """Mesh over ALL addressable devices across hosts. Axis order places
    `expert` innermost so expert-parallel all-to-all/psum traffic stays on
    ICI within a slice — except under TP x EP (model > 1), where `model`
    goes innermost instead: a TP column pair psums every layer (the
    chattiest axis) and the column-sharded arenas require each
    expert-coordinate's columns to live on one host (parallel/pod.py)."""
    return make_mesh(
        plan, devices=jax.devices(), tp_inner=plan.model > 1
    )


class PrefetchHints:
    """Pod-wide prefetch consensus (SURVEY.md §7 hard-parts): the host that
    runs the predictor broadcasts the predicted expert set each step so
    every host warms its shard of the experts *before* the collective —
    an expert miss on one host would stall the all-to-all for all hosts.

    Uses the jax.distributed KV store when available; falls back to a
    process-local dict (single host / tests).
    """

    def __init__(self, namespace: str = "moe_prefetch"):
        self.namespace = namespace
        self._local = {}
        try:
            from jax._src.distributed import global_state

            self._client = global_state.client  # may be None
        except Exception:
            self._client = None

    def publish(self, step: int, keys: Sequence[tuple]) -> None:
        payload = json.dumps([list(k) for k in keys])
        if self._client is not None:
            self._client.key_value_set(f"{self.namespace}/{step}", payload)
        else:
            self._local[step] = payload

    def fetch(self, step: int, timeout_ms: int = 5000):
        if self._client is not None:
            payload = self._client.blocking_key_value_get(
                f"{self.namespace}/{step}", timeout_ms
            )
        else:
            payload = self._local.get(step, "[]")
        return [tuple(k) for k in json.loads(payload)]

    def delete(self, step) -> None:
        """Drop a published entry (bounded KV-store growth for per-step
        protocols; safe to call after a barrier guarantees consumption)."""
        if self._client is not None:
            try:
                self._client.key_value_delete(f"{self.namespace}/{step}")
            except Exception:  # noqa: BLE001 — cleanup is best-effort
                pass
        else:
            self._local.pop(step, None)
