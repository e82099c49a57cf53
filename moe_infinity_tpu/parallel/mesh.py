"""Device mesh construction and sharding plans.

The TPU-native replacement for the reference's placement machinery
(DeviceMapManager round-robin + torch-RPC cross-node paths,
/root/reference/moe_infinity/distributed/devicemap_manager.py:38-73 and
expert_executor.py:60-136, dormant there): placement is *declarative* —
a (data, model, expert) `jax.sharding.Mesh`, NamedShardings on the param
and expert pytrees, and XLA-inserted collectives over ICI. No RPC layer,
no peer-access setup, no per-GPU threads.

Axes:
  data   — batch rows (DP replicas of everything else)
  model  — tensor parallelism for attention/dense weights (heads / ffn dim)
  expert — expert parallelism: dim 0 of every stacked expert array
  seq    — sequence/context parallelism: prefill tokens sharded over the
           time axis, attention via the ring primitive (ops/ring_attention)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA, MODEL, EXPERT, SEQ = "data", "model", "expert", "seq"


@dataclass(frozen=True)
class MeshPlan:
    data: int = 1
    model: int = 1
    expert: int = 1
    seq: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.model * self.expert * self.seq


def make_mesh(
    plan: MeshPlan,
    devices: Optional[Sequence[jax.Device]] = None,
    *,
    tp_inner: bool = False,
) -> Mesh:
    """tp_inner: place `model` innermost (varying fastest) instead of
    outer of `expert`. TP x EP offload serving wants this: one expert's
    GEMM columns split over the model axis every layer (the chattiest
    psum), so its columns should sit on the closest devices — and across
    processes it keeps each expert-coordinate's columns on ONE host,
    which the column-sharded arena requires (parallel/pod.py)."""
    devices = list(devices if devices is not None else jax.devices())
    n = plan.num_devices
    if len(devices) < n:
        raise ValueError(f"need {n} devices for {plan}, have {len(devices)}")
    # `seq` innermost: ring ppermute hops ride neighbor ICI links
    if tp_inner:
        arr = np.array(devices[:n]).reshape(
            plan.data, plan.expert, plan.model, plan.seq
        ).transpose(0, 2, 1, 3)
    else:
        arr = np.array(devices[:n]).reshape(
            plan.data, plan.model, plan.expert, plan.seq
        )
    return Mesh(arr, (DATA, MODEL, EXPERT, SEQ))


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def mixtral_param_shardings(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    """NamedSharding pytree matching MixtralModel.load_params output.

    Dense weights are in HF torch-Linear layout [out, in]:
      q/k/v — out = heads*head_dim → shard out on `model`
      o     — in  = heads*head_dim → shard in  on `model`
      embed/lm_head [V, D] — shard vocab on `model`
      norms / router — replicated
    """
    rep = _ns(mesh)

    def layer_spec(pl):
        return {
            "input_norm": rep,
            "post_norm": rep,
            "q": _ns(mesh, MODEL, None),
            "k": _ns(mesh, MODEL, None),
            "v": _ns(mesh, MODEL, None),
            "o": _ns(mesh, None, MODEL),
            "router": rep,
        }

    out = {
        "embed": _ns(mesh, MODEL, None),
        "final_norm": rep,
        "layers": [layer_spec(pl) for pl in params["layers"]],
    }
    if "lm_head" in params:
        out["lm_head"] = _ns(mesh, MODEL, None)
    return out


def expert_shardings(mesh: Mesh, expert_tree: Dict[str, Any]) -> Dict[str, Any]:
    """Shard every stacked expert array on dim 0 (experts/slots) over the
    `expert` axis; slot maps replicated. With a model axis > 1, the d_ff
    dim (common/arch.py TP_MODEL_DIMS, keyed by the tree's role names)
    additionally shards over `model` — matching grouped_ffn_ep's
    (expert, model) dispatch specs so placement equals the compute
    layout and no reshard happens at dispatch."""
    from moe_infinity_tpu.common.arch import TP_MODEL_DIMS

    tp = mesh.shape.get(MODEL, 1)

    def spec_for(path, leaf):
        if not (hasattr(leaf, "ndim") and leaf.ndim >= 2):
            return _ns(mesh)
        spec = [EXPERT] + [None] * (leaf.ndim - 1)
        if tp > 1:
            key = next(
                (p.key for p in reversed(path) if hasattr(p, "key")), None
            )
            mdim = TP_MODEL_DIMS.get(key)
            if mdim is not None and mdim < leaf.ndim:
                spec[mdim] = MODEL
        return _ns(mesh, *spec)

    return jax.tree_util.tree_map_with_path(spec_for, expert_tree)


def shard_params(tree, shardings):
    """device_put a pytree with its sharding pytree."""
    return jax.tree.map(lambda a, s: jax.device_put(a, s), tree, shardings)
