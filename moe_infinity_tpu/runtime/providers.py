"""Expert weight providers: how MoE layers obtain their expert weights.

The model layer is provider-agnostic: a provider contributes (a) a pytree of
device arrays threaded through jit and (b) a trace-time accessor
`for_layer(tree, moe_layer_id) -> (weights, expert_to_slot, biases)` whose
output feeds ops.moe.grouped_ffn.

* ResidentProvider — all experts of all layers stacked in HBM
  ([L][role][E, ...]); expert_to_slot is the identity. The fast path when
  everything fits (and the layout the single-chip bench uses for dense
  models).
* ArenaProvider (runtime/arena.py) — one shared slot arena + per-layer slot
  tables; the offload path.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from moe_infinity_tpu.common.arch import FFN_ROLES
from moe_infinity_tpu.store.blob import ExpertStore


def role_map_for(store_meta: dict) -> Dict[str, Optional[str]]:
    arch = store_meta["arch"]
    if arch == "switch" and store_meta.get("gated"):
        return FFN_ROLES["switch_gated"]
    return FFN_ROLES[arch]


_ROLE_KEYS = {"gate_or_in": "gate", "up": "up", "down": "down"}
_BIAS_TAILS = {"fc1.bias": "gate_bias", "fc2.bias": "down_bias"}


class ResidentProvider:
    """Stack every expert of every MoE layer into device arrays."""

    def __init__(
        self,
        store: ExpertStore,
        *,
        dequantize: bool = False,
        dtype=jnp.bfloat16,
        device_put=jax.device_put,
        fuse_gateup: bool = False,
    ):
        """fuse_gateup: concatenate gate+up (and scales) per layer so the
        gather/ragged FFN paths do one matmul for both projections (decode
        op-count reduction; exact — see ops.moe.fuse_gateup)."""
        self.store = store
        self.meta = store.meta
        roles = role_map_for(self.meta)
        quantized = any(n.endswith(".scale") for n in store.field_names)
        layers: List[Dict[str, jax.Array]] = []
        for l in range(store.num_layers):
            w: Dict[str, jax.Array] = {}
            for role, tail in roles.items():
                if tail is None:
                    continue
                key = _ROLE_KEYS[role]
                is4 = store._field_by_name[tail].dtype == "int4"
                stacked = np.stack(
                    [store.get_tensor(l, e, tail) for e in range(store.num_experts)]
                )
                if quantized and tail + ".scale" in store.field_names:
                    scale = np.stack(
                        [
                            store.get_tensor(l, e, tail + ".scale")
                            for e in range(store.num_experts)
                        ]
                    )
                    if dequantize:
                        if is4:
                            from moe_infinity_tpu.store.quant import unpack_int4_np

                            stacked = unpack_int4_np(stacked)
                        w[key] = device_put(
                            jnp.asarray(
                                stacked.astype(np.float32) * scale[:, None, :]
                            ).astype(dtype)
                        )
                    else:
                        # int4 stays packed under '<role>4'; scale keeps the
                        # base-role key (ops.moe convention)
                        w[key + "4" if is4 else key] = device_put(
                            jnp.asarray(stacked)
                        )
                        w[key + "_scale"] = device_put(jnp.asarray(scale))
                else:
                    arr = jnp.asarray(stacked)
                    if arr.dtype in (jnp.bfloat16, jnp.float32, jnp.float16):
                        arr = arr.astype(dtype)
                    w[key] = device_put(arr)
            for tail, key in _BIAS_TAILS.items():
                if tail in store.field_names:
                    stacked = np.stack(
                        [store.get_tensor(l, e, tail) for e in range(store.num_experts)]
                    )
                    w[key] = device_put(jnp.asarray(stacked).astype(jnp.float32))
            if fuse_gateup and ("up" in w or "up4" in w) and "gate_bias" not in w:
                from moe_infinity_tpu.ops.moe import fuse_gateup as _fuse

                w = jax.tree.map(device_put, _fuse(w))
            layers.append(w)
        self._layers = layers
        self._slot_map = device_put(
            jnp.arange(store.num_experts, dtype=jnp.int32)
        )

    # -- provider protocol -------------------------------------------------
    def pytree(self):
        return {"layers": self._layers, "slot_map": self._slot_map}

    @staticmethod
    def for_layer(tree, moe_layer_id: int):
        w = dict(tree["layers"][moe_layer_id])
        biases = {}
        for bk in ("gate_bias", "down_bias"):
            if bk in w:
                biases[bk] = w.pop(bk)
        return w, tree["slot_map"], (biases or None)

    def hbm_bytes(self) -> int:
        total = 0
        for layer in self._layers:
            for v in layer.values():
                total += v.size * v.dtype.itemsize
        return total
