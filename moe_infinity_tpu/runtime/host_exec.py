"""Run-on-host expert execution: the miss-never-stalls escape hatch.

SURVEY.md §7's hard part: an expert miss stalls the step (and on a pod,
the collective for every host). The reference *observed* that experts can
run on the CPU but left it commented out
(/root/reference/core/prefetch/task_scheduler.cpp:143-151); here it is a
real path. When the engine cannot make a routed expert resident within a
deadline, it points that expert's slot row at the arena's reserved ZERO
slot — the device program then contributes exactly 0 for those (token, k)
pairs (every expert FFN maps zero weights/biases to zero output) — and
the true contribution is computed on the host from the store record and
added to the layer output. Output remains EXACT; the cost is a small host
GEMM over the missed expert's routed tokens instead of a blocking fetch.

Numerics note: the host math runs in f32 over dequantized weights, which
is at least as precise as the device's bf16 kernels — exactness here means
"the same expert function", with f32-vs-bf16 rounding differences bounded
like any other impl choice (tests compare against the fully-resident run
with a tight tolerance).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from moe_infinity_tpu.runtime.providers import role_map_for

_ML_DTYPES = None


def _np_f32(a: np.ndarray) -> np.ndarray:
    return np.asarray(a).astype(np.float32)


def _unpack_int4_np(w8: np.ndarray) -> np.ndarray:
    """Mirror of ops.moe.unpack_int4: int8 [..., P] -> int8 [..., 2P]."""
    lo = np.left_shift(w8, 4).astype(np.int8) >> 4
    hi = w8 >> 4
    return np.concatenate([lo, hi], axis=-1)


def _act(name: str, x: np.ndarray) -> np.ndarray:
    if name == "relu":
        return np.maximum(x, 0.0)
    if name == "silu":
        return x / (1.0 + np.exp(-x))
    if name in ("gelu", "gelu_tanh"):
        # tanh approximation (matches jax.nn.gelu's default approximate=True
        # used by the device kernels)
        c = np.float32(np.sqrt(2.0 / np.pi))
        return 0.5 * x * (1.0 + np.tanh(c * (x + 0.044715 * x**3)))
    raise ValueError(f"unknown activation {name!r}")


# expert-FFN nonlinearity per arch (common/arch.py expert_layout; switch
# checkpoints may override via store meta["activation"])
_ARCH_ACT = {
    "switch": "relu",
    "nllb": "relu",
    "mixtral": "silu",
    "arctic": "silu",
    "grok": "gelu",
    "deepseek": "silu",
    "deepseek_v3": "silu",
}


def activation_for(store_meta: dict) -> str:
    return store_meta.get("activation") or _ARCH_ACT[store_meta["arch"]]


class HostExpertExecutor:
    """Computes one expert's FFN on the host from its store record."""

    def __init__(self, store, activation: str):
        self.store = store
        self.activation = activation
        roles = role_map_for(store.meta)
        self.gate_tail = roles["gate_or_in"]
        self.up_tail = roles.get("up")
        self.down_tail = None
        for role, tail in roles.items():
            if role == "down":
                self.down_tail = tail
        assert self.gate_tail and self.down_tail
        fields = set(store.field_names)
        self.gate_bias = "fc1.bias" if "fc1.bias" in fields else None
        self.down_bias = "fc2.bias" if "fc2.bias" in fields else None

    def _weight(self, record: Dict[str, np.ndarray], tail: str) -> np.ndarray:
        w = record[tail]
        if w.dtype == np.int8 and (tail + ".scale") in record:
            scale = _np_f32(record[tail + ".scale"])
            wf = _np_f32(w)
            if w.shape[-1] * 2 == scale.shape[0]:  # packed int4
                wf = _np_f32(_unpack_int4_np(w))
            return wf * scale[None, :]
        return _np_f32(w)

    def ffn(self, layer: int, expert: int, x: np.ndarray) -> np.ndarray:
        """x [n, D] f32 -> [n, D] f32 (the expert's FFN contribution
        BEFORE combine weights)."""
        record = self.store.get_expert(layer, expert, prio=0, gen=0)
        g = x @ self._weight(record, self.gate_tail)  # [n, F]
        if self.gate_bias:
            g = g + _np_f32(record[self.gate_bias])[None, :]
        h = _act(self.activation, g)
        if self.up_tail is not None:
            h = h * (x @ self._weight(record, self.up_tail))
        y = h @ self._weight(record, self.down_tail)  # [n, D]
        if self.down_bias:
            y = y + _np_f32(record[self.down_bias])[None, :]
        return y


def host_moe_delta(
    executor: HostExpertExecutor,
    mli: int,
    missing: Sequence[Tuple[int, int]],  # [(mli, expert)]
    h_np: np.ndarray,    # [B, T, D] pre-FFN hidden (f32/bf16 ok)
    cw_np: np.ndarray,   # [B, T, K] combine weights
    ids_np: np.ndarray,  # [B, T, K] routed expert ids
) -> np.ndarray:
    """The layer-output correction for experts that ran as the zero slot:
    sum over missing experts of cw * FFN_e(h) at their routed positions."""
    B, T, D = h_np.shape
    h2 = _np_f32(h_np).reshape(B * T, D)
    cw2 = _np_f32(cw_np).reshape(B * T, -1)
    ids2 = np.asarray(ids_np).reshape(B * T, -1)
    delta = np.zeros((B * T, D), dtype=np.float32)
    for (_, e) in missing:
        rows, ks = np.nonzero(ids2 == e)
        if rows.size == 0:
            continue
        y = executor.ffn(mli, int(e), h2[rows])
        np.add.at(delta, rows, y * cw2[rows, ks][:, None])
    return delta.reshape(B, T, D)
