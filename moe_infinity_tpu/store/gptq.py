"""GPTQ checkpoint support: dequantize packed GPTQ linears at ingest.

The reference loads GPTQ checkpoints by converting the model skeleton to
AutoGPTQ QuantLinear modules at load time (/root/reference/moe_infinity/
runtime/model_offload.py:452-467 via optimum's GPTQQuantizer.convert_model).
On TPU we instead dequantize once at ingest into the expert-major store at
the configured storage dtype (bf16 / int8 rowwise), so the runtime sees
ordinary weights — no bespoke 4-bit kernels on the hot path, and the store's
own int8 path recovers most of the footprint win.

Format (AutoGPTQ / optimum "gptq" v1, per quantized Linear of [out, in]):
  qweight  int32 [in * bits/32, out]   — `bits`-bit codes packed along in
  qzeros   int32 [groups, out * bits/32]
  scales   fp16  [groups, out]
  g_idx    int32 [in]                  — group id per input row
v1 stores zero-points offset by -1 (dequant adds 1); `checkpoint_format:
"gptq_v2"` stores them directly.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

GPTQ_COMPONENTS = ("qweight", "qzeros", "scales", "g_idx")


def _unpack_rows(packed: np.ndarray, bits: int) -> np.ndarray:
    """Unpack along axis 0: int32 [K*bits/32, N] -> uint [K, N]."""
    per = 32 // bits
    mask = (1 << bits) - 1
    shifts = (np.arange(per, dtype=np.uint32) * bits)[None, :, None]
    u = packed.astype(np.uint32)[:, None, :]  # [K/per, per, N]
    out = (u >> shifts) & mask
    return out.reshape(-1, packed.shape[1])


def _unpack_cols(packed: np.ndarray, bits: int) -> np.ndarray:
    """Unpack along axis 1: int32 [G, N*bits/32] -> uint [G, N]."""
    per = 32 // bits
    mask = (1 << bits) - 1
    shifts = (np.arange(per, dtype=np.uint32) * bits)[None, None, :]
    u = packed.astype(np.uint32)[:, :, None]  # [G, N/per, per]
    out = (u >> shifts) & mask
    return out.reshape(packed.shape[0], -1)


def dequant_gptq(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    g_idx: Optional[np.ndarray],
    *,
    bits: int = 4,
    group_size: int = 128,
    v2: bool = False,
) -> np.ndarray:
    """Reconstruct the float weight in torch Linear layout [out, in]."""
    if bits not in (2, 4, 8):
        raise NotImplementedError(f"GPTQ bits={bits} not supported (2/4/8)")
    w = _unpack_rows(qweight, bits)  # [in, out]
    z = _unpack_cols(qzeros, bits)  # [groups, out]
    if not v2:
        z = z + 1
    if g_idx is None:
        g_idx = np.arange(w.shape[0]) // group_size
    g_idx = np.asarray(g_idx, np.int64)
    deq = scales.astype(np.float32)[g_idx] * (
        w.astype(np.float32) - z.astype(np.float32)[g_idx]
    )  # [in, out]
    return np.ascontiguousarray(deq.T)


def pack_gptq(
    weight: np.ndarray, *, bits: int = 4, group_size: int = 128
) -> Dict[str, np.ndarray]:
    """Quantize + pack a [out, in] float weight into GPTQ v1 tensors.
    Asymmetric per-group min/max quantization; used by tests and the
    `tools/` converters to fabricate GPTQ checkpoints."""
    out_f, in_f = weight.shape
    if in_f % group_size:
        raise ValueError(f"in_features {in_f} not divisible by {group_size}")
    per = 32 // bits
    maxq = (1 << bits) - 1
    wt = weight.astype(np.float32).T  # [in, out]
    groups = in_f // group_size
    g = wt.reshape(groups, group_size, out_f)
    lo, hi = g.min(axis=1), g.max(axis=1)  # [groups, out]
    scale = np.maximum((hi - lo) / maxq, 1e-8).astype(np.float32)
    zero = np.clip(np.round(-lo / scale), 0, maxq).astype(np.uint32)
    g_idx = (np.arange(in_f) // group_size).astype(np.int32)
    q = np.clip(
        np.round(wt / scale[g_idx] + zero[g_idx]), 0, maxq
    ).astype(np.uint32)  # [in, out]

    def pack_axis0(a):
        a = a.reshape(-1, per, a.shape[1])
        sh = (np.arange(per, dtype=np.uint32) * bits)[None, :, None]
        return (a << sh).sum(axis=1, dtype=np.uint32).astype(np.int64).astype(
            np.int32
        )

    def pack_axis1(a):
        a = a.reshape(a.shape[0], -1, per)
        sh = (np.arange(per, dtype=np.uint32) * bits)[None, None, :]
        return (a << sh).sum(axis=2, dtype=np.uint32).astype(np.int64).astype(
            np.int32
        )

    return {
        "qweight": pack_axis0(q),
        "qzeros": pack_axis1(zero - 1),  # v1 stores zeros offset by -1
        "scales": scale.astype(np.float16),
        "g_idx": g_idx,
    }


def gptq_config(config) -> Optional[dict]:
    """Extract a normalized GPTQ quantization config from an HF config, or
    None when the checkpoint is not GPTQ-quantized."""
    qc = getattr(config, "quantization_config", None)
    if qc is None:
        return None
    if not isinstance(qc, dict):
        qc = qc.to_dict() if hasattr(qc, "to_dict") else vars(qc)
    if qc.get("quant_method") != "gptq":
        return None
    return {
        "bits": int(qc.get("bits", 4)),
        "group_size": int(qc.get("group_size", 128)),
        "v2": qc.get("checkpoint_format") == "gptq_v2",
        "sym": bool(qc.get("sym", False)),
    }


class GptqReassembler:
    """Streaming reassembly of GPTQ component tensors into dequantized
    `.weight` tensors. Feed (name, np.ndarray) in shard order; emits
    (name, array) pairs — quantized linears come out as `<prefix>.weight`
    float32 once all components have arrived."""

    def __init__(self, qcfg: dict):
        self.qcfg = qcfg
        self._partial: Dict[str, Dict[str, np.ndarray]] = {}

    def feed(self, name: str, arr: np.ndarray):
        for comp in GPTQ_COMPONENTS:
            suffix = "." + comp
            if name.endswith(suffix):
                prefix = name[: -len(suffix)]
                parts = self._partial.setdefault(prefix, {})
                parts[comp] = arr
                if all(k in parts for k in GPTQ_COMPONENTS):
                    yield prefix + ".weight", self._emit(prefix)
                return
        yield name, arr

    def _emit(self, prefix: str) -> np.ndarray:
        parts = self._partial.pop(prefix)
        return dequant_gptq(
            parts["qweight"],
            parts["qzeros"],
            parts["scales"],
            parts.get("g_idx"),
            bits=self.qcfg["bits"],
            group_size=self.qcfg["group_size"],
            v2=self.qcfg["v2"],
        )

    def flush(self):
        """Emit any linears whose g_idx never arrived (derive from
        group_size)."""
        for prefix in list(self._partial):
            parts = self._partial[prefix]
            if all(k in parts for k in ("qweight", "qzeros", "scales")):
                yield prefix + ".weight", self._emit(prefix)
        leftover = {
            p: sorted(parts) for p, parts in self._partial.items() if parts
        }
        if leftover:
            raise RuntimeError(
                f"incomplete GPTQ tensor groups after ingest: {leftover}"
            )
