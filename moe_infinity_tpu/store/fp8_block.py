"""DeepSeek-V3 official FP8 checkpoint support (block-scaled float8).

The official DSv3 release stores every quantized Linear as
  <prefix>.weight            float8_e4m3fn [out, in]
  <prefix>.weight_scale_inv  float32 [ceil(out/B0), ceil(in/B1)]
with `quantization_config = {"quant_method": "fp8",
"weight_block_size": [B0, B1]}` (B0 = B1 = 128). The reference loads these
by casting the whole model to float8 and running per-expert C++ FFNs
(model_offload.py:347,425, DTYPE_FP8_E4M3FN in expert_module.h:23); we
dequantize at ingest into the store's own dtype (bf16 / rowwise-int8 /
per-channel fp8) so every downstream path works unchanged.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def fp8_block_config(config) -> Optional[dict]:
    """Normalized FP8 block-quant config from an HF config, else None."""
    qc = getattr(config, "quantization_config", None)
    if qc is None:
        return None
    if not isinstance(qc, dict):
        qc = qc.to_dict() if hasattr(qc, "to_dict") else vars(qc)
    if qc.get("quant_method") != "fp8":
        return None
    b = qc.get("weight_block_size") or [128, 128]
    return {"block": (int(b[0]), int(b[1]))}


def dequant_fp8_block(
    weight: np.ndarray,  # float8 codes viewed as any dtype-castable array
    scale_inv: np.ndarray,  # [ceil(out/B0), ceil(in/B1)] f32
    block: tuple = (128, 128),
) -> np.ndarray:
    """W[o, i] = fp8(w)[o, i] * scale_inv[o // B0, i // B1], in float32."""
    w = weight.astype(np.float32)
    O, I = w.shape
    b0, b1 = block
    s = np.repeat(np.repeat(scale_inv, b0, axis=0)[:O], b1, axis=1)[:, :I]
    return w * s


def pack_fp8_block(weight: np.ndarray, block: tuple = (128, 128)):
    """Quantize a [out, in] float weight into the official DSv3 layout:
    (fp8 codes, scale_inv [ceil(out/B0), ceil(in/B1)]). Per-block absmax
    scaling to the e4m3 range; used by tests and converters."""
    import ml_dtypes

    O, I = weight.shape
    b0, b1 = block
    n0, n1 = -(-O // b0), -(-I // b1)
    padded = np.zeros((n0 * b0, n1 * b1), np.float32)
    padded[:O, :I] = weight.astype(np.float32)
    blocks = padded.reshape(n0, b0, n1, b1)
    absmax = np.abs(blocks).max(axis=(1, 3))  # [n0, n1]
    scale = np.maximum(absmax / 448.0, 1e-12).astype(np.float32)
    q = (padded / np.repeat(np.repeat(scale, b0, 0), b1, 1)).astype(
        ml_dtypes.float8_e4m3fn
    )
    return q[:O, :I], scale


class Fp8BlockReassembler:
    """Streaming pairing of (weight, weight_scale_inv): emits plain float32
    `.weight` tensors once both halves of a quantized linear arrive;
    unquantized tensors pass through."""

    SCALE_SUFFIX = ".weight_scale_inv"

    def __init__(self, qcfg: dict):
        self.block = qcfg["block"]
        self._weights: Dict[str, np.ndarray] = {}
        self._scales: Dict[str, np.ndarray] = {}

    def feed(self, name: str, arr: np.ndarray, is_fp8: bool):
        if name.endswith(self.SCALE_SUFFIX):
            prefix = name[: -len(self.SCALE_SUFFIX)]
            self._scales[prefix] = arr
            if prefix in self._weights:
                yield prefix + ".weight", self._emit(prefix)
            return
        if name.endswith(".weight") and is_fp8:
            prefix = name[: -len(".weight")]
            self._weights[prefix] = arr
            if prefix in self._scales:
                yield prefix + ".weight", self._emit(prefix)
            return
        yield name, arr

    def _emit(self, prefix: str) -> np.ndarray:
        return dequant_fp8_block(
            self._weights.pop(prefix), self._scales.pop(prefix), self.block
        )

    def flush(self):
        if self._weights or self._scales:
            raise RuntimeError(
                "unpaired FP8 tensors after ingest: "
                f"weights={sorted(self._weights)} scales={sorted(self._scales)}"
            )
        return iter(())
