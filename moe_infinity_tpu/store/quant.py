"""Weight-only quantization for offloaded experts (host side, numpy).

Symmetric per-output-channel scaling:
  int8:          q = round(w / s), s = rowmax(|w|) / 127
  float8_e4m3fn: q = w / s,        s = rowmax(|w|) / 448

Scales are float32 and stored alongside the quantized tensor in the expert
record as '<name>.scale'. Dequantization is fused into the expert matmul on
device (ops/moe.py, ops/pallas kernels).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from moe_infinity_tpu.utils.dtypes import FP8_E4M3

INT8_MAX = 127.0
FP8_E4M3_MAX = 448.0


def quantize_rowwise(w: np.ndarray, dtype: str) -> Tuple[np.ndarray, np.ndarray]:
    """Quantize a 2-D weight [out, in] row-wise; returns (q, scale[out])."""
    assert w.ndim == 2, w.shape
    w32 = w.astype(np.float32)
    absmax = np.abs(w32).max(axis=1)
    if dtype == "int8":
        scale = np.where(absmax > 0, absmax / INT8_MAX, 1.0).astype(np.float32)
        q = np.clip(np.rint(w32 / scale[:, None]), -127, 127).astype(np.int8)
    elif dtype == "float8_e4m3fn":
        scale = np.where(absmax > 0, absmax / FP8_E4M3_MAX, 1.0).astype(np.float32)
        q = (w32 / scale[:, None]).astype(FP8_E4M3)
    else:
        raise ValueError(f"unsupported quant dtype {dtype}")
    return q, scale


def dequantize_rowwise(q: np.ndarray, scale: np.ndarray) -> np.ndarray:
    return q.astype(np.float32) * scale[:, None]
