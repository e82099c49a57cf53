"""dtype bridging between torch checkpoints, numpy (via ml_dtypes), and JAX.

numpy has no native bfloat16/fp8; JAX ships ml_dtypes which provides them as
numpy extension dtypes, so host-side expert buffers can hold bf16/fp8 bytes
that `jax.device_put` moves without conversion.
"""

from __future__ import annotations

import ml_dtypes
import numpy as np

BF16 = np.dtype(ml_dtypes.bfloat16)
FP8_E4M3 = np.dtype(ml_dtypes.float8_e4m3fn)

_NAME_TO_NP = {
    "bfloat16": BF16,
    "float32": np.dtype(np.float32),
    "float16": np.dtype(np.float16),
    "int8": np.dtype(np.int8),
    # int4 is stored packed two-per-byte in an int8 container; field shapes
    # carry the PACKED (halved out-axis) dims (store/quant.py pack_int4_np)
    "int4": np.dtype(np.int8),
    "float8_e4m3fn": FP8_E4M3,
}

# torch dtype name -> (bit-identical integer view dtype, numpy target dtype)
_TORCH_VIEW = {
    "torch.bfloat16": ("int16", BF16),
    "torch.float8_e4m3fn": ("int8", FP8_E4M3),
}


def np_dtype(name: str) -> np.dtype:
    return _NAME_TO_NP[name]


def dtype_name(dt) -> str:
    dt = np.dtype(dt)
    for name, cand in _NAME_TO_NP.items():
        if cand == dt:
            return name
    return dt.name


def torch_to_numpy(t) -> np.ndarray:
    """Zero-copy (bit-cast) view of a CPU torch tensor as numpy, handling
    dtypes numpy lacks (bf16, fp8)."""
    import torch

    key = str(t.dtype)
    if key in _TORCH_VIEW:
        view_name, np_dt = _TORCH_VIEW[key]
        return t.contiguous().view(getattr(torch, view_name)).numpy().view(np_dt)
    return t.contiguous().numpy()


def numpy_to_torch(a: np.ndarray):
    """Inverse bridge: numpy (possibly ml_dtypes) array -> torch tensor."""
    import torch

    if a.dtype == BF16:
        return torch.from_numpy(np.ascontiguousarray(a).view(np.int16)).view(
            torch.bfloat16
        )
    if a.dtype == FP8_E4M3:
        return torch.from_numpy(np.ascontiguousarray(a).view(np.int8)).view(
            torch.float8_e4m3fn
        )
    return torch.from_numpy(np.ascontiguousarray(a))
