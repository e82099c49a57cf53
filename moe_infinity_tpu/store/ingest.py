"""Checkpoint ingest: HF shards → expert-major blob store + dense archive.

The analogue of the reference's first-run offload path
(/root/reference/moe_infinity/runtime/model_offload.py:323-392 →
core/aio/archer_tensor_handle.cpp:53-86), re-designed expert-major: instead
of one record per tensor, one fixed-stride record per (layer, expert) so a
whole expert streams with a single aligned read/DMA.

Ingest is restartable and idempotent: a finished store is detected via
`store_exists` and skipped (warm start, SURVEY.md §3.5).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

from moe_infinity_tpu.common.arch import expert_layout
from moe_infinity_tpu.store.blob import (
    DenseArchiveWriter,
    ExpertStoreWriter,
    store_exists,
)
from moe_infinity_tpu.store.quant import quantize_rowwise
from moe_infinity_tpu.utils.checkpoints import get_checkpoint_paths
from moe_infinity_tpu.utils.dtypes import dtype_name, torch_to_numpy
from moe_infinity_tpu.utils.hf_config import (
    detect_arch,
    parse_expert_param,
    parse_geometry,
)
from moe_infinity_tpu.utils.logger import get_logger

logger = get_logger("ingest")

QUANT_DTYPES = ("int8", "int4", "float8_e4m3fn")


def _iter_checkpoint_tensors(checkpoint: str):
    """Yield (name, torch.Tensor) across all shards, one shard in memory at
    a time."""
    import torch

    paths, is_safetensors = get_checkpoint_paths(checkpoint)
    for path in paths:
        logger.info("ingesting shard %s", os.path.basename(path))
        if is_safetensors:
            from safetensors import safe_open

            with safe_open(path, framework="pt", device="cpu") as f:
                for name in f.keys():
                    yield name, f.get_tensor(name)
        else:
            state = torch.load(path, map_location="cpu", weights_only=True)
            for name, tensor in state.items():
                yield name, tensor
            del state


def _iter_model_tensors(checkpoint: str, config):
    """Checkpoint tensor stream with quantized linears reconstructed as
    plain float `.weight` tensors: GPTQ packed 4/8-bit (reference loads
    these via AutoGPTQ QuantLinear conversion, model_offload.py:452-467)
    and DeepSeek-V3 official FP8 block-scaled checkpoints (reference casts
    the model to float8, model_offload.py:347,425)."""
    from moe_infinity_tpu.store.fp8_block import (
        Fp8BlockReassembler,
        fp8_block_config,
    )
    from moe_infinity_tpu.store.gptq import GptqReassembler, gptq_config

    f8cfg = fp8_block_config(config)
    if f8cfg is not None:
        import torch

        logger.info("FP8 block-quantized checkpoint (block=%s): "
                    "dequantizing at ingest", f8cfg["block"])
        asm8 = Fp8BlockReassembler(f8cfg)
        for name, tensor in _iter_checkpoint_tensors(checkpoint):
            is_fp8 = str(tensor.dtype) == "torch.float8_e4m3fn"
            if is_fp8 or name.endswith(Fp8BlockReassembler.SCALE_SUFFIX):
                for out_name, arr in asm8.feed(
                    name, torch_to_numpy(tensor), is_fp8
                ):
                    yield out_name, torch.from_numpy(np.ascontiguousarray(arr))
            else:
                yield name, tensor
        for out_name, arr in asm8.flush():
            yield out_name, torch.from_numpy(np.ascontiguousarray(arr))
        return

    qcfg = gptq_config(config)
    if qcfg is None:
        yield from _iter_checkpoint_tensors(checkpoint)
        return
    logger.info("GPTQ checkpoint detected (bits=%d group_size=%d): "
                "dequantizing at ingest", qcfg["bits"], qcfg["group_size"])
    import torch

    from moe_infinity_tpu.store.gptq import GPTQ_COMPONENTS

    asm = GptqReassembler(qcfg)
    for name, tensor in _iter_checkpoint_tensors(checkpoint):
        if any(name.endswith("." + c) for c in GPTQ_COMPONENTS):
            for out_name, arr in asm.feed(name, torch_to_numpy(tensor)):
                yield out_name, torch.from_numpy(np.ascontiguousarray(arr))
        else:
            yield name, tensor
    for out_name, arr in asm.flush():
        yield out_name, torch.from_numpy(np.ascontiguousarray(arr))


def _expert_fields(layout, expert_dtype: str):
    """Record field list for one expert given the storage dtype."""
    fields = []
    for spec in layout.tensors:
        if expert_dtype in QUANT_DTYPES and len(spec.shape) == 2:
            shape = spec.shape
            if expert_dtype == "int4":  # packed: out axis halves
                shape = (shape[0], shape[1] // 2)
            fields.append((spec.name, shape, expert_dtype))
            # per-output-channel scale; out dim is shape[1] in compute layout
            fields.append((spec.name + ".scale", (spec.shape[1],), "float32"))
        else:
            dt = expert_dtype if expert_dtype not in QUANT_DTYPES else "bfloat16"
            fields.append((spec.name, spec.shape, dt))
    return fields


def _cast_np(a: np.ndarray, dtype: str) -> np.ndarray:
    from moe_infinity_tpu.utils.dtypes import np_dtype

    target = np_dtype(dtype)
    if a.dtype == target:
        return a
    return a.astype(np.float32).astype(target)


def ingest_checkpoint(
    checkpoint: str,
    offload_path: str,
    config,
    expert_dtype: str = "bfloat16",
    dense_dtype: str = "bfloat16",
    force: bool = False,
) -> Dict[str, object]:
    """Convert an HF checkpoint into the offload store. Returns the store
    meta dict. No-op if the store already exists (unless force)."""
    if store_exists(offload_path) and not force:
        logger.info("store already present at %s (warm start)", offload_path)
        with open(os.path.join(offload_path, "experts.index.json")) as f:
            return json.load(f)["meta"]

    arch = detect_arch(config)
    geometry = parse_geometry(config)
    layout = expert_layout(config)
    meta = {
        "arch": arch,
        "num_moe_layers": geometry.num_moe_layers,
        "num_experts": geometry.num_experts,
        "num_encoder_moe_layers": geometry.num_encoder_moe_layers,
        "expert_dtype": expert_dtype,
        "dense_dtype": dense_dtype,
        "activation": layout.activation,
        "gated": layout.gated,
        "tensor_names": list(layout.names),
    }

    writer = ExpertStoreWriter(
        offload_path,
        geometry.num_moe_layers,
        geometry.num_experts,
        _expert_fields(layout, expert_dtype),
        meta=meta,
    )
    dense_writer = DenseArchiveWriter(offload_path)
    name_map: Dict[str, list] = {}
    n_expert_tensors = 0
    n_dense = 0

    for name, tensor in _iter_model_tensors(checkpoint, config):
        parsed = parse_expert_param(name, config)
        arr = torch_to_numpy(tensor)
        if parsed is not None:
            layer, expert, tail = parsed
            # Expert 2-D weights are stored transposed into compute layout
            # ([in, out]); scales stay per output channel (see common/arch.py).
            if expert_dtype in QUANT_DTYPES and arr.ndim == 2:
                q, scale = quantize_rowwise(arr, expert_dtype)
                writer.write_tensor(layer, expert, tail, np.ascontiguousarray(q.T))
                writer.write_tensor(layer, expert, tail + ".scale", scale)
            else:
                dt = expert_dtype if expert_dtype not in QUANT_DTYPES else "bfloat16"
                a = _cast_np(arr, dt)
                if a.ndim == 2:
                    a = np.ascontiguousarray(a.T)
                writer.write_tensor(layer, expert, tail, a)
            name_map[name] = ["expert", layer, expert, tail]
            n_expert_tensors += 1
        else:
            # Keep small norm/bias params in float32 for numerical stability;
            # cast matrices to the dense compute dtype.
            dt = dense_dtype if arr.ndim >= 2 else "float32"
            dense_writer.write(name, _cast_np(arr, dt))
            name_map[name] = ["dense"]
            n_dense += 1

    missing = int((~writer._written).sum())
    if missing:
        missing_ids = np.argwhere(~writer._written)[:8].tolist()
        raise RuntimeError(
            f"{missing} expert records missing after ingest, e.g. {missing_ids}"
        )
    writer.finalize()
    dense_writer.finalize()
    with open(os.path.join(offload_path, "name_map.json"), "w") as f:
        json.dump(name_map, f)
    logger.info(
        "ingested %d expert tensors (%d experts) + %d dense tensors -> %s",
        n_expert_tensors,
        geometry.num_moe_layers * geometry.num_experts,
        n_dense,
        offload_path,
    )
    return meta
