"""Tensor-parallel column views over an expert store.

TP x EP on the pod arena path: when the mesh has a `model` axis of size
tp > 1, each expert-coordinate's arena is split into tp COLUMN buffers —
one per (expert, model) device — each holding the 1/tp slice of every
expert's FFN weights along the ffn hidden dim. ``ColumnShardStore`` is
the store-protocol view that makes this transparent to the arena: field
shapes, record reads, and meta all describe column ``col`` of ``tp``, so
an ``ExpertArena`` constructed on the view naturally allocates and lands
sliced slots.

Slicing plan (record layouts per common/arch.py FFN_ROLES; records store
gate/up as [d_model, d_ff] and down as [d_ff, d_model]):

  gate_or_in / up tails — slice dim 1 (d_ff columns)
  down tail             — slice dim 0 (d_ff rows)
  fc1.bias              — slice dim 0 ([d_ff])
  fc2.bias              — NOT sliced ([d_model]); replicated across
                          columns and added exactly once by the shard_map
                          program (zeroed on model columns != 0 before
                          the (expert, model) psum — ops/moe.py
                          grouped_ffn_ep)

The partial products then sum exactly: act(x @ W1[:, col]) is elementwise
over the sliced d_ff, each column's (act_col @ W2[col, :]) is a partial
[T, d_model], and the psum over `model` reassembles the full FFN output.

All tp column reads of one (layer, expert) share ONE base-store read
(``_BaseRecordCache`` refcounts it), so TP does not multiply host-store
traffic — each record crosses the host path once and each device uploads
only its 1/tp slice. The reference has no TP of experts at all: its
multi-GPU dispatch replicates whole experts per GPU
(/root/reference/moe_infinity/distributed/expert_executor.py:49-54).

Quantized stores (store/quant.py row-wise int8/int4/fp8) slice too:
per-OUT-channel scales follow their weight's slice — gate/up scales
([d_ff]) slice with the d_ff columns, down's scale ([d_model]) replicates
across columns like fc2.bias. int4 records are packed split-wise along
the OUT axis (quant.pack_int4_np), so a d_ff column slice of gate/up is
not a byte slice: the view unpacks, slices the channels, and repacks per
column (host numpy at fetch time; d_ff/tp must stay even). Only BLOCK
scales (2-D, e.g. DeepSeek FP8 128x128 blocks) are rejected — slicing a
block grid along d_ff needs block-aligned tp splits, a follow-up.
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from moe_infinity_tpu.runtime.providers import role_map_for


def _slice_dims_for(store) -> Dict[str, Optional[int]]:
    """tail name -> record dim sliced over the model axis (None = whole)."""
    roles = role_map_for(store.meta)
    dims: Dict[str, Optional[int]] = {}
    names = set(store.field_names)
    for role, tail in roles.items():
        if tail is None:
            continue
        dims[tail] = 0 if role == "down" else 1
        if tail + ".scale" in names:
            # per-OUT-channel scale [out]: slices with gate/up's d_ff
            # columns; down's [d_model] scale replicates (added once by
            # the dequantized matmul on every column — it scales the
            # OUTPUT channels, identical across column partials)
            dims[tail + ".scale"] = None if role == "down" else 0
    if "fc1.bias" in names:
        dims["fc1.bias"] = 0
    if "fc2.bias" in names:
        dims["fc2.bias"] = None
    return dims


class _BaseRecordCache:
    """One base-store read shared by the tp column views of a record.

    The arena's fetch worker reads the primary column then each mirror
    column back-to-back; the first get() performs the (possibly O_DIRECT
    / relay-expensive) base read and the remaining tp-1 gets slice from
    the cached record, after which the entry is dropped (refcount)."""

    def __init__(self, store, tp: int):
        self.store = store
        self.tp = tp
        self._lock = threading.Lock()
        self._cache: Dict[Tuple[int, int], Tuple[dict, int]] = {}

    def get(self, layer: int, expert: int, prio: int, gen: int) -> dict:
        key = (layer, expert)
        with self._lock:
            hit = self._cache.get(key)
            if hit is not None:
                rec, refs = hit
                if refs + 1 >= self.tp:
                    del self._cache[key]
                else:
                    self._cache[key] = (rec, refs + 1)
                return rec
        rec = self.store.get_expert(layer, expert, prio=prio, gen=gen)
        if self.tp > 1:
            with self._lock:
                self._cache[key] = (rec, 1)
        return rec


class ColumnShardStore:
    """ExpertStore-protocol view presenting column ``col`` of ``tp``."""

    def __init__(self, store, col: int, tp: int,
                 shared: Optional[_BaseRecordCache] = None):
        if not 0 <= col < tp:
            raise ValueError(f"col {col} out of range for tp={tp}")
        self.base = store
        self.col = col
        self.tp = tp
        self.num_layers = store.num_layers
        self.num_experts = store.num_experts
        self.meta = store.meta
        self._dims = _slice_dims_for(store)
        self._shared = shared or _BaseRecordCache(store, 1)
        # int4 tails packed split-wise along a SLICED out axis need
        # unpack -> channel-slice -> repack instead of a byte slice
        self._repack4: set = set()
        fields = []
        for f in store.fields if hasattr(store, "fields") else [
            store._field_by_name[n] for n in store.field_names
        ]:
            if f.name.endswith(".scale") and len(f.shape) != 1:
                raise NotImplementedError(
                    f"column sharding of BLOCK-scaled records is not "
                    f"supported ({f.name} scale shape {f.shape}; needs "
                    f"block-aligned tp splits)"
                )
            dim = self._dims.get(f.name)
            shape = f.shape
            if dim is not None:
                if f.dtype == "int4" and dim == len(shape) - 1:
                    # packed axis holds out/2 bytes; each column gets
                    # (out/tp)/2 — the generic divide below is right but
                    # the CONTENT must be re-packed per column
                    if (shape[dim] * 2 // tp) % 2:
                        raise ValueError(
                            f"int4 field {f.name}: d_ff/tp "
                            f"({shape[dim] * 2 // tp}) must stay even "
                            f"for split-wise packing"
                        )
                    self._repack4.add(f.name)
                if shape[dim] % tp:
                    raise ValueError(
                        f"field {f.name} dim {dim} ({shape[dim]}) must "
                        f"divide over the model axis (tp={tp})"
                    )
                shape = tuple(
                    s // tp if i == dim else s for i, s in enumerate(shape)
                )
            fields.append(dataclasses.replace(f, shape=shape))
        self.fields = fields
        self._field_by_name = {f.name: f for f in fields}

    # record dim sliced for an arena ROLE key ("gate"/"up"/"down"/
    # "gate_bias"/"down_bias"); the stacked arena/global array adds a
    # leading slot dim, so the model-sharded dim there is this + 1
    def record_slice_dim(self, tail: str) -> Optional[int]:
        return self._dims.get(tail)

    @property
    def field_names(self) -> List[str]:
        return [f.name for f in self.fields]

    def _slice(self, name: str, a: np.ndarray) -> np.ndarray:
        dim = self._dims.get(name)
        if dim is None:
            return a
        if name in self._repack4:
            # split-wise int4 packing interleaves channel i with
            # i + out/2 in one byte, so a d_ff column is NOT a byte
            # range: unpack to channels, slice, repack per column
            from moe_infinity_tpu.store.quant import (
                pack_int4_np,
                unpack_int4_np,
            )

            ch = unpack_int4_np(a)
            n = ch.shape[dim] // self.tp
            idx = [slice(None)] * ch.ndim
            idx[dim] = slice(self.col * n, (self.col + 1) * n)
            return np.ascontiguousarray(pack_int4_np(ch[tuple(idx)]))
        n = a.shape[dim] // self.tp
        idx = [slice(None)] * a.ndim
        idx[dim] = slice(self.col * n, (self.col + 1) * n)
        return np.ascontiguousarray(a[tuple(idx)])

    def get_tensor(self, layer: int, expert: int, name: str) -> np.ndarray:
        return self._slice(name, self.base.get_tensor(layer, expert, name))

    def get_expert(
        self, layer: int, expert: int, *, prio: int = 0, gen: int = 0
    ) -> Dict[str, np.ndarray]:
        rec = self._shared.get(layer, expert, prio, gen)
        return {n: self._slice(n, rec[n]) for n in self.field_names}


def column_views(store, tp: int) -> List[ColumnShardStore]:
    """The tp column views of a store, sharing one base-record cache."""
    shared = _BaseRecordCache(store, tp)
    return [ColumnShardStore(store, m, tp, shared) for m in range(tp)]
