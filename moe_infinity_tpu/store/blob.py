"""Disk-backed tensor stores.

Two artifacts live under `offload_path` (the analogue of the reference's
`archer_param_0` + `archer_index` + `name_id_map.json`, see
/root/reference/core/aio/archer_tensor_handle.cpp:53-86 and SURVEY.md §3.5):

* ``experts.blob`` / ``experts.index.json`` — fixed-stride expert records,
  layer-major then expert-minor, each record 4096-aligned (O_DIRECT-friendly
  for the native AIO reader). A record is the concatenation of one expert's
  tensors (plus quantization scales) at fixed offsets shared by all experts.
* ``dense.blob`` / ``dense.index.json`` — every non-expert parameter, loaded
  wholesale at model start.

The Python reader memory-maps the blob; `get_record` returns a zero-copy
view suitable for `jax.device_put`. A native C++ O_DIRECT reader
(store/native.py) can service cold reads without polluting the page cache.
"""

from __future__ import annotations

import json
import mmap
import os
import threading
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from moe_infinity_tpu.utils.dtypes import dtype_name, np_dtype

ALIGN = 4096  # O_DIRECT / page alignment for records
FORMAT_VERSION = 1


def _align(n: int, a: int = ALIGN) -> int:
    return (n + a - 1) // a * a


@dataclass(frozen=True)
class RecordField:
    """One tensor inside an expert record."""

    name: str
    shape: Tuple[int, ...]
    dtype: str  # dtype name from utils.dtypes
    offset: int  # bytes from record start

    @property
    def nbytes(self) -> int:
        return int(np.prod(self.shape, dtype=np.int64)) * np_dtype(self.dtype).itemsize


def build_record_layout(
    fields: Sequence[Tuple[str, Tuple[int, ...], str]],
) -> Tuple[List[RecordField], int]:
    """Pack (name, shape, dtype) tensors into a record; returns fields with
    offsets and the aligned record stride. Each field is 128-byte aligned so
    device-side views stay lane-aligned."""
    out: List[RecordField] = []
    off = 0
    for name, shape, dt in fields:
        off = _align(off, 128)
        f = RecordField(name, tuple(int(x) for x in shape), dt, off)
        out.append(f)
        off += f.nbytes
    return out, _align(off)


class ExpertStoreWriter:
    """Ingest-time writer: fixed-stride records appended in any order."""

    def __init__(
        self,
        path: str,
        num_layers: int,
        num_experts: int,
        fields: Sequence[Tuple[str, Tuple[int, ...], str]],
        meta: Optional[dict] = None,
    ):
        os.makedirs(path, exist_ok=True)
        self.path = path
        self.num_layers = num_layers
        self.num_experts = num_experts
        self.fields, self.stride = build_record_layout(fields)
        self.meta = dict(meta or {})
        self._blob_path = os.path.join(path, "experts.blob")
        self._f = open(self._blob_path, "wb")
        self._f.truncate(self.stride * num_layers * num_experts)
        self._written = np.zeros((num_layers, num_experts), dtype=bool)
        self._field_by_name = {f.name: f for f in self.fields}

    def write_tensor(self, layer: int, expert: int, name: str, array: np.ndarray) -> None:
        f = self._field_by_name[name]
        a = np.ascontiguousarray(array)
        if tuple(a.shape) != f.shape:
            raise ValueError(
                f"{name} shape {a.shape} != spec {f.shape} (L{layer} E{expert})"
            )
        # int4 fields hold packed nibbles in an int8 container
        want = "int8" if f.dtype == "int4" else f.dtype
        if dtype_name(a.dtype) != want:
            raise ValueError(f"{name} dtype {a.dtype} != spec {f.dtype}")
        base = (layer * self.num_experts + expert) * self.stride
        self._f.seek(base + f.offset)
        self._f.write(a.tobytes())
        self._written[layer, expert] = True

    def finalize(self) -> None:
        self._f.flush()
        os.fsync(self._f.fileno())
        self._f.close()
        index = {
            "version": FORMAT_VERSION,
            "num_layers": self.num_layers,
            "num_experts": self.num_experts,
            "stride": self.stride,
            "fields": [
                {"name": f.name, "shape": list(f.shape), "dtype": f.dtype, "offset": f.offset}
                for f in self.fields
            ],
            "meta": self.meta,
        }
        with open(os.path.join(self.path, "experts.index.json"), "w") as f:
            json.dump(index, f, indent=1)


class ExpertStore:
    """Read side of the expert tier.

    load_mode:
      * 'mmap'   — page-cache backed; first touch faults from SSD.
      * 'ram'    — eagerly read the whole blob into anonymous memory (the
        reference's host tier keeps all experts in host RAM when they fit).
      * 'direct' — native C++ O_DIRECT reader (store/native.py): cold reads
        stream from SSD without polluting the page cache; records are
        4096-strided so every read is aligned.
    """

    def __init__(self, path: str, load_mode: str = "mmap"):
        self.path = path
        with open(os.path.join(path, "experts.index.json")) as f:
            index = json.load(f)
        if index["version"] != FORMAT_VERSION:
            raise ValueError(f"store version {index['version']} unsupported")
        self.num_layers: int = index["num_layers"]
        self.num_experts: int = index["num_experts"]
        self.stride: int = index["stride"]
        self.fields: List[RecordField] = [
            RecordField(d["name"], tuple(d["shape"]), d["dtype"], d["offset"])
            for d in index["fields"]
        ]
        self.meta: dict = index.get("meta", {})
        self._field_by_name = {f.name: f for f in self.fields}
        blob_path = os.path.join(path, "experts.blob")
        self.blob_nbytes = os.path.getsize(blob_path)
        expected = self.stride * self.num_layers * self.num_experts
        if self.blob_nbytes != expected:
            raise ValueError(
                f"blob size {self.blob_nbytes} != expected {expected}"
            )
        self._native = None
        self._sched = None
        if load_mode == "ram":
            self._buf = np.fromfile(blob_path, dtype=np.uint8)
        elif load_mode == "mmap":
            f = open(blob_path, "rb")
            self._mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
            self._buf = np.frombuffer(self._mm, dtype=np.uint8)
        elif load_mode == "direct":
            from moe_infinity_tpu.store.native import NativeBlobReader

            self._native = NativeBlobReader(blob_path)
            self._buf = None
        elif load_mode == "sched":
            # native priority scheduler: reads are ordered by (prio, fifo)
            # across caller threads with block-granular preemption of
            # prefetch reads (csrc/sched.cc)
            from moe_infinity_tpu.store.native import NativeFetchScheduler

            self._sched = NativeFetchScheduler(blob_path)
            self._buf = None
        else:
            raise ValueError(f"unknown load_mode {load_mode!r}")
        self.load_mode = load_mode

    @property
    def field_names(self) -> List[str]:
        return [f.name for f in self.fields]

    def _record_base(self, layer: int, expert: int) -> int:
        if not (0 <= layer < self.num_layers and 0 <= expert < self.num_experts):
            raise IndexError(f"expert (L{layer}, E{expert}) out of range")
        return (layer * self.num_experts + expert) * self.stride

    def get_record(
        self, layer: int, expert: int, *, prio: int = 0, gen: int = 0
    ) -> np.ndarray:
        """uint8 view/buffer of the whole record (stride bytes).
        mmap/ram: zero-copy view; direct: one aligned O_DIRECT read;
        sched: priority-ordered read (prio 0 preempts prefetch reads at
        block granularity)."""
        base = self._record_base(layer, expert)
        if self._sched is not None:
            self._sched.submit(layer, expert, base, self.stride,
                               prio=prio, gen=gen)
            return self._sched.wait(layer, expert)
        if self._native is not None:
            return self._native.read(base, self.stride)
        return self._buf[base : base + self.stride]

    def _fields_from(self, rec: np.ndarray) -> Dict[str, np.ndarray]:
        return {
            f.name: rec[f.offset : f.offset + f.nbytes]
            .view(np_dtype(f.dtype))
            .reshape(f.shape)
            for f in self.fields
        }

    def get_tensor(self, layer: int, expert: int, name: str) -> np.ndarray:
        f = self._field_by_name[name]
        if self._buf is None:  # direct/sched: one whole-record read
            rec = self.get_record(layer, expert)
            raw = rec[f.offset : f.offset + f.nbytes]
            return raw.view(np_dtype(f.dtype)).reshape(f.shape)
        base = self._record_base(layer, expert)
        raw = self._buf[base + f.offset : base + f.offset + f.nbytes]
        return raw.view(np_dtype(f.dtype)).reshape(f.shape)

    def get_expert(
        self, layer: int, expert: int, *, prio: int = 0, gen: int = 0
    ) -> Dict[str, np.ndarray]:
        if self._native is not None or self._sched is not None:
            return self._fields_from(
                self.get_record(layer, expert, prio=prio, gen=gen)
            )
        return {f.name: self.get_tensor(layer, expert, f.name) for f in self.fields}

    def escalate(self, layer: int, expert: int) -> None:
        """Boost an in-flight scheduled read to on-demand priority
        (no-op for non-sched modes)."""
        if self._sched is not None:
            self._sched.escalate(layer, expert)

    def warm(self, layer: int, expert: int) -> None:
        """Touch a record to promote it into page cache (mmap mode)."""
        rec = self.get_record(layer, expert)
        # Strided read faults every page without copying the record.
        rec[:: mmap.PAGESIZE].sum()


class DenseArchiveWriter:
    """Blob + JSON index for the non-expert (dense) parameters."""

    def __init__(self, path: str):
        os.makedirs(path, exist_ok=True)
        self.path = path
        self._f = open(os.path.join(path, "dense.blob"), "wb")
        self._entries: List[dict] = []
        self._off = 0

    def write(self, name: str, array: np.ndarray) -> None:
        a = np.ascontiguousarray(array)
        self._off = _align(self._off, 128)
        self._f.seek(self._off)
        self._f.write(a.tobytes())
        self._entries.append(
            {
                "name": name,
                "shape": list(a.shape),
                "dtype": dtype_name(a.dtype),
                "offset": self._off,
            }
        )
        self._off += a.nbytes

    def finalize(self) -> None:
        self._f.flush()
        os.fsync(self._f.fileno())
        self._f.close()
        with open(os.path.join(self.path, "dense.index.json"), "w") as f:
            json.dump({"version": FORMAT_VERSION, "tensors": self._entries}, f)


class DenseArchive:
    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, "dense.index.json")) as f:
            index = json.load(f)
        self._entries = {e["name"]: e for e in index["tensors"]}
        blob = os.path.join(path, "dense.blob")
        f = open(blob, "rb")
        self._mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        self._buf = np.frombuffer(self._mm, dtype=np.uint8)

    def names(self) -> List[str]:
        return list(self._entries)

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def get(self, name: str) -> np.ndarray:
        e = self._entries[name]
        dt = np_dtype(e["dtype"])
        n = int(np.prod(e["shape"], dtype=np.int64)) * dt.itemsize
        raw = self._buf[e["offset"] : e["offset"] + n]
        return raw.view(dt).reshape(e["shape"])


class SyntheticStore:
    """ExpertStore-protocol store with in-RAM pseudo-random records.

    For synthetic benchmarks at production geometry: host→HBM traffic,
    arena behavior, and kernel shapes are identical to a real store
    without materializing hundreds of GB on disk.

    distinct_records=False (default): every (layer, expert) returns views
    of ONE shared record buffer — cheapest, but all experts compute
    identical outputs, which makes routing degenerate-stable and flatters
    cache hit rates. distinct_records=True generates a deterministic
    per-(layer, expert) record on read (seeded, LRU-cached) so expert
    outputs — and therefore routing dynamics and cache pressure — behave
    like a real model's. The offload benches opt in.
    """

    def __init__(
        self,
        num_layers: int,
        num_experts: int,
        fields: Sequence[Tuple[str, Tuple[int, ...], str]],
        meta: Optional[dict] = None,
        seed: int = 0,
        distinct_records: bool = False,
        cache_records: int = 64,
    ):
        self.num_layers = num_layers
        self.num_experts = num_experts
        self.fields, self.stride = build_record_layout(fields)
        self._field_by_name = {f.name: f for f in self.fields}
        self.meta = dict(meta or {})
        self.seed = seed
        self.distinct = bool(distinct_records)
        self._cache_cap = max(1, cache_records)
        self._cache: Dict[Tuple[int, int], Dict[str, np.ndarray]] = {}
        self._cache_lock = threading.Lock()  # arena fetch workers race
        rng = np.random.default_rng(seed)
        self._tensors: Dict[str, np.ndarray] = {}
        for f in self.fields:
            self._tensors[f.name] = self._gen_field(rng, f)

    @staticmethod
    def _gen_field(rng, f) -> np.ndarray:
        dt = np_dtype(f.dtype)
        n = int(np.prod(f.shape))
        if dt.kind == "i":
            # raw bytes ARE valid int8/packed-int4 content; ~50x faster
            # than rng.integers at multi-MB field sizes
            return np.frombuffer(rng.bytes(n), dtype=np.int8).reshape(f.shape)
        return (rng.standard_normal(f.shape) * 0.02).astype(dt)

    @property
    def field_names(self) -> List[str]:
        return [f.name for f in self.fields]

    def _record(self, layer: int, expert: int) -> Dict[str, np.ndarray]:
        if not self.distinct:
            return self._tensors
        key = (layer, expert)
        with self._cache_lock:
            rec = self._cache.get(key)
        if rec is None:
            rng = np.random.default_rng(
                self.seed + 1 + layer * self.num_experts + expert
            )
            rec = {f.name: self._gen_field(rng, f) for f in self.fields}
            with self._cache_lock:
                while len(self._cache) >= self._cache_cap:
                    self._cache.pop(next(iter(self._cache)), None)
                self._cache[key] = rec
        return rec

    def get_tensor(self, layer: int, expert: int, name: str) -> np.ndarray:
        return self._record(layer, expert)[name]

    def get_expert(
        self, layer: int, expert: int, *, prio: int = 0, gen: int = 0
    ) -> Dict[str, np.ndarray]:
        return dict(self._record(layer, expert))


def store_exists(path: str) -> bool:
    return os.path.isfile(os.path.join(path, "experts.index.json")) and os.path.isfile(
        os.path.join(path, "dense.index.json")
    )
