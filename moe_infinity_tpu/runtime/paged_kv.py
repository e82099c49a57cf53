"""Paged KV cache: fixed page pool + per-sequence page tables.

The serving-memory analogue of the expert slot arena: KV storage is a
global pool of fixed-size pages ([num_pages, page_size, Hkv, Dh] per
layer); each sequence owns an int32 page table, and a host-side allocator
hands out pages as sequences grow and reclaims them when requests finish.
Shapes stay static (XLA-friendly); sequences of different lengths share
the pool, so batched serving capacity is bounded by total tokens rather
than max_len × batch (the reference has no KV management at all — it
inherits HF's contiguous per-sequence cache).

PagedKVCache quacks like models.layers.KVCache (`.k`/`.v` gather the
logical [B, S, H, D] views; `.update()` scatters into the pool), so every
decoder-only model works unchanged.
"""

from __future__ import annotations

import threading
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class PagedKVCache(NamedTuple):
    pool_k: jax.Array  # [num_pages, page, Hkv, Dh]
    pool_v: jax.Array
    page_table: jax.Array  # [B, max_pages] int32 page ids

    @property
    def page_size(self) -> int:
        return self.pool_k.shape[1]

    @property
    def k(self) -> jax.Array:
        """Logical [B, S, Hkv, Dh] view (gather over the page table)."""
        B, P = self.page_table.shape
        g = self.pool_k[self.page_table]  # [B, P, page, H, D]
        return g.reshape(B, P * self.page_size, *self.pool_k.shape[2:])

    @property
    def v(self) -> jax.Array:
        B, P = self.page_table.shape
        g = self.pool_v[self.page_table]
        return g.reshape(B, P * self.page_size, *self.pool_v.shape[2:])

    def update(self, k_new: jax.Array, v_new: jax.Array, offset) -> "PagedKVCache":
        """Insert [B, T, H, D] at token offset (scalar): scatter each token
        row into (page_table[b, row // page], row % page)."""
        B, T = k_new.shape[:2]
        rows = offset + jnp.arange(T, dtype=jnp.int32)  # [T]
        page_idx = rows // self.page_size  # [T]
        slots = rows % self.page_size  # [T]
        pages = jnp.take_along_axis(
            self.page_table, jnp.broadcast_to(page_idx[None, :], (B, T)), axis=1
        )  # [B, T] physical page ids
        slots_b = jnp.broadcast_to(slots[None, :], (B, T))
        pool_k = self.pool_k.at[pages, slots_b].set(
            k_new.astype(self.pool_k.dtype)
        )
        pool_v = self.pool_v.at[pages, slots_b].set(
            v_new.astype(self.pool_v.dtype)
        )
        return PagedKVCache(pool_k, pool_v, self.page_table)


class PageAllocator:
    """Host-side page bookkeeping for one model (all layers share table
    shapes; each layer has its own pool)."""

    def __init__(self, num_pages: int, page_size: int):
        self.num_pages = num_pages
        self.page_size = page_size
        self._free: List[int] = list(range(num_pages - 1, -1, -1))
        # seq_id -> {logical page index -> physical page id}
        self._owned: dict = {}
        self._lock = threading.Lock()

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def allocate(self, seq_id, num_tokens: int, start_token: int = 0) -> dict:
        """Pages covering token columns [start_token, num_tokens) for a
        sequence (extends an existing allocation; the start is fixed by the
        first call). A request admitted at column C holds no pages for
        columns < C — the range offset is what lets late joiners share a
        long timeline without tying up the whole pool. Raises if the pool
        is exhausted."""
        first = start_token // self.page_size
        last = -(-num_tokens // self.page_size)  # exclusive
        with self._lock:
            have = self._owned.setdefault(seq_id, {})
            for idx in range(first, last):
                if idx in have:
                    continue
                if not self._free:
                    raise RuntimeError(
                        f"KV page pool exhausted ({self.num_pages} pages)"
                    )
                have[idx] = self._free.pop()
            return dict(have)

    def release(self, seq_id) -> None:
        with self._lock:
            for p in self._owned.pop(seq_id, {}).values():
                self._free.append(p)

    def table(self, seq_ids: Sequence, max_pages: int) -> np.ndarray:
        """[B, max_pages] int32 table (unused entries point at page 0 —
        rows outside each sequence's owned column range are masked by
        attention and never written)."""
        out = np.zeros((len(seq_ids), max_pages), dtype=np.int32)
        with self._lock:
            for b, sid in enumerate(seq_ids):
                for idx, phys in self._owned.get(sid, {}).items():
                    if idx < max_pages:
                        out[b, idx] = phys
        return out


def init_paged_caches(
    num_layers: int,
    num_pages: int,
    page_size: int,
    n_kv: int,
    head_dim: int,
    dtype,
    batch: int,
    max_pages_per_seq: int,
) -> List[PagedKVCache]:
    shape = (num_pages, page_size, n_kv, head_dim)
    table = jnp.zeros((batch, max_pages_per_seq), jnp.int32)
    return [
        PagedKVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), table)
        for _ in range(num_layers)
    ]
