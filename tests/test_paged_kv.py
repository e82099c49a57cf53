"""Paged KV cache: allocator behavior + generation parity with the
contiguous cache (the PagedKVCache quacks like KVCache, so the model runs
unchanged)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moe_infinity_tpu.models.mixtral import MixtralModel, MixtralSpec
from moe_infinity_tpu.runtime.generate import Generator
from moe_infinity_tpu.runtime.paged_kv import (
    PageAllocator,
    PagedKVCache,
    init_paged_caches,
)
from moe_infinity_tpu.runtime.providers import ResidentProvider

SPEC = MixtralSpec(
    vocab_size=128, hidden_size=48, intermediate_size=96, num_layers=2,
    num_heads=6, num_kv_heads=2, head_dim=8, num_experts=4, top_k=2,
    rms_eps=1e-6, rope_theta=1e4, tie_embeddings=False,
)
PAGE = 8


class TestAllocator:
    def test_allocate_extend_release(self):
        a = PageAllocator(num_pages=10, page_size=PAGE)
        p1 = a.allocate("s1", 20)  # 3 pages
        assert len(p1) == 3 and a.free_pages == 7
        p1b = a.allocate("s1", 30)  # extend to 4
        assert len(p1b) == 4
        assert all(p1b[i] == p1[i] for i in p1)
        a.release("s1")
        assert a.free_pages == 10

    def test_range_offset_allocation(self):
        """A request admitted at a late column holds pages only for its own
        column range."""
        a = PageAllocator(num_pages=5, page_size=PAGE)
        a.allocate("__null__", 1)  # reserve phys page 0 (batcher convention)
        pages = a.allocate("late", 40, start_token=24)  # cols 24..39: idx 3,4
        assert sorted(pages) == [3, 4]
        assert a.free_pages == 2  # only 2 pages consumed, not 5
        t = a.table(["late"], max_pages=5)
        assert (t[0, :3] == 0).all() and t[0, 3] != 0 and t[0, 4] != 0

    def test_exhaustion(self):
        a = PageAllocator(num_pages=2, page_size=PAGE)
        a.allocate("s1", 16)
        with pytest.raises(RuntimeError, match="exhausted"):
            a.allocate("s2", 8)

    def test_table(self):
        a = PageAllocator(num_pages=8, page_size=PAGE)
        a.allocate("x", 12)
        a.allocate("y", 4)
        t = a.table(["x", "y"], max_pages=4)
        assert t.shape == (2, 4)
        assert len(set(t[0, :2]) | set(t[1, :1])) == 3  # distinct pages


def test_paged_generation_matches_contiguous():
    model = MixtralModel(SPEC, compute_dtype=jnp.float32)
    params, experts = model.init_random(jax.random.PRNGKey(7))
    gen = Generator(
        model, params, experts, ResidentProvider.for_layer, max_seq_len=32,
        donate_kv=False,
    )
    prompt = np.array([[5, 31, 8, 77]])
    want = gen.generate(prompt, max_new_tokens=6).sequences

    # paged run: drive the stepper's forward with paged caches
    B, T = prompt.shape
    alloc = PageAllocator(num_pages=16, page_size=PAGE)
    alloc.allocate("seq0", 16)  # 2 pages (cap 16 tokens)
    table = jnp.asarray(alloc.table(["seq0"], max_pages=2))
    kvs = init_paged_caches(
        SPEC.num_layers, 16, PAGE, SPEC.num_kv_heads, SPEC.head_dim,
        jnp.float32, B, 2,
    )
    kvs = [PagedKVCache(c.pool_k, c.pool_v, table) for c in kvs]

    tokens = jnp.asarray(prompt, jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    logits, kvs, _ = gen.stepper.forward(tokens, positions, kvs, jnp.int32(0))
    toks = [int(jnp.argmax(logits[0, -1]))]
    cur = T
    for _ in range(5):
        logits, kvs, _ = gen.stepper.forward(
            jnp.asarray([[toks[-1]]], jnp.int32),
            jnp.full((B, 1), cur, jnp.int32),
            kvs,
            jnp.int32(cur),
        )
        toks.append(int(jnp.argmax(logits[0, -1])))
        cur += 1
    got = np.concatenate([prompt[0], np.asarray(toks)])
    np.testing.assert_array_equal(got, want[0])


def test_paged_pages_shared_across_sequences():
    """Two sequences with different lengths share one pool; page tables
    differ per row."""
    model = MixtralModel(SPEC, compute_dtype=jnp.float32)
    params, experts = model.init_random(jax.random.PRNGKey(8))
    gen = Generator(
        model, params, experts, ResidentProvider.for_layer, max_seq_len=32,
        donate_kv=False,
    )
    B = 2
    alloc = PageAllocator(num_pages=8, page_size=PAGE)
    alloc.allocate("a", 16)
    alloc.allocate("b", 16)
    table = jnp.asarray(alloc.table(["a", "b"], max_pages=2))
    assert len(set(np.asarray(table).ravel())) == 4  # all distinct pages
    kvs = init_paged_caches(
        SPEC.num_layers, 8, PAGE, SPEC.num_kv_heads, SPEC.head_dim,
        jnp.float32, B, 2,
    )
    kvs = [PagedKVCache(c.pool_k, c.pool_v, table) for c in kvs]
    prompt = np.array([[5, 31, 8, 77], [9, 3, 44, 6]])
    want = gen.generate(prompt, max_new_tokens=4).sequences

    tokens = jnp.asarray(prompt, jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(4, dtype=jnp.int32), (B, 4))
    logits, kvs, _ = gen.stepper.forward(tokens, positions, kvs, jnp.int32(0))
    nxt = jnp.argmax(logits[:, -1, :], axis=-1)
    out = [np.asarray(nxt)]
    cur = 4
    for _ in range(3):
        logits, kvs, _ = gen.stepper.forward(
            jnp.asarray(out[-1][:, None], jnp.int32),
            jnp.full((B, 1), cur, jnp.int32),
            kvs,
            jnp.int32(cur),
        )
        out.append(np.asarray(jnp.argmax(logits[:, -1, :], axis=-1)))
        cur += 1
    got = np.concatenate([prompt, np.stack(out, axis=1)], axis=1)
    np.testing.assert_array_equal(got, want)
