"""Stream-gather grouped FFN: in-program expert fetching vs the resident
oracle. The gather must reproduce grouped_ffn over fully-resident stacks
exactly, across segment boundaries, unique-overflow masking, and the
unstaged-record mask — with the host-side stream_overflow check flagging
exactly the cases where zero-masking dropped a real contribution."""

import numpy as np

import jax
import jax.numpy as jnp

from moe_infinity_tpu.ops.moe import grouped_ffn
from moe_infinity_tpu.ops.stream import (
    StreamSource,
    gffn_stream,
    stream_overflow,
)

E, D, F = 10, 8, 16
SEG_ROWS = 3  # force multi-segment gathers


def _make(seed=0, staged=None):
    rng = np.random.default_rng(seed)
    gate = rng.standard_normal((E, D, F)).astype(np.float32) * 0.1
    up = rng.standard_normal((E, D, F)).astype(np.float32) * 0.1
    down = rng.standard_normal((E, F, D)).astype(np.float32) * 0.1
    staged = list(range(E)) if staged is None else staged
    rec_row = np.full(E, -1, np.int32)
    for row, e in enumerate(staged):
        rec_row[e] = row

    def segs(a):
        stacked = a[staged]
        return [
            jnp.asarray(stacked[i:i + SEG_ROWS])
            for i in range(0, len(staged), SEG_ROWS)
        ]

    source = StreamSource(
        fields={"gate": segs(gate), "up": segs(up), "down": segs(down)},
        rec_row=rec_row,
        seg_rows=SEG_ROWS,
    )
    resident = {
        "gate": jnp.asarray(gate),
        "up": jnp.asarray(up),
        "down": jnp.asarray(down),
    }
    return source, resident, rng


def test_stream_matches_resident_across_segments():
    source, resident, rng = _make(1)
    T, K = 6, 2
    x = jnp.asarray(rng.standard_normal((T, D)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, E, (T, K)).astype(np.int32))
    cw = jnp.asarray(rng.uniform(0.2, 1.0, (T, K)).astype(np.float32))

    want = grouped_ffn(
        x, ids, cw, jnp.arange(E, dtype=jnp.int32), resident, "silu"
    )
    got = jax.jit(
        lambda x, i, c: gffn_stream(
            x, i, c, source, "silu", max_unique=E
        )
    )(x, ids, cw)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
    assert not stream_overflow(np.asarray(ids), E, source.rec_row)


def test_stream_overflow_masks_and_flags():
    source, resident, rng = _make(2)
    T, K = 8, 2
    x = jnp.asarray(rng.standard_normal((T, D)).astype(np.float32))
    # touch MORE uniques than max_unique
    ids = jnp.asarray(
        (np.arange(T * K) % E).reshape(T, K).astype(np.int32)
    )
    cw = jnp.asarray(np.full((T, K), 0.5, np.float32))
    U = 4
    got = gffn_stream(x, ids, cw, source, "silu", max_unique=U)
    # the first U uniques (ascending ids 0..3) contribute; others zero
    keep = np.asarray(ids) < U
    want = grouped_ffn(
        x, ids, jnp.asarray(np.asarray(cw) * keep),
        jnp.arange(E, dtype=jnp.int32), resident, "silu",
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
    assert stream_overflow(np.asarray(ids), U, source.rec_row)
    assert not stream_overflow(np.asarray(ids)[:1, :1], U, source.rec_row)


def test_stream_unstaged_masks_and_flags():
    staged = [0, 1, 2, 3, 4, 5, 6, 8]  # 7 and 9 unstaged
    source, resident, rng = _make(3, staged=staged)
    T, K = 5, 2
    x = jnp.asarray(rng.standard_normal((T, D)).astype(np.float32))
    ids = jnp.asarray(
        np.array([[0, 7], [1, 2], [9, 3], [4, 8], [5, 6]], np.int32)
    )
    cw = jnp.asarray(rng.uniform(0.2, 1.0, (T, K)).astype(np.float32))
    got = gffn_stream(x, ids, cw, source, "silu", max_unique=E)
    keep = ~np.isin(np.asarray(ids), [7, 9])
    want = grouped_ffn(
        x, ids, jnp.asarray(np.asarray(cw) * keep),
        jnp.arange(E, dtype=jnp.int32), resident, "silu",
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
    assert stream_overflow(np.asarray(ids), E, source.rec_row)
    ok_ids = np.asarray(ids)[[1, 4]]  # only staged experts
    assert not stream_overflow(ok_ids, E, source.rec_row)
