"""Expert blob store: record layout, roundtrip, quantization, alignment."""

import numpy as np
import pytest

from moe_infinity_tpu.store.blob import (
    ALIGN,
    DenseArchive,
    DenseArchiveWriter,
    ExpertStore,
    ExpertStoreWriter,
    build_record_layout,
    store_exists,
)
from moe_infinity_tpu.store.quant import dequantize_rowwise, quantize_rowwise
from moe_infinity_tpu.utils.dtypes import BF16


FIELDS = [
    ("w1.weight", (16, 8), "bfloat16"),
    ("w2.weight", (8, 16), "bfloat16"),
]


def test_record_layout_alignment():
    fields, stride = build_record_layout(FIELDS)
    assert stride % ALIGN == 0
    for f in fields:
        assert f.offset % 128 == 0
    assert fields[1].offset >= fields[0].nbytes


def make_store(path, L=2, E=3, rng=None):
    rng = rng or np.random.default_rng(0)
    w = ExpertStoreWriter(path, L, E, FIELDS)
    truth = {}
    for l in range(L):
        for e in range(E):
            a = rng.normal(size=(16, 8)).astype(np.float32).astype(BF16)
            b = rng.normal(size=(8, 16)).astype(np.float32).astype(BF16)
            w.write_tensor(l, e, "w1.weight", a)
            w.write_tensor(l, e, "w2.weight", b)
            truth[(l, e)] = (a, b)
    w.finalize()
    return truth


def test_store_roundtrip(tmp_store_dir, rng):
    truth = make_store(tmp_store_dir, rng=rng)
    for mode in ("mmap", "ram"):
        s = ExpertStore(tmp_store_dir, load_mode=mode)
        assert s.num_layers == 2 and s.num_experts == 3
        for (l, e), (a, b) in truth.items():
            got = s.get_expert(l, e)
            np.testing.assert_array_equal(got["w1.weight"], a)
            np.testing.assert_array_equal(got["w2.weight"], b)
        rec = s.get_record(1, 2)
        assert rec.nbytes == s.stride


def test_missing_record_detected(tmp_store_dir):
    w = ExpertStoreWriter(tmp_store_dir, 1, 2, FIELDS)
    w.write_tensor(0, 0, "w1.weight", np.zeros((16, 8), dtype=BF16))
    assert not w._written[0, 1]


def test_shape_dtype_validation(tmp_store_dir):
    w = ExpertStoreWriter(tmp_store_dir, 1, 1, FIELDS)
    with pytest.raises(ValueError, match="shape"):
        w.write_tensor(0, 0, "w1.weight", np.zeros((8, 8), dtype=BF16))
    with pytest.raises(ValueError, match="dtype"):
        w.write_tensor(0, 0, "w1.weight", np.zeros((16, 8), dtype=np.float32))


def test_dense_archive_roundtrip(tmp_store_dir, rng):
    w = DenseArchiveWriter(tmp_store_dir)
    a = rng.normal(size=(4, 6)).astype(np.float32)
    b = rng.normal(size=(3,)).astype(np.float32).astype(BF16)
    w.write("embed", a)
    w.write("norm.weight", b)
    w.finalize()
    arc = DenseArchive(tmp_store_dir)
    assert set(arc.names()) == {"embed", "norm.weight"}
    np.testing.assert_array_equal(arc.get("embed"), a)
    np.testing.assert_array_equal(arc.get("norm.weight"), b)
    assert "embed" in arc and "nope" not in arc


def test_quantize_roundtrip_int8(rng):
    w = rng.normal(size=(32, 16)).astype(np.float32)
    q, s = quantize_rowwise(w, "int8")
    assert q.dtype == np.int8 and s.shape == (32,)
    back = dequantize_rowwise(q, s)
    # row-wise int8: worst-case error is scale/2 per element
    err = np.abs(back - w)
    assert (err <= s[:, None] * 0.5 + 1e-6).all()


def test_quantize_fp8(rng):
    w = rng.normal(size=(8, 8)).astype(np.float32)
    q, s = quantize_rowwise(w, "float8_e4m3fn")
    back = q.astype(np.float32) * s[:, None]
    assert np.abs(back - w).max() < 0.1 * np.abs(w).max() + 1e-3
