"""End-to-end ingest of a real (tiny, random) HF Mixtral checkpoint."""

import numpy as np
import pytest
import torch
from transformers import MixtralConfig, MixtralForCausalLM

from moe_infinity_tpu.store.blob import ExpertStore, DenseArchive, store_exists
from moe_infinity_tpu.store.ingest import ingest_checkpoint
from moe_infinity_tpu.store.quant import dequantize_rowwise
from moe_infinity_tpu.utils.dtypes import torch_to_numpy


@pytest.fixture(scope="module")
def tiny_mixtral(tmp_path_factory):
    cfg = MixtralConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        vocab_size=128,
        max_position_embeddings=64,
        architectures=["MixtralForCausalLM"],
    )
    torch.manual_seed(0)
    model = MixtralForCausalLM(cfg)
    path = tmp_path_factory.mktemp("ckpt") / "mixtral-tiny"
    model.save_pretrained(path, safe_serialization=True)
    return str(path), cfg, model


def test_ingest_bf16(tiny_mixtral, tmp_path):
    path, cfg, model = tiny_mixtral
    out = str(tmp_path / "store")
    meta = ingest_checkpoint(path, out, cfg, expert_dtype="bfloat16", dense_dtype="float32")
    assert meta["arch"] == "mixtral"
    assert store_exists(out)

    store = ExpertStore(out)
    assert store.num_layers == 2 and store.num_experts == 4
    ref = model.model.layers[1].block_sparse_moe.experts[3].w1.weight.detach()
    got = store.get_tensor(1, 3, "w1.weight")  # stored transposed: [in, out]
    np.testing.assert_allclose(
        got.astype(np.float32),
        ref.to(torch.bfloat16).float().numpy().T,
        rtol=0,
        atol=0,
    )

    dense = DenseArchive(out)
    emb = dense.get("model.embed_tokens.weight")
    np.testing.assert_allclose(
        emb, model.model.embed_tokens.weight.detach().float().numpy()
    )
    # warm start: second call is a no-op returning the same meta
    meta2 = ingest_checkpoint(path, out, cfg)
    assert meta2["arch"] == "mixtral"


def test_ingest_int8(tiny_mixtral, tmp_path):
    path, cfg, model = tiny_mixtral
    out = str(tmp_path / "store8")
    ingest_checkpoint(path, out, cfg, expert_dtype="int8")
    store = ExpertStore(out)
    names = store.field_names
    assert "w1.weight.scale" in names
    q = store.get_tensor(0, 0, "w1.weight")  # [in, out]
    s = store.get_tensor(0, 0, "w1.weight.scale")  # [out]
    assert q.dtype == np.int8
    back = dequantize_rowwise(q.T, s)
    ref = model.model.layers[0].block_sparse_moe.experts[0].w1.weight.detach().float().numpy()
    assert np.abs(back - ref).max() <= s.max() * 0.5 + 1e-6
