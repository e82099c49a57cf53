"""DeepSeek-V3 official FP8 block-scaled checkpoint ingest: weight +
weight_scale_inv pairs dequantize at ingest; end-to-end generation matches
an HF model carrying the dequantized weights."""

import json

import numpy as np
import pytest
import torch

from moe_infinity_tpu.store.fp8_block import (
    Fp8BlockReassembler,
    dequant_fp8_block,
    fp8_block_config,
    pack_fp8_block,
)
from moe_infinity_tpu.utils.dtypes import numpy_to_torch


class TestCodec:
    def test_roundtrip_is_fixed_point(self):
        rng = np.random.default_rng(0)
        w = rng.normal(size=(24, 40)).astype(np.float32)
        q, s = pack_fp8_block(w, block=(8, 16))
        assert q.shape == w.shape and s.shape == (3, 3)
        d1 = dequant_fp8_block(q, s, (8, 16))
        q2, s2 = pack_fp8_block(d1, block=(8, 16))
        d2 = dequant_fp8_block(q2, s2, (8, 16))
        np.testing.assert_allclose(d1, d2, rtol=1e-6, atol=1e-6)
        # quantization error bounded by e4m3 relative precision per block
        assert np.abs(d1 - w).max() < np.abs(w).max() * 0.1

    def test_non_divisible_shapes(self):
        rng = np.random.default_rng(1)
        w = rng.normal(size=(10, 18)).astype(np.float32)  # ragged blocks
        q, s = pack_fp8_block(w, block=(8, 16))
        d = dequant_fp8_block(q, s, (8, 16))
        assert d.shape == w.shape

    def test_config_detection(self):
        class Cfg:
            pass

        c = Cfg()
        assert fp8_block_config(c) is None
        c.quantization_config = {"quant_method": "fp8",
                                 "weight_block_size": [8, 16]}
        assert fp8_block_config(c)["block"] == (8, 16)
        c.quantization_config = {"quant_method": "fp8"}
        assert fp8_block_config(c)["block"] == (128, 128)

    def test_reassembler_either_order(self):
        rng = np.random.default_rng(2)
        w = rng.normal(size=(8, 16)).astype(np.float32)
        q, s = pack_fp8_block(w, block=(8, 16))
        want = dequant_fp8_block(q, s, (8, 16))
        for order in (("w", "s"), ("s", "w")):
            asm = Fp8BlockReassembler({"block": (8, 16)})
            out = []
            for item in order:
                if item == "w":
                    out += list(asm.feed("m.w1.weight", q, True))
                else:
                    out += list(asm.feed("m.w1.weight_scale_inv", s, False))
            out += list(asm.feed("m.norm.weight",
                                 np.ones(4, np.float32), False))
            assert [n for n, _ in out] == ["m.w1.weight", "m.norm.weight"]
            np.testing.assert_allclose(out[0][1], want)

    def test_unpaired_raises(self):
        asm = Fp8BlockReassembler({"block": (8, 16)})
        list(asm.feed("m.w1.weight", np.zeros((8, 16), np.float32), True))
        with pytest.raises(RuntimeError):
            asm.flush()


def test_fp8_e2e_matches_dequantized_hf(tmp_path):
    """Tiny DeepSeek checkpoint in the official FP8 layout through the MoE
    facade vs HF carrying the dequantized weights."""
    from safetensors.torch import save_file
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    from moe_infinity_tpu.entrypoints.api import MoE

    cfg = DeepseekV2Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4, q_lora_rank=None,
        kv_lora_rank=32, qk_nope_head_dim=32, qk_rope_head_dim=16,
        v_head_dim=32, head_dim=16, n_routed_experts=8,
        num_experts_per_tok=2, n_shared_experts=1, first_k_dense_replace=1,
        topk_method="greedy", n_group=None, topk_group=None,
        routed_scaling_factor=1.0, norm_topk_prob=False, aux_loss_alpha=0.0,
        seq_aux=False, max_position_embeddings=128,
        torch_dtype=torch.float32,
        architectures=["DeepseekV2ForCausalLM"], attention_bias=False,
    )
    torch.manual_seed(17)
    hf = DeepseekV2ForCausalLM(cfg).eval()
    block = (8, 16)
    new_state = {}
    for name, t in hf.state_dict().items():
        if ".mlp.experts." in name and name.endswith(".weight"):
            q, s = pack_fp8_block(t.numpy(), block=block)
            new_state[name] = numpy_to_torch(q)
            new_state[name[: -len(".weight")] + ".weight_scale_inv"] = (
                torch.from_numpy(s)
            )
            with torch.no_grad():
                t.copy_(torch.from_numpy(dequant_fp8_block(q, s, block)))
        else:
            new_state[name] = t
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    save_file(new_state, str(ckpt / "model.safetensors"))
    cfg_dict = cfg.to_dict()
    cfg_dict["quantization_config"] = {
        "quant_method": "fp8", "weight_block_size": list(block),
    }
    with open(ckpt / "config.json", "w") as f:
        json.dump(cfg_dict, f)

    engine = MoE(
        str(ckpt),
        {"expert_dtype": "float32", "max_seq_len": 64,
         "offload_path": str(tmp_path / "store")},
    )
    prompt = np.array([[5, 31, 8, 77]])
    got = engine.generate(prompt, max_new_tokens=8)
    with torch.no_grad():
        want = hf.generate(
            torch.tensor(prompt), max_new_tokens=8, do_sample=False,
            pad_token_id=0,
        ).numpy()
    np.testing.assert_array_equal(got, want)
    engine.shutdown()
