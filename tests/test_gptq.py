"""GPTQ checkpoint ingest: packed 4/8-bit linears are dequantized into the
store at ingest (reference loads GPTQ via AutoGPTQ QuantLinear conversion,
model_offload.py:452-467); end-to-end generation must match an HF model
carrying the dequantized weights."""

import json

import numpy as np
import pytest
import torch

from moe_infinity_tpu.store.gptq import (
    GptqReassembler,
    dequant_gptq,
    gptq_config,
    pack_gptq,
)


class TestCodec:
    @pytest.mark.parametrize("bits", [2, 4, 8])
    def test_pack_dequant_roundtrip(self, bits):
        rng = np.random.default_rng(0)
        w = rng.normal(size=(32, 64)).astype(np.float32)  # [out, in]
        packed = pack_gptq(w, bits=bits, group_size=16)
        deq = dequant_gptq(**packed, bits=bits, group_size=16)
        assert deq.shape == w.shape
        # reconstruction error bounded by half a quantization step per group
        step = packed["scales"].astype(np.float32).max()
        assert np.abs(deq - w).max() <= step * 0.5 + 1e-6

    def test_dequant_exact_on_manual_grid(self):
        """Quantize manually, then dequant must reproduce the grid exactly."""
        rng = np.random.default_rng(1)
        w = rng.normal(size=(8, 32)).astype(np.float32)
        packed = pack_gptq(w, bits=4, group_size=8)
        deq1 = dequant_gptq(**packed, bits=4, group_size=8)
        # re-packing the dequantized weight is a fixed point
        packed2 = pack_gptq(deq1, bits=4, group_size=8)
        deq2 = dequant_gptq(**packed2, bits=4, group_size=8)
        np.testing.assert_allclose(deq1, deq2, atol=1e-5)

    def test_dequant_without_g_idx(self):
        rng = np.random.default_rng(2)
        w = rng.normal(size=(8, 32)).astype(np.float32)
        packed = pack_gptq(w, bits=4, group_size=16)
        with_g = dequant_gptq(**packed, bits=4, group_size=16)
        without = dequant_gptq(
            packed["qweight"], packed["qzeros"], packed["scales"], None,
            bits=4, group_size=16,
        )
        np.testing.assert_array_equal(with_g, without)

    def test_reassembler_streams(self):
        rng = np.random.default_rng(3)
        w = rng.normal(size=(8, 32)).astype(np.float32)
        packed = pack_gptq(w, bits=4, group_size=16)
        asm = GptqReassembler({"bits": 4, "group_size": 16, "v2": False,
                               "sym": False})
        emitted = []
        for comp in ("qweight", "scales", "g_idx", "qzeros"):  # odd order
            emitted += list(asm.feed(f"m.layers.0.w1.{comp}", packed[comp]))
        emitted += list(asm.feed("m.norm.weight", np.ones(4, np.float32)))
        emitted += list(asm.flush())
        names = [n for n, _ in emitted]
        assert names == ["m.layers.0.w1.weight", "m.norm.weight"]
        np.testing.assert_allclose(
            emitted[0][1], dequant_gptq(**packed, bits=4, group_size=16)
        )

    def test_reassembler_flush_derives_missing_g_idx(self):
        rng = np.random.default_rng(4)
        w = rng.normal(size=(8, 32)).astype(np.float32)
        packed = pack_gptq(w, bits=4, group_size=16)
        asm = GptqReassembler({"bits": 4, "group_size": 16, "v2": False,
                               "sym": False})
        emitted = []
        for comp in ("qweight", "scales", "qzeros"):
            emitted += list(asm.feed(f"w1.{comp}", packed[comp]))
        assert not emitted
        emitted = list(asm.flush())
        assert emitted[0][0] == "w1.weight"

    def test_gptq_config_detection(self):
        class Cfg:
            pass

        c = Cfg()
        assert gptq_config(c) is None
        c.quantization_config = {"quant_method": "awq"}
        assert gptq_config(c) is None
        c.quantization_config = {"quant_method": "gptq", "bits": 4,
                                 "group_size": 32}
        qc = gptq_config(c)
        assert qc["bits"] == 4 and qc["group_size"] == 32 and not qc["v2"]


@pytest.fixture(scope="module")
def gptq_ckpt(tmp_path_factory):
    """Tiny Mixtral whose expert weights are GPTQ-packed in the checkpoint;
    returns (ckpt_dir, hf_model_with_dequantized_weights)."""
    from safetensors.torch import save_file
    from transformers import MixtralConfig, MixtralForCausalLM

    tmp = tmp_path_factory.mktemp("gptq")
    cfg = MixtralConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, torch_dtype=torch.float32,
        architectures=["MixtralForCausalLM"],
    )
    torch.manual_seed(5)
    hf = MixtralForCausalLM(cfg).eval()

    state = dict(hf.state_dict())
    new_state = {}
    for name, tensor in state.items():
        if ".block_sparse_moe.experts." in name and name.endswith(".weight"):
            w = tensor.numpy()
            packed = pack_gptq(w, bits=4, group_size=16)
            prefix = name[: -len(".weight")]
            for comp, arr in packed.items():
                new_state[f"{prefix}.{comp}"] = torch.from_numpy(
                    np.ascontiguousarray(arr)
                )
            # the HF reference model carries the dequantized values
            deq = dequant_gptq(**packed, bits=4, group_size=16)
            with torch.no_grad():
                tensor.copy_(torch.from_numpy(deq))
        else:
            new_state[name] = tensor
    ckpt = tmp / "ckpt"
    ckpt.mkdir()
    save_file(new_state, str(ckpt / "model.safetensors"))
    cfg_dict = cfg.to_dict()
    cfg_dict["quantization_config"] = {
        "quant_method": "gptq", "bits": 4, "group_size": 16, "sym": False,
    }
    with open(ckpt / "config.json", "w") as f:
        json.dump(cfg_dict, f)
    return str(ckpt), hf


def test_gptq_e2e_matches_dequantized_hf(gptq_ckpt, tmp_path):
    from moe_infinity_tpu.entrypoints.api import MoE

    path, hf = gptq_ckpt
    engine = MoE(
        path,
        {"expert_dtype": "float32", "max_seq_len": 64,
         "offload_path": str(tmp_path / "store")},
    )
    prompt = np.array([[5, 9, 33, 2]])
    got = engine.generate(prompt, max_new_tokens=8)
    want = hf.generate(
        torch.tensor(prompt), max_new_tokens=8, do_sample=False,
        pad_token_id=0,
    ).numpy()
    np.testing.assert_array_equal(got, want)
