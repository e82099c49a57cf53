"""OPT (dense decoder-only) facade parity: the reference registers plain
OPT in MODEL_MAPPING_NAMES (constants.py:22) and serves it with every
layer as a dense offload unit; here it rides the same ingest + generate
surface with no expert machinery at all."""

import numpy as np
import pytest
import torch
from transformers import OPTConfig, OPTForCausalLM

from moe_infinity_tpu.entrypoints.api import MoE


@pytest.fixture(scope="module")
def tiny_opt(tmp_path_factory):
    cfg = OPTConfig(
        vocab_size=128, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        do_layer_norm_before=True, torch_dtype=torch.float32,
        architectures=["OPTForCausalLM"],
        pad_token_id=1, bos_token_id=2, eos_token_id=2,
    )
    torch.manual_seed(9)
    hf = OPTForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("opt") / "ckpt"
    hf.save_pretrained(path, safe_serialization=True)
    return str(path), hf


def test_opt_facade_matches_hf_greedy(tiny_opt):
    path, hf = tiny_opt
    engine = MoE(path, {"expert_dtype": "float32", "max_seq_len": 64})
    assert engine.arch == "opt"
    assert engine.engine is None  # dense-only plan: no offload machinery
    prompt = np.array([[5, 9, 33, 7]])
    want = hf.generate(
        torch.tensor(prompt), max_new_tokens=8, do_sample=False,
        eos_token_id=None, pad_token_id=1,
    ).numpy()
    got = engine.generate(prompt, max_new_tokens=8, eos_token_id=None)
    np.testing.assert_array_equal(got, want)


def test_opt_batched_prefill_matches(tiny_opt):
    path, hf = tiny_opt
    engine = MoE(path, {"expert_dtype": "float32", "max_seq_len": 64})
    prompt = np.array([[3, 14, 15, 92, 6], [2, 71, 8, 28, 18]])
    want = hf.generate(
        torch.tensor(prompt), max_new_tokens=5, do_sample=False,
        eos_token_id=None, pad_token_id=1,
    ).numpy()
    got = engine.generate(prompt, max_new_tokens=5, eos_token_id=None)
    np.testing.assert_array_equal(got, want)
