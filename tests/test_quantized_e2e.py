"""Quantized expert paths end-to-end: int8 and fp8 ingested checkpoints
generate through the full stack (resident + offload) with outputs close to
the f32 reference (perplexity-Δ-style gate at tiny scale: top-1 token
agreement on most steps)."""

import numpy as np
import pytest
import torch
from transformers import MixtralConfig, MixtralForCausalLM

import jax.numpy as jnp

from moe_infinity_tpu.entrypoints.api import MoE
from moe_infinity_tpu.store.quant import dequantize_rowwise, quantize_rowwise

pytestmark = pytest.mark.slow  # e2e-heavy; fast path: -m 'not slow'


def test_quant_roundtrip_error_bounds(rng):
    w = rng.standard_normal((64, 32)).astype(np.float32)
    for dtype, tol in (("int8", 0.02), ("float8_e4m3fn", 0.1)):
        q, s = quantize_rowwise(w, dtype)
        back = dequantize_rowwise(q, s)
        rel = np.abs(back - w).max() / np.abs(w).max()
        assert rel < tol, (dtype, rel)


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    cfg = MixtralConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, num_local_experts=4,
        num_experts_per_tok=2, vocab_size=128, max_position_embeddings=128,
        torch_dtype=torch.float32, architectures=["MixtralForCausalLM"],
    )
    torch.manual_seed(5)
    hf = MixtralForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("quant") / "ckpt"
    hf.save_pretrained(path, safe_serialization=True)
    return str(path), hf


@pytest.mark.parametrize("dtype", ["int8", "int4", "float8_e4m3fn"])
def test_quantized_generation_close_to_f32(tiny_ckpt, tmp_path, dtype):
    path, hf = tiny_ckpt
    engine = MoE(
        path,
        {
            "expert_dtype": dtype,
            "max_seq_len": 64,
            "offload_path": str(tmp_path / f"store_{dtype}"),
        },
    )
    prompt = np.array([[5, 9, 33, 17]])
    got = engine.generate(prompt, max_new_tokens=8)
    want = hf.generate(
        torch.tensor(prompt), max_new_tokens=8, do_sample=False, pad_token_id=0
    ).numpy()
    # weight-only quant at tiny scale: most greedy tokens should agree
    agree = (got[0, :8] == want[0, :8]).mean()
    assert agree >= 0.75, (dtype, got, want)


def test_int4_offload_matches_int4_resident(tiny_ckpt, tmp_path):
    """int4 through the slot arena (packed slots AND dequant-on-write
    slots) must generate exactly what the int4-resident plan generates —
    the offload machinery may not change numerics, only residency."""
    path, hf = tiny_ckpt
    prompt = np.array([[5, 9, 33, 17]])
    want = MoE(
        path,
        {
            "expert_dtype": "int4",
            "max_seq_len": 64,
            "offload_path": str(tmp_path / "resident"),
        },
    ).generate(prompt, max_new_tokens=8)
    for dq_write in (False, True):
        engine = MoE(
            path,
            {
                "expert_dtype": "int4",
                "max_seq_len": 64,
                "device_memory_bytes": 1,  # force the offload plan
                "num_slots": 5,
                "dequant_on_write": dq_write,
                "offload_path": str(tmp_path / f"offload_{dq_write}"),
            },
        )
        got = engine.generate(prompt, max_new_tokens=8)
        np.testing.assert_array_equal(got, want), dq_write
        stats = engine.hit_rate()
        assert stats is not None
