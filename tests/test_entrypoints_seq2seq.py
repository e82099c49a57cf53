"""MoE facade end-to-end for an encoder-decoder checkpoint (Switch)."""

import numpy as np
import pytest
import torch
from transformers import (
    SwitchTransformersConfig,
    SwitchTransformersForConditionalGeneration,
)

from moe_infinity_tpu.entrypoints.api import MoE

pytestmark = pytest.mark.slow  # e2e-heavy; fast path: -m 'not slow'


def test_switch_through_facade(tmp_path):
    cfg = SwitchTransformersConfig(
        vocab_size=96,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=2,
        num_decoder_layers=2,
        num_heads=4,
        num_experts=4,
        expert_capacity=8,
        num_sparse_encoder_layers=1,
        num_sparse_decoder_layers=1,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
        dropout_rate=0.0,
        router_jitter_noise=0.0,
        decoder_start_token_id=0,
        eos_token_id=1,
        pad_token_id=0,
        torch_dtype=torch.float32,
        architectures=["SwitchTransformersForConditionalGeneration"],
    )
    torch.manual_seed(3)
    hf = SwitchTransformersForConditionalGeneration(cfg).eval()
    ckpt = tmp_path / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)

    engine = MoE(str(ckpt), {"expert_dtype": "float32"})
    assert engine.arch == "switch"
    prompt = np.array([[5, 31, 8, 77]])
    with torch.no_grad():
        want = hf.generate(
            torch.tensor(prompt), max_new_tokens=6, do_sample=False
        ).numpy()
    got = engine.generate(prompt, max_new_tokens=6)
    n = min(got.shape[1], want.shape[1])
    np.testing.assert_array_equal(got[:, :n], want[:, :n])

    # tiny device budget forces the enc-dec OFFLOAD engine; same output
    engine2 = MoE(
        str(ckpt),
        {"expert_dtype": "float32", "device_memory_bytes": 1, "num_slots": 4},
    )
    assert engine2.engine is not None
    got2 = engine2.generate(prompt, max_new_tokens=6)
    n = min(got2.shape[1], want.shape[1])
    np.testing.assert_array_equal(got2[:, :n], want[:, :n])
    assert engine2.stats()["visits"] > 0
    engine2.shutdown()


def test_switch_concurrent_wave_batching(tmp_path):
    """max_batch_size > 1 on a seq2seq checkpoint activates the wave
    batcher: concurrent greedy generate() calls batch into one encode +
    decode and match HF exactly."""
    import concurrent.futures as cf

    cfg = SwitchTransformersConfig(
        vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, num_experts=4, expert_capacity=8,
        num_sparse_encoder_layers=1, num_sparse_decoder_layers=1,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
        dropout_rate=0.0, router_jitter_noise=0.0, decoder_start_token_id=0,
        eos_token_id=1, pad_token_id=0, torch_dtype=torch.float32,
        architectures=["SwitchTransformersForConditionalGeneration"],
    )
    torch.manual_seed(5)
    hf = SwitchTransformersForConditionalGeneration(cfg).eval()
    ckpt = tmp_path / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)

    engine = MoE(str(ckpt), {"expert_dtype": "float32", "max_batch_size": 4})
    assert engine.s2s_batcher is not None
    try:
        prompts = [
            np.array([[5, 31, 8, 77]]),
            np.array([[9, 4, 61]]),
            np.array([[12, 3, 44, 7, 90]]),
        ]
        wants = []
        for p in prompts:
            with torch.no_grad():
                wants.append(
                    hf.generate(
                        torch.tensor(p), max_new_tokens=6, do_sample=False
                    ).numpy()
                )
        with cf.ThreadPoolExecutor(3) as ex:
            gots = list(
                ex.map(
                    lambda p: engine.generate(p, max_new_tokens=6), prompts
                )
            )
        for got, want in zip(gots, wants):
            n = min(got.shape[1], want.shape[1])
            np.testing.assert_array_equal(got[:, :n], want[:, :n])
    finally:
        engine.shutdown()

def test_switch_offload_continuous_batching(tmp_path):
    """Offload plan + speculative_decode + batch slots through the facade:
    the continuous seq2seq batcher serves concurrent requests over the
    engine's arena, matching HF greedy exactly."""
    import concurrent.futures as cf
    import time

    cfg = SwitchTransformersConfig(
        vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, num_experts=4,
        expert_capacity=8, num_sparse_encoder_layers=1,
        num_sparse_decoder_layers=1, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
        router_jitter_noise=0.0, decoder_start_token_id=0, eos_token_id=1,
        pad_token_id=0, torch_dtype=torch.float32,
        architectures=["SwitchTransformersForConditionalGeneration"],
    )
    torch.manual_seed(5)
    hf = SwitchTransformersForConditionalGeneration(cfg).eval()
    ckpt = tmp_path / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)
    engine = MoE(
        str(ckpt),
        # device_memory_bytes=1 forces the offload plan; dense_paging
        # must be pinned off (it would otherwise auto-trigger on the
        # artificial budget, and paging forces the per-layer path that
        # the continuous batcher cannot ride)
        {"expert_dtype": "float32", "device_memory_bytes": 1,
         "dense_paging": "off",
         "num_slots": 6, "speculative_decode": True, "max_batch_size": 2,
         "max_seq_len": 32},
    )
    try:
        from moe_infinity_tpu.runtime.continuous_s2s import (
            Seq2SeqContinuousBatcher,
        )

        assert isinstance(engine.s2s_batcher, Seq2SeqContinuousBatcher)
        assert engine.s2s_batcher.engine is engine.engine
        p1, p2 = np.array([[5, 31, 8, 77]]), np.array([[9, 4, 61]])
        with torch.no_grad():
            w1 = hf.generate(
                torch.tensor(p1), max_new_tokens=6, do_sample=False
            ).numpy()
            w2 = hf.generate(
                torch.tensor(p2), max_new_tokens=5, do_sample=False
            ).numpy()
        with cf.ThreadPoolExecutor(2) as ex:
            g1 = ex.submit(engine.generate, p1, max_new_tokens=6)
            time.sleep(0.3)
            g2 = ex.submit(engine.generate, p2, max_new_tokens=5)
            r1, r2 = g1.result(), g2.result()
        n1, n2 = min(r1.shape[1], w1.shape[1]), min(r2.shape[1], w2.shape[1])
        np.testing.assert_array_equal(r1[:, :n1], w1[:, :n1])
        np.testing.assert_array_equal(r2[:, :n2], w2[:, :n2])
        assert engine.s2s_batcher.replay_counts
        assert engine.stats().get("speculative_steps", 0) > 0
    finally:
        engine.shutdown()
