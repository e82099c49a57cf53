"""Encoder-decoder generation with PADDED batches (attention_mask path):
mixed-length prompts in one batch match HF's padded generation for both
Switch (relative-bias masking) and NLLB (mask-derived sinusoidal position
ids)."""

import numpy as np
import pytest
import torch
from transformers import (
    NllbMoeConfig,
    NllbMoeForConditionalGeneration,
    SwitchTransformersConfig,
    SwitchTransformersForConditionalGeneration,
)

import jax.numpy as jnp

from moe_infinity_tpu.models.nllb import NllbModel, NllbSpec
from moe_infinity_tpu.models.switch import SwitchModel, SwitchSpec
from moe_infinity_tpu.runtime.generate import Seq2SeqGenerator
from moe_infinity_tpu.runtime.providers import ResidentProvider
from moe_infinity_tpu.store.blob import DenseArchive, ExpertStore
from moe_infinity_tpu.store.ingest import ingest_checkpoint


def test_switch_padded_batch(tmp_path):
    cfg = SwitchTransformersConfig(
        vocab_size=96, d_model=32, d_kv=8, d_ff=64,
        num_layers=2, num_decoder_layers=2, num_heads=4, num_experts=4,
        expert_capacity=8, num_sparse_encoder_layers=1,
        num_sparse_decoder_layers=1, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
        router_jitter_noise=0.0, decoder_start_token_id=0, eos_token_id=1,
        pad_token_id=0, torch_dtype=torch.float32,
        architectures=["SwitchTransformersForConditionalGeneration"],
    )
    torch.manual_seed(37)
    hf = SwitchTransformersForConditionalGeneration(cfg).eval()
    ckpt = tmp_path / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)
    store = str(tmp_path / "store")
    ingest_checkpoint(str(ckpt), store, cfg, expert_dtype="float32",
                      dense_dtype="float32")
    model = SwitchModel(SwitchSpec.from_hf(cfg), compute_dtype=jnp.float32)
    params = model.load_params(DenseArchive(store))
    provider = ResidentProvider(ExpertStore(store), dtype=jnp.float32)
    gen = Seq2SeqGenerator(
        model, params, provider.pytree(), ResidentProvider.for_layer
    )
    # right-padded batch: row 1 is shorter
    ids = np.array([[5, 31, 8, 77], [9, 3, 0, 0]])
    mask = np.array([[1, 1, 1, 1], [1, 1, 0, 0]], dtype=np.float32)
    with torch.no_grad():
        want = hf.generate(
            torch.tensor(ids), attention_mask=torch.tensor(mask).long(),
            max_new_tokens=6, do_sample=False,
        ).numpy()
    got = gen.generate(ids, max_new_tokens=6, attention_mask=mask).sequences
    n = min(got.shape[1], want.shape[1])
    np.testing.assert_array_equal(got[:, :n], want[:, :n])


def test_nllb_padded_batch(tmp_path):
    cfg = NllbMoeConfig(
        vocab_size=96, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, encoder_sparse_step=2,
        decoder_sparse_step=2, num_experts=4, max_position_embeddings=64,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        moe_token_dropout=0.0, router_jitter_noise=0.0, pad_token_id=1,
        bos_token_id=0, eos_token_id=2, decoder_start_token_id=2,
        torch_dtype=torch.float32,
        architectures=["NllbMoeForConditionalGeneration"],
    )
    torch.manual_seed(41)
    hf = NllbMoeForConditionalGeneration(cfg).eval()
    ckpt = tmp_path / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)
    store = str(tmp_path / "store")
    ingest_checkpoint(str(ckpt), store, cfg, expert_dtype="float32",
                      dense_dtype="float32")
    model = NllbModel(NllbSpec.from_hf(cfg), compute_dtype=jnp.float32)
    params = model.load_params(DenseArchive(store))
    provider = ResidentProvider(ExpertStore(store), dtype=jnp.float32)
    gen = Seq2SeqGenerator(
        model, params, provider.pytree(), ResidentProvider.for_layer
    )
    # NLLB pads with token 1 (its padding_idx drives position ids)
    ids = np.array([[5, 31, 8, 77, 2], [9, 3, 44, 2, 1]])
    mask = np.array([[1, 1, 1, 1, 1], [1, 1, 1, 1, 0]], dtype=np.float32)
    with torch.no_grad():
        want = hf.generate(
            torch.tensor(ids), attention_mask=torch.tensor(mask).long(),
            max_new_tokens=6, do_sample=False,
        ).numpy()
    got = gen.generate(
        ids, max_new_tokens=6, attention_mask=mask, eos_token_id=2
    ).sequences
    n = min(got.shape[1], want.shape[1])
    np.testing.assert_array_equal(got[:, :n], want[:, :n])
