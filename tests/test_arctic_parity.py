"""Arctic parity vs the reference's vendored torch modeling (oracle only;
skipped when /root/reference is not mounted). Exercises the
parallel-attn-mlp-residual MoE layer, dense layers (moe_layer_frequency),
and top-1 / top-2 routing."""

import os
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from moe_infinity_tpu.models.arctic import ArcticModel, ArcticSpec
from moe_infinity_tpu.runtime.generate import Generator
from moe_infinity_tpu.runtime.providers import ResidentProvider
from moe_infinity_tpu.store.blob import DenseArchive, ExpertStore
from moe_infinity_tpu.store.ingest import ingest_checkpoint

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "moe_infinity/models/modeling_arctic")),
    reason="reference arctic modeling not mounted (oracle unavailable)",
)


def _build(tmp, *, freq, parallel, top_k, seed):
    sys.path.insert(0, REF)
    from moe_infinity.models.modeling_arctic.configuration_arctic import ArcticConfig
    from moe_infinity.models.modeling_arctic.modeling_arctic import ArcticForCausalLM

    cfg = ArcticConfig(
        vocab_size=96,
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=2 * freq,
        num_attention_heads=6,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=top_k,
        moe_layer_frequency=freq,
        parallel_attn_mlp_res=parallel,
        max_position_embeddings=64,
        rope_theta=10000.0,
        architectures=["ArcticForCausalLM"],
    )
    torch.manual_seed(seed)
    hf = ArcticForCausalLM(cfg).eval().float()
    ckpt = tmp / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)
    cfg.save_pretrained(ckpt)
    store_dir = str(tmp / "store")
    ingest_checkpoint(
        str(ckpt), store_dir, cfg, expert_dtype="float32", dense_dtype="float32"
    )
    model = ArcticModel(ArcticSpec.from_hf(cfg), compute_dtype=jnp.float32)
    params = model.load_params(DenseArchive(store_dir))
    provider = ResidentProvider(ExpertStore(store_dir), dtype=jnp.float32)
    gen = Generator(
        model, params, provider.pytree(), ResidentProvider.for_layer,
        max_seq_len=64,
    )
    return hf, gen


def _greedy(hf, prompt, n):
    seq = torch.tensor(prompt)
    with torch.no_grad():
        for _ in range(n):
            logits = hf(seq, use_cache=False).logits
            seq = torch.cat([seq, logits[:, -1, :].argmax(-1, keepdim=True)], 1)
    return seq.numpy()


def test_arctic_parallel_residual_matches(tmp_path):
    hf, gen = _build(tmp_path, freq=1, parallel=True, top_k=1, seed=41)
    prompt = np.array([[5, 31, 8, 77]])
    want = _greedy(hf, prompt, 6)
    got = gen.generate(prompt, max_new_tokens=6).sequences
    np.testing.assert_array_equal(got, want)


def test_arctic_dense_interleave_top2_matches(tmp_path):
    hf, gen = _build(tmp_path, freq=2, parallel=False, top_k=2, seed=43)
    prompt = np.array([[9, 3, 44, 6]])
    want = _greedy(hf, prompt, 6)
    got = gen.generate(prompt, max_new_tokens=6).sequences
    np.testing.assert_array_equal(got, want)
