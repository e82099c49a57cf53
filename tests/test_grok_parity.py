"""Grok-1 parity vs the reference's vendored torch modeling (used purely as
a test oracle when /root/reference is mounted; skipped otherwise)."""

import os
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from moe_infinity_tpu.models.grok import GrokModel, GrokSpec
from moe_infinity_tpu.runtime.generate import Generator
from moe_infinity_tpu.runtime.providers import ResidentProvider
from moe_infinity_tpu.store.blob import DenseArchive, ExpertStore
from moe_infinity_tpu.store.ingest import ingest_checkpoint

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "moe_infinity/models/modeling_grok")),
    reason="reference grok modeling not mounted (oracle unavailable)",
)


@pytest.fixture(scope="module")
def grok_setup(tmp_path_factory):
    sys.path.insert(0, REF)
    from moe_infinity.models.modeling_grok.configuration_grok1 import Grok1Config
    from moe_infinity.models.modeling_grok.modeling_grok1 import Grok1ModelForCausalLM

    cfg = Grok1Config(
        vocab_size=128,
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=6,
        num_key_value_heads=2,
        num_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=128,
        attn_output_multiplier=0.15,
        max_attn_value=30.0,
        embedding_multiplier_scale=2.0,
        output_multiplier_scale=0.5,
        architectures=["Grok1ModelForCausalLM"],
    )
    torch.manual_seed(9)
    hf = Grok1ModelForCausalLM(cfg).eval().float()
    # reference zero-inits weights; randomize for a meaningful oracle
    with torch.no_grad():
        for p in hf.parameters():
            if p.dim() >= 1:
                p.normal_(0, 0.05)
    ckpt = tmp_path_factory.mktemp("grok") / "ckpt"
    hf.save_pretrained(ckpt, safe_serialization=True)
    cfg.save_pretrained(ckpt)
    store_dir = str(tmp_path_factory.mktemp("grok") / "store")
    ingest_checkpoint(
        str(ckpt), store_dir, cfg, expert_dtype="float32", dense_dtype="float32"
    )
    model = GrokModel(GrokSpec.from_hf(cfg), compute_dtype=jnp.float32)
    params = model.load_params(DenseArchive(store_dir))
    provider = ResidentProvider(ExpertStore(store_dir), dtype=jnp.float32)
    gen = Generator(
        model, params, provider.pytree(), ResidentProvider.for_layer,
        max_seq_len=64,
    )
    return cfg, hf, gen


def test_grok_logits_close(grok_setup):
    cfg, hf, gen = grok_setup
    ids = torch.tensor([[3, 17, 42, 7, 99]])
    with torch.no_grad():
        want = hf(ids).logits.float().numpy()
    kv = gen.stepper.init_cache(1, 16)
    logits, _, _ = gen.stepper.forward(
        jnp.asarray(ids.numpy(), jnp.int32),
        jnp.broadcast_to(jnp.arange(5, dtype=jnp.int32), (1, 5)),
        kv,
        jnp.int32(0),
    )
    np.testing.assert_allclose(np.asarray(logits), want, rtol=3e-3, atol=3e-3)


def test_grok_greedy_matches(grok_setup):
    cfg, hf, gen = grok_setup
    prompt = np.array([[5, 31, 8, 77]])
    # manual greedy loop (the vendored model predates GenerationMixin
    # changes in current transformers)
    seq = torch.tensor(prompt)
    with torch.no_grad():
        for _ in range(6):
            logits = hf(seq).logits
            nxt = logits[:, -1, :].argmax(-1, keepdim=True)
            seq = torch.cat([seq, nxt], dim=1)
    want = seq.numpy()
    got = gen.generate(prompt, max_new_tokens=6).sequences
    np.testing.assert_array_equal(got, want)
