"""Param-name parsing + geometry vs real HF config classes (tiny configs)."""

import pytest
from transformers import MixtralConfig, NllbMoeConfig, SwitchTransformersConfig

from moe_infinity_tpu.common.arch import expert_layout
from moe_infinity_tpu.utils.hf_config import (
    detect_arch,
    parse_expert_id,
    parse_expert_param,
    parse_geometry,
    parse_moe_param,
)


def mixtral_cfg(**kw):
    d = dict(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        vocab_size=256,
        architectures=["MixtralForCausalLM"],
    )
    d.update(kw)
    return MixtralConfig(**d)


def switch_cfg(**kw):
    d = dict(
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=4,
        num_decoder_layers=4,
        num_heads=4,
        num_experts=8,
        encoder_sparse_step=2,
        decoder_sparse_step=2,
        num_sparse_encoder_layers=2,
        num_sparse_decoder_layers=2,
        vocab_size=256,
        architectures=["SwitchTransformersForConditionalGeneration"],
    )
    d.update(kw)
    return SwitchTransformersConfig(**d)


class FakeDeepseek:
    architectures = ["DeepseekV2ForCausalLM"]
    model_type = "deepseek_v2"
    num_hidden_layers = 5
    n_routed_experts = 16
    first_k_dense_replace = 1
    moe_layer_freq = 1
    hidden_size = 64
    moe_intermediate_size = 32
    torch_dtype = None


def test_detect_arch():
    assert detect_arch(mixtral_cfg()) == "mixtral"
    assert detect_arch(switch_cfg()) == "switch"
    assert detect_arch(FakeDeepseek()) == "deepseek"

    class V3:
        architectures = ["DeepseekV3ForCausalLM"]
        model_type = "deepseek_v3"

    assert detect_arch(V3()) == "deepseek_v3"


def test_parse_moe_param_mixtral():
    L, E, enc = parse_moe_param(mixtral_cfg())
    assert (L, E, enc) == (3, 4, 0)


def test_parse_moe_param_switch():
    L, E, enc = parse_moe_param(switch_cfg())
    assert (L, E, enc) == (4, 8, 2)


def test_parse_moe_param_deepseek_first_dense():
    L, E, enc = parse_moe_param(FakeDeepseek())
    assert (L, E, enc) == (4, 16, 0)


def test_parse_expert_id_mixtral():
    cfg = mixtral_cfg()
    lid, eid = parse_expert_id(
        "model.layers.2.block_sparse_moe.experts.3.w1.weight", cfg
    )
    assert (lid, eid) == (2, 3)
    assert parse_expert_id("model.layers.0.self_attn.q_proj.weight", cfg) == (
        None,
        None,
    )


def test_parse_expert_param_switch_encoder_decoder():
    cfg = switch_cfg()
    # encoder block 1 (sparse step 2) -> moe layer 0
    got = parse_expert_param(
        "encoder.block.1.layer.1.mlp.experts.expert_7.wi.weight", cfg
    )
    assert got == (0, 7, "wi.weight")
    # decoder block 3 -> local 1 + 2 encoder moe layers = 3
    got = parse_expert_param(
        "decoder.block.3.layer.2.mlp.experts.expert_0.wo.weight", cfg
    )
    assert got == (3, 0, "wo.weight")


def test_parse_expert_param_deepseek_offsets_dense_head():
    cfg = FakeDeepseek()
    got = parse_expert_param(
        "model.layers.1.mlp.experts.0.gate_proj.weight", cfg
    )
    assert got == (0, 0, "gate_proj.weight")
    # shared experts are dense, never parsed as routed experts
    assert (
        parse_expert_param(
            "model.layers.1.mlp.shared_experts.gate_proj.weight", cfg
        )
        is None
    )


def test_expert_layout_shapes():
    lay = expert_layout(mixtral_cfg())
    assert lay.names == ("w1.weight", "w2.weight", "w3.weight")
    # compute layout: [in, out] (transposed from HF torch-Linear)
    shapes = {t.name: t.shape for t in lay.tensors}
    assert shapes["w1.weight"] == (64, 128)
    assert shapes["w2.weight"] == (128, 64)
    assert lay.activation == "silu" and lay.gated

    lay = expert_layout(switch_cfg())
    assert lay.names == ("wi.weight", "wo.weight")
    assert lay.activation == "relu" and not lay.gated

    nllb = NllbMoeConfig(
        d_model=32,
        encoder_ffn_dim=64,
        decoder_ffn_dim=64,
        encoder_layers=4,
        decoder_layers=4,
        encoder_sparse_step=2,
        decoder_sparse_step=2,
        num_experts=4,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        vocab_size=256,
        architectures=["NllbMoeForConditionalGeneration"],
    )
    lay = expert_layout(nllb)
    assert "fc1.bias" in lay.names
    g = parse_geometry(nllb)
    assert g.num_moe_layers == 4 and g.num_encoder_moe_layers == 2
