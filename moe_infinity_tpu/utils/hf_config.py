"""HuggingFace-config introspection: architecture detection, MoE geometry,
and expert parameter-name parsing.

Behavioral parity with the reference's
/root/reference/moe_infinity/utils/hf_config.py:8-126 and
/root/reference/moe_infinity/common/constants.py:18-54, re-designed around a
declarative `ArchSpec` table instead of per-arch if/else chains so the store,
arena, and model layers all consume one source of truth.

Layer-id convention (same as the reference): MoE layers are numbered 0..L-1
across the whole model, encoder sparse layers first, then decoder sparse
layers; a model's raw block index is divided by its sparse step.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

SUPPORTED_ARCHS = (
    "switch",
    "nllb",
    "mixtral",
    "grok",
    "arctic",
    "deepseek_v3",
    "deepseek",
    # dense decoder-only: the reference registers plain OPT in
    # MODEL_MAPPING_NAMES (constants.py:22) and serves it with every
    # layer treated as a dense offload unit; keep LAST so the MoE archs
    # win substring matches
    "opt",
)


@dataclass(frozen=True)
class MoEGeometry:
    """Global MoE shape of one checkpoint."""

    arch: str
    num_moe_layers: int  # encoder + decoder sparse layers
    num_experts: int  # routed experts per sparse layer
    num_encoder_moe_layers: int
    encoder_sparse_step: int = 1
    decoder_sparse_step: int = 1
    first_k_dense_replace: int = 0  # DeepSeek: leading dense layers


def detect_arch(config) -> str:
    """Map an HF config to one of SUPPORTED_ARCHS (longest match wins so
    'deepseek_v3' is preferred over 'deepseek')."""
    name = ""
    if getattr(config, "architectures", None):
        name = config.architectures[0].lower()
    if not name:
        name = getattr(config, "model_type", "").lower()
    # normalize: DeepseekV3ForCausalLM -> deepseek_v3
    if "deepseekv3" in name.replace("_", "") or "deepseek_v3" in name:
        return "deepseek_v3"
    for arch in SUPPORTED_ARCHS:
        if arch in name:
            return arch
    raise RuntimeError(
        f"Unsupported architecture {name!r}; supported: {SUPPORTED_ARCHS}"
    )


def parse_moe_param(config) -> Tuple[int, int, int]:
    """(num_moe_layers, num_experts, num_encoder_moe_layers) — same contract
    as the reference's parse_moe_param (hf_config.py:22-53)."""
    g = parse_geometry(config)
    return g.num_moe_layers, g.num_experts, g.num_encoder_moe_layers


def parse_geometry(config) -> MoEGeometry:
    arch = detect_arch(config)
    if arch == "switch":
        enc = config.num_sparse_encoder_layers
        dec = config.num_sparse_decoder_layers
        return MoEGeometry(
            arch=arch,
            num_moe_layers=enc + dec,
            num_experts=config.num_experts,
            num_encoder_moe_layers=enc,
            encoder_sparse_step=getattr(config, "encoder_sparse_step", 2),
            decoder_sparse_step=getattr(config, "decoder_sparse_step", 2),
        )
    if arch == "nllb":
        enc_step = config.encoder_sparse_step
        dec_step = config.decoder_sparse_step
        enc = config.encoder_layers // enc_step
        dec = config.decoder_layers // dec_step
        return MoEGeometry(
            arch=arch,
            num_moe_layers=enc + dec,
            num_experts=config.num_experts,
            num_encoder_moe_layers=enc,
            encoder_sparse_step=enc_step,
            decoder_sparse_step=dec_step,
        )
    if arch == "mixtral":
        return MoEGeometry(
            arch=arch,
            num_moe_layers=config.num_hidden_layers,
            num_experts=config.num_local_experts,
            num_encoder_moe_layers=0,
        )
    if arch == "arctic":
        freq = getattr(config, "moe_layer_frequency", 1) or 1
        return MoEGeometry(
            arch=arch,
            num_moe_layers=config.num_hidden_layers // freq,
            num_experts=config.num_local_experts,
            num_encoder_moe_layers=0,
            decoder_sparse_step=freq,
        )
    if arch == "grok":
        return MoEGeometry(
            arch=arch,
            num_moe_layers=config.num_hidden_layers,
            num_experts=config.num_experts,
            num_encoder_moe_layers=0,
        )
    if arch in ("deepseek", "deepseek_v3"):
        first_dense = getattr(config, "first_k_dense_replace", 0)
        step = getattr(config, "moe_layer_freq", 1) or 1
        n_moe = max(0, (config.num_hidden_layers - first_dense + step - 1) // step)
        return MoEGeometry(
            arch=arch,
            num_moe_layers=n_moe,
            num_experts=config.n_routed_experts,
            num_encoder_moe_layers=0,
            decoder_sparse_step=step,
            first_k_dense_replace=first_dense,
        )
    if arch == "opt":  # dense decoder-only: no MoE geometry at all
        return MoEGeometry(
            arch=arch, num_moe_layers=0, num_experts=0,
            num_encoder_moe_layers=0,
        )
    raise AssertionError(arch)


# One regex per arch family capturing (coder?, block_idx, expert_idx, tail).
_EXPERT_PATTERNS: Dict[str, re.Pattern] = {
    "switch": re.compile(
        r"(encoder|decoder)\.block\.(\d+)\..*?experts\.expert_(\d+)\.(.+)"
    ),
    "nllb": re.compile(
        r"(encoder|decoder)\.layers\.(\d+)\..*?experts\.expert_(\d+)\.(.+)"
    ),
    "mixtral": re.compile(
        r"layers\.(\d+)\.block_sparse_moe\.experts\.(\d+)\.(.+)"
    ),
    "arctic": re.compile(
        r"layers\.(\d+)\.block_sparse_moe\.experts\.(\d+)\.(.+)"
    ),
    "grok": re.compile(r"layers\.(\d+)\.moe_block\.experts\.(\d+)\.(.+)"),
    "deepseek": re.compile(r"layers\.(\d+)\.mlp\.experts\.(\d+)\.(.+)"),
    "deepseek_v3": re.compile(r"layers\.(\d+)\.mlp\.experts\.(\d+)\.(.+)"),
}


def parse_expert_id(
    param_name: str, config
) -> Tuple[Optional[int], Optional[int]]:
    """(global_moe_layer_id, expert_id) for an expert param, (None, None)
    otherwise. Same contract as reference parse_expert_id (hf_config.py:56-126)."""
    parsed = parse_expert_param(param_name, config)
    if parsed is None:
        return None, None
    return parsed[0], parsed[1]


def parse_expert_param(
    param_name: str, config
) -> Optional[Tuple[int, int, str]]:
    """(global_moe_layer_id, expert_id, weight_name) or None.

    weight_name is the per-expert tensor tail, e.g. 'wi.weight',
    'w1.weight', 'gate_proj.weight' — the key used by the expert store
    layout.
    """
    g = parse_geometry(config)
    if g.num_experts == 0:  # dense-only archs (opt): nothing routes
        return None
    pat = _EXPERT_PATTERNS[g.arch]
    m = pat.search(param_name)
    if not m:
        return None
    if g.arch in ("switch", "nllb"):
        coder, block, expert, tail = m.groups()
        block, expert = int(block), int(expert)
        if coder == "encoder":
            layer = block // g.encoder_sparse_step
        else:
            layer = block // g.decoder_sparse_step + g.num_encoder_moe_layers
    else:
        block, expert, tail = m.groups()
        block, expert = int(block), int(expert)
        if g.arch in ("deepseek", "deepseek_v3"):
            layer = (block - g.first_k_dense_replace) // g.decoder_sparse_step
        elif g.arch == "arctic":
            # MoE layers sit at (i+1) % freq == 0
            layer = (block + 1) // g.decoder_sparse_step - 1
        else:
            layer = block
    return layer, expert, tail


def parse_expert_dtype(config) -> str:
    """Checkpoint compute dtype as a string ('bfloat16' | 'float32' |
    'float16'). The reference returns an int enum (hf_config.py:8-19); we
    keep strings and map at the store boundary."""
    dt = getattr(config, "torch_dtype", None)
    name = str(dt).replace("torch.", "") if dt is not None else "float32"
    if name not in ("bfloat16", "float32", "float16"):
        raise ValueError(f"unknown checkpoint dtype {name}")
    return name
