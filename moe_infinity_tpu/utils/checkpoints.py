"""Checkpoint discovery: resolve a model path into an ordered list of weight
shard files (safetensors preferred, torch .bin accepted).

Capability parity with /root/reference/moe_infinity/utils/checkpoints.py:22-86.
"""

from __future__ import annotations

import json
import os
from typing import List, Tuple

SAFE_WEIGHTS_NAME = "model.safetensors"
SAFE_WEIGHTS_INDEX_NAME = "model.safetensors.index.json"
WEIGHTS_NAME = "pytorch_model.bin"
WEIGHTS_INDEX_NAME = "pytorch_model.bin.index.json"


def get_checkpoint_paths(checkpoint: str) -> Tuple[List[str], bool]:
    """Return (ordered shard paths, is_safetensors).

    `checkpoint` may be a single weights file, an index json, or a model
    directory containing either.
    """
    if os.path.isfile(checkpoint):
        if checkpoint.endswith(".index.json"):
            return _from_index(checkpoint)
        return [checkpoint], checkpoint.endswith(".safetensors")

    if not os.path.isdir(checkpoint):
        raise FileNotFoundError(f"checkpoint not found: {checkpoint}")

    for index_name in (SAFE_WEIGHTS_INDEX_NAME, WEIGHTS_INDEX_NAME):
        index_path = os.path.join(checkpoint, index_name)
        if os.path.isfile(index_path):
            return _from_index(index_path)

    for name in (SAFE_WEIGHTS_NAME, WEIGHTS_NAME):
        path = os.path.join(checkpoint, name)
        if os.path.isfile(path):
            return [path], name.endswith(".safetensors")

    # Fall back to any sharded files present without an index.
    entries = sorted(os.listdir(checkpoint))
    safes = [e for e in entries if e.endswith(".safetensors")]
    if safes:
        return [os.path.join(checkpoint, e) for e in safes], True
    bins = [e for e in entries if e.endswith(".bin") and "arguments" not in e]
    if bins:
        return [os.path.join(checkpoint, e) for e in bins], False
    raise FileNotFoundError(f"no weight files under {checkpoint}")


def _from_index(index_path: str) -> Tuple[List[str], bool]:
    with open(index_path) as f:
        index = json.load(f)
    folder = os.path.dirname(index_path)
    shards = sorted(set(index["weight_map"].values()))
    paths = [os.path.join(folder, s) for s in shards]
    return paths, all(p.endswith(".safetensors") for p in paths)
