import json

import pytest

from moe_infinity_tpu.utils.config import EngineConfig


def test_defaults():
    c = EngineConfig()
    assert c.trace_capacity == 1000
    assert c.prefetch is True
    assert 0 < c.device_memory_ratio <= 1


def test_load_from_json_roundtrip(tmp_path):
    c = EngineConfig(offload_path="/tmp/x", device_memory_ratio=0.5, num_slots=16)
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(c.to_json()))
    c2 = EngineConfig.load_from_file(str(p))
    assert c2 == c


def test_unknown_key_rejected():
    with pytest.raises(ValueError, match="unknown"):
        EngineConfig.load_from_json({"not_a_key": 1})


def test_validation():
    with pytest.raises(ValueError):
        EngineConfig(device_memory_ratio=0.0)
    with pytest.raises(ValueError):
        EngineConfig(expert_dtype="int2")
