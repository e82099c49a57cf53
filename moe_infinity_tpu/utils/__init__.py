from moe_infinity_tpu.utils.config import EngineConfig  # noqa: F401
