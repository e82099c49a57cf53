"""moe_infinity_tpu — a TPU-native MoE inference engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
EfficientMoE/MoE-Infinity (see SURVEY.md): host-offloaded expert weights
streamed into a fixed HBM slot arena, expert-activation tracing (EAMC),
activation-aware prefetching and caching, Pallas grouped expert kernels,
and pjit/shard_map multi-chip parallelism.
"""

__version__ = "0.1.0"

from moe_infinity_tpu.utils.config import EngineConfig  # noqa: F401


def __getattr__(name):
    # Lazy import of the heavyweight entrypoint so that
    # `import moe_infinity_tpu` stays cheap in tools/tests.
    if name == "MoE":
        from moe_infinity_tpu.entrypoints.api import MoE

        return MoE
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
