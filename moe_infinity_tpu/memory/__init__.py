from moe_infinity_tpu.memory.tracer import ExpertTracer, TraceEntry
from moe_infinity_tpu.memory.predictor import ExpertPredictor
from moe_infinity_tpu.memory.cache_policy import CacheStats, ExpertCachePolicy
from moe_infinity_tpu.memory.prefetch_plan import plan_prefetch

__all__ = [
    "ExpertTracer",
    "TraceEntry",
    "ExpertPredictor",
    "ExpertCachePolicy",
    "CacheStats",
    "plan_prefetch",
]
