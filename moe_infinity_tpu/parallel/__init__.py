from moe_infinity_tpu.parallel.mesh import (
    MeshPlan,
    make_mesh,
    mixtral_param_shardings,
    expert_shardings,
    shard_params,
)
from moe_infinity_tpu.parallel.sequence import caches_from_sp, sp_prefill

__all__ = [
    "MeshPlan",
    "make_mesh",
    "mixtral_param_shardings",
    "expert_shardings",
    "shard_params",
    "sp_prefill",
    "caches_from_sp",
]
