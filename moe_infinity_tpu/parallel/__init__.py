from moe_infinity_tpu.parallel.mesh import (
    MeshPlan,
    make_mesh,
    mixtral_param_shardings,
    expert_shardings,
    shard_params,
)

__all__ = [
    "MeshPlan",
    "make_mesh",
    "mixtral_param_shardings",
    "expert_shardings",
    "shard_params",
]
