from moe_infinity_tpu.parallel.mesh import (
    MeshPlan,
    make_mesh,
    mixtral_param_shardings,
    expert_shardings,
    shard_params,
)
from moe_infinity_tpu.parallel.pod import (
    PodExpertPlan,
    PodPrefetchCoordinator,
)
from moe_infinity_tpu.parallel.sequence import (
    SPDecoder,
    caches_from_sp,
    sp_encode,
    sp_prefill,
)

__all__ = [
    "MeshPlan",
    "make_mesh",
    "mixtral_param_shardings",
    "expert_shardings",
    "shard_params",
    "PodExpertPlan",
    "PodPrefetchCoordinator",
    "sp_prefill",
    "sp_encode",
    "SPDecoder",
    "caches_from_sp",
]
