from moe_infinity_tpu.store.blob import DenseArchive, ExpertStore, ExpertStoreWriter  # noqa: F401
from moe_infinity_tpu.store.ingest import ingest_checkpoint  # noqa: F401
