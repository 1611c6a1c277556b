from recommendation_tpu.parallel.mesh import (  # noqa: F401
    MeshSpec,
    make_mesh,
    table_sharding,
    batch_sharding,
    replicated,
)
from recommendation_tpu.parallel.collectives import sharded_topk  # noqa: F401
from recommendation_tpu.parallel.embedding import sharded_embedding_lookup  # noqa: F401
