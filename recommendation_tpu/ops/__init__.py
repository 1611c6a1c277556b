from recommendation_tpu.ops.spmm import adj_matmul, segment_softmax  # noqa: F401
from recommendation_tpu.ops.topk import masked_topk, topk_with_exclusions  # noqa: F401
from recommendation_tpu.ops.kmeans import kmeans  # noqa: F401
