from recommendation_tpu.graph.device import DeviceAdj, DeviceGraph  # noqa: F401
from recommendation_tpu.graph.augment import drop_edges, mask_features  # noqa: F401
