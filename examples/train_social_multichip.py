"""Social model + sharded training example: MHCN on a (data, model) mesh.

Run (simulated 8-device mesh on CPU):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/train_social_multichip.py
On a real multi-chip slice, drop the env vars — the mesh picks up every
visible device.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recommendation_tpu.config import default_config
from recommendation_tpu.data.interaction import Interaction
from recommendation_tpu.data.social import synthesize_social
from recommendation_tpu.data.synthetic import load_or_make_dataset
from recommendation_tpu.graph.social_device import SocialDeviceGraph
from recommendation_tpu.models import get_model
from recommendation_tpu.parallel.mesh import make_mesh
from recommendation_tpu.parallel.trainer import ShardedGraphRecommender

train, test = load_or_make_dataset()
data = Interaction(train, test)
social = synthesize_social(data)  # test.ipynb protocol (θ=0.35 ∪ top-10)

config = default_config(**{
    "max.epoch": 5,
    "embedding.size": 64,
    "MHCN.n_layer": 2,
    "eval.interval": 5,
})
graph = SocialDeviceGraph(data, social)
rec = ShardedGraphRecommender(
    get_model("mhcn", config), data, config, graph=graph, mesh=make_mesh()
)
print(rec.execute())
