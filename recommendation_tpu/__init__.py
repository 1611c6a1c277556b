"""recommendation_tpu — a TPU-native graph-recommender framework.

A from-scratch JAX / XLA / Pallas / pjit re-design of the capability surface of
the Cmint22/Recommendation model zoo (see SURVEY.md): self-supervised /
graph-contrastive collaborative filtering with 10+ model families, built as ONE
coherent stack instead of 21 copy-pasted scripts.

Layer map (mirrors SURVEY.md §1, built once):
  data/       L1-L2  triple ingestion, Interaction store, social relations
  graph/      L3     CSR/COO build, symmetric normalization, augmentation
  ops/        --     TPU compute primitives (adj matmul, fused losses, top-k)
  losses.py   L5     BPR / InfoNCE / batch-softmax / DirectAU / bootstrap / BT
  sampling.py L5     device-side negative sampling
  models/     L4+L6  encoder zoo as pure functions over the primitives
  train/      L6     Recommender lifecycle, jitted steps, early stopping
  evalx/      L7     ranking metrics (exact reference contract), sharded top-k
  tune/       L8     grid + univariate sweeps with per-config fault isolation
  parallel/   --     mesh axes, sharded embedding tables, collective helpers
"""

__version__ = "0.1.0"

from recommendation_tpu.config import Config, OptionConf  # noqa: F401
