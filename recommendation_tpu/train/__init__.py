from recommendation_tpu.train.recommender import GraphRecommender  # noqa: F401
from recommendation_tpu.train.loop import make_epoch_fn, make_optimizer  # noqa: F401
