from recommendation_tpu.evalx.metrics import Metric, ranking_metrics, ranking_evaluation  # noqa: F401
from recommendation_tpu.evalx.ranking import evaluate_ranking, RankingResult  # noqa: F401
