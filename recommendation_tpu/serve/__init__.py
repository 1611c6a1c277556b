from recommendation_tpu.serve.service import RecommenderService  # noqa: F401
from recommendation_tpu.serve.http import serve_http  # noqa: F401
