from recommendation_tpu.data.io import load_data, FileIO  # noqa: F401
from recommendation_tpu.data.interaction import Interaction  # noqa: F401
from recommendation_tpu.data.social import Relation, synthesize_social  # noqa: F401
from recommendation_tpu.data.synthetic import make_synthetic_dataset  # noqa: F401
