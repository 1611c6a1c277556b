"""Model zoo (layers L4+L6): each family is encoder math + loss composition
over the shared primitives — the ~50-150-line model format SURVEY.md §1 calls
for, replacing the reference's 21 vertical-slice scripts."""

from recommendation_tpu.models.base import Model, ForwardOutput  # noqa: F401
from recommendation_tpu.models.lightgcn import LightGCN  # noqa: F401


def get_model(name: str, config):
    """Registry lookup by reference script name or family name."""
    from recommendation_tpu.models import registry

    return registry.build(name, config)
