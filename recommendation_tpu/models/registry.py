"""Model registry: reference script name → model class."""

from __future__ import annotations

_REGISTRY: dict[str, type] = {}


def register(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls

    return deco


def build(name: str, config):
    key = name.lower()
    if key not in _REGISTRY:
        _ensure_imported()
    if key not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[key](config)


def available() -> list[str]:
    _ensure_imported()
    return sorted(_REGISTRY)


def _ensure_imported():
    # Import every model module so decorators run.
    import importlib

    for mod in (
        "lightgcn", "graphsage", "gat", "gcl", "ssl4rec", "ncl", "selfcf",
        "directau", "buir", "grace", "bgrl", "gbt", "sept", "mhcn", "diffnet",
        "esrf",
    ):
        try:
            importlib.import_module(f"recommendation_tpu.models.{mod}")
        except ImportError:
            pass
