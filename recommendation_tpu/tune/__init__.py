from recommendation_tpu.tune.tuner import (  # noqa: F401
    GridTuner,
    UnivariateTuner,
    generate_independent_grid,
    print_summary,
)
