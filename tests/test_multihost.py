"""Multi-host (DCN) execution path: 2 CPU processes x 4 virtual devices with
gloo collectives must reproduce the single-process 8-device result exactly
(parallel/distributed.py — SURVEY.md §2.5 DCN comm-backend row)."""

import numpy as np
import pytest

from recommendation_tpu.parallel.distributed import dryrun_multihost


def test_two_process_training_matches_single_process():
    # spawns subprocesses; asserts internally (params + losses allclose)
    dryrun_multihost(n_processes=2, local_devices=4)


def test_hybrid_mesh_single_process_fallback():
    """With one process the hybrid constructor degrades to the flat mesh."""
    import jax

    from recommendation_tpu.parallel.distributed import make_hybrid_mesh
    from recommendation_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    mesh = make_hybrid_mesh(model=2)
    assert mesh.axis_names == (DATA_AXIS, MODEL_AXIS)
    assert mesh.shape[MODEL_AXIS] == 2
    assert mesh.devices.size == len(jax.devices())


def test_two_process_serving_matches_single_process():
    """Sharded serving over a model axis that spans hosts, from a restored
    sharded checkpoint, returns ids identical to the single-process mesh
    (VERDICT-r2 item 8)."""
    from recommendation_tpu.parallel.distributed import dryrun_serve_multihost

    dryrun_serve_multihost(n_processes=2, local_devices=4)
