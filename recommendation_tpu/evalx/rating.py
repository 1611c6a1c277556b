"""Rating-prediction evaluation (MAE/RMSE) — `univariate/diffnet.py:560-657`
``Measure.ratingMeasure`` path.

The reference's rating predictor is the score dot product clamped to the
rating scale, with the global train mean as fallback for unseen pairs.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from recommendation_tpu.data.interaction import Interaction
from recommendation_tpu.evalx.metrics import Metric


def global_mean(data: Interaction) -> float:
    if not len(data.edge_weights):
        return 0.0
    return float(np.mean(data.edge_weights))


def evaluate_rating(
    user_emb,
    item_emb,
    data: Interaction,
    clip: Tuple[float, float] | None = None,
) -> Dict[str, float]:
    """Predict r̂(u,i) = <e_u, e_i> for every test pair; MAE/RMSE report."""
    ue = np.asarray(user_emb)
    ie = np.asarray(item_emb)
    mean = global_mean(data)
    rows = []
    for user, item, rating in data.test_data:
        uid = data.get_user_id(user)
        iid = data.get_item_id(item)
        if uid is None or iid is None:
            pred = mean
        else:
            pred = float(ue[uid] @ ie[iid])
        if clip is not None:
            pred = float(np.clip(pred, clip[0], clip[1]))
        rows.append((user, item, float(rating), pred))
    return {"MAE": Metric.MAE(rows), "RMSE": Metric.RMSE(rows)}
