"""Device-resident social graph state.

Extends ``DeviceGraph`` with the social-side matrices the social model
families consume — all precomputed ONCE host-side with scipy motif algebra
(SURVEY.md §2.4: one-shot preprocessing, never in the training loop) and
uploaded as DeviceAdj buffers:

  * ``social_adj``    — row-normalized trust matrix S (DiffNet's
    follower-count normalization `univariate/diffnet.py:1070-1077` equals row
    normalization of the 0/1 S)
  * ``mhcn_hs/hj/hp`` — MHCN hypergraph channels (`univariate/mhcn.py:340-368`)
  * ``sept_friend/sept_sharing`` — SEPT views (`univariate/sept_social.py:361-368`)
  * ``esrf_motif``    — ESRF summed motif adjacency (`univariate/esrf.py:1067-1096`)
  * ``interaction_norm`` — one-sided row-normalized R (MHCN's R, DiffNet's A)
"""

from __future__ import annotations

from typing import Sequence

import jax

from recommendation_tpu.data.interaction import Interaction, normalize_graph_mat
from recommendation_tpu.data.social import (
    Relation,
    esrf_motif_adjacency,
    mhcn_hypergraph_channels,
    row_normalize,
    sept_social_views,
)
from recommendation_tpu.graph.device import DeviceGraph, from_scipy


@jax.tree_util.register_pytree_node_class
class SocialDeviceGraph(DeviceGraph):
    _DATA_FIELDS = DeviceGraph._DATA_FIELDS + (
        "social_adj",
        "mhcn_hs",
        "mhcn_hj",
        "mhcn_hp",
        "sept_friend",
        "sept_sharing",
        "esrf_motif",
        "interaction_norm",
    )

    def __init__(
        self,
        data: Interaction,
        social_triples: Sequence[Sequence],
        backend: str = "auto",
        pad_to: int = 8,
        compute_dtype: str = "float32",
        mhcn_purchase_threshold: int = 3,
        esrf_purchase_threshold: int = 5,
    ):
        super().__init__(data, backend=backend, pad_to=pad_to, compute_dtype=compute_dtype)
        relation = Relation(social_triples, data.user)
        self.relation = relation

        S = relation.get_social_mat()
        Y = data.interaction_mat

        def up(mat):
            return from_scipy(mat, backend=self.backend, pad_to=pad_to, compute_dtype=compute_dtype)

        # DiffNet's S entries are 1/|followees(trustor)| (`diffnet.py:1075`)
        # == row normalization of the 0/1 trust matrix.
        self.social_adj = up(row_normalize(S))
        hs, hj, hp = mhcn_hypergraph_channels(S, Y, mhcn_purchase_threshold)
        self.mhcn_hs, self.mhcn_hj, self.mhcn_hp = up(hs), up(hj), up(hp)
        bi = relation.get_bidirectional_social_mat()
        friend, sharing = sept_social_views(bi, Y)
        self.sept_friend, self.sept_sharing = up(friend), up(sharing)
        self.esrf_motif = up(esrf_motif_adjacency(S, Y, esrf_purchase_threshold))
        self.interaction_norm = up(normalize_graph_mat(Y))
