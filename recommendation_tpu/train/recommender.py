"""Recommender lifecycle (layer L6).

Mirrors the reference's ``Recommender → GraphRecommender`` base-class
contract — ``build / train / test / evaluate / fast_evaluation / save /
execute`` (`selfcf.py:331-453`, `ncl.py:234-277`, `directau.py:147-191`) —
on top of the jitted epoch machinery.

Quality-control behaviors carried over (SURVEY.md §5):
  * per-epoch ``fast_evaluation`` with best-model tracking by Recall@maxN
    (`ncl.py:271-277`) or metric majority vote (`selfcf.py:437-444`),
    selected via ``model.selection`` config;
  * in-memory best snapshot + restore (`selfcf.py:575-579`);
  * early stopping with patience (`ssl4rec.py:213,240-244`);
  * per-step NaN guard (NaN-loss abort, `univariate/diffnet.py:782-786`).
Disk checkpoints (which the reference lacks) live in ``train/checkpoint.py``.
"""

from __future__ import annotations

import math
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from recommendation_tpu.config import Config, default_config
from recommendation_tpu.data.interaction import Interaction
from recommendation_tpu.evalx.ranking import RankingResult, evaluate_ranking
from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.models.base import Model
from recommendation_tpu.train.loop import (
    make_epoch_fn,
    make_multi_epoch_fn,
    make_optimizer,
    tree_copy,
)
from recommendation_tpu.utils.logging import Log


class GraphRecommender:
    def __init__(
        self,
        model: Model,
        data: Interaction,
        config: Optional[Config] = None,
        graph: Optional[DeviceGraph] = None,
        log: Optional[Log] = None,
    ):
        from recommendation_tpu.config import apply_legacy_options

        self.model = model
        self.data = data
        self.config = apply_legacy_options(
            config if config is not None else default_config()
        )
        self.graph = graph if graph is not None else DeviceGraph(
            data,
            backend=self.config.get("graph.backend", "auto"),
            compute_dtype=self.config.get("graph.compute_dtype", "float32"),
        )
        self.log = log or Log(name=model.name)
        self.topN = list(self.config.get("item.ranking.topN", [10, 20, 30, 50]))
        self.max_N = max(self.topN)
        self.batch_size = int(self.config.get("batch.size", 2048))
        self.max_epoch = int(self.config.get("max.epoch", 30))
        self.eval_interval = int(self.config.get("eval.interval", 1))
        self.patience = self.config.get("early.stopping.patience", None)
        self.selection = str(self.config.get("model.selection", "recall"))

        self.params = None
        self.state = None
        self.opt_state = None
        self.best_params = None
        self.best_state = None
        self.best_metrics: Dict[str, float] = {}
        self.best_epoch = -1
        self.history: list[dict] = []

    # -- lifecycle ------------------------------------------------------------

    def print_model_info(self):
        u, i, e = self.data.training_size()
        backend = self.graph.backend
        if backend == "pallas":  # honest config surface: no kernel exists yet
            backend = "pallas(->segment fallback)"
        self.log.add(
            f"model={self.model.name} users={u} items={i} interactions={e} "
            f"backend={backend} emb={self.model.emb_size}"
        )

    def build(self):
        rng = jax.random.PRNGKey(int(self.config.get("seed", 0)))
        self.params, self.state = self.model.init(rng, self.graph)
        self._bold = None
        if self.config.get("adaptive.lr", False):
            # legacy bold-driver schedule (`univariate/diffnet.py:756-763`)
            from recommendation_tpu.train.loop import make_bold_driver_optimizer

            self.optimizer, self._bold = make_bold_driver_optimizer(self.config)
        else:
            self.optimizer = self.model.make_optimizer(self.config) or make_optimizer(self.config)
        self.opt_state = self.optimizer.init(self.params)
        # chunk very long epochs into several device executions so one call
        # stays under the runtime watchdog (~1-2 min kills; observed on
        # ~245-step scans at 4M edges — bench.py uses the same guard). The
        # gate is COST-aware: per-step time scales with edge count (each
        # step runs full-graph propagation), so weigh steps by millions of
        # edges — 245 steps at 4M edges is over the default budget while 110
        # steps at 2M (a ~5 s epoch) stays unchunked. The chunked path is
        # numerically identical (tests/test_train_extras.py).
        n_batches = -(-self.graph.n_edges // self.batch_size)
        cost_weight = max(1, -(-self.graph.n_edges // 1_000_000))
        max_steps = int(self.config.get("train.max_steps_per_call", 512))
        steps_per_call = (
            int(self.config.get("train.steps_per_call", 32))
            if n_batches * cost_weight > max_steps
            else None
        )
        self._epoch_fn = make_epoch_fn(
            self.model, self.optimizer, self.batch_size,
            steps_per_call=steps_per_call,
        )
        self._fused_fns: Dict[int, object] = {}
        self._rng = jax.random.PRNGKey(int(self.config.get("seed", 0)) + 1)
        self.start_epoch = 0
        self._ckpt = None
        ckpt_dir = self.config.get("checkpoint.dir")
        if ckpt_dir:
            from recommendation_tpu.train.checkpoint import CheckpointManager

            self._ckpt = CheckpointManager(
                ckpt_dir, keep=int(self.config.get("checkpoint.keep", 3))
            )
            if self.config.get("checkpoint.resume", True):
                restored = self._ckpt.restore_latest()
                if restored is not None:
                    from recommendation_tpu.train.checkpoint import restore_into

                    self.params = restore_into(self.params, restored["params"])
                    self.opt_state = restore_into(self.opt_state, restored["opt_state"])
                    self.state = restore_into(self.state, restored["state"])
                    self.start_epoch = int(restored["epoch"]) + 1
                    self.log.add(f"resumed from checkpoint at epoch {restored['epoch']}")

    def _can_fuse_epochs(self) -> bool:
        """True when a block of ``eval.interval`` epochs can run as ONE device
        execution (`make_multi_epoch_fn`): no per-epoch HOST work is active —
        ``epoch_begin`` is the base no-op, no bold-driver LR injection, no
        convergence check (which must see each epoch's loss before the next
        one runs). Gated additionally on total scan length so one device
        execution stays under the runtime watchdog. The fused path draws the
        exact per-epoch keys the unfused loop would, so the two paths are
        numerically identical while losses stay finite (pinned by
        tests/test_train_extras.py). Sole divergence: a NaN epoch aborts at
        BLOCK granularity — later epochs of the same block have already run
        (their per-step guards still skip non-finite updates), whereas the
        unfused loop stops before them."""
        from recommendation_tpu.models.base import Model

        mode = self.config.get("train.fuse_epochs", "auto")
        if mode is False or str(mode).lower() == "false":
            return False
        n_batches = -(-self.graph.n_edges // self.batch_size)
        # fuse only when ONE epoch is short enough that the per-epoch
        # dispatch RTT is a real fraction of its compute (same threshold as
        # bench.py). Long single executions are also actively SLOWER on this
        # runtime: a 330-step fused scan measured 8x below the same steps
        # chunked (21.5k vs 182k ex/s at Gowalla scale, watchdog-adjacent
        # execution times) — fusing big epochs is a loss twice over.
        fuse_below = int(self.config.get("train.fuse_below_steps", 64))
        max_steps = int(self.config.get("train.max_fused_steps", 1024))
        # weight by per-step edge cost — the same factor the auto-chunk gate
        # uses — so a short-epoch/large-graph config can't fuse a block whose
        # wall-clock approaches the ~1-2 min device watchdog
        cost_weight = max(1, -(-self.graph.n_edges // 1_000_000))
        return (
            self.eval_interval > 1
            and type(self.model).epoch_begin is Model.epoch_begin
            and self._bold is None
            and self.config.get("convergence.eps", None) is None
            and n_batches <= fuse_below
            and n_batches * self.eval_interval * cost_weight <= max_steps
        )

    def _fused_fn(self, n_epochs: int):
        if n_epochs not in self._fused_fns:
            self._fused_fns[n_epochs] = make_multi_epoch_fn(
                self.model, self.optimizer, self.batch_size, n_epochs=n_epochs
            )
        return self._fused_fns[n_epochs]

    def train(self):
        bad_epochs = 0
        last_loss = None
        conv_eps = self.config.get("convergence.eps", None)
        fuse = self._can_fuse_epochs()
        examples = -(-self.graph.n_edges // self.batch_size) * self.batch_size
        epoch = self.start_epoch
        aborted = False
        while epoch < self.max_epoch and not aborted:
            # epochs up to and including the next eval boundary
            iv = self.eval_interval
            next_eval = min((epoch // iv) * iv + iv - 1, self.max_epoch - 1)
            block = next_eval - epoch + 1
            if fuse and block > 1:
                t0 = time.perf_counter()
                keys = []
                for _ in range(block):
                    # identical key sequence to the unfused loop below
                    self._rng, _ek, tk = jax.random.split(self._rng, 3)
                    keys.append(tk)
                self.params, self.opt_state, self.state, losses = self._fused_fn(block)(
                    self.graph, self.params, self.opt_state, self.state,
                    jnp.stack(keys),
                )
                losses = np.asarray(losses).tolist()  # one host transfer
                dt = (time.perf_counter() - t0) / block
                for k, loss in enumerate(losses):
                    if math.isnan(loss):
                        # block-granular abort: the per-step NaN guard already
                        # kept non-finite updates out of the tables
                        self.log.add(
                            f"epoch {epoch + k}: loss is NaN — aborting "
                            f"(diffnet.py:782-786 guard)"
                        )
                        aborted = True
                        break
                    self.log.add(
                        f"epoch {epoch + k}: loss={loss:.5f} ({dt:.2f}s, "
                        f"{examples / dt:,.0f} examples/s, fused x{block})"
                    )
                if aborted:
                    break
                last_loss = losses[-1]
                epoch = next_eval
            else:
                t0 = time.perf_counter()
                self._rng, ek, tk = jax.random.split(self._rng, 3)
                self.state = self.model.epoch_begin(
                    self.params, self.state, self.graph, ek, epoch
                )
                self.params, self.opt_state, self.state, loss = self._epoch_fn(
                    self.graph, self.params, self.opt_state, self.state, tk
                )
                loss = float(loss)
                dt = time.perf_counter() - t0
                if math.isnan(loss):
                    self.log.add(
                        f"epoch {epoch}: loss is NaN — aborting (diffnet.py:782-786 guard)"
                    )
                    break
                self.log.add(
                    f"epoch {epoch}: loss={loss:.5f} ({dt:.2f}s, "
                    f"{examples / dt:,.0f} examples/s)"
                )
                # convergence check (`univariate/diffnet.py:782-802` semantics:
                # |delta loss| < eps stops; otherwise adapt the learning rate)
                if last_loss is not None and conv_eps is not None:
                    if abs(last_loss - loss) < float(conv_eps):
                        self.log.add(
                            f"converged at epoch {epoch} (|Δloss| < {conv_eps})"
                        )
                        self.fast_evaluation(epoch)
                        break
                if self._bold is not None:
                    new_lr = self._bold.update(epoch, loss)
                    self.opt_state.hyperparams["learning_rate"] = jnp.asarray(
                        new_lr, dtype=jnp.float32
                    )
                    self.log.add(f"  bold-driver lr -> {new_lr:.6f}")
                last_loss = loss
            if (epoch + 1) % self.eval_interval == 0 or epoch == self.max_epoch - 1:
                improved = self.fast_evaluation(epoch)
                bad_epochs = 0 if improved else bad_epochs + 1
                if self._ckpt is not None:
                    self._ckpt.save(
                        epoch,
                        {
                            "params": self.params,
                            "opt_state": self.opt_state,
                            "state": self.state,
                            "epoch": epoch,
                        },
                    )
                if self.patience is not None and bad_epochs > int(self.patience):
                    self.log.add(f"early stop at epoch {epoch} (patience {self.patience})")
                    break
            epoch += 1
        if self.best_params is not None:
            self.params, self.state = self.best_params, self.best_state

    def test(self) -> RankingResult:
        user_emb, item_emb = self.model.eval_embeddings(self.params, self.state, self.graph)
        return evaluate_ranking(
            user_emb, item_emb, self.data, self.graph, Ns=self.topN,
            batch_size=int(self.config.get("eval.batch.size", 1024)),
        )

    def evaluate(self) -> Dict[str, float]:
        result = self.test()
        for line in result.report(self.data, self.topN):
            self.log.add(line.rstrip("\n"))
        return result.metrics

    def predict(self, user) -> np.ndarray:
        """Scores over all items for an external user id (`selfcf.py:581`)."""
        uid = self.data.get_user_id(user)
        user_emb, item_emb = self.model.eval_embeddings(self.params, self.state, self.graph)
        return np.asarray(user_emb[uid] @ item_emb.T)

    def execute(self) -> Dict[str, float]:
        """print info → build → train → test → evaluate (`selfcf.py:378-387`)."""
        self.print_model_info()
        self.build()
        self.train()
        return self.evaluate()

    # -- model selection ------------------------------------------------------

    def _is_better(self, metrics: Dict[str, float]) -> bool:
        if not self.best_metrics:
            return True
        if self.selection == "majority":
            # Count improved metrics at max-N (`selfcf.py:437-444`).
            keys = [f"{m}@{self.max_N}" for m in ("HitRatio", "Precision", "Recall", "NDCG")]
            better = sum(metrics[k] > self.best_metrics[k] for k in keys)
            return better > len(keys) / 2
        return metrics[f"Recall@{self.max_N}"] > self.best_metrics.get(
            f"Recall@{self.max_N}", -1.0
        )

    def fast_evaluation(self, epoch: int) -> bool:
        user_emb, item_emb = self.model.eval_embeddings(self.params, self.state, self.graph)
        result = evaluate_ranking(
            user_emb, item_emb, self.data, self.graph, Ns=[self.max_N],
            batch_size=int(self.config.get("eval.batch.size", 1024)),
        )
        metrics = result.metrics
        self.history.append({"epoch": epoch, **metrics})
        improved = self._is_better(metrics)
        if improved:
            self.best_metrics = dict(metrics)
            self.best_epoch = epoch
            self.best_params = tree_copy(self.params)
            self.best_state = tree_copy(self.state)
        self.log.add(
            f"  eval@{epoch}: "
            + " ".join(f"{k}={v:.5f}" for k, v in metrics.items())
            + (" *best*" if improved else "")
        )
        return improved
