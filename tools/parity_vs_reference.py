"""Head-to-head metric parity: OUR models vs the REFERENCE implementations.

Runs the actual reference scripts' model classes (imported from
/root/reference, torch-CPU) and our TPU-native models on the SAME dataset
with matched hyperparameters, then evaluates BOTH embedding sets with the
same evaluator (ours, vectorized — identical formulas to theirs, tested).

Covered head-to-head (every reference script runnable in this image):
directau, buir, selfcf, gcl (linear quirk), sept_basic, mhcn, sept-full
(warm-up phase — the reference crashes past it, see run_reference_sept).
lightgcn/graphsage/gat/grace/bgrl/gbt need torch_geometric, ncl needs
faiss, diffnet/esrf need numba — absent from this image; their parity
rests on the loss/encoder-level torch oracles in tests/.

Usage:  python tools/parity_vs_reference.py [--epochs 2] [--hard]
Appends a summary row per model to stdout; paste into BASELINE.md.
"""

from __future__ import annotations

import argparse
import importlib.util
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

EPOCHS = 2
EMB = 64
BATCH = 2048
LR = 1e-3
TOPN = [20]


def _load_reference_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _metrics_from_embeddings(ue, ie, data, graph):
    import jax.numpy as jnp

    from recommendation_tpu.evalx.ranking import evaluate_ranking

    res = evaluate_ranking(jnp.asarray(ue), jnp.asarray(ie), data, graph, Ns=TOPN)
    return {k: round(v, 4) for k, v in res.metrics.items()}


def run_reference_directau(train, test, epochs):
    mod = _load_reference_module("/root/reference/directau.py", "ref_directau")
    conf = {
        "model": {"name": "DirectAU"},
        "DirectAU": {"gamma": 1.0, "n_layers": 2},
        "embedding.size": EMB, "batch.size": BATCH, "learning.rate": LR,
        "reg.lambda": 1e-4, "optimizer": "adam", "max.epoch": epochs,
        "item.ranking.topN": TOPN,
    }
    model = mod.DirectAU(conf, train, test)
    # their train() hardcodes range(1); loop it ourselves for matched epochs
    import torch

    optimizer = torch.optim.Adam(model.model.parameters(), lr=LR)
    for _ in range(epochs):
        for user_idx, pos_idx, neg_idx in mod.next_batch_pairwise(model.data, BATCH):
            user_emb, item_emb, _ = model.model()
            u, p, n = user_emb[user_idx], item_emb[pos_idx], item_emb[neg_idx]
            loss = model.calculate_loss(u, p) - model.calculate_loss(u, n)
            loss = loss + mod.l2_reg_loss(model.reg, u, p, n) / BATCH
            optimizer.zero_grad(); loss.backward(); optimizer.step()
    with torch.no_grad():
        ue, ie, _ = model.model()
    return ue.numpy(), ie.numpy(), model.data


def run_reference_buir(train, test, epochs):
    mod = _load_reference_module("/root/reference/univariate/buir.py", "ref_buir")
    conf = {
        "model": {"name": "BUIR"},
        "BUIR": {"tau": 0.995, "n_layer": 2, "drop_rate": 0.2},
        "emb_size": EMB, "batch_size": BATCH, "lr": LR,
        "embedding.size": EMB, "batch.size": BATCH, "learning.rate": LR,
        "reg.lambda": 1e-4, "max.epoch": epochs, "item.ranking.topN": TOPN,
    }
    model = mod.BUIR(conf, train, test)
    import torch

    net = model.model
    optimizer = torch.optim.Adam(net.parameters(), lr=LR)
    for _ in range(epochs):
        for user_idx, i_idx, j_idx in mod.next_batch_pairwise(model.data, BATCH):
            output = net({"user": user_idx, "item": i_idx})
            loss = net.get_loss(output)
            optimizer.zero_grad(); loss.backward(); optimizer.step()
            net.update_target(user_idx, i_idx)
    p_u, u_on, p_i, i_on = net.get_embedding()
    ue = np.concatenate([p_u.detach().numpy(), u_on.detach().numpy()], axis=1)
    ie = np.concatenate([i_on.detach().numpy(), p_i.detach().numpy()], axis=1)
    return ue, ie, model.data


def run_reference_selfcf(train, test, epochs):
    mod = _load_reference_module("/root/reference/selfcf.py", "ref_selfcf")
    conf = mod.ModelConf({
        "model": {"name": "SelfCF"},
        "SelfCF": {"tau": 0.05, "n_layer": 2},
        "embedding.size": EMB, "batch.size": BATCH, "learning.rate": LR,
        "reg.lambda": 1e-4, "reg.weight": 1.0, "optimizer": "adam",
        "max.epoch": epochs, "item.ranking.topN": TOPN, "output": "/tmp/",
    })
    model = mod.SelfCF(conf, train, test)
    model.train()  # their loop honors maxEpoch; best snapshot kept
    p_u, u_on, p_i, i_on = (
        t.detach().numpy() if hasattr(t, "detach") else np.asarray(t)
        for t in (model.p_u_online, model.u_online, model.p_i_online, model.i_online)
    )
    # dual score p(u)·i + u·p(i) == concat embeddings (`selfcf.py:581-591`)
    ue = np.concatenate([p_u, u_on], axis=1)
    ie = np.concatenate([i_on, p_i], axis=1)
    return ue, ie, model.data


def run_reference_gcl(train, test, epochs):
    """gcl.py works on integer-id files via pandas; write numeric views and
    replicate its training step (`gcl.py:204-227`) with a fixed config."""
    import os
    import tempfile

    import torch

    mod = _load_reference_module("/root/reference/gcl.py", "ref_gcl")
    tmp = tempfile.mkdtemp()

    def write_numeric(rows, path):
        with open(path, "w") as f:
            for u, i, w in rows:
                f.write(f"{int(str(u)[1:])} {int(str(i)[1:])} {w}\n")

    train_path = os.path.join(tmp, "train.txt")
    test_path = os.path.join(tmp, "test.txt")
    write_numeric(train, train_path)
    write_numeric(test, test_path)
    edge_index, train_df, test_df, num_users, num_items = mod.load_data(train_path, test_path)
    user_pos = mod.get_user_pos(train_df)

    model = mod.GRACEModel(num_users, num_items, emb_size=EMB, num_layers=2)
    optimizer = torch.optim.Adam(model.parameters(), lr=LR, weight_decay=1e-4)
    aug = mod.EdgeRemoving(pe=0.2)
    for _ in range(epochs):
        for users, pos_items, neg_items in mod.next_batch_pairwise(
            train_df, BATCH, num_users, num_items, user_pos
        ):
            optimizer.zero_grad()
            z1, z2 = model(aug(edge_index), aug(edge_index))
            u1, i1 = z1[:num_users], z1[num_users:]
            u2, i2 = z2[:num_users], z2[num_users:]
            ssl = mod.info_nce_loss(u1, u2, 0.2) + mod.info_nce_loss(i1, i2, 0.2)
            u_e, p_e, n_e = u1[users], i1[pos_items], i1[neg_items]
            bpr = -torch.nn.functional.logsigmoid(
                (u_e * p_e).sum(1) - (u_e * n_e).sum(1)
            ).mean()
            reg = (u_e.norm(2).pow(2) + p_e.norm(2).pow(2) + n_e.norm(2).pow(2)) / len(users)
            (ssl + bpr + 1e-4 * reg).backward()
            optimizer.step()
    with torch.no_grad():
        z = model.encode(edge_index)
    # raw integer ids ARE the row indices in gcl.py; expose an id->row map
    # compatible with the remapping step
    class _Ids:
        user = {f"u{i}": i for i in range(num_users)}
        item = {f"i{i}": i for i in range(num_items)}

    return z[:num_users].numpy(), z[num_users:].numpy(), _Ids


def run_reference_sept_basic(train, test, epochs):
    """univariate/sept.py — the simplified no-social SEPT (torch+scipy)."""
    import torch

    mod = _load_reference_module("/root/reference/univariate/sept.py", "ref_sept")
    conf = {
        "model": {"name": "SEPT"},
        "SEPT": {"n_layer": 2, "ss_rate": 0.005, "drop_rate": 0.3, "ins_cnt": 10},
        "emb_size": EMB, "batch_size": BATCH, "lr": LR, "reg_lambda": 1e-4,
        "embedding.size": EMB, "batch.size": BATCH, "learning.rate": LR,
        "reg.lambda": 1e-4, "max.epoch": epochs, "item.ranking.topN": TOPN,
    }
    model = mod.SEPT(conf, train, test)
    model.train()  # honors conf['max.epoch']
    return model.U.detach().numpy(), model.V.detach().numpy(), model.data


def run_reference_mhcn(train, test, social, epochs):
    """univariate/mhcn.py — torch+scipy (+tf-vestige import, present in this
    image). Drive train_epoch directly for matched epochs."""
    import torch

    mod = _load_reference_module("/root/reference/univariate/mhcn.py", "ref_mhcn")
    conf = {
        "model": {"name": "MHCN"},
        "MHCN": {"n_layer": 2, "ss_rate": 0.01},
        "emb_size": EMB, "batch_size": BATCH, "lr": LR, "reg_lambda": 1e-4,
        "max.epoch": epochs, "item.ranking.topN": TOPN,
    }
    model = mod.MHCN(conf, list(train), list(test), [list(t) for t in social])
    model.build()
    optimizer = torch.optim.Adam(model.parameters(), lr=LR)
    for epoch in range(epochs):
        model.train_epoch(optimizer, epoch)
    U = model.final_user_embeddings.detach().cpu().numpy()
    V = model.final_item_embeddings.detach().cpu().numpy()
    return U, V, model.data


def run_reference_sept(train, test, social, epochs):
    """univariate/sept_social.py — full tri-view SEPT (torch+scipy).

    The reference CRASHES past its warm-up third: `train()` calls
    `self.data.convert_to_laplacian_mat(...)` (`sept_social.py:427`) but its
    own `Interaction` class defines no such method — any `max.epoch >= 2`
    raises AttributeError on the first post-warm-up epoch. The script is
    only runnable for max.epoch == 1 (pure warm-up BPR), so the head-to-head
    compares exactly that phase; the SSL phase has no runnable reference."""
    mod = _load_reference_module(
        "/root/reference/univariate/sept_social.py", "ref_sept_social"
    )
    del epochs  # see docstring: anything >= 2 crashes in the reference
    conf = {
        "model": {"name": "SEPT"},
        "SEPT": {"n_layer": 2, "ss_rate": 0.005, "drop_rate": 0.3, "ins_cnt": 10},
        "emb_size": EMB, "batch_size": BATCH, "lr": LR, "reg_lambda": 1e-4,
        "max.epoch": 1, "item.ranking.topN": TOPN,
    }
    model = mod.SEPT(conf, list(train), list(test), [list(t) for t in social])
    model.train()
    return np.asarray(model.U), np.asarray(model.V), model.data


def run_ours(name, train, test, epochs, extra=None, social=None):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from recommendation_tpu.config import default_config
    from recommendation_tpu.data.interaction import Interaction
    from recommendation_tpu.graph.device import DeviceGraph
    from recommendation_tpu.models import get_model
    from recommendation_tpu.train.recommender import GraphRecommender
    from recommendation_tpu.utils.logging import Log

    config = default_config(**{
        "max.epoch": epochs, "embedding.size": EMB, "batch.size": BATCH,
        "learning.rate": LR, "item.ranking.topN": TOPN,
        "eval.interval": max(1, epochs), **(extra or {}),
    })
    data = Interaction(train, test)
    if social is not None:
        from recommendation_tpu.graph.social_device import SocialDeviceGraph

        graph = SocialDeviceGraph(data, social)
    else:
        graph = DeviceGraph(data)
    rec = GraphRecommender(get_model(name, config), data, config, graph=graph, log=Log(echo=False))
    rec.build()
    rec.train()
    ue, ie = rec.model.eval_embeddings(rec.params, rec.state, graph)
    return np.asarray(ue), np.asarray(ie), data, graph


def main():
    # force CPU before ANY jax work: this tool may run alongside a TPU job,
    # and the chip only admits one process (see CLAUDE.md env traps)
    import jax

    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=EPOCHS)
    ap.add_argument("--hard", action="store_true",
                    help="run on the discriminating hard regime instead of "
                         "the round-1 saturating dataset")
    args = ap.parse_args()

    from recommendation_tpu.data.synthetic import load_or_make_dataset

    train, test = load_or_make_dataset(hard=args.hard)

    # one shared trust graph for the social head-to-heads (test.ipynb protocol)
    from recommendation_tpu.data.interaction import Interaction as _I
    from recommendation_tpu.data.social import synthesize_social

    social = synthesize_social(_I(train, test))

    rows = []
    for name, ref_fn, extra in (
        ("directau", run_reference_directau, {"DirectAU.gamma": 1.0, "DirectAU.n_layers": 2}),
        ("buir", run_reference_buir, {"BUIR.tau": 0.995, "BUIR.n_layer": 2, "BUIR.drop_rate": 0.2}),
        ("selfcf", run_reference_selfcf, {"SelfCF.tau": 0.05, "SelfCF.n_layer": 2, "reg.weight": 1.0}),
        # bug-compatible mode: the reference's "convs" are plain Linears
        ("gcl", run_reference_gcl, {"GCL.encoder": "linear", "GCL.ssl_temp": 0.2,
                                    "GCL.drop_edge": 0.2, "GCL.reg_weight": 1e-4,
                                    "weight.decay": 1e-4, "optimizer": "adamw"}),
        ("sept_basic", run_reference_sept_basic,
         {"SEPT.n_layer": 2, "SEPT.drop_rate": 0.3}),
        ("mhcn", run_reference_mhcn, {"MHCN.n_layer": 2, "MHCN.ss_rate": 0.01}),
        # warm-up phase only: the reference crashes past it (see runner)
        ("sept", run_reference_sept,
         {"SEPT.n_layer": 2, "SEPT.ss_rate": 0.005, "SEPT.drop_rate": 0.3,
          "SEPT.ins_cnt": 10, "SEPT.warmup_fraction": 1.0, "max.epoch": 1}),
    ):
        is_social = name in ("mhcn", "sept")
        print(f"=== {name}: reference (torch-cpu) ...", flush=True)
        if is_social:
            ref_ue, ref_ie, ref_data = ref_fn(list(train), list(test), social, args.epochs)
        else:
            ref_ue, ref_ie, ref_data = ref_fn(list(train), list(test), args.epochs)
        print(f"=== {name}: ours (jax) ...", flush=True)
        our_ue, our_ie, data, graph = run_ours(
            name, train, test, args.epochs, extra,
            social=social if is_social else None,
        )
        # the reference scripts drift on id assignment (sorted vs insertion
        # order, SURVEY.md §2.3) — remap their rows into OUR id space
        uperm = np.array([ref_data.user[data.id2user[i]] for i in range(data.user_num)])
        iperm = np.array([ref_data.item[data.id2item[i]] for i in range(data.item_num)])
        ref_ue, ref_ie = ref_ue[uperm], ref_ie[iperm]
        ref_m = _metrics_from_embeddings(ref_ue, ref_ie, data, graph)
        our_m = _metrics_from_embeddings(our_ue, our_ie, data, graph)
        rows.append((name, ref_m, our_m))
        print(f"{name}: reference={ref_m}")
        print(f"{name}: ours     ={our_m}", flush=True)

    print("\nSummary (same data, same epochs, same evaluator):")
    for name, ref_m, our_m in rows:
        print(f"  {name:10s} ref Recall@20={ref_m['Recall@20']:.4f} "
              f"ours Recall@20={our_m['Recall@20']:.4f} | "
              f"ref NDCG@20={ref_m['NDCG@20']:.4f} ours NDCG@20={our_m['NDCG@20']:.4f}")


if __name__ == "__main__":
    main()
