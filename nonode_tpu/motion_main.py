"""Mocap training driver: EGNO on CMU motion capture.

``python -m nonode_tpu.motion_main --config_by_file [path]``

The reference snapshot ships the mocap dataset/parser and a config preset
(EGNO/configs/config_mocap_no.json) but its motion driver script is absent;
this driver completes the workload with the same config surface: EGNO decodes
``num_timesteps`` frames ending at ``delta_frame``, on the skeleton + 2-hop
graph (edge attr 1/2), node feature z/10.
"""

from __future__ import annotations

import argparse
import functools
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .data.motion import MotionDynamicsDataset
from .runtime import bootstrap

bootstrap()
from .models.egno import EGNO
from .train.checkpoint import EarlyStopping, load_params
from .train.loop import adam_l2, make_perm

DEFAULT_CONFIG = Path(__file__).parent / "configs" / "config_mocap_no.json"


def get_args(argv=None):
    parser = argparse.ArgumentParser(description="EGNO mocap")
    parser.add_argument("--exp_name", type=str, default="mocap_exp")
    parser.add_argument("--batch_size", type=int, default=12)
    parser.add_argument("--epochs", type=int, default=2000)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--nf", type=int, default=128)
    parser.add_argument("--n_layers", type=int, default=6)
    parser.add_argument("--max_training_samples", type=int, default=200)
    parser.add_argument("--data_dir", type=str, default="motion/dataset")
    parser.add_argument("--weight_decay", type=float, default=1e-10)
    parser.add_argument("--delta_frame", type=int, default=30)
    parser.add_argument("--case", type=str, default="run",
                        choices=["walk", "run"])
    parser.add_argument("--num_timesteps", type=int, default=5)
    parser.add_argument("--time_emb_dim", type=int, default=32)
    parser.add_argument("--num_modes", type=int, default=2)
    parser.add_argument("--test_interval", type=int, default=5)
    parser.add_argument("--outf", type=Path, default="results")
    parser.add_argument("--config_by_file", default=None, nargs="?", const="",
                        type=str)
    args = parser.parse_args(argv)
    if args.config_by_file is not None:
        path = args.config_by_file or DEFAULT_CONFIG
        with open(path) as f:
            overrides = json.load(f)
        for k, v in overrides.items():
            if hasattr(args, k):
                setattr(args, k, v)
    return args


def _build_batcher(ds, model, batch_size):
    e_attr = jnp.broadcast_to(ds.edge_attr, (batch_size, *ds.edge_attr.shape))
    n = ds.n_node

    def loss_fn(params, idx):
        x0 = ds.x_0[idx]
        v0 = ds.v_0[idx]
        nodes = ds.node_features(x0)
        loc_mean = x0.mean(axis=1, keepdims=True).repeat(n, 1)
        x, v, _ = model(params, x0, v0, nodes, e_attr, loc_mean,
                        edge_mask=ds.edge_mask)
        pred = jnp.swapaxes(x, 0, 1)           # [B, T, N, 3]
        return ((pred - ds.x_t[idx]) ** 2).mean()

    return loss_fn


def main(args):
    rng = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed)

    mk = lambda part, n: MotionDynamicsDataset(
        data_dir=args.data_dir, partition=part, max_samples=n,
        delta_frame=args.delta_frame, case=args.case,
        num_timesteps=args.num_timesteps)
    ds_train = mk("train", args.max_training_samples)
    ds_val = mk("val", 600)
    ds_test = mk("test", 600)
    print(f"mocap[{args.case}]: train {len(ds_train)} val {len(ds_val)} "
          f"test {len(ds_test)}, N={ds_train.n_node}")

    model = EGNO(n_layers=args.n_layers, in_node_nf=1, in_edge_nf=1,
                 hidden_nf=args.nf, num_modes=args.num_modes,
                 num_timesteps=args.num_timesteps,
                 time_emb_dim=args.time_emb_dim)
    optimizer = adam_l2(args.lr, args.weight_decay)
    params = model.init(key)
    opt_state = optimizer.init(params)

    loss_train = _build_batcher(ds_train, model, args.batch_size)
    loss_val = _build_batcher(ds_val, model, args.batch_size)
    loss_test = _build_batcher(ds_test, model, args.batch_size)

    @jax.jit
    def train_epoch(params, opt_state, perm):
        def body(carry, idx):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_train)(params, idx)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state),
                                                   perm)
        return params, opt_state, losses.mean()

    @functools.partial(jax.jit, static_argnums=2)
    def eval_epoch(params, perm, which):
        fn = (loss_val, loss_test)[which]
        _, losses = jax.lax.scan(lambda _, idx: (None, fn(params, idx)),
                                 None, perm)
        return losses.mean()

    save_path = (args.outf / args.exp_name /
                 f"EGNO_motion_{args.case}_seed={args.seed}.ckpt")
    save_path.parent.mkdir(parents=True, exist_ok=True)
    early = EarlyStopping(patience=15, verbose=True, path=save_path)
    results = {"train loss": [], "val loss": [], "eval epoch": [],
               "test loss": []}
    best_val = 1e8
    t0 = time.time()
    # train losses stay on device between evals; ONE stacked transfer per
    # test_interval (each sync costs ~30 ms of tunnel roundtrip — see
    # nonode_tpu/main.py flush_train_losses and RESULTS.md)
    pending = []

    def flush_pending():
        if pending:
            results["train loss"].extend(
                float(v) for v in np.asarray(jnp.stack(pending)))
            pending.clear()

    for epoch in range(args.epochs):
        perm = make_perm(rng, len(ds_train), args.batch_size)
        params, opt_state, tr = train_epoch(params, opt_state, perm)
        pending.append(tr)
        # same gate as the nbody drivers (reference main.py:156), incl. the
        # final-epoch eval so a last-interval improvement is checkpointed
        if (epoch % args.test_interval == 0
                or epoch == args.epochs - 1) and epoch > 0:
            flush_pending()
            vperm = make_perm(rng, len(ds_val), args.batch_size, shuffle=False)
            vl = float(eval_epoch(params, vperm, 0))
            results["eval epoch"].append(epoch)
            results["val loss"].append(vl)
            best_val = min(best_val, vl)
            print(f"epoch {epoch} train {results['train loss'][-1]:.5f} "
                  f"val {vl:.5f} (best {best_val:.5f})")
            early(vl, params)
            if early.early_stop:
                print("Early Stopping.")
                break
    flush_pending()
    print(f"training wall-clock: {time.time() - t0:.1f}s")

    if Path(save_path).exists():
        params = load_params(save_path, params)
    tperm = make_perm(rng, len(ds_test), args.batch_size, shuffle=False)
    test_loss = float(eval_epoch(params, tperm, 1))
    results["test loss"].append(test_loss)
    print(f"==> test loss: {test_loss:.5f}")
    with open(save_path.with_suffix(".json"), "w") as f:
        json.dump(results, f, indent=4)

    # Trajectory artifact with the nbody drivers' schema
    # {targets, preds, test_loss} so analysis/registry aggregates mocap seed
    # groups (per-timestep MSE curves, mean±std) exactly like an n-body grid
    # cell. N=31 joints stand in for n_part; the stem parses under FNAME_RE.
    from .analysis.registry import artifact_stem
    e_attr = jnp.broadcast_to(ds_test.edge_attr,
                              (args.batch_size, *ds_test.edge_attr.shape))

    @jax.jit
    def decode(params, idx):
        x0 = ds_test.x_0[idx]
        nodes = ds_test.node_features(x0)
        loc_mean = x0.mean(axis=1, keepdims=True).repeat(ds_test.n_node, 1)
        x, _, _ = model(params, x0, ds_test.v_0[idx], nodes, e_attr,
                        loc_mean, edge_mask=ds_test.edge_mask)
        return jnp.swapaxes(x, 0, 1)            # [B, T, N, 3]

    preds_l, targets_l = [], []
    for row in np.asarray(tperm):
        preds_l.append(np.asarray(decode(params, jnp.asarray(row))))
        targets_l.append(np.asarray(ds_test.x_t[row]))
    artifact = {"targets": np.concatenate(targets_l),
                "preds": np.concatenate(preds_l), "test_loss": test_loss}
    stem = artifact_stem("egno", f"motion_{args.case}", args.seed,
                         ds_test.n_node, num_timesteps=args.num_timesteps)
    np.savez(save_path.parent / f"{stem}_results.npz", **artifact)
    print(f"trajectory artifact saved to {save_path.parent / stem}_results.npz")
    return best_val, test_loss


if __name__ == "__main__":
    a = get_args()
    best_val, test_loss = main(a)
    print(f"Best Val Loss: {best_val}\nTest Loss: {test_loss}")
