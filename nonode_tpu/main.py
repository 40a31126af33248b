"""Unified experiment driver — parity with the reference's main.py.

``python -m nonode_tpu.main --model {segno,egno} --dataset {charged,gravity} ...``

Flow (main.py:68-201): seed everything, build datasets + model from
model_confs.yaml, Adam with per-model lr/wd, train with periodic validation +
EarlyStopping(patience=15), reload the best checkpoint, rollout test, write a
results JSON and a trajectory artifact
{targets, preds, energy_conservation, test_loss}.

TPU-first: datasets live on device, epochs are single jitted scans, rollout +
energy oracle stay on device. The artifact is written as ``.npz`` (the
reference uses a torch_geometric Data pickle; same schema, README.md:38-41).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import random
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .config import load_model_config
from .runtime import bootstrap

bootstrap()
from .data.nbody import NBodyDataset
from .models.egno import EGNO
from .models.segno import SEGNO
from .train.checkpoint import EarlyStopping, load_params
from .train.loop import EGNOExperiment, SEGNOExperiment, make_perm
from .utils.logging import RunLogger


def str2bool(value):
    if isinstance(value, bool):
        return value
    if value.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if value.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise ValueError(f"Invalid boolean value: {value}")


def get_args(argv=None):
    parser = argparse.ArgumentParser(description="Main module for SEGNO and EGNO")
    parser.add_argument("--model", type=str, choices=["segno", "egno"],
                        required=True)
    parser.add_argument("--exp_name", type=str, default="0exp_new")
    parser.add_argument("--config", type=str, default="model_confs.yaml")
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--epochs", type=int, default=1000)
    parser.add_argument("--data_dir", type=Path, default="data")
    parser.add_argument("--dataset", type=str, default="charged",
                        choices=["charged", "gravity"])
    parser.add_argument("--max_samples", type=int, default=3000)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--only_test", type=str2bool, default=False)
    parser.add_argument("--traj_len", type=int, default=20)
    parser.add_argument("--test_interval", type=int, default=5)
    parser.add_argument("--n_balls", type=int, default=5)
    parser.add_argument("--outf", type=Path, default="results")
    parser.add_argument("--load_checkpoint", type=str2bool, default=False)
    parser.add_argument("--scale_lr", type=float, default=None)
    parser.add_argument("--dT", type=int, default=1)
    parser.add_argument("--num_timesteps", type=int, default=None)
    parser.add_argument("--varDT", type=str2bool, default=False)
    parser.add_argument("--num_inputs", type=int, default=1)
    parser.add_argument("--use_wb", type=str2bool, default=False)
    parser.add_argument("--precision", type=str, default="fp32",
                        choices=["fp32", "bf16"],
                        help="fp32 (default): fp32 params + HIGHEST-precision "
                        "matmuls, the physics-parity mode. bf16: opt-in speed "
                        "mode — fp32 master weights/Adam state, fwd/bwd cast "
                        "to bfloat16 (native single-pass MXU), fp32 loss.")
    parser.add_argument("--dp", type=int, default=1,
                        help="Data-parallel mesh size (batch axis sharding).")
    parser.add_argument("--space", type=int, default=1,
                        help="Space-parallel mesh size (particle axis "
                             "sharding for large N).")
    parser.add_argument("--config_by_file", default=None, nargs="?", const="",
                        type=str,
                        help="JSON preset merged over existing args "
                             "(main_simulation_simple_no.py:389-399; bare "
                             "flag loads configs/config_simulation_simple_no"
                             ".json)")
    args = parser.parse_args(argv)
    if args.config_by_file is not None:
        path = args.config_by_file or str(
            Path(__file__).parent / "configs" /
            "config_simulation_simple_no.json")
        with open(path) as f:
            overrides = json.load(f)
        # only update keys the namespace already has, like the reference
        for k, v in overrides.items():
            if hasattr(args, k):
                setattr(args, k, v)
        # the reference standalone driver's parser carries the
        # hyperparameters directly (--lr/--nf/--n_layers/...,
        # main_simulation_simple_no.py:389-399), so preset values take
        # effect there; this unified driver keeps them in the model config
        # — stash them for main() to overlay onto cfg
        args._cfg_overrides = {
            dst: overrides[src] for src, dst in
            (("lr", "lr"), ("weight_decay", "weight_decay"),
             ("n_layers", "n_layers"), ("nf", "hidden_nf"),
             ("time_emb_dim", "time_emb_dim"), ("num_modes", "num_modes"))
            if src in overrides}
        if "max_training_samples" in overrides:
            args.max_samples = overrides["max_training_samples"]
        args.outf = Path(args.outf)
        args.data_dir = Path(args.data_dir)
    return args


def main(args):
    cfg = load_model_config(args.model, args.config)
    over = getattr(args, "_cfg_overrides", None)
    if over:
        # JSON preset hyperparameters override the YAML config, as in the
        # reference standalone driver where they override parser defaults.
        # Filter to this model's config fields (like load_model_config does):
        # EGNO-only keys such as time_emb_dim/num_modes in a preset must not
        # crash a --model segno run.
        fields = {f.name for f in dataclasses.fields(cfg)}
        cfg = dataclasses.replace(cfg, **{
            k: (float(v) if k in ("lr", "weight_decay") else v)
            for k, v in over.items() if k in fields})
    print(args)
    seed = args.seed
    random.seed(seed)
    np.random.seed(seed)
    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)

    if args.num_timesteps is None:
        args.num_timesteps = cfg.num_timesteps
    cfg = dataclasses.replace(cfg, num_timesteps=args.num_timesteps)
    if args.scale_lr:
        cfg = dataclasses.replace(cfg, lr=cfg.lr * args.scale_lr)

    from nonode_tpu.analysis.registry import artifact_stem
    model_save_path = (args.outf / args.exp_name /
                       (artifact_stem(args.model, args.dataset, seed,
                                      args.n_balls, args.num_inputs, args.dT,
                                      args.varDT, args.num_timesteps)
                        + ".ckpt"))
    model_save_path.parent.mkdir(parents=True, exist_ok=True)
    print(f"Model saved to {model_save_path}")
    early_stopping = EarlyStopping(patience=15, verbose=True,
                                   path=model_save_path)

    results = {"eval epoch": [], "val loss": [], "test loss": [],
               "train loss": []}
    best_val_loss = 1e8
    best_epoch = 0

    ds_kw = dict(data_dir=args.data_dir, dataset=args.dataset,
                 n_balls=args.n_balls, num_timesteps=args.num_timesteps)
    compute_dtype = (jnp.bfloat16
                     if getattr(args, "precision", "fp32") == "bf16" else None)

    if args.model == "segno":
        ds_train = NBodyDataset(partition="train", max_samples=args.max_samples,
                                num_inputs=args.num_inputs, **ds_kw)
        ds_val = NBodyDataset(partition="val", num_inputs=args.num_inputs, **ds_kw)
        ds_test = NBodyDataset(partition="test", num_inputs=args.num_inputs,
                               traj_len=args.traj_len, **ds_kw)
        model = SEGNO(in_node_nf=cfg.in_node_nf, in_edge_nf=cfg.in_edge_nf,
                      hidden_nf=cfg.hidden_nf, n_layers=cfg.n_layers,
                      recurrent=cfg.recurrent, tanh=cfg.tanh, varDT=args.varDT,
                      multiple_agg="attn" if args.num_inputs > 1 else None)
        exp = SEGNOExperiment(model, num_timesteps=args.num_timesteps,
                              lr=cfg.lr, weight_decay=cfg.weight_decay,
                              compute_dtype=compute_dtype)
    else:
        # EGNO forces varDT off for single input (main.py:121)
        args.varDT = bool(args.varDT and args.num_inputs > 1)
        ds_train = NBodyDataset(partition="train", max_samples=args.max_samples,
                                num_inputs=args.num_inputs, varDT=args.varDT,
                                dT=args.dT, **ds_kw)
        ds_val = NBodyDataset(partition="val", num_inputs=args.num_inputs,
                              varDT=args.varDT, dT=args.dT, **ds_kw)
        ds_test = NBodyDataset(partition="test", num_inputs=args.num_inputs,
                               traj_len=args.traj_len, varDT=args.varDT,
                               dT=args.dT, **ds_kw)
        model = EGNO(n_layers=cfg.n_layers, in_node_nf=cfg.in_node_nf,
                     in_edge_nf=cfg.in_edge_nf, hidden_nf=cfg.hidden_nf,
                     num_modes=cfg.num_modes, num_timesteps=args.num_timesteps,
                     time_emb_dim=cfg.time_emb_dim, num_inputs=args.num_inputs,
                     varDT=args.varDT, with_v=cfg.with_v, flat=cfg.flat,
                     norm=cfg.norm)
        exp = EGNOExperiment(model, lr=cfg.lr, weight_decay=cfg.weight_decay,
                             compute_dtype=compute_dtype)

    print(f"Num particles: {args.n_balls}, VarDT: {args.varDT}, "
          f"Num inputs: {args.num_inputs}, "
          f"Num timesteps: {args.num_timesteps}, dT: {args.dT}")

    if getattr(args, "dp", 1) * getattr(args, "space", 1) > 1:
        from .parallel.mesh import apply_mesh, make_mesh, replicate_dataset
        n_dev = args.dp * args.space
        assert len(jax.devices()) >= n_dev, (
            f"--dp {args.dp} x --space {args.space} needs {n_dev} devices, "
            f"have {len(jax.devices())}")
        assert args.batch_size % args.dp == 0, \
            f"batch_size {args.batch_size} not divisible by dp={args.dp}"
        assert args.n_balls % args.space == 0, \
            f"n_balls {args.n_balls} not divisible by space={args.space}"
        mesh = make_mesh(n_devices=n_dev, space=args.space)
        apply_mesh(exp, mesh, shard_particles=args.space > 1)
        for ds in (ds_train, ds_val, ds_test):
            replicate_dataset(ds, mesh)
        print(f"mesh: data={args.dp} space={args.space}")

    logger = RunLogger(args.outf / args.exp_name, model_save_path.stem,
                       config=vars(args), use_wandb=args.use_wb)

    params, opt_state = exp.init(key)
    if args.load_checkpoint and Path(model_save_path).exists():
        print(f"Loading model from {model_save_path}")
        params = load_params(model_save_path, params)
    else:
        print("Training from scratch.")

    def run_train_epoch(params, opt_state, ds, train=True):
        perm = make_perm(rng, len(ds), args.batch_size, shuffle=train)
        if args.model == "egno":
            arrays = (ds.loc, ds.vel, ds.charges, ds.edge_weights)
            idx_arrays = {k: jax.numpy.asarray(v) for k, v in
                          exp.epoch_index_arrays(ds, rng).items()}
            if train:
                params, opt_state, losses, last = exp.train_epoch(
                    params, opt_state, arrays, idx_arrays, perm)
            else:
                losses, last = exp.eval_epoch(params, arrays, idx_arrays, perm)
            # reference reports the last-timestep loss as the epoch loss
            return params, opt_state, jax.numpy.mean(last)
        else:
            arrays = (ds.loc, ds.vel, ds.charges, ds.edge_weights)
            if args.varDT and args.num_inputs > 1:
                # per-batch segment resampling, reference granularity
                # (train_nbody.py:97-116)
                steps = exp.sample_steps_batched(ds, rng, True, len(perm))
                frames = jax.numpy.asarray(exp.frames_from_steps(ds, steps))
                mi = exp.max_interior(ds)
                if train:
                    params, opt_state, losses = exp.train_epoch_dynamic(
                        params, opt_state, arrays, perm, frames, mi)
                else:
                    losses = exp.eval_epoch_dynamic(params, arrays, perm,
                                                    mi, frames)
                return params, opt_state, jax.numpy.mean(losses)
            steps = exp.sample_steps(ds, rng, args.varDT)
            frames, in_steps, _ = exp.input_frames(ds, steps)
            if train:
                params, opt_state, losses = exp.train_epoch(
                    params, opt_state, arrays, perm, frames, in_steps)
            else:
                losses = exp.eval_epoch(params, arrays, perm, frames, in_steps)
            return params, opt_state, jax.numpy.mean(losses)

    # Train losses are left ON DEVICE between evals and flushed in ONE
    # stacked transfer per test_interval: on the tunneled chip each
    # device->host sync costs ~30 ms of roundtrip latency on top of the
    # ~38 ms epoch compute, so syncing every epoch nearly halves training
    # throughput (measured; RESULTS.md). Values/printed lines are identical
    # to the per-epoch version — they just arrive in test_interval batches.
    pending = []

    def flush_train_losses():
        if not pending:
            return
        vals = np.asarray(jax.numpy.stack([d for _, d in pending]))
        for (ep, _), v in zip(pending, vals):
            v = float(v)
            results["train loss"].append(v)
            print(f"train epoch {ep} avg loss: {v:.5f}")
            logger.log({"train_loss": v}, step=ep)
        pending.clear()

    epoch = 0
    t_start = time.time()
    if not args.only_test:
        # try/finally so an interrupted run still persists the device-side
        # pending losses (up to test_interval-1 epochs) to results/wandb
        try:
            for epoch in range(args.epochs):
                params, opt_state, train_loss_dev = run_train_epoch(
                    params, opt_state, ds_train, train=True)
                pending.append((epoch, train_loss_dev))
                # gate matches the reference exactly (main.py:156), incl.
                # its `epoch > 0` quirk: a 1-epoch run never evaluates
                if (epoch % args.test_interval == 0
                        or epoch == args.epochs - 1) and epoch > 0:
                    flush_train_losses()
                    _, _, val_loss = run_train_epoch(params, opt_state, ds_val,
                                                     train=False)
                    val_loss = float(np.asarray(val_loss))
                    print(f"==> val epoch {epoch} avg loss: {val_loss:.5f}")
                    results["eval epoch"].append(epoch)
                    results["val loss"].append(val_loss)
                    logger.log({"val_loss": val_loss}, step=epoch)
                    if val_loss < best_val_loss:
                        best_val_loss = val_loss
                        best_epoch = epoch
                    print("*** Best Val Loss: %.5f \t  Best epoch %d"
                          % (best_val_loss, best_epoch))
                    early_stopping(val_loss, params)
                    if early_stopping.early_stop:
                        print("Early Stopping.")
                        break
        finally:
            flush_train_losses()
        print(f"training wall-clock: {time.time() - t_start:.1f}s")

    if Path(model_save_path).exists():
        params = load_params(model_save_path, params)

    if args.traj_len <= 0:
        # reference runs a PLAIN (non-rollout) test epoch when
        # rollout=traj_len > 1 is false and saves no artifact for
        # traj_len=0 (main.py:176,188). That path is only DEFINED for
        # SEGNO: the EGNO test dataset has an empty out window at
        # traj_len=0 and the reference crashes on losses[-1]
        # (main_simulation_simple_no.py:274-287) — fail loudly instead of
        # with a shape error deep in jit. traj_len=1 keeps our 1-window
        # rollout (the reference NameErrors there on its own undefined
        # trajectory save — documented divergence, README.md).
        if args.model == "egno":
            raise ValueError(
                "EGNO requires --traj_len >= 1: at traj_len=0 the test "
                "dataset's out window is empty (the reference crashes on "
                "this config too, main_simulation_simple_no.py:274-287)")
        _, _, test_loss = run_train_epoch(params, opt_state, ds_test,
                                          train=False)
        test_loss = float(np.asarray(test_loss))
        avg_num_steps, artifact = 0.0, {}
    elif args.model == "egno":
        test_loss, avg_num_steps, artifact = exp.test_rollout(
            params, ds_test, args.batch_size, rng)
    else:
        test_loss, avg_num_steps, artifact = exp.test_rollout(
            params, ds_test, args.batch_size, rng, args.traj_len, args.varDT)
    print(f"==> test rollout loss: {test_loss:.5f} "
          f"avg_num_steps: {avg_num_steps:.2f} "
          f"finite_fraction: {artifact.get('finite_fraction', 1.0):.3f} "
          f"loss_finite: {artifact.get('test_loss_finite', float('nan')):.5f}")
    results["test loss"].append(test_loss)
    logger.log({"test_loss": test_loss,
                "avg_num_steps": avg_num_steps,
                "finite_fraction": artifact.get("finite_fraction", 1.0)})

    with open(model_save_path.with_suffix(".json"), "w") as f:
        f.write(json.dumps(results, indent=4))

    if args.traj_len > 0:
        traj_file = model_save_path.parent / f"{model_save_path.stem}_results.npz"
        np.savez(traj_file, **artifact)
        print(f"trajectory artifact saved to {traj_file}")
        logger.log_artifact(traj_file)
    logger.finish()

    return best_val_loss, test_loss, best_epoch


if __name__ == "__main__":
    a = get_args()
    best_val_loss, test_loss, best_epoch = main(a)
    print(f"Best Val Loss: {best_val_loss}")
    print(f"Best Epoch: {best_epoch}")
    print(f"Test Loss: {test_loss}")
