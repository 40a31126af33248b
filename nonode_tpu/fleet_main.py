"""Seed-fleet driver: train every seed of a sweep group simultaneously.

``python -m nonode_tpu.fleet_main --model {egno,segno} --dataset charged \
    --seeds 1,2,3,4,5 ...``

All K seeds train as one vmapped device program (parallel/fleet.py); early
stopping runs per seed on the host with the same decisions K sequential
EarlyStopping instances would make (FleetEarlyStopping), stopped seeds are
COMPACTED out of the fleet (they stop consuming device compute), then each
seed's best checkpoint is tested with the standard rollout and written as a
standard per-seed artifact — so the analysis registry sees exactly what K
sequential runs would have produced, at ~1/K the wall-clock.

Covers the BASE grid (single-input) for both models, and EGNO PRO groups
(multi-input / varDT: each seed samples its own per-epoch input offsets
from its own rng stream, vmapped via SeedFleet.train_epoch_idx). SEGNO
multi-input/varDT cells run through the sequential driver — SEGNO fleets
have no wall-clock win (RESULTS.md fleets section) and its varDT epochs
are already per-batch dynamic programs.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .analysis.registry import artifact_stem
from .config import load_model_config
from .runtime import bootstrap

bootstrap()
from .data.nbody import NBodyDataset
from .models.egno import EGNO
from .models.segno import SEGNO
from .parallel.fleet import FleetEarlyStopping, SeedFleet
from .train.checkpoint import save_params
from .train.loop import EGNOExperiment, SEGNOExperiment, make_perm


def get_args(argv=None):
    parser = argparse.ArgumentParser(description="Seed-fleet trainer")
    parser.add_argument("--model", type=str, default="egno",
                        choices=["egno", "segno"])
    parser.add_argument("--exp_name", type=str, default="0exp_fleet")
    parser.add_argument("--config", type=str, default="model_confs.yaml")
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--epochs", type=int, default=1000)
    parser.add_argument("--data_dir", type=Path, default="data")
    parser.add_argument("--dataset", type=str, default="charged",
                        choices=["charged", "gravity"])
    parser.add_argument("--max_samples", type=int, default=3000)
    parser.add_argument("--seeds", type=str, default="1,2,3,4,5")
    parser.add_argument("--traj_len", type=int, default=20)
    parser.add_argument("--test_interval", type=int, default=5)
    parser.add_argument("--patience", type=int, default=15)
    parser.add_argument("--n_balls", type=int, default=5)
    parser.add_argument("--num_inputs", type=int, default=1)
    parser.add_argument("--varDT", type=lambda v: str(v).lower() in
                        ("yes", "true", "t", "y", "1"), default=False)
    parser.add_argument("--dT", type=int, default=1)
    parser.add_argument("--num_timesteps", type=int, default=None)
    parser.add_argument("--outf", type=Path, default="results")
    parser.add_argument("--remat", action="store_true",
                        help="gradient rematerialization (large N / big fleets)")
    parser.add_argument("--no_hbm_guard", action="store_true",
                        help="keep the requested batch size even when the "
                        "K*B*N^2 pressure heuristic would scale it down. "
                        "The guard's empirical OOM points are 3-seed "
                        "fleets whose K axis pads the (8,128) tiling; a "
                        "K=1 charged-20 fleet at B=512 is the same program "
                        "the sequential driver and the bench roofline run "
                        "in-memory fine. Use for exact-shape quality runs "
                        "(scripts/r5_c20_quality.py).")
    parser.add_argument("--precision", type=str, default="fp32",
                        choices=["fp32", "bf16"],
                        help="same semantics as the sequential driver "
                             "(main.py): fp32 = physics-parity mode; bf16 = "
                             "opt-in speed mode (fp32 master weights/Adam, "
                             "bf16 fwd/bwd, fp32 loss)")
    parser.add_argument("--checkpoint_every", type=int, default=50,
                        help="save resumable fleet state every N epochs "
                             "(0 disables). Multi-hour fleets on the "
                             "tunneled chip die to wedges after 45-90 min "
                             "(verify-skill field notes); without mid-run "
                             "state the whole group restarts from epoch 0.")
    parser.add_argument("--_die_at_epoch", type=int, default=None,
                        help=argparse.SUPPRESS)  # test hook: simulate a wedge
    return parser.parse_args(argv)


def _fleet_state_path(args) -> Path:
    return (args.outf / args.exp_name /
            (f"fleet_state_{args.model}_{args.dataset}_n{args.n_balls}"
             f"_in{args.num_inputs}_varDT{args.varDT}"
             f"_seeds{args.seeds.replace(',', '-')}.pkl"))


def _save_fleet_state(path: Path, epoch, params, opt_state, best_params, es,
                      alive, rngs, wall_so_far):
    """Atomic pickle of everything a fleet needs to resume bit-identically:
    device state (params/opt/best), the vectorized stopper, the alive-seed
    compaction, every seed's host rng stream, and the accumulated
    wall-clock."""
    import pickle
    host = lambda t: jax.tree.map(np.asarray, t)
    state = {"epoch": epoch,
             "params": host(params), "opt_state": host(opt_state),
             "best_params": host(best_params),
             "es": {"best_val": es.best_val, "best_epoch": es.best_epoch,
                    "counter": es.counter, "stopped": es.stopped},
             "alive": np.asarray(alive),
             "rng_states": [r.get_state() for r in rngs],
             "wall_so_far": wall_so_far}
    tmp = path.with_suffix(".pkl.tmp")
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(tmp, "wb") as f:
        pickle.dump(state, f)
    tmp.replace(path)


def _load_fleet_state(path: Path):
    import pickle
    with open(path, "rb") as f:
        return pickle.load(f)


def main(args):
    cfg = load_model_config(args.model, args.config)
    if args.num_timesteps is None:
        args.num_timesteps = cfg.num_timesteps
    seeds = [int(s) for s in args.seeds.split(",")]
    k = len(seeds)

    # HBM guard: the fleet's peak activation memory scales with
    # K * batch * N^2; a 3-seed charged-20 fleet at B=256 needs 22.7G on a
    # 16G chip. Scale the batch down and enable remat instead of OOMing.
    pressure = k * args.batch_size * args.n_balls ** 2
    # empirically: K*B*N^2 of 3*128*400 fits; 5*64*400 does NOT (the (8,128)
    # tiling pads the N=20 dims 2x) — keep a conservative margin
    limit = 2 * 128 * 400
    if args.no_hbm_guard:
        limit = float("inf")
    if args.n_balls >= 20 and pressure > limit:
        new_b = max(32, int(args.batch_size * limit / pressure // 32 * 32))
        # remat only exists on the EGNO experiment (per-layer
        # jax.checkpoint); SEGNO fleets rely on the batch reduction alone —
        # don't claim otherwise in the log
        remat_note = ", remat on" if args.model == "egno" else ""
        print(f"HBM guard: batch {args.batch_size} -> {new_b}{remat_note} "
              f"(K={k}, N={args.n_balls})")
        args.batch_size = new_b
        args.remat = args.model == "egno"

    if args.model == "segno" and (args.num_inputs > 1 or args.varDT):
        raise NotImplementedError(
            "SEGNO multi-input/varDT fleets are not supported — run those "
            "cells through the sequential driver (nonode_tpu.main); SEGNO "
            "fleets have no wall-clock win anyway (RESULTS.md)")
    # EGNO forces varDT off for single input (reference main.py:121)
    if args.model == "egno":
        args.varDT = bool(args.varDT and args.num_inputs > 1)
    multi = args.model == "egno" and args.num_inputs > 1

    ds_kw = dict(data_dir=args.data_dir, dataset=args.dataset,
                 n_balls=args.n_balls, num_timesteps=args.num_timesteps,
                 num_inputs=args.num_inputs)
    if args.model == "egno":
        ds_kw.update(varDT=args.varDT, dT=args.dT)
    ds_train = NBodyDataset(partition="train", max_samples=args.max_samples,
                            **ds_kw)
    ds_val = NBodyDataset(partition="val", **ds_kw)
    ds_test = NBodyDataset(partition="test", traj_len=args.traj_len, **ds_kw)

    if args.model == "egno":
        # same kwargs as main.py:159-164 so YAML model_params overrides
        # (with_v/flat/norm) reach the fleet too and fleet checkpoints load
        # into the sequential driver's model
        model = EGNO(n_layers=cfg.n_layers, in_node_nf=cfg.in_node_nf,
                     in_edge_nf=cfg.in_edge_nf, hidden_nf=cfg.hidden_nf,
                     num_modes=cfg.num_modes,
                     num_timesteps=args.num_timesteps,
                     time_emb_dim=cfg.time_emb_dim,
                     num_inputs=args.num_inputs, varDT=args.varDT,
                     with_v=cfg.with_v, flat=cfg.flat, norm=cfg.norm)
        exp = EGNOExperiment(model, lr=cfg.lr, weight_decay=cfg.weight_decay,
                             remat=args.remat,
                             compute_dtype=(jnp.bfloat16 if
                                            args.precision == "bf16" else None))
    else:
        model = SEGNO(in_node_nf=cfg.in_node_nf, in_edge_nf=cfg.in_edge_nf,
                      hidden_nf=cfg.hidden_nf, n_layers=cfg.n_layers,
                      recurrent=cfg.recurrent, tanh=cfg.tanh)
        exp = SEGNOExperiment(model, num_timesteps=args.num_timesteps,
                              lr=cfg.lr, weight_decay=cfg.weight_decay,
                              compute_dtype=(jnp.bfloat16 if
                                             args.precision == "bf16" else None))
    fleet = SeedFleet(exp, seeds)
    params, opt_state = fleet.init()
    best_params = jax.tree.map(jnp.copy, params)

    rngs = [np.random.RandomState(s) for s in seeds]
    eval_rng = np.random.RandomState(0)
    arrays = (ds_train.loc, ds_train.vel, ds_train.charges,
              ds_train.edge_weights)
    val_arrays = (ds_val.loc, ds_val.vel, ds_val.charges, ds_val.edge_weights)
    # val batches are shared across seeds: the sequential driver's val perm
    # is the unshuffled arange (make_perm(shuffle=False), main.py:233)
    vperm_const = jnp.asarray(
        np.arange((len(ds_val) // args.batch_size) * args.batch_size)
        .reshape(-1, args.batch_size))

    def _stack_idx(dicts):
        """Per-seed epoch_index_arrays dicts -> one dict with leading K axis.
        The out-window truncation (epoch_index_arrays 'valid' columns) is
        data-dependent per seed in principle; at the PRO configs the shift
        is bounded by T-1 << n_frames so no seed ever truncates — assert
        instead of silently padding."""
        out = {}
        for key in dicts[0]:
            arrs = [d[key] for d in dicts]
            assert len({a.shape for a in arrs}) == 1, \
                f"per-seed idx shape mismatch for {key}"
            out[key] = jnp.asarray(np.stack(arrs))
        return out

    if args.model == "egno" and not multi:
        # single input: index arrays are constant (no rng consumption),
        # shared across seeds
        idx_train = {key: jnp.asarray(v) for key, v in
                     exp.epoch_index_arrays(ds_train, eval_rng).items()}
        idx_val = {key: jnp.asarray(v) for key, v in
                   exp.epoch_index_arrays(ds_val, eval_rng).items()}

        def train_fn(p, o, alive_rngs):
            perms = jnp.asarray(fleet.make_perms(alive_rngs, len(ds_train),
                                                 args.batch_size))
            p, o, _, last = fleet.train_epoch(p, o, arrays, idx_train, perms)
            return p, o

        def val_fn(p, alive_rngs):
            _, vlast = fleet.eval_epoch(p, val_arrays, idx_val, vperm_const)
            # reference epoch metric is the last-timestep loss
            return np.asarray(vlast).mean(axis=1)
    elif args.model == "egno":
        # multi-input / varDT: per-seed per-epoch index sampling. The rng
        # consumption order per seed matches the sequential driver exactly
        # (main.py:232-237): the train permutation, then the train input
        # offsets; on eval epochs additionally the val input offsets.
        def train_fn(p, o, alive_rngs):
            perms, idx = [], []
            for r in alive_rngs:
                perms.append(make_perm(r, len(ds_train), args.batch_size))
                idx.append(exp.epoch_index_arrays(ds_train, r))
            p, o, _, last = fleet.train_epoch_idx(
                p, o, arrays, _stack_idx(idx),
                jnp.asarray(np.stack(perms)))
            return p, o

        def val_fn(p, alive_rngs):
            idx = [exp.epoch_index_arrays(ds_val, r) for r in alive_rngs]
            _, vlast = fleet.eval_epoch_idx(p, val_arrays, _stack_idx(idx),
                                            vperm_const)
            return np.asarray(vlast).mean(axis=1)
    else:
        frames, in_steps, _ = exp.input_frames(ds_train, None)

        def train_fn(p, o, alive_rngs):
            perms = jnp.asarray(fleet.make_perms(alive_rngs, len(ds_train),
                                                 args.batch_size))
            p, o, _ = fleet.train_epoch_segno(p, o, arrays, perms, frames,
                                              in_steps)
            return p, o

        def val_fn(p, alive_rngs):
            vl = fleet.eval_epoch_segno(p, val_arrays, vperm_const, frames,
                                        in_steps)
            return np.asarray(vl).mean(axis=1)

    es = FleetEarlyStopping(k, patience=args.patience)
    alive = np.arange(k)                 # indices into the original seed list
    start_epoch, wall_prev = 0, 0.0
    state_path = _fleet_state_path(args)
    if args.checkpoint_every and state_path.exists():
        st = _load_fleet_state(state_path)
        dev = lambda t: jax.tree.map(jnp.asarray, t)
        params, opt_state = dev(st["params"]), dev(st["opt_state"])
        best_params = dev(st["best_params"])
        for f_ in ("best_val", "best_epoch", "counter", "stopped"):
            setattr(es, f_, st["es"][f_])
        alive = st["alive"]
        for r, s in zip(rngs, st["rng_states"]):
            r.set_state(s)
        start_epoch, wall_prev = st["epoch"], st["wall_so_far"]
        print(f"resuming fleet from {state_path.name} at epoch {start_epoch} "
              f"(alive {[seeds[i] for i in alive]})")
    t0 = time.time() - wall_prev

    for epoch in range(start_epoch, args.epochs):
        alive_rngs = [rngs[i] for i in alive]
        params, opt_state = train_fn(params, opt_state, alive_rngs)
        # gate matches the reference exactly (main.py:156), including its
        # `epoch > 0` quirk: a 1-epoch run never evaluates on either side
        if (epoch % args.test_interval == 0 or epoch == args.epochs - 1) \
                and epoch > 0:
            val_a = val_fn(params, alive_rngs)             # [K_alive]
            val = np.full(k, np.inf)
            val[alive] = val_a
            improved = es(val, epoch)                      # [K]
            imp_a = jnp.asarray(improved[alive])
            alive_j = jnp.asarray(alive)
            best_params = jax.tree.map(
                lambda b, p: b.at[alive_j].set(
                    jnp.where(imp_a.reshape((-1,) + (1,) * (p.ndim - 1)),
                              p, b[alive_j])),
                best_params, params)
            print(f"epoch {epoch}: val {np.round(val, 5).tolist()} "
                  f"best {np.round(es.best_val, 5).tolist()} "
                  f"stopped {es.stopped.tolist()}")
            if es.all_stopped:
                print("All seeds early-stopped.")
                break
            newly_stopped = es.stopped[alive]
            if newly_stopped.any():
                # compact the fleet: stopped seeds stop consuming compute
                keep = np.where(~newly_stopped)[0]
                params = fleet.take(params, keep)
                opt_state = fleet.take(opt_state, keep)
                alive = alive[keep]
                print(f"compacted fleet to {len(alive)} seeds "
                      f"{[seeds[i] for i in alive]}")
        if args.checkpoint_every and epoch > 0 \
                and epoch % args.checkpoint_every == 0:
            _save_fleet_state(state_path, epoch + 1, params, opt_state,
                              best_params, es, alive, rngs,
                              time.time() - t0)
        if args._die_at_epoch is not None and epoch >= args._die_at_epoch:
            raise RuntimeError(f"test hook: simulated wedge at epoch {epoch}")
    best_val, best_epoch = es.best_val, es.best_epoch
    wall = time.time() - t0
    print(f"fleet training wall-clock: {wall:.1f}s for {k} seeds "
          f"({wall / k:.1f}s/seed equivalent)")

    out_dir = args.outf / args.exp_name
    out_dir.mkdir(parents=True, exist_ok=True)
    records = []
    for i, seed in enumerate(seeds):
        p_i = jax.tree.map(lambda a: a[i], best_params)
        stem = artifact_stem(args.model, args.dataset, seed, args.n_balls,
                             num_inputs=args.num_inputs, dT=args.dT,
                             varDT=args.varDT,
                             num_timesteps=args.num_timesteps)
        save_params(out_dir / f"{stem}.ckpt", p_i)
        if args.model == "egno":
            # multi-input: the per-seed stream continues into the test
            # window sampling, like the sequential driver's shared rng
            # (main.py:347); single-input consumes nothing — the fresh
            # RandomState keeps bit-compat with the BASE ledgers
            test_rng = rngs[i] if multi else np.random.RandomState(seed)
            test_loss, avg_steps, artifact = exp.test_rollout(
                p_i, ds_test, args.batch_size, test_rng)
        else:
            test_loss, avg_steps, artifact = exp.test_rollout(
                p_i, ds_test, args.batch_size, np.random.RandomState(seed),
                args.traj_len, varDT=False)
        np.savez(out_dir / f"{stem}_results.npz", **artifact)
        print(f"seed {seed}: best_val {best_val[i]:.5f} @ {best_epoch[i]} "
              f"test {test_loss:.5f} "
              f"finite {artifact['finite_fraction']:.3f} "
              f"loss_finite {artifact['test_loss_finite']:.5f}")
        records.append({
            "seed": seed, "best_val_loss": float(best_val[i]),
            "best_epoch": int(best_epoch[i]), "test_loss": float(test_loss),
            "finite_fraction": float(artifact["finite_fraction"]),
            "test_loss_finite": float(artifact["test_loss_finite"]),
        })
    # the group is fully recorded — drop the resume state (kept through the
    # test phase so a wedge during rollouts still resumes from the last
    # training checkpoint instead of epoch 0)
    if args.checkpoint_every:
        _fleet_state_path(args).unlink(missing_ok=True)
    return records


if __name__ == "__main__":
    main(get_args())
