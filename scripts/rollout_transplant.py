"""Cross-framework rollout weight-transplant: adjudicate the gravity EGNO
tail deviation (PARITY_E2E_gravity.md: jax steps 11+ are 5-10x worse in the
GROUP MEAN while steps 1-10 and best-val match).

The deviation has two candidate sources: (a) the rollout feedback MECHANICS
(main_simulation_simple_no.py:342-384 vs train/loop.py:rollout) differ, or
(b) the TRAINED WEIGHTS differ in feedback stability (training outcome).
Transplanting weights across frameworks separates them:

- Direction A (ref .pth -> jax rollout): port each reference-trained
  checkpoint (compat/torch_port.py) and run the jax test rollout on the
  SAME anchor test set; compare per-step MSE with the curve recomputed from
  the reference's own ``*_results.pt`` (same weights + same data, so any
  difference is rollout mechanics, modulo fp noise amplified by chaos).
- Direction B (jax .ckpt -> ref rollout): export each jax-trained
  checkpoint to a reference-layout state_dict, run the UNMODIFIED reference
  driver with ``--epochs 0`` (its post-loop checkpoint-load + rollout path,
  main.py:173-186), and compare with the jax artifact curve.

If both directions reproduce each side's curves, the mechanics are
equivalent and the deviation lives in the trained weights (cross-seed
feedback-stability variance). Output: <workdir>/transplant.json + stdout
table.

Usage:
    python scripts/rollout_transplant.py --workdir results/parity_e2e_gravity \
        --dataset gravity --seeds 1 2 3 4 5
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
import sys

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def stem(seed, dataset, n_balls):
    from nonode_tpu.analysis.registry import artifact_stem
    return artifact_stem("egno", dataset, seed, n_balls)


def per_step_mse(art):
    from nonode_tpu.analysis.results import mse_per_timestep
    preds = np.asarray(art["preds"])
    targets = np.asarray(art["targets"])[:, : preds.shape[1]]
    return np.asarray(mse_per_timestep(targets, preds))


def build_exp():
    from nonode_tpu.config import load_model_config
    from nonode_tpu.models.egno import EGNO
    from nonode_tpu.train.loop import EGNOExperiment

    cfg = load_model_config("egno", REPO / "model_confs.yaml")
    model = EGNO(n_layers=cfg.n_layers, in_node_nf=cfg.in_node_nf,
                 in_edge_nf=cfg.in_edge_nf, hidden_nf=cfg.hidden_nf,
                 num_modes=cfg.num_modes, num_timesteps=cfg.num_timesteps,
                 time_emb_dim=cfg.time_emb_dim)
    return EGNOExperiment(model, lr=cfg.lr, weight_decay=cfg.weight_decay), cfg


def direction_a(cfg_args, exp):
    """ref weights -> jax rollout, vs the ref's own artifact curve."""
    import torch

    from nonode_tpu.analysis.results import load_artifact
    from nonode_tpu.compat.torch_port import egno_params_from_state_dict
    from nonode_tpu.data.nbody import NBodyDataset

    # max_samples must match the anchor's --max_samples (the ref artifact
    # covers only that many test samples; a wider jax split would compare
    # different sample sets)
    ds_test = NBodyDataset(
        partition="test", dataset=cfg_args.dataset, n_balls=cfg_args.n_balls,
        num_timesteps=10, traj_len=cfg_args.traj_len,
        max_samples=cfg_args.max_samples,
        data_dir=cfg_args.workdir / "data")
    out = {}
    for seed in cfg_args.seeds:
        s = stem(seed, cfg_args.dataset, cfg_args.n_balls)
        pth = cfg_args.workdir / "ref" / "0exp_new" / f"{s}.pth"
        sd = torch.load(pth, map_location="cpu", weights_only=True)
        params = egno_params_from_state_dict(sd, n_layers=4)
        _, _, art = exp.test_rollout(params, ds_test, cfg_args.batch_size,
                                     np.random.RandomState(seed))
        mse_transplant = per_step_mse(art)
        ref_art = load_artifact(
            cfg_args.workdir / "ref" / "0exp_new" / f"{s}_results.pt")
        mse_ref = per_step_mse(ref_art)
        k = min(len(mse_ref), len(mse_transplant))
        out[seed] = {"ref_rollout": mse_ref[:k].tolist(),
                     "jax_rollout_of_ref_weights": mse_transplant[:k].tolist()}
        print(f"[A seed {seed}] ref tail(13-16) "
              f"{mse_ref[12:16].mean():.4g}  jax-transplant tail "
              f"{mse_transplant[12:16].mean():.4g}")
    return out


def direction_b(cfg_args, exp):
    """jax weights -> reference rollout (--epochs 0), vs the jax artifact."""
    import torch

    from nonode_tpu.analysis.results import load_artifact
    from nonode_tpu.compat.ref_runner import run_reference
    from nonode_tpu.compat.torch_port import egno_state_dict_from_params
    from nonode_tpu.train.checkpoint import load_params

    import jax

    template, _ = exp.init(jax.random.PRNGKey(0))
    out = {}
    scratch = cfg_args.workdir / "transplant_b"
    # cache is valid only under the SAME eval config: a changed
    # --max_samples/--traj_len/--batch_size would silently compare rollouts
    # over different sample sets. Checked once for the whole run.
    eval_cfg = {"max_samples": cfg_args.max_samples,
                "traj_len": cfg_args.traj_len,
                "batch_size": cfg_args.batch_size,
                "dataset": cfg_args.dataset, "n_balls": cfg_args.n_balls}
    cfg_path = scratch / "eval_config.json"
    cfg_stale = (not cfg_path.exists()
                 or json.loads(cfg_path.read_text()) != eval_cfg)
    if cfg_stale:
        scratch.mkdir(parents=True, exist_ok=True)
        # purge ALL cached rollouts before stamping the new config: the
        # stamp is written up front, so an interrupted run must not leave
        # old-config caches that a resume would accept via the mtime check
        for old in (scratch / "0exp_new").glob("*_results.pt"):
            old.unlink()
        cfg_path.write_text(json.dumps(eval_cfg, indent=2))
    for seed in cfg_args.seeds:
        s = stem(seed, cfg_args.dataset, cfg_args.n_balls)
        params = load_params(
            cfg_args.workdir / "jax" / "0exp_new" / f"{s}.ckpt", template)
        sd = {k: torch.tensor(v)
              for k, v in egno_state_dict_from_params(params, 4).items()}
        (scratch / "0exp_new").mkdir(parents=True, exist_ok=True)
        res_pt = scratch / "0exp_new" / f"{s}_results.pt"
        ckpt = cfg_args.workdir / "jax" / "0exp_new" / f"{s}.ckpt"
        if cfg_stale or not res_pt.exists() \
                or res_pt.stat().st_mtime < ckpt.stat().st_mtime:
            res_pt.unlink(missing_ok=True)
            torch.save(sd, scratch / "0exp_new" / f"{s}.pth")
            run_reference([
                "--model", "egno", "--dataset", cfg_args.dataset,
                "--n_balls", str(cfg_args.n_balls),
                "--data_dir", str(cfg_args.workdir / "data"),
                "--epochs", "0", "--batch_size", str(cfg_args.batch_size),
                "--max_samples", str(cfg_args.max_samples),
                "--traj_len", str(cfg_args.traj_len), "--seed", str(seed),
                "--outf", str(scratch)])
        mse_transplant = per_step_mse(load_artifact(res_pt))
        jax_art = load_artifact(
            cfg_args.workdir / "jax" / "0exp_new" / f"{s}_results.npz")
        mse_jax = per_step_mse(jax_art)
        k = min(len(mse_jax), len(mse_transplant))
        out[seed] = {"jax_rollout": mse_jax[:k].tolist(),
                     "ref_rollout_of_jax_weights": mse_transplant[:k].tolist()}
        print(f"[B seed {seed}] jax tail(13-16) "
              f"{mse_jax[12:16].mean():.4g}  ref-transplant tail "
              f"{mse_transplant[12:16].mean():.4g}")
    return out


def summarize(a, b):
    def group_curve(d, key):
        return np.mean([np.asarray(v[key]) for v in d.values()], axis=0)

    s = {}
    for name, d, native, transplant in (
            ("A_ref_weights", a, "ref_rollout", "jax_rollout_of_ref_weights"),
            ("B_jax_weights", b, "jax_rollout", "ref_rollout_of_jax_weights")):
        if not d:
            continue
        gn, gt = group_curve(d, native), group_curve(d, transplant)
        ratio = gt / gn
        s[name] = {
            "native_group_mean": gn.tolist(),
            "transplant_group_mean": gt.tolist(),
            "transplant/native ratio": ratio.tolist(),
            "geomean_ratio": float(np.exp(np.mean(np.log(ratio)))),
            "tail_ratio_13_16": float(gt[12:16].mean() / gn[12:16].mean()),
        }
        print(f"{name}: geomean transplant/native ratio "
              f"{s[name]['geomean_ratio']:.3f}, tail(13-16) ratio "
              f"{s[name]['tail_ratio_13_16']:.3f}")
    return s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=Path,
                    default=REPO / "results" / "parity_e2e_gravity")
    ap.add_argument("--dataset", default="gravity")
    ap.add_argument("--n_balls", type=int, default=5)
    ap.add_argument("--traj_len", type=int, default=4)
    ap.add_argument("--batch_size", type=int, default=100)
    ap.add_argument("--max_samples", type=int, default=500,
                    help="must match the parity anchor's --max_samples")
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3, 4, 5])
    ap.add_argument("--skip_a", action="store_true")
    ap.add_argument("--skip_b", action="store_true")
    args = ap.parse_args()

    exp, _ = build_exp()
    # a skipped direction keeps its previously stored results instead of
    # wiping them from transplant.json
    prev = {}
    prev_path = args.workdir / "transplant.json"
    if prev_path.exists() and (args.skip_a or args.skip_b):
        prev = json.loads(prev_path.read_text())
    a = prev.get("A", {}) if args.skip_a else direction_a(args, exp)
    b = prev.get("B", {}) if args.skip_b else direction_b(args, exp)
    s = summarize(a, b)
    out = {"A": a, "B": b, "summary": s}
    with open(prev_path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.workdir / 'transplant.json'}")


if __name__ == "__main__":
    main()
