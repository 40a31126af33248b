"""Per-seed adjudication data for a parity-anchor workdir.

The PARITY_E2E group-mean curves can be dominated by a single outlier seed
(cross-seed spread at these chaotic configs reaches 10x). This prints the
per-seed evidence the adjudication needs: per-seed best-val, test loss,
per-step MSE tail, and the cross-framework overlap — does each side's seed
band contain the other side's median seed?

Usage:
    python scripts/parity_seed_analysis.py --workdir results/parity_e2e_charged \
        --dataset charged --seeds 1 2 3 4 5
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
import sys

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def stem(model, seed, dataset, n_balls):
    return (f"{model.upper()}_{dataset}_seed={seed}_n_part={n_balls}"
            f"_n_inputs=1_dT_1_varDT=False_num_timesteps=10")


def seed_row(workdir, side, model, seed, dataset, n_balls):
    from nonode_tpu.analysis.results import load_artifact, mse_per_timestep
    ext = "pt" if side == "ref" else "npz"
    s = stem(model, seed, dataset, n_balls)
    art = load_artifact(workdir / side / "0exp_new" / f"{s}_results.{ext}")
    preds = np.asarray(art["preds"])
    targets = np.asarray(art["targets"])[:, : preds.shape[1]]
    mse = np.asarray(mse_per_timestep(targets, preds))
    with open(workdir / side / "0exp_new" / f"{s}.json") as f:
        j = json.load(f)
    return {
        "best_val": min(j["val loss"]) if j.get("val loss") else float("nan"),
        "test_loss": float(np.asarray(art["test_loss"])),
        "mse": mse,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=Path,
                    default=REPO / "results" / "parity_e2e_charged")
    ap.add_argument("--dataset", default="charged")
    ap.add_argument("--n_balls", type=int, default=5)
    ap.add_argument("--models", nargs="+", default=["egno", "segno"])
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3, 4, 5])
    args = ap.parse_args()

    out = {}
    for model in args.models:
        rows = {side: {s: seed_row(args.workdir, side, model, s,
                                   args.dataset, args.n_balls)
                       for s in args.seeds}
                for side in ("ref", "jax")}
        print(f"\n=== {model} ({args.dataset}-{args.n_balls}) ===")
        print(f"{'seed':>4} | {'ref best_val':>12} {'ref test':>10} | "
              f"{'jax best_val':>12} {'jax test':>10}")
        for s in args.seeds:
            r, j = rows["ref"][s], rows["jax"][s]
            print(f"{s:>4} | {r['best_val']:>12.5f} {r['test_loss']:>10.5f} | "
                  f"{j['best_val']:>12.5f} {j['test_loss']:>10.5f}")

        # group mean vs per-seed MEDIAN curves: a mean/median divergence on
        # one side = outlier-driven deviation, not a systematic mechanism
        k = min(min(len(r["mse"]) for r in rows[s_].values())
                for s_ in ("ref", "jax"))
        curves = {s_: np.stack([rows[s_][s]["mse"][:k] for s in args.seeds])
                  for s_ in ("ref", "jax")}
        for name, agg in (("mean", np.mean), ("median", np.median)):
            ratio = agg(curves["jax"], axis=0) / agg(curves["ref"], axis=0)
            geo = float(np.exp(np.mean(np.log(ratio))))
            print(f"per-step jax/ref ratio of seed-{name} curves: "
                  f"geomean {geo:.3f}  "
                  f"[{' '.join(f'{v:.2f}' for v in ratio)}]")
        # band overlap: per seed, is it inside the other side's min-max band?
        for s_, other in (("ref", "jax"), ("jax", "ref")):
            lo = curves[other].min(axis=0)
            hi = curves[other].max(axis=0)
            frac = [float(((curves[s_][i] >= lo) & (curves[s_][i] <= hi))
                          .mean()) for i in range(len(args.seeds))]
            print(f"{s_} seeds inside {other} min-max band "
                  f"(fraction of steps): "
                  f"{' '.join(f'{v:.2f}' for v in frac)}")
        out[model] = {
            "ref": {s: {"best_val": rows["ref"][s]["best_val"],
                        "test_loss": rows["ref"][s]["test_loss"],
                        "mse": rows["ref"][s]["mse"][:k].tolist()}
                    for s in args.seeds},
            "jax": {s: {"best_val": rows["jax"][s]["best_val"],
                        "test_loss": rows["jax"][s]["test_loss"],
                        "mse": rows["jax"][s]["mse"][:k].tolist()}
                    for s in args.seeds},
        }
    with open(args.workdir / "seed_analysis.json", "w") as f:
        json.dump(out, f, indent=2)
    print(f"\nwrote {args.workdir / 'seed_analysis.json'}")


if __name__ == "__main__":
    main()
