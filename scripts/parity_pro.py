"""PRO-cell trained-parity anchor: varDT-helps-SEGNO vs the torch reference.

VERDICT round-4 item 3: the strongest PRO finding — varDT improves SEGNO
gravity validation ~2.5x at the reference protocol (0.0021 vs 0.0052,
results/pro_ref/sweep_PRO.jsonl) — rested entirely on the rebuild's own
runs on both sides. This script anchors the PRO cell against the
actually-trained torch reference: segno/gravity-5/num_inputs=2 with varDT
ON and OFF, >=5 seeds/side, trained through scripts/parity_e2e.py (the
reference runs UNMODIFIED via compat/ref_runner with the intended-semantics
SEGNO shim — required for ANY trainable SEGNO, multi-input included, since
the live forward drops the final integration segment,
/root/reference/SEGNO/models/model.py:53-92; the multi-input fusion
:78-91 and varDT step sampling train_nbody.py:97-116 run as checked in).

Two deliverables, written to PARITY_E2E_pro.md:
1. per-variant two-sided parity (the same 4-check rule as the BASE
   anchors, one shared implementation: parity_e2e.two_sided_checks);
2. the varDT DIRECTION anchor: does the actually-trained reference also
   improve when varDT turns on, and by a comparable factor?

Usage (after both variants' ref+jax sides exist; each side resumable):
    python scripts/parity_pro.py [--seeds 1 2 3 4 5] [--train]
With --train, missing sides are trained first (jax side needs the chip
free — serialize with any running sweep per the verify-skill runbook).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from argparse import Namespace
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import importlib.util  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "parity_e2e", REPO / "scripts" / "parity_e2e.py")
pe = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(pe)

VARIANTS = {True: "varT", False: "varF"}


def workdir(varDT):
    return REPO / "results" / f"parity_e2e_pro_{VARIANTS[varDT]}"


def cfg_for(varDT, seeds):
    return Namespace(dataset="gravity", n_balls=5, num_inputs=2,
                     varDT=varDT, workdir=workdir(varDT), seeds=seeds)


def artifact(cfg, side, seed):
    st = pe.stem("segno", seed, cfg)
    ext = "_results.pt" if side == "ref" else "_results.npz"
    return cfg.workdir / side / "0exp_new" / (st + ext)


def ensure_trained(cfg, train):
    missing = [(side, s) for side in ("ref", "jax") for s in cfg.seeds
               if not artifact(cfg, side, s).exists()]
    if not missing:
        return
    if not train:
        raise SystemExit(f"missing artifacts for {cfg.workdir.name}: "
                         f"{missing} — rerun with --train (chip free for "
                         "the jax side)")
    seeds = [str(s) for s in cfg.seeds]
    subprocess.run(
        [sys.executable, "scripts/parity_e2e.py",
         "--workdir", str(cfg.workdir), "--dataset", "gravity",
         "--n_balls", "5", "--num_inputs", "2", "--varDT", str(cfg.varDT),
         "--models", "segno", "--epochs", "600",
         "--report", f"PARITY_E2E_pro_{VARIANTS[cfg.varDT]}.md",
         "--ref_seeds", *seeds, "--jax_seeds", *seeds],
        cwd=REPO, check=True)


def group(cfg, side):
    arts = [artifact(cfg, side, s) for s in cfg.seeds]
    return pe.summarize(arts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3, 4, 5])
    ap.add_argument("--train", action="store_true")
    args = ap.parse_args()

    groups = {}
    for varDT in (True, False):
        cfg = cfg_for(varDT, args.seeds)
        ensure_trained(cfg, args.train)
        for side in ("ref", "jax"):
            groups[(side, varDT)] = group(cfg, side)

    lines = [
        "# PARITY_E2E_pro — the varDT-helps-SEGNO PRO cell vs the "
        "actually-trained torch reference",
        "",
        "Anchored cell: segno / gravity-5 / num_inputs=2, varDT ON vs OFF "
        f"— {len(args.seeds)} seeds/side ({args.seeds}), reduced protocol "
        "(500/100/200 trajectories, batch 100, epochs <= 600, "
        "test_interval 5, patience-15 early stop, traj_len 4), same "
        "repo-generated data on both sides, reference run UNMODIFIED on "
        "CPU torch via compat/ref_runner (intended-semantics SEGNO shim — "
        "see PARITY_E2E.md bug #2; the multi-input attn fusion "
        "`SEGNO/models/model.py:78-91` and the varDT step sampler "
        "`SEGNO/train_nbody.py:97-116` execute as checked in). Generated "
        "by scripts/parity_pro.py; per-variant figures/reports: "
        "PARITY_E2E_pro_varT.md / PARITY_E2E_pro_varF.md.",
        "",
        "## Outcomes",
        "",
        "| varDT | side | best val (mean over seeds) | per-seed best val "
        "| rollout test loss (mean ± std) |",
        "|---|---|---|---|---|",
    ]
    for varDT in (True, False):
        for side in ("ref", "jax"):
            g = groups[(side, varDT)]
            per_seed = " ".join(f"{v:.5f}" for v in g["best_val"])
            lines.append(
                f"| {'T' if varDT else 'F'} "
                f"| {'reference (torch)' if side == 'ref' else 'nonode_tpu'} "
                f"| {g['best_val_mean']:.5f} | {per_seed} "
                f"| {g['test_loss_mean']:.5f} ± {g['test_loss_std']:.5f} |")

    lines += ["", "## Two-sided parity per variant (rule of "
              "PARITY_E2E.md, shared implementation)", ""]
    parity_ok = {}
    for varDT in (True, False):
        ev = pe.two_sided_checks(groups[("ref", varDT)],
                                 groups[("jax", varDT)])
        failed = [c for c, v in ev["checks"].items() if not v]
        parity_ok[varDT] = not failed
        lines.append(
            f"- **varDT={'T' if varDT else 'F'}**: per-timestep MSE "
            f"geomean ratio jax/ref = {ev['geo']:.2f} over "
            f"{ev['k']} steps (worst 4-step window "
            f"{ev['sig_stats']['tail_worst']:.2f}); rollout mean ratio "
            f"{ev['tl_ratio']:.2f}; upper bound "
            f"{groups[('jax', varDT)]['test_loss_mean']:.4f} vs "
            f"{ev['hi']:.4f} — "
            + ("**PARITY**" if not failed else
               f"**SYSTEMATIC DEVIATION ({', '.join(failed)}) — OPEN**"))

    # the direction anchor
    lines += ["", "## The varDT direction, on each side", ""]
    direction = {}
    for side in ("ref", "jax"):
        vt = groups[(side, True)]["best_val_mean"]
        vf = groups[(side, False)]["best_val_mean"]
        direction[side] = vf / vt
        per_t = groups[(side, True)]["best_val"]
        per_f = groups[(side, False)]["best_val"]
        n_improve = sum(t < f for t, f in zip(sorted(per_t), sorted(per_f)))
        lines.append(
            f"- **{'reference (torch)' if side == 'ref' else 'nonode_tpu'}"
            f"**: best val {vt:.5f} (varT) vs {vf:.5f} (varF) — varDT "
            f"{'improves' if vt < vf else 'WORSENS'} validation "
            f"{vf / vt:.2f}x; rank-paired seeds improving: "
            f"{n_improve}/{len(per_t)}.")
    both_improve = all(r > 1.0 for r in direction.values())
    lines += [
        "",
        f"Direction verdict: **{'ANCHORED' if both_improve else 'NOT CONFIRMED'}** — "
        + (f"the actually-trained torch reference reproduces the "
           f"varDT improvement ({direction['ref']:.2f}x) alongside "
           f"nonode_tpu ({direction['jax']:.2f}x) at the matched reduced "
           "protocol. This anchors the full-protocol PRO-grid finding "
           "(RESULTS.md: segno gravity-5/in=2 best val 0.0021 varT vs "
           "0.0052 varF, results/pro_ref/sweep_PRO.jsonl) to the "
           "reference implementation."
           if both_improve else
           f"sides disagree (ref {direction['ref']:.2f}x, jax "
           f"{direction['jax']:.2f}x) — the full-protocol finding keeps "
           "its rebuild-only status; adjudicate before citing."),
        "",
        "Overall: "
        + ("PASS" if (all(parity_ok.values()) and both_improve)
           else "DIVERGENCE — OPEN (see above)")
        + " (both variants at parity and the varDT direction reproduced "
        "on the reference side).",
    ]
    (REPO / "PARITY_E2E_pro.md").write_text("\n".join(lines) + "\n")
    print("wrote PARITY_E2E_pro.md")
    print("\n".join(lines[-8:]))


if __name__ == "__main__":
    main()
