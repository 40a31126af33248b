"""End-to-end trained-parity anchor: torch reference vs nonode_tpu.

Trains the UNMODIFIED reference (/root/reference/main.py, CPU torch; its
missing deps stubbed by nonode_tpu.compat) and nonode_tpu at an identical
reduced config on the same repo-generated data, then compares best-val loss,
rollout test loss, per-timestep MSE/correlation curves, and energy drift.
Writes PARITY_E2E.md + docs/figures/parity_e2e_*.png.

Reference-snapshot bugs this has to work around (each documented in
PARITY_E2E.md): the EGNO import bug (main_simulation_simple_no.py:8), the
untrainable live SEGNO forward (model.py:53-92 — trained via the
intended-semantics shim, matching nonode_tpu's documented divergence), and
the traj_len==1 artifact save crash (main.py:188-190).

Usage:
    python scripts/parity_e2e.py --workdir results/parity_e2e [--epochs 240]
Phases are resumable: existing artifacts are not re-run.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


# Adjudications of systematic deviations flagged by the two-sided verdict.
# Keyed by (dataset, model). Each entry is BOUND to the exact config it
# examined ("n_balls"), the exact check set it explains ("checks"), AND a
# machine-checkable shape "signature" of the deviation it root-caused
# (direction / where in the horizon it lives, evaluated on the current
# run's ratio stats): a future regeneration that fails a DIFFERENT check,
# runs at a different config, or deviates with a different shape (e.g. the
# OPPOSITE direction, or a uniform band shift instead of a tail spike)
# stays DIVERGENCE-OPEN instead of inheriting a stale adjudication.
# Filled once a deviation is root-caused (or pinned with a minimal repro).
# Signature stats: geo (whole-horizon geomean of the jax/ref per-step MSE
# ratio), head_geo (geomean over the first 60% of steps), tail_worst
# (worst 4-step sliding-window geomean).
ROOT_CAUSES: dict[tuple[str, str], dict] = {
    ("charged", "egno"): {
        "checks": frozenset({"one_sided"}), "n_balls": 5,
        # explains a jax-BETTER drift (stuck ref seed inflates the ref
        # mean); a jax-WORSE one-sided drift is a different finding
        "signature": lambda st: st["geo"] < 1.0,
        "cause":
        "the `one_sided` drift (group-mean per-step ratio geomean 0.65, all "
        "16 steps < 1) is an OUTLIER ARTIFACT, not a mechanism: reference "
        "seed 1 converges to a stuck plateau (best val 0.470 = 10x the "
        "other ref seeds' 0.042-0.114; test 0.154 vs their 0.044-0.064), "
        "dragging the ref group mean up at every timestep. The seed-MEDIAN "
        "per-step ratio is 0.90 (range 0.81-1.00) — inside every band — "
        "and 4/5 ref seeds lie within the jax min-max band at >=88% of "
        "steps (4/5 jax seeds within the ref band at 100%). The same stuck "
        "seed dominated the round-2 3-seed group mean (the origin of the "
        "'jax trains 2-3.6x better' finding). Pinned reference "
        "inefficiency: its training occasionally (1/5 seeds here) settles "
        "in a ~10x-worse optimization basin under its init/batch RNG "
        "stream; nonode_tpu at the matched config shows no such mode in "
        "the sampled seeds. Per-seed evidence: "
        "results/parity_e2e_charged/seed_analysis.json "
        "(scripts/parity_seed_analysis.py)."},
    ("gravity", "egno"): {
        "checks": frozenset({"band", "tail"}), "n_balls": 5,
        # explains a TAIL-DRIVEN excursion (early steps inside the band, a
        # real tail-window spike): a uniform whole-horizon band shift with
        # a clean tail must not inherit it
        "signature": lambda st: (2 / 3 <= st["head_geo"] <= 1.5
                                 and st["tail_worst"] > 3.0),
        "cause":
        "the `tail` violation (group-mean per-step ratio spiking 3-33x at "
        "steps 11-16) — and the `band` violation it induces (the 16-step "
        "geomean 2.21 is entirely tail-driven: steps 1-10 have geomean "
        "ratio 1.00, range 0.96-1.06, inside every band) — is "
        "SEED-SAMPLING NOISE of a failure mode the two "
        "frameworks SHARE, not a mechanism difference. Mechanics: the "
        "weight-transplant harness (scripts/rollout_transplant.py) runs "
        "reference-trained weights through the nonode rollout and "
        "nonode-trained weights through the reference's unmodified torch "
        "rollout — both directions reproduce the native per-step curves to "
        "geomean ratio 1.000 (results/parity_e2e_gravity/transplant.json), "
        "so eval/rollout feedback is equivalent; init distributions match "
        "torch defaults and the optimizer is torch-semantics Adam "
        "(L2-in-grad), pinned by tests/test_parity_torch.py. Outcomes at "
        "10 seeds/side: rollout blowups concentrate on the SAME chaotic "
        "test trajectories ({4,15,42,118,144,156,162,175} — 8/10 of the "
        "blown-sample union shared, one private sample per side), with "
        "per-seed blown counts ref [2,0,2,4,2,0,5,2,7,8] vs jax "
        "[2,6,2,7,5,5,6,1,2,4]: the SEED is the independent unit (blowups "
        "cluster on the same trajectories, so pooled per-sample tests "
        "overstate N), and at seed level the difference is far from "
        "significant — permutation test over seeds p=0.53, per-seed "
        "Mann-Whitney p=0.46 (pooled rates 1.6% vs 2.0%, descriptive "
        "only) — and uncorrelated with convergence quality "
        "(Spearman(best_val, blown count) = -0.06). The round-2 5-seed "
        "group mean flagged 5-10x because the unbounded per-sample loss "
        "of a diverged chaotic trajectory (Lyapunov growth makes the "
        "magnitude arbitrary) lands on whichever side's unlucky seeds were "
        "sampled: at 10v10 the seed-MEDIAN per-step ratio is geomean 1.15 "
        "(steps 1-10 at 0.85-1.03) and 9/10 ref seeds lie inside the jax "
        "min-max band at >=81% of steps. Per-seed evidence: "
        "results/parity_e2e_gravity/seed_analysis.json "
        "(scripts/parity_seed_analysis.py, 10 seeds/side)."},
}


def seeds_for(cfg, model, side):
    """Seed list for (model, side): per-model override, else the global
    --ref_seeds/--jax_seeds lists. Overrides let one model run at a deeper
    seed count (e.g. the gravity EGNO 10-vs-10 blowup-rate adjudication)
    without forcing extra runs for the other models in the same workdir."""
    over = getattr(cfg, "_per_model_seeds", {}).get(model)
    if over is not None:
        return over
    return cfg.ref_seeds if side == "ref" else cfg.jax_seeds


def stem(model, seed, cfg):
    from nonode_tpu.analysis.registry import artifact_stem
    return artifact_stem(model, cfg.dataset, seed, cfg.n_balls,
                         num_inputs=cfg.num_inputs, varDT=cfg.varDT)


def common_argv(cfg, seed, outf):
    # --num_inputs/--varDT are the SAME flags on both CLIs (the reference
    # main.py:60-62 and nonode_tpu.main) — the PRO anchor passes them
    # through verbatim so the two sides train the same cell.
    return ["--dataset", cfg.dataset, "--n_balls", str(cfg.n_balls),
            "--data_dir", str(cfg.data_dir),
            "--epochs", str(cfg.epochs), "--test_interval", "5",
            "--batch_size", str(cfg.batch_size),
            "--max_samples", str(cfg.max_samples),
            "--num_inputs", str(cfg.num_inputs), "--varDT", str(cfg.varDT),
            "--traj_len", str(cfg.traj_len), "--seed", str(seed),
            "--outf", str(outf)]


def run(cmd, log_path):
    print(f"  $ {' '.join(map(str, cmd))}")
    t0 = time.time()
    with open(log_path, "w") as f:
        r = subprocess.run(list(map(str, cmd)), stdout=f,
                           stderr=subprocess.STDOUT, cwd=REPO)
    dt = time.time() - t0
    if r.returncode != 0:
        print(open(log_path).read()[-3000:])
        raise RuntimeError(f"command failed (rc={r.returncode}), log {log_path}")
    print(f"    done in {dt:.0f}s")
    return dt


def record_wallclock(cfg, key, seconds):
    """Persist per-run wall-clock to a JSON sidecar at first run, so a
    resumed report regeneration (artifacts exist, run skipped) still shows
    the REAL training time instead of the cache-hit 0s."""
    p = cfg.workdir / "wallclock.json"
    d = json.loads(p.read_text()) if p.exists() else {}
    d[key] = round(seconds, 1)
    p.write_text(json.dumps(d, indent=2))


def load_wallclocks(cfg):
    p = cfg.workdir / "wallclock.json"
    return json.loads(p.read_text()) if p.exists() else {}


def ensure_data(cfg):
    marker = cfg.data_dir / f"loc_train_{cfg.dataset}{cfg.n_balls}_initvel1small.npy"
    if marker.exists():
        print(f"[data] exists: {marker}")
        return
    cfg.data_dir.mkdir(parents=True, exist_ok=True)
    run([sys.executable, "-m", "nonode_tpu.sim.generate",
         "--simulation", cfg.dataset, "--num-train", cfg.n_train,
         "--num-valid", cfg.n_valid, "--num-test", cfg.n_test,
         "--length", cfg.length, "--length_test", cfg.length,
         "--n_balls", cfg.n_balls, "--suffix", "small",
         "--outdir", cfg.data_dir], cfg.workdir / "datagen.log")


def run_reference_side(cfg, model, seed):
    out = cfg.workdir / "ref"
    art = out / "0exp_new" / f"{stem(model, seed, cfg)}_results.pt"
    if art.exists():
        print(f"[ref {model} s{seed}] exists")
        return art
    code = (
        "import sys; sys.path.insert(0, {repo!r})\n"
        "from nonode_tpu.compat.ref_runner import run_reference\n"
        "out = run_reference({argv!r}, fix_segno={fix})\n"
        "print('REF_DONE', out[0], out[2])\n"
    ).format(repo=str(REPO),
             argv=["--model", model] + common_argv(cfg, seed, out),
             fix=model == "segno")
    dt = run([sys.executable, "-c", code],
             cfg.workdir / f"ref_{model}_s{seed}.log")
    record_wallclock(cfg, f"ref {model} seed{seed}", dt)
    assert art.exists(), f"reference artifact missing: {art}"
    return art


def run_jax_side(cfg, model, seed):
    out = cfg.workdir / "jax"
    art = out / "0exp_new" / f"{stem(model, seed, cfg)}_results.npz"
    if art.exists():
        print(f"[jax {model} s{seed}] exists")
        return art
    dt = run([sys.executable, "-m", "nonode_tpu.main", "--model", model]
             + common_argv(cfg, seed, out),
             cfg.workdir / f"jax_{model}_s{seed}.log")
    record_wallclock(cfg, f"jax {model} seed{seed}", dt)
    assert art.exists(), f"nonode artifact missing: {art}"
    return art


def best_val_from_json(art_path):
    j = Path(str(art_path).replace("_results.pt", ".json")
             .replace("_results.npz", ".json"))
    with open(j) as f:
        d = json.load(f)
    return min(d["val loss"]) if d.get("val loss") else float("nan")


def summarize(arts):
    """arts: list of artifact paths for one (side, model) group."""
    from nonode_tpu.analysis.results import analyze_group, load_artifact
    g = analyze_group(arts)
    g["best_val"] = [best_val_from_json(a) for a in arts]
    g["best_val_mean"] = float(np.mean(g["best_val"]))
    g["test_losses"] = [float(load_artifact(a)["test_loss"]) for a in arts]
    return g


def fmt_curve(c, k=8):
    return " ".join(f"{v:.3g}" for v in np.asarray(c)[:k])


def two_sided_checks(gr, gj):
    """The anchor's two-sided tolerance rule (see write_report for the
    prose statement), computed on a (ref, jax) group pair. Shared with the
    PRO-cell combiner (scripts/parity_pro.py) so the rule has exactly one
    implementation."""
    k = min(len(gr["mse_mean"]), len(gj["mse_mean"]))
    ratio = np.asarray(gj["mse_mean"][:k]) / np.asarray(gr["mse_mean"][:k])
    lratio = np.log(ratio)
    geo = float(np.exp(lratio.mean()))
    hi = 2.0 * float(np.max(gr["test_losses"]))
    checks = {
        "upper": gj["test_loss_mean"] <= hi,
        "band": 0.5 <= geo <= 2.0,
        "one_sided": not (
            (max((ratio < 1).mean(), (ratio > 1).mean()) >= 0.9)
            and not (2 / 3 <= geo <= 1.5)),
        "tail": all(
            1 / 3 <= np.exp(lratio[i:i + 4].mean()) <= 3
            for i in range(max(1, k - 3))),
    }
    head = max(1, int(0.6 * k))
    sig_stats = {
        "geo": geo,
        "head_geo": float(np.exp(lratio[:head].mean())),
        "tail_worst": max(
            float(np.exp(lratio[i:i + 4].mean()))
            for i in range(max(1, k - 3))),
    }
    return {"k": k, "ratio": ratio, "lratio": lratio, "geo": geo,
            "checks": checks, "sig_stats": sig_stats, "hi": hi,
            "tl_ratio": gj["test_loss_mean"] / gr["test_loss_mean"]}


def write_report(cfg, groups, fig_paths, wallclocks):
    lines = [
        "# PARITY_E2E — end-to-end trained parity vs the torch reference",
        "",
        f"Matched config: `{cfg.dataset}`-{cfg.n_balls}, {cfg.n_train} train / "
        f"{cfg.n_valid} val / {cfg.n_test} test trajectories "
        f"({cfg.length} sim steps -> {cfg.length // 100 - 1} frames), "
        f"batch {cfg.batch_size}, <= {cfg.epochs} epochs, test_interval 5, "
        f"early-stop patience 15, traj_len {cfg.traj_len}, T=10, "
        f"num_inputs {cfg.num_inputs}, varDT {cfg.varDT}, "
        "model_confs.yaml hyperparameters on both sides. Same repo-generated "
        "`.npy` data consumed by both. Reference: /root/reference/main.py "
        "run UNMODIFIED on CPU torch (seeds "
        f"{cfg.ref_seeds}); nonode_tpu: `python -m nonode_tpu.main` (seeds "
        f"{cfg.jax_seeds})"
        + (f"; per-model overrides {cfg._per_model_seeds}"
           if cfg._per_model_seeds else "")
        + ". Generated by scripts/parity_e2e.py.",
        "",
        "## Reference-snapshot bugs encountered (worked around, not fixed",
        "in-place; reference tree is read-only)",
        "",
        "1. `EGNO/main_simulation_simple_no.py:8` imports "
        "`random_ascending_tensor` from `EGNO/utils.py`, which does not "
        "define it (it lives in root `utils.py:15`) — `python main.py "
        "--model egno` crashes at import. Shimmed by injecting the root "
        "function (nonode_tpu/compat/ref_runner.py).",
        "2. The live `SEGNO.forward` (`SEGNO/models/model.py:53-92`) never "
        "commits the LAST integration segment, so single-input SEGNO is an "
        "identity function of its input and `loss.backward()` raises "
        "(`element 0 of tensors does not require grad`). **The checked-in "
        "reference cannot train single-input SEGNO at all.** For the SEGNO "
        "anchor the reference is trained with the intended-semantics patch "
        "(`install_segno_intended_semantics`), which matches nonode_tpu's "
        "documented divergence (nonode_tpu/models/segno.py docstring).",
        "3. `main.py:188-190` saves the trajectory artifact whenever "
        "`traj_len > 0` but only defines it when `traj_len > 1`; and SEGNO's "
        "rollout asserts when the horizon is truncated by trajectory end "
        "(`train_nbody.py:210`). Avoided by config (traj_len "
        f"{cfg.traj_len}, horizon fits).",
        "",
        "## Outcomes",
        "",
        "| model | side | seeds | best val loss | rollout test loss |",
        "|---|---|---|---|---|",
    ]
    for model in cfg.models:
        for side in ("ref", "jax"):
            g = groups[(side, model)]
            seeds = seeds_for(cfg, model, side)
            lines.append(
                f"| {model} | {'reference (torch)' if side == 'ref' else 'nonode_tpu'} "
                f"| {seeds} | {g['best_val_mean']:.5f} | "
                f"{g['test_loss_mean']:.5f} ± {g['test_loss_std']:.5f} |")
    lines += ["", "## Per-timestep curves (group means)", ""]
    for model in cfg.models:
        gr, gj = groups[("ref", model)], groups[("jax", model)]
        k = min(len(gr["mse_mean"]), len(gj["mse_mean"]))
        ratio = np.asarray(gj["mse_mean"][:k]) / np.asarray(gr["mse_mean"][:k])
        lines += [
            f"### {model}",
            "",
            f"- MSE/step ref:  {fmt_curve(gr['mse_mean'], k)}",
            f"- MSE/step jax:  {fmt_curve(gj['mse_mean'], k)}",
            f"- jax/ref ratio: {fmt_curve(ratio, k)}  "
            f"(geomean {np.exp(np.mean(np.log(ratio))):.2f}x)",
            f"- corr/step ref: {fmt_curve(gr['corr_mean'], k)}",
            f"- corr/step jax: {fmt_curve(gj['corr_mean'], k)}",
            f"- energy-drift^2/step ref: {fmt_curve(gr['energy_drift_mean'], k)}",
            f"- energy-drift^2/step jax: {fmt_curve(gj['energy_drift_mean'], k)}",
            "",
        ]
    lines += ["## Figures", ""]
    lines += [f"![{p.stem}]({p.as_posix()})" for p in fig_paths]
    lines += [
        "",
        "## Tolerance statement (two-sided)",
        "",
        "Training is stochastic on both sides (different RNG streams for "
        "init, batch order, and varDT/window sampling — bitwise parity is "
        "impossible by construction; forward-pass bitwise parity is pinned "
        "separately in tests/test_parity_torch.py with ported weights). The "
        "anchor therefore compares trained OUTCOMES across seeds, with a "
        "TWO-SIDED rule — systematically better is a deviation to "
        "adjudicate, not a free pass. Per model, all of:",
        "",
        "1. upper bound: jax group-mean rollout test loss <= 2x the worst "
        "reference seed (the reference's own cross-seed envelope + 2x);",
        "2. whole-horizon band: per-timestep MSE geomean ratio in [0.5, 2];",
        "3. no one-sided drift: NOT (>= 90% of per-timestep ratios on one "
        "side of 1.0 AND geomean outside [0.67, 1.5]);",
        "4. no divergent tail: every 4-step sliding window's geomean ratio "
        "in [1/3, 3].",
        "",
        "A model violating any rule is a SYSTEMATIC DEVIATION; it resolves "
        "to `root-caused` only with an adjudication entry below, else the "
        "overall verdict stays DIVERGENCE-OPEN.",
        "",
    ]
    verdicts = []
    flagged = []
    for model in cfg.models:
        gr, gj = groups[("ref", model)], groups[("jax", model)]
        ev = two_sided_checks(gr, gj)
        k, ratio, lratio = ev["k"], ev["ratio"], ev["lratio"]
        geo, checks, sig_stats = ev["geo"], ev["checks"], ev["sig_stats"]
        tl_ratio, hi = ev["tl_ratio"], ev["hi"]
        ok = all(checks.values())
        failed = [c for c, v in checks.items() if not v]
        entry = ROOT_CAUSES.get((cfg.dataset, model))
        cause = None
        # adjudications were derived at single-input fixed-dT anchors — a
        # PRO cell (multi-input / varDT) must not inherit them
        if entry is not None and set(failed) <= entry["checks"] \
                and cfg.n_balls == entry["n_balls"] \
                and cfg.num_inputs == entry.get("num_inputs", 1) \
                and cfg.varDT == entry.get("varDT", False) \
                and entry["signature"](sig_stats):
            cause = entry["cause"]
        if ok:
            verdict = "PARITY"
        elif cause is not None:
            verdict = f"SYSTEMATIC DEVIATION ({', '.join(failed)}) — root-caused"
        else:
            verdict = f"SYSTEMATIC DEVIATION ({', '.join(failed)}) — OPEN"
        verdicts.append(ok or cause is not None)
        if not ok:
            flagged.append((model, cause))
        win = [float(np.exp(lratio[i:i + 4].mean()))
               for i in range(max(1, k - 3))]
        lines.append(
            f"- **{model}**: ref per-seed test losses "
            f"{[round(t, 5) for t in gr['test_losses']]}, jax "
            f"{[round(t, 5) for t in gj['test_losses']]}; mean ratio "
            f"jax/ref = {tl_ratio:.2f}; per-timestep MSE geomean ratio = "
            f"{geo:.2f} over the {k}-step horizon (worst 4-step window "
            f"{max(win):.2f}, best {min(win):.2f}); upper bound "
            f"{gj['test_loss_mean']:.4f} vs {hi:.4f} — **{verdict}**")
    lines += [
        "",
        "Overall: "
        + ("PASS" if all(verdicts) else "DIVERGENCE — OPEN (see above)")
        + " (every model at PARITY or with a root-caused adjudication).",
    ]
    if flagged:
        lines += ["", "## Systematic-deviation adjudication", ""]
        for model, cause in flagged:
            lines.append(f"- **{model}**: "
                         + (cause if cause else
                            "OPEN — not yet root-caused."))
    lines += [
        "",
        "## Wall-clock (same machine; reference on CPU torch, nonode_tpu on "
        "1 TPU chip)",
        "",
        "Timings persist to `wallclock.json` at first run, so resumed "
        "report regenerations show the real training time, not a cache hit.",
        "",
        "| run | seconds |", "|---|---|",
    ]
    note = load_wallclocks(cfg).get("_note")
    if note:
        lines[-3:-3] = ["", note]
    for k_, v in wallclocks.items():
        lines.append(f"| {k_} | {v:.0f} |" if v is not None
                     else f"| {k_} | n/a (pre-sidecar run) |")
    for model in cfg.models:
        # speedup over the seeds that have timings on BOTH sides (early
        # runs predate the sidecar)
        pairs = [(wallclocks.get(f"ref {model} seed{s}"),
                  wallclocks.get(f"jax {model} seed{s}"))
                 for s in seeds_for(cfg, model, "ref")
                 if s in seeds_for(cfg, model, "jax")]
        pairs = [(r, j) for r, j in pairs if r is not None and j is not None]
        if pairs and sum(j for _, j in pairs) > 0:
            lines.append(
                f"| **{model} speedup (sum ref / sum jax, "
                f"{len(pairs)} timed seeds)** | "
                f"**{sum(r for r, _ in pairs) / sum(j for _, j in pairs):.2f}x** |")
    lines += [
        "",
        "These ratios measure the ANCHOR runs, not framework throughput: "
        "the anchor config is deliberately tiny (5 train steps/epoch at "
        "batch 100 — per-epoch chip compute is sub-millisecond), seeds "
        "early-stop at different epoch counts on each side, and the runs "
        "share a single host CPU core with concurrent jobs, so wall-clock "
        "here is dominated by host dispatch/tunnel sync + torch-side "
        "contention. The throughput comparison at the canonical config is "
        "bench.py / RESULTS.md (sync-closed: 322x the measured torch-CPU "
        "reference at batch 256).",
    ]
    # keep the original charged report path; per-dataset reports otherwise
    name = cfg.report or ("PARITY_E2E.md" if cfg.dataset == "charged"
                          else f"PARITY_E2E_{cfg.dataset}.md")
    (REPO / name).write_text("\n".join(lines) + "\n")
    print(f"wrote {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=Path,
                    default=REPO / "results" / "parity_e2e")
    ap.add_argument("--dataset", default="charged")
    ap.add_argument("--n_balls", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=240)
    ap.add_argument("--batch_size", type=int, default=100)
    ap.add_argument("--max_samples", type=int, default=500)
    ap.add_argument("--n_train", type=int, default=500)
    ap.add_argument("--n_valid", type=int, default=100)
    ap.add_argument("--n_test", type=int, default=200)
    ap.add_argument("--length", type=int, default=10000)
    ap.add_argument("--traj_len", type=int, default=4)
    ap.add_argument("--num_inputs", type=int, default=1)
    ap.add_argument("--varDT", default=False,
                    type=lambda v: str(v).lower() in ("1", "true", "t", "yes"))
    ap.add_argument("--sides", default="ref,jax",
                    help="comma subset of ref,jax — run only those training "
                    "sides (e.g. the CPU-only ref side while the chip is "
                    "busy); the report is only written when both sides' "
                    "artifacts exist")
    ap.add_argument("--report", default=None,
                    help="report filename override (default: PARITY_E2E.md "
                    "for charged, PARITY_E2E_<dataset>.md otherwise)")
    ap.add_argument("--models", nargs="+", default=["egno", "segno"])
    ap.add_argument("--ref_seeds", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--jax_seeds", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--model_seeds", nargs="*", default=[],
                    help="per-model seed override 'MODEL=1,2,3' applied to "
                    "BOTH sides (e.g. 'egno=1,2,3,4,5,6,7,8,9,10')")
    cfg = ap.parse_args()
    cfg._per_model_seeds = {}
    for spec in cfg.model_seeds:
        model, _, csv = spec.partition("=")
        cfg._per_model_seeds[model] = [int(v) for v in csv.split(",")]
    cfg.data_dir = cfg.workdir / "data"
    cfg.workdir.mkdir(parents=True, exist_ok=True)

    # provenance guard: resumed runs reuse artifacts keyed only by
    # (model, dataset, seed) — a changed protocol flag would silently mix
    # old artifacts under a new report header. Pin the anchor config on
    # first run; refuse to resume under a different one.
    prov_keys = ("dataset", "n_balls", "epochs", "batch_size", "max_samples",
                 "n_train", "n_valid", "n_test", "length", "traj_len",
                 "num_inputs", "varDT")
    prov = {k: getattr(cfg, k) for k in prov_keys}
    prov_path = cfg.workdir / "anchor_config.json"
    if prov_path.exists():
        saved = json.loads(prov_path.read_text())
        # pre-PRO sidecars predate the num_inputs/varDT keys; they pinned
        # the implicit defaults
        saved = {"num_inputs": 1, "varDT": False} | saved
        if saved != prov:
            diff = {k: (saved.get(k), prov[k]) for k in prov_keys
                    if saved.get(k) != prov[k]}
            raise SystemExit(
                f"workdir {cfg.workdir} holds artifacts from a DIFFERENT "
                f"anchor config {diff} (saved vs requested) — use a fresh "
                f"--workdir or rerun with the saved config")
    else:
        prov_path.write_text(json.dumps(prov, indent=2))

    ensure_data(cfg)

    sides = [s.strip() for s in cfg.sides.split(",") if s.strip()]
    arts = {}
    for model in cfg.models:
        if "ref" in sides:
            for seed in seeds_for(cfg, model, "ref"):
                arts.setdefault(("ref", model), []).append(
                    run_reference_side(cfg, model, seed))
        if "jax" in sides:
            for seed in seeds_for(cfg, model, "jax"):
                arts.setdefault(("jax", model), []).append(
                    run_jax_side(cfg, model, seed))
    if not all(("ref", m) in arts and ("jax", m) in arts
               for m in cfg.models):
        print(f"sides={sides}: one-sided run complete; report skipped "
              "(rerun with --sides ref,jax once both sides exist)")
        return
    saved = load_wallclocks(cfg)
    wallclocks = {key: saved.get(key)
                  for model in cfg.models
                  for side in ("ref", "jax")
                  for key in [f"{side} {model} seed{s}"
                              for s in seeds_for(cfg, model, side)]}

    from nonode_tpu.analysis.results import plot_multiple_curves
    groups = {k: summarize(v) for k, v in arts.items()}

    figdir = REPO / "docs" / "figures"
    figdir.mkdir(parents=True, exist_ok=True)
    # PRO-cell anchors (num_inputs>1 / varDT) get their own figure names —
    # the default stem is owned by the committed BASE anchors, which a
    # re-run at a different cell must not clobber
    cell = (f"_in{cfg.num_inputs}" if cfg.num_inputs > 1 else "") + \
        ("_varT" if cfg.varDT else "")
    fig_paths = []
    for model in cfg.models:
        gr, gj = groups[("ref", model)], groups[("jax", model)]
        for metric, ylabel in [("mse", "MSE"), ("energy_drift",
                                                "mean squared energy drift")]:
            p = figdir / f"parity_e2e_{cfg.dataset}{cell}_{model}_{metric}.png"
            plot_multiple_curves(
                {"reference (torch)": (gr[f"{metric}_mean"], gr[f"{metric}_std"]),
                 "nonode_tpu": (gj[f"{metric}_mean"], gj[f"{metric}_std"])},
                out_path=p, ylabel=ylabel,
                title=f"{model} {cfg.dataset}-{cfg.n_balls} trained parity")
            fig_paths.append(p.relative_to(REPO))

    write_report(cfg, groups, fig_paths, wallclocks)


if __name__ == "__main__":
    main()
