"""Regenerate docs/REPORT.md — the consolidated reproduction report.

One entry point (VERDICT round-4 item 8): renders the complete BASE+PRO
reference-protocol reproduction, the trained-parity anchors, the mocap
group, the perf/roofline story, and the multi-chip validation — all from
COMMITTED artifacts (ledgers under results/, the PARITY_E2E*.md anchors,
results/bench_full.json, MULTICHIP_r*.json). Nothing here measures or
trains; a reader reruns this script and gets the same document the repo
ships, or an updated one after new ledger rows land.

This is the artifact the reference's plotting.py:859-1116 / test.ipynb
final tables correspond to, re-done as a reproducible document.

Usage: python scripts/make_report.py  [--out docs/REPORT.md]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from protocol_compare import compare_table  # noqa: E402  (same directory)


def _read_json(path):
    try:
        return json.loads(Path(path).read_text())
    except (OSError, json.JSONDecodeError):
        return None


def _read_jsonl(path):
    try:
        return [json.loads(l) for l in Path(path).read_text().splitlines()]
    except OSError:
        return []


def section_grids():
    lines = ["## 1. The reference sweep, reproduced at the reference protocol",
             "",
             "Both `_schedule.yaml` grids (the reference's full experimental "
             "surface: BASE 60 cells, PRO 96 cells), trained end-to-end at "
             "the reference protocol — epochs ≤ 1000 with patience-15 early "
             "stopping (`/root/reference/main.py:37-45`) — on one TPU v5e "
             "chip, against the round-2 300-epoch truncated grids. «ref» "
             "numbers are ledger-backed (`results/{base_ref,pro_ref}/"
             "sweep_*.jsonl`, resumable wedge-surviving chains); `loss@20f`/"
             "`finite@20f` are the bound-invariant 20-frame rollout "
             "companions (divergence-bound sensitivity swept 3×–30× at two "
             "snapshots, `results/bound_sensitivity{,_r5}.json`; companions "
             "survive artifact wipes via the committed per-seed/group "
             "snapshots `results/*/companions.jsonl`).", ""]
    for name, short, ref in (("BASE (60 cells, 5 seeds)",
                              "results/base", "results/base_ref"),
                             ("PRO (96 cells, 3 seeds)",
                              "results/pro", "results/pro_ref")):
        try:
            tbl, tally = compare_table(REPO / short, REPO / ref)
        except Exception as e:
            tbl, tally = [f"_table unavailable: {e}_"], ""
        note = []
        if all(l.endswith("| nan | nan |") for l in tbl[2:]):
            # the grid's rollout artifacts are absent from this checkout (a
            # machine reset wiped the gitignored .npz trees; ledger scalars
            # are append-only and survive) — drop the two all-nan companion
            # columns instead of printing a wall of nan
            tbl = [l.rsplit("|", 3)[0] + "|"
                   if l.endswith("| nan | nan |") else
                   "|".join(l.split("|")[:-3]) + "|" for l in tbl]
            note = ["", "_Rollout companions (`loss@20f`/`finite@20f`) "
                    "omitted: this grid's `.npz` artifacts were wiped by a "
                    "machine reset (ledger scalars survive). The values "
                    "measured while the artifacts existed are preserved in "
                    "RESULTS.md («Full reference BASE grid») and were "
                    "covered by the divergence-bound sensitivity sweep of "
                    "that snapshot._"]
        lines += [f"### {name}", ""] + tbl + note + ["", tally, ""]
    lines += [
        "Findings (detail and history in RESULTS.md):",
        "",
        "- **Every one of the 22 EGNO groups improves 25–46% at the "
        "reference protocol** with median best epochs 720–999: the "
        "300-epoch cap structurally truncated ALL of EGNO's training. "
        "SEGNO's early stopping fires well before 1000, so its numbers "
        "move ≤ 2% — except gravity-varDT, the one SEGNO regime the cap "
        "also bound.",
        "- **SEGNO beats EGNO ~2–3× on validation everywhere** and leads "
        "on the 20-frame rollout too; EGNO's 200-frame autoregressive "
        "rollouts diverge for most seeds while its 20-frame MSE stays "
        "well-behaved — the same chaotic-tail behavior the trained torch "
        "reference exhibits (see the anchors below).",
        "- **varDT improves SEGNO gravity validation ~2.5×** (gravity-5/"
        "in=2: 0.0021 varT vs 0.0052 varF at protocol) — the thesis's PRO "
        "hypothesis, reproduced and anchored (PARITY_E2E_pro.md).",
        ""]
    return lines


def section_anchors():
    lines = ["## 2. Trained-parity anchors vs the actually-trained torch "
             "reference",
             "",
             "The reference is trained UNMODIFIED (CPU torch, its missing "
             "deps stubbed; `compat/ref_runner.py`) at matched reduced "
             "configs on repo-generated data, ≥5 seeds/side, and compared "
             "under a TWO-SIDED four-check rule (upper bound / whole-horizon "
             "band / one-sided drift / divergent tail — "
             "`scripts/parity_e2e.py:two_sided_checks`). Forward-pass "
             "bitwise parity with ported weights is pinned separately "
             "(`tests/test_parity_torch.py`).", ""]
    anchors = [("PARITY_E2E.md", "charged-5, egno+segno, 5 seeds/side"),
               ("PARITY_E2E_gravity.md",
                "gravity-5, egno+segno (EGNO at 10v10 seeds for the "
                "blowup-rate adjudication)"),
               ("PARITY_E2E_pro.md",
                "PRO cell: segno/gravity-5/in=2, varDT ON vs OFF, "
                "5 seeds/side + varDT direction check")]
    for fname, desc in anchors:
        p = REPO / fname
        if not p.exists():
            lines.append(f"- `{fname}` ({desc}): _not yet generated_")
            continue
        txt = p.read_text()
        m = re.search(r"^Overall: (.+)$", txt, re.M)
        verdict = m.group(1).strip() if m else "(no Overall line)"
        lines.append(f"- `{fname}` ({desc}): **{verdict}**")
    lines += [
        "",
        "Cross-framework weight transplants (reference-trained weights "
        "through the nonode rollout and vice versa) reproduce the native "
        "per-step curves to geomean ratio 1.000 "
        "(`scripts/rollout_transplant.py`), isolating training stochastics "
        "from eval semantics.", ""]
    return lines


def section_mocap():
    rows = _read_jsonl(REPO / "results/mocap/ledger.jsonl")
    lines = ["## 3. CMU motion-capture (EGNO, case=run)", ""]
    if not rows:
        return lines + ["_ledger unavailable_", ""]
    tl = np.array([r["test_loss"] for r in rows], float)
    bv = np.array([r["best_val_loss"] for r in rows], float)
    lines += [
        f"5-seed group on the reference's walk/run splits "
        f"(`data/motion.py` + batched-FK `data/amc.py`, bit-parity with "
        f"the reference's preprocessing pinned by test): best val "
        f"{bv.mean():.4f} ± {bv.std(ddof=1):.4f}, rollout test "
        f"{tl.mean():.2f} ± {tl.std(ddof=1):.2f} (per-seed "
        f"{[round(float(t), 2) for t in tl]}) — the round-3 single-seed "
        f"number was a favorable outlier; the group statistic is the "
        f"honest one. Ledger: `results/mocap/ledger.jsonl`; figures "
        f"`docs/figures/mocap_run/`.", ""]
    return lines


def section_perf():
    lines = ["## 4. Performance on TPU v5e-1", ""]
    full = _read_json(REPO / "results/bench_full.json") or []
    rows = {r.get("metric"): r for r in full if isinstance(r, dict)}
    # prefer whichever headline record is richer: bench_headline.json is
    # rewritten by every default bench run and gained the bf16_* keys in
    # round 5; an older bench_full.json row must not hide them
    hl_candidates = [rows.get("egno_train_throughput"),
                     _read_json(REPO / "results/bench_headline.json")]
    hl_candidates = [h for h in hl_candidates if h]
    hl = max(hl_candidates, key=lambda h: len(h), default=None)
    if hl:
        extra = (f"; validated bf16 speed mode "
                 f"{hl['bf16_samples_per_s']:,.0f} samples/s"
                 if hl.get("bf16_samples_per_s") else "")
        lines += [
            f"- **Headline**: EGNO train step (canonical charged-5, "
            f"B=256) **{hl['value']:,.0f} samples/s** "
            f"({hl.get('step_ms', '?')} ms/step) — "
            f"**{hl.get('vs_baseline', '?')}× the torch-CPU reference** "
            f"measured on this host{extra}."]
    seg = rows.get("segno_train_throughput")
    if seg:
        lines += [f"- SEGNO train step: {seg['value']:,.0f} samples/s — "
                  "integrator-serialized by the model's 80 sequential "
                  "weight-tied GCL applications; batching is measured flat "
                  "(results/segno_latency.json), so samples/s is the honest "
                  "headline, not MFU."]
    dg = rows.get("datagen_charged5")
    if dg:
        lines += [f"- Dataset generation: {dg['value']:,.0f} traj/s "
                  "(charged-5, 20k steps) — the reference's hours-scale CPU "
                  "datagen runs in seconds (scan/vmap simulators)."]
    ln = rows.get("large_n_1000body_20k_steps")
    if ln:
        lines += [f"- 1000-body charged, 20k steps: {ln['value']} s "
                  f"({ln.get('pair_interactions_per_s', '?')} G pairs/s, "
                  "Pallas blockwise pairwise kernel) — a scale the "
                  "reference cannot reach at all (its dense torch simulator "
                  "OOMs/stalls; see RESULTS.md stretch controls for the "
                  "drift adjudication)."]
    lines += ["", "### Roofline (measured; `results/bench_full.json`)", "",
              "| shape | samples/s | step ms | Tflop/s | MFU (fp32-H) | "
              "MFU (bf16) |", "|---|---|---|---|---|---|"]
    for key, label in (
            ("roofline_egno_charged20_B512", "charged-20 B=512"),
            ("roofline_egno_gravity100_B64", "gravity-100 (large-N dense)"),
            ("roofline_egno_charged5_h256_B512", "charged-5 hidden=256 B=512"),
            ("roofline_egno_charged20_B512_bf16", "charged-20 B=512 «bf16»"),
            ("roofline_egno_charged5_h256_B512_bf16",
             "charged-5 h=256 B=512 «bf16»")):
        r = rows.get(key)
        if not r or "error" in r:
            continue
        f32 = r.get("mfu_fp32_highest_peak")
        b16 = r.get("mfu_bf16_peak")
        lines.append(
            f"| {label} | {r['value']:,.0f} | {r['step_ms']} "
            f"| {r.get('achieved_tflops', '?')} "
            f"| {f'{f32:.1%}' if f32 else '—'} "
            f"| {f'{b16:.1%}' if b16 else '—'} |")
    lines += [
        "",
        "MFU tracks arithmetic intensity as the roofline predicts: width "
        "scaling (hidden 64→256) lifts fp32-HIGHEST MFU to ~47% "
        "(15.3 Tflop/s through the MXU); the reference's hidden-64 shapes "
        "are HBM/latency-bound by construction. The opt-in `--precision "
        "bf16` mode doubles end-to-end training throughput at identical "
        "shapes (single-pass MXU matmuls, fp32 master weights)."]
    # bf16 trained-quality summary
    c20 = _read_jsonl(REPO / "results/bf16_quality/ledger_c20.jsonl")
    lines += ["", "### bf16 speed mode: trained-quality gates", "",
              "- charged-5 (canonical), 3-seed protocol fleets vs the fp32 "
              "5-seed band: **EGNO matched** (best-val ratio 0.973), "
              "**SEGNO NOT matched** (1/3 seeds NaN, +10% best-val) — the "
              "2.1× rows are EGNO-only (`results/bf16_quality/"
              "ledger.jsonl`, `scripts/bf16_compare.py`)."]
    if c20:
        by = {}
        for r in c20:
            by.setdefault(r["precision"], []).append(r["best_val_loss"])
        if "fp32" in by and "bf16" in by:
            f, b = np.array(by["fp32"]), np.array(by["bf16"])
            lines += [
                f"- charged-20/B=512 (the shape the 2.1× throughput row is "
                f"measured at), 3 seeds/precision at the reference "
                f"protocol: fp32 best val {f.mean():.4f} ± "
                f"{f.std(ddof=1):.4f} vs bf16 {b.mean():.4f} ± "
                f"{b.std(ddof=1):.4f} (ratio {b.mean() / f.mean():.3f}) — "
                f"closes the round-4 shape gap "
                f"(`results/bf16_quality/ledger_c20.jsonl`)."]
    else:
        lines += ["- charged-20/B=512 shape-gap runs: _ledger_c20.jsonl "
                  "not yet populated (scripts/r5_chain.sh phase 3)_."]
    lines += [""]
    return lines


def section_multichip():
    mc = None
    for n in sorted(REPO.glob("MULTICHIP_r*.json"), reverse=True):
        mc = _read_json(n)
        if mc:
            break
    lines = ["## 5. Multi-chip (SPMD over a device mesh)", ""]
    if not mc:
        return lines + ["_no dryrun record_", ""]
    lines += [
        f"`__graft_entry__.dryrun_multichip` on a {mc.get('n_devices', '?')}"
        "-device mesh (virtual CPU devices; one physical chip is an "
        "environment constraint): both models' whole-epoch train/eval "
        "scans AND the jitted rollout+energy programs run under dp and "
        "dp×space `NamedSharding`s with sharded == single-device outputs "
        "(rtol 5e-5). The driver exposes the same mesh via `--dp/--space` "
        "on real workloads (space-sharded gravity-100 training measured in "
        "RESULTS.md). Collectives are XLA-inserted from sharding "
        "annotations — no hand-written NCCL/MPI analog, by design.", ""]
    return lines


def make_report():
    lines = [
        "# NO-NODE-comparison on TPU — consolidated reproduction report",
        "",
        "The complete experimental surface of the reference "
        "(simone7monaco/NO-NODE-comparison: EGNO + SEGNO neural-operator/"
        "graph models on charged/gravity N-body and CMU mocap), rebuilt "
        "TPU-native (JAX/XLA/Pallas; functional modules, whole-epoch "
        "jitted `lax.scan` programs, device-resident datasets) and run END "
        "TO END at the reference protocol on one TPU v5e chip. Component "
        "coverage: 43/43 (PARITY.md, line-per-component with tests); "
        "behavioral contracts cite reference file:line in docstrings; "
        "documented divergences from reference bugs are pinned by tests "
        "(README.md).",
        "",
        "Everything below regenerates from committed artifacts: "
        "`python scripts/make_report.py`.",
        "",
    ]
    lines += section_grids()
    lines += section_anchors()
    lines += section_mocap()
    lines += section_perf()
    lines += section_multichip()
    lines += [
        "## 6. Regeneration map",
        "",
        "| artifact | command |",
        "|---|---|",
        "| this report | `python scripts/make_report.py` |",
        "| grid tables | `python scripts/protocol_compare.py --short "
        "results/pro --ref results/pro_ref` (same for base) |",
        "| figures + table.tex | `python -m nonode_tpu.analysis.registry "
        "<results-dir> --out docs/figures/<name>` |",
        "| parity anchors | `python scripts/parity_e2e.py` / "
        "`python scripts/parity_pro.py` |",
        "| bound sensitivity | `python scripts/bound_sensitivity.py --outf "
        "results/pro_ref --outf results/base_ref --json "
        "results/bound_sensitivity.json` |",
        "| benchmarks | `python bench.py --full` (chip must be free) |",
        "| the grids themselves | `scripts/run_{base,pro}_grid.sh`, "
        "`scripts/r5_chain.sh` (resumable ledgers) |",
        "",
    ]
    return "\n".join(lines) + "\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, default=REPO / "docs" / "REPORT.md")
    args = ap.parse_args()
    args.out.write_text(make_report())
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
