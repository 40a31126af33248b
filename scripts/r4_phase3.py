"""Round-4 chip phase 3 — the short TPU jobs after the PRO ref-protocol grid.

Four resume-safe stages (each skips work its ledger already holds), run
strictly serially on the one tunneled chip:

1. bf16_quality  — VERDICT item 4: train canonical charged-5 (EGNO + SEGNO,
   3 seeds each) under --precision bf16 at the full reference protocol;
   ledger results/bf16_quality/ledger.jsonl for comparison against the fp32
   seed bands in results/base_ref/sweep_BASE.jsonl.
2. mocap         — VERDICT item 5: 5-seed EGNO mocap run-case group at the
   reference preset (configs/config_mocap_no.json), per-seed artifacts +
   ledger results/mocap/ledger.jsonl.
3. stretch_drift — VERDICT item 3: the BASELINE.md stretch config end to
   end — 1000-body charged, Pallas kernels, 20k leapfrog steps, energy
   evaluated on all 200 saved frames; drift curve (reference oracle
   |Et-E0|/(E0+1e-10), /root/reference/utils.py:221-243, plus a
   kinetic-scale-normalized companion since charged E0 can sit near zero)
   saved to results/stretch/drift_1000body_20k.npz + .json.
4. segno_latency — VERDICT item 9: is SEGNO's 1.26 ms / 1.2%-MFU step
   latency-bound? Measure the train step at B = 256 / 1024 / 4096
   (sync-closed, device->host transfer closes the timing window) and record
   samples/s + achieved Tflop/s to results/segno_latency.json.
5. bf16_eval_fp32 — follow-up to bf16_quality: the bf16-trained fp32 master
   checkpoints re-evaluated with the DEFAULT fp32 rollout (main --only_test,
   which bit-reproduces the ledgered test phase), isolating eval-precision
   from trained-model quality in the rollout columns.

Usage: python scripts/r4_phase3.py [--stages bf16_quality,mocap,...]
"""

import argparse
import json
import time
from pathlib import Path
import sys

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

MOCAP_DATA = "/root/reference/EGNO/motion/dataset"


def _ledger_rows(path):
    if not Path(path).exists():
        return {}
    rows = [json.loads(l) for l in Path(path).read_text().splitlines()]
    return {r["key"]: r for r in rows}


def _append(path, row):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(row) + "\n")


def stage_bf16_quality():
    """3-seed fleets under --precision bf16, apples-to-apples with the fp32
    base_ref rows (which were fleet-trained too, and fleet == sequential is
    pinned by test)."""
    from nonode_tpu.fleet_main import get_args, main
    ledger = ROOT / "results/bf16_quality/ledger.jsonl"
    done = _ledger_rows(ledger)
    for model in ("egno", "segno"):
        key = f"{model}/charged/5/seeds1-3/bf16"
        if key in done:
            continue
        print(f"=== bf16_quality {key} ===", flush=True)
        t0 = time.time()
        records = main(get_args([
            "--model", model, "--dataset", "charged", "--n_balls", "5",
            "--seeds", "1,2,3", "--precision", "bf16",
            "--epochs", "1000", "--batch_size", "256",
            "--data_dir", str(ROOT / "data"),
            "--outf", str(ROOT / "results/bf16_quality")]))
        _append(ledger, {"key": key, "model": model, "precision": "bf16",
                         "records": records,
                         "wall_s": round(time.time() - t0, 1)})


def stage_mocap():
    from nonode_tpu.motion_main import get_args, main
    ledger = ROOT / "results/mocap/ledger.jsonl"
    done = _ledger_rows(ledger)
    for seed in (1, 2, 3, 4, 5):
        key = f"egno/motion_run/seed{seed}"
        if key in done:
            continue
        print(f"=== mocap {key} ===", flush=True)
        t0 = time.time()
        args = get_args(["--config_by_file", "--data_dir", MOCAP_DATA,
                         "--outf", str(ROOT / "results/mocap")])
        args.seed = seed   # the preset merge clobbers --seed (reference
        #                    quirk, main_simulation_simple_no.py:389-399)
        best_val, test_loss = main(args)
        _append(ledger, {"key": key, "seed": seed,
                         "best_val_loss": float(best_val),
                         "test_loss": float(test_loss),
                         "wall_s": round(time.time() - t0, 1)})


def stage_stretch_drift():
    out = ROOT / "results/stretch"
    if (out / "drift_1000body_20k.json").exists():
        return
    import jax
    import jax.numpy as jnp
    from nonode_tpu.sim.large import LargeNChargedSim
    print("=== stretch_drift: 1000-body charged, 20k steps ===", flush=True)
    n, steps, freq = 1000, 20000, 100
    sim = LargeNChargedSim(n_balls=n)
    t0 = time.time()
    loc, vel, edges, q = sim.sample_trajectory(jax.random.PRNGKey(2),
                                               T=steps, sample_freq=freq)
    np.asarray(loc[0])  # device->host transfer closes the timing window
    wall_sim = time.time() - t0
    t0 = time.time()
    e = np.asarray(jnp.stack([sim.energy(loc[i], vel[i], edges)
                              for i in range(loc.shape[0])]), dtype=np.float64)
    wall_energy = time.time() - t0
    # reference oracle: |Et - E0| / (E0 + 1e-10)  (utils.py:221-243)
    drift_ref = np.abs(e - e[0]) / (e[0] + 1e-10)
    # kinetic-scale companion (charged E0 = K + PE can sit near zero,
    # making the reference-relative number scale-fragile)
    k0 = float(0.5 * np.asarray((vel[0] ** 2)).sum())
    drift_k = np.abs(e - e[0]) / k0
    out.mkdir(parents=True, exist_ok=True)
    np.savez(out / "drift_1000body_20k.npz", energy=e,
             drift_ref=drift_ref, drift_kinetic=drift_k)
    rec = {"n_balls": n, "steps": steps, "sample_freq": freq,
           "frames": int(e.shape[0]), "E0": float(e[0]),
           "kinetic_scale": k0,
           "max_drift_ref_oracle": float(np.abs(drift_ref).max()),
           "max_drift_kinetic": float(drift_k.max()),
           "final_drift_kinetic": float(drift_k[-1]),
           "wall_sim_s": round(wall_sim, 2),
           "wall_energy_s": round(wall_energy, 2)}
    (out / "drift_1000body_20k.json").write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec), flush=True)


def stage_segno_latency():
    path = ROOT / "results/segno_latency.json"
    if path.exists():
        return
    import jax
    import jax.numpy as jnp
    from nonode_tpu.data.nbody import NBodyDataset
    from nonode_tpu.models.segno import SEGNO
    from nonode_tpu.train.loop import SEGNOExperiment, make_perm
    print("=== segno_latency: B sweep ===", flush=True)
    ds = NBodyDataset(data_dir=ROOT / "data", partition="train",
                      dataset="charged", n_balls=5, max_samples=3000)
    model = SEGNO(hidden_nf=64, n_layers=8)
    exp = SEGNOExperiment(model, num_timesteps=10, lr=5e-3,
                          weight_decay=1e-12)
    arrays = (ds.loc, ds.vel, ds.charges, ds.edge_weights)
    frames, in_steps, _ = exp.input_frames(ds, None)
    rows = []
    for b in (256, 1024, 2944):   # 2944 = largest multiple of 64 < 3000
        params, opt_state = exp.init(jax.random.PRNGKey(0))
        perm = jnp.asarray(make_perm(np.random.RandomState(0), len(ds), b))
        nb = perm.shape[0]

        def run():
            nonlocal params, opt_state
            params, opt_state, losses = exp.train_epoch(
                params, opt_state, arrays, perm, frames, in_steps)
            return losses

        np.asarray(run())                    # compile + warm transfer
        # ONE device->host transfer per timed block: a per-epoch sync costs
        # a ~30 ms tunnel roundtrip, which at nb=1 epoch/step would dominate
        # the step time and at nb=11 would add ~3 ms/step — the round-3
        # measurement made exactly that mistake (the three batch sizes had
        # 11/2/1 steps per epoch, so the sync share differed 11x per row
        # and the 'flat samples/s' read was an artifact).
        reps = 10
        t0 = time.time()
        losses = None
        for _ in range(reps):
            losses = run()
        np.asarray(losses)                   # closes the async timing window
        dt = (time.time() - t0) / reps / nb  # per step
        rows.append({"batch": b, "steps_per_epoch": int(nb),
                     "step_ms": round(dt * 1e3, 3),
                     "samples_per_s": round(b / dt, 1)})
        print(rows[-1], flush=True)
    path.write_text(json.dumps(rows, indent=2))


def stage_bf16_eval_fp32():
    """Re-run the test rollout of every bf16-trained seed under the DEFAULT
    fp32 eval path (main --only_test, which bit-reproduces the ledgered test
    phase — tests/test_driver.py). Checkpoints hold fp32 master weights (the
    bf16 cast happens per-step inside _loss, train/loop.py:209-213), so this
    isolates EVAL precision from trained quality in the rollout columns."""
    import shutil
    from nonode_tpu.main import get_args, main
    from nonode_tpu.analysis.registry import artifact_stem
    ledger = ROOT / "results/bf16_quality/fp32_eval_ledger.jsonl"
    done = _ledger_rows(ledger)
    src_dir = ROOT / "results/bf16_quality/0exp_fleet"
    eval_dir = ROOT / "results/bf16_quality/fp32_eval"
    eval_dir.mkdir(parents=True, exist_ok=True)
    for model in ("egno", "segno"):
        for seed in (1, 2, 3):
            key = f"{model}/charged/5/seed{seed}/bf16train_fp32eval"
            if key in done:
                continue
            stem = artifact_stem(model, "charged", seed, 5, num_inputs=1,
                                 dT=1, varDT=False, num_timesteps=10)
            src = src_dir / f"{stem}.ckpt"
            if not src.exists():
                print(f"skip {key}: no checkpoint {src}", flush=True)
                continue
            # copy into a separate exp dir so --only_test's artifact writes
            # don't clobber the bf16-eval npz next to the original ckpt
            shutil.copy2(src, eval_dir / f"{stem}.ckpt")
            print(f"=== bf16_eval_fp32 {key} ===", flush=True)
            t0 = time.time()
            best_val, test_loss, _ = main(get_args([
                "--model", model, "--dataset", "charged", "--n_balls", "5",
                "--seed", str(seed), "--only_test", "true",
                "--batch_size", "256",
                "--data_dir", str(ROOT / "data"),
                "--outf", str(ROOT / "results/bf16_quality"),
                "--exp_name", "fp32_eval"]))
            art = np.load(eval_dir / f"{stem}_results.npz")
            _append(ledger, {
                "key": key, "model": model, "seed": seed,
                "test_loss": float(test_loss),
                "finite_fraction": float(art["finite_fraction"]),
                "test_loss_finite": float(art["test_loss_finite"]),
                "wall_s": round(time.time() - t0, 1)})


STAGES = {"bf16_quality": stage_bf16_quality, "mocap": stage_mocap,
          "stretch_drift": stage_stretch_drift,
          "segno_latency": stage_segno_latency,
          "bf16_eval_fp32": stage_bf16_eval_fp32}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", type=str, default=",".join(STAGES))
    args = ap.parse_args()
    for name in args.stages.split(","):
        STAGES[name]()
    print("=== phase 3 done ===")


if __name__ == "__main__":
    main()
