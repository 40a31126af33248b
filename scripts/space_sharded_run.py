"""Space-sharded large-N training through the real driver — recorded run.

Runs `nonode_tpu.main` twice at an identical gravity N=100 config on a
virtual 8-device CPU mesh (the only multi-device platform on this machine;
the bench host has ONE TPU chip): once single-device, once sharded
--dp 2 --space 4 (batch over 'data', the 100-particle axis over 'space' —
the pairwise [B,N,N,.] tensors shard over the receiver axis and XLA
all-gathers the sender axis; gradient psum comes from sharding propagation).
Asserts the sharded run reproduces the single-device losses.

The N=100 dataset comes from `python -m nonode_tpu.sim.generate --simulation
gravity --n_balls 100 ...` (see RESULTS.md "Space-sharded large-N" for the
exact command). Usage:

    python scripts/space_sharded_run.py --data_dir /tmp/g100

This is the driver-level proof that the 'space' axis (SURVEY.md §5
"long-context/N-axis parallelism": the N-body analogue of sequence
parallelism) trains a real large-N workload, not just the dryrun shapes.
Wall-clock on the 1-core CPU mesh is meaningless; the single-chip TPU
wall-clock for the same config is recorded in RESULTS.md alongside.
"""

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = """
import jax
jax.config.update('jax_platforms', 'cpu')
from nonode_tpu.main import get_args, main
import json, sys
args = get_args(json.loads(sys.argv[1]))
main(args)
"""


def run_child(cli_args, n_devices=8):
    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={n_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    r = subprocess.run(
        [sys.executable, "-c", CHILD, json.dumps(cli_args)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600)
    if r.returncode != 0:
        raise RuntimeError(f"driver child failed:\n{r.stdout}\n{r.stderr}")
    return r.stdout


def read_metrics(outf, exp_name="0exp_new"):
    js = sorted((Path(outf) / exp_name).glob("*[0-9].json"))
    assert js, f"no results json under {outf}/{exp_name}"
    return json.loads(js[-1].read_text())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/tmp/g100")
    ap.add_argument("--outf", default="/tmp/g100_spacecmp")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--max_samples", type=int, default=8)
    args = ap.parse_args()

    base = ["--model", "egno", "--dataset", "gravity", "--n_balls", "100",
            "--data_dir", str(args.data_dir), "--epochs", str(args.epochs),
            "--test_interval", "1", "--batch_size", str(args.batch_size),
            "--max_samples", str(args.max_samples), "--traj_len", "1"]

    print("== single-device (1 of 8 virtual CPU devices) ==", flush=True)
    run_child(base + ["--outf", f"{args.outf}/single"])
    single = read_metrics(f"{args.outf}/single")

    print("== sharded --dp 2 --space 4 ==", flush=True)
    run_child(base + ["--outf", f"{args.outf}/sharded",
                      "--dp", "2", "--space", "4"])
    sharded = read_metrics(f"{args.outf}/sharded")

    row = {}
    # reference-schema loss log: {"eval epoch": [..], "val loss": [..],
    # "test loss": [..], "train loss": [..]} (main.py:184-186 semantics)
    for k in ("train loss", "val loss", "test loss", "eval epoch"):
        s, d = single[k], sharded[k]
        row[k] = {"single": s, "dp2_space4": d}
        assert len(s) == len(d) and len(s) > 0, (k, s, d)
        rel = max(abs(a - b) / max(abs(a), 1e-12) for a, b in zip(s, d))
        assert rel < 5e-4, f"{k}: single={s} sharded={d} max rel={rel}"
    print(json.dumps(row, indent=2))
    print("OK: space-sharded N=100 driver run reproduces single-device")


if __name__ == "__main__":
    main()
