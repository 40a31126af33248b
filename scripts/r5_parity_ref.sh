#!/bin/bash
# CPU torch reference side of the PRO parity anchor (VERDICT round-4
# item 3): segno/gravity-5/num_inputs=2, varDT={T,F} x 5 seeds, reduced
# protocol — scripts/parity_pro.py's exact ensure_trained argv restricted
# to --sides ref. Safe alongside the TPU chain (pure-CPU torch subprocesses;
# round 4 ran ref seeds concurrently with a TPU sweep — wallclock.json
# note). PREREQ: both workdirs' data/ must already exist (pre-generated
# serially on the chip BEFORE any chain launch) — otherwise ensure_data
# starts a second TPU client and wedges the tunnel.
# Resumable: existing ref artifacts are skipped.
cd "$(dirname "$0")/.."
for varDT in True False; do
  v=$([ "$varDT" = True ] && echo varT || echo varF)
  if [ ! -f "results/parity_e2e_pro_$v/data/loc_train_gravity5_initvel1small.npy" ]; then
    echo "FATAL: results/parity_e2e_pro_$v/data missing — pre-generate it" \
         "on the chip first (see header)"; exit 1
  fi
  echo "=== parity ref side $v ($(date)) ==="
  python scripts/parity_e2e.py \
    --workdir "results/parity_e2e_pro_$v" --dataset gravity \
    --n_balls 5 --num_inputs 2 --varDT "$varDT" --models segno \
    --epochs 600 --report "PARITY_E2E_pro_$v.md" \
    --ref_seeds 1 2 3 4 5 --jax_seeds 1 2 3 4 5 --sides ref \
    || { echo "ref side $v failed"; exit 1; }
done
echo "=== parity ref side complete ($(date)) ==="
