#!/bin/bash
# Full reference BASE grid (_schedule.yaml:1-31): {segno,egno} x
# {charged,gravity} x n_balls {5,10,20} x 5 seeds, trained as vmapped seed
# fleets (--use_fleet; the HBM guard auto-scales batch/remat for N=20).
# Resumable via the sweep ledger.
set -e
cd "$(dirname "$0")/.."

gen () {  # sim n_balls
  if [ ! -f "data/loc_train_${1}${2}_initvel1small.npy" ]; then
    python -m nonode_tpu.sim.generate --simulation "$1" --n_balls "$2" \
      --num-train 3000 --num-valid 2000 --num-test 2000 \
      --length 20000 --length_test 52000 --sample-freq 100 \
      --seed 43 --suffix small --outdir data
  fi
}

for n in 5 10 20; do
  gen charged $n
  gen gravity $n
done

python -m nonode_tpu.parallel.sweep --grid BASE --use_fleet \
  --data_dir data --outf results/base --epochs 300 --batch_size 256
