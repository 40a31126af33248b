#!/bin/bash
# Round-5 boot: bring the chip up after a wedged first probe, pre-generate
# the parity workdirs' data (serially — MUST precede both the chain and the
# CPU ref runner, which each ensure_data and would otherwise race a second
# TPU client onto the tunnel), then launch the detached chain, the stall
# killer, and the CPU torch ref side.
cd "$(dirname "$0")/.."
source scripts/r4_tpu_lib.sh

echo "=== boot: initial 700 s hold (first probe wedged) ($(date)) ==="
sleep 700
probe || { echo "boot: chip unreachable"; exit 1; }

gen_parity () {  # exact ensure_data argv (scripts/parity_e2e.py)
  local dir="results/parity_e2e_pro_$1/data"
  if [ ! -f "$dir/loc_train_gravity5_initvel1small.npy" ]; then
    echo "=== boot: parity datagen $1 ($(date +%H:%M:%S)) ==="
    mkdir -p "$dir"
    run_tpu python -m nonode_tpu.sim.generate --simulation gravity \
      --num-train 500 --num-valid 100 --num-test 200 \
      --length 10000 --length_test 10000 --n_balls 5 \
      --suffix small --outdir "$dir" || return 1
  fi
}
gen_parity varT || exit 1
# identical config + seed -> identical files; copy instead of regenerating
mkdir -p results/parity_e2e_pro_varF/data
cp results/parity_e2e_pro_varT/data/*.npy results/parity_e2e_pro_varF/data/

echo "=== boot: launching chain + stall killer + ref side ($(date)) ==="
nohup bash scripts/r5_chain.sh > /tmp/r5_chain.log 2>&1 &
echo $! > /tmp/r5_chain.pid
nohup bash scripts/r4_stall_killer.sh > /tmp/r5_stall_killer.log 2>&1 &
echo $! > /tmp/r4_stall_killer.pid
nohup bash scripts/r5_parity_ref.sh > /tmp/r5_parity_ref.log 2>&1 &
echo $! > /tmp/r5_parity_ref.pid
echo "=== boot done: chain=$(cat /tmp/r5_chain.pid) killer=$(cat /tmp/r4_stall_killer.pid) ref=$(cat /tmp/r5_parity_ref.pid) ==="
