#!/bin/bash
# Wedge detector for the round-4 chip chain. The axon tunnel wedges a
# long-running client silently (0% CPU forever, no exit) — without this,
# the phase scripts and watcher would wait on it indefinitely. Every 60 s:
# if a TPU job is registered (/tmp/r4_tpu_job.pid, written by run_tpu) and
# BOTH (a) no phase log has grown for STALL_S seconds AND (b) the job's
# cumulative CPU time has not advanced over the same window, kill that PID
# (by pid file, NEVER by pattern). The phase scripts' retry loops then hold
# 680 s, probe, and resume from their ledgers / fleet checkpoints.
#
# The CPU-time condition is what separates a true wedge from a long remote
# compile: the N=20 remat fleet's resume compile runs >20 min with no log
# output, but its client keeps accruing CPU ticks. Log-growth alone killed
# healthy compiles.
#
# Round-4 field note: a wedged client is NOT exactly 0% CPU — background
# threads trickle ~1-2 jiffies/min (measured: 1 jiffy / 30 s on a client
# whose log had been frozen 37 min at epoch 5), which reset the original
# exact-equality check forever and the killer never fired. The wedge test
# is now a RATE threshold: over the stall window the client must accrue
# at least WEDGE_JIFFIES to count as alive; a healthy compile burns orders
# of magnitude more.
#
# Round-5 field note: a 2026-08-21 wedge trickled ~19 jiffies/min (10x the
# round-4 signature) — enough to keep re-arming the old 150-jiffy slide
# anchor forever, so the killer never fired and the client had to be
# killed by hand. Default raised to 600 (≈ 40 jiffies/min over the 15-min
# window): healthy B=512 training burns ~900+/min, the fattest observed
# wedge ~19/min — an order of magnitude of margin on both sides.
STALL_S=${STALL_S:-900}
WEDGE_JIFFIES=${WEDGE_JIFFIES:-600}
anchor_cpu=""
anchor_t=0
last_pid=""
while true; do
  sleep 60
  pidfile=/tmp/r4_tpu_job.pid
  [ -f "$pidfile" ] || { last_pid=""; continue; }
  pid=$(cat "$pidfile")
  kill -0 "$pid" 2>/dev/null || continue
  now=$(date +%s)
  # cumulative CPU time in jiffies from /proc (utime+stime), robust to ps
  # TIME granularity
  cpu=$(awk '{print $14 + $15}' "/proc/$pid/stat" 2>/dev/null)
  [ -n "$cpu" ] || continue
  if [ "$pid" != "$last_pid" ]; then
    last_pid="$pid"; anchor_cpu="$cpu"; anchor_t=$now
    continue
  fi
  # slide the anchor forward whenever the client proves it's alive, so a
  # healthy phase never accumulates a stale window
  if [ $(( cpu - anchor_cpu )) -ge "$WEDGE_JIFFIES" ]; then
    anchor_cpu="$cpu"; anchor_t=$now
  fi
  cpu_age=$(( now - anchor_t ))
  newest=0
  for log in ${WATCH_LOGS:-/tmp/r4_phase1.log /tmp/r4_phase2.log /tmp/r5_chain.log}; do
    [ -f "$log" ] || continue
    m=$(stat -c %Y "$log")
    [ "$m" -gt "$newest" ] && newest=$m
  done
  [ "$newest" -eq 0 ] && continue
  age=$(( now - newest ))
  if [ "$age" -ge "$STALL_S" ] && [ "$cpu_age" -ge "$STALL_S" ]; then
    echo "[$(date)] stall killer: no log growth for ${age}s and no CPU advance for ${cpu_age}s, killing TPU job $pid" \
      | tee -a /tmp/r4_phase1.log
    kill "$pid" 2>/dev/null
    sleep 10
    kill -9 "$pid" 2>/dev/null
    rm -f "$pidfile"
    last_pid=""
  fi
done
