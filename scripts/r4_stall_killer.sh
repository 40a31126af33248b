#!/bin/bash
# Wedge detector for the round-4 chip chain. The axon tunnel wedges a
# long-running client silently (0% CPU forever, no exit) — without this,
# the phase scripts and watcher would wait on it indefinitely. Every 60 s:
# if a TPU job is registered (/tmp/r4_tpu_job.pid, written by run_tpu) and
# NO phase log has grown for STALL_S seconds, kill that PID (by pid file,
# NEVER by pattern). The phase scripts' retry loops then hold 680 s, probe,
# and resume from their ledgers / fleet checkpoints.
#
# STALL_S is conservative (15 min): remote compiles and rollout-test phases
# can be legitimately silent for several minutes.
STALL_S=${STALL_S:-900}
while true; do
  sleep 60
  pidfile=/tmp/r4_tpu_job.pid
  [ -f "$pidfile" ] || continue
  pid=$(cat "$pidfile")
  kill -0 "$pid" 2>/dev/null || continue
  newest=0
  for log in /tmp/r4_phase1.log /tmp/r4_phase2.log; do
    [ -f "$log" ] || continue
    m=$(stat -c %Y "$log")
    [ "$m" -gt "$newest" ] && newest=$m
  done
  [ "$newest" -eq 0 ] && continue
  age=$(( $(date +%s) - newest ))
  if [ "$age" -ge "$STALL_S" ]; then
    echo "[$(date)] stall killer: no log growth for ${age}s, killing TPU job $pid" \
      | tee -a /tmp/r4_phase1.log
    kill "$pid" 2>/dev/null
    sleep 10
    kill -9 "$pid" 2>/dev/null
    rm -f "$pidfile"
  fi
done
