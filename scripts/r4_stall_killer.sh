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
# The CPU-time condition is what separates a true wedge (field notes: 0%
# CPU forever) from a long remote compile: the N=20 remat fleet's resume
# compile runs >20 min with no log output, but its client keeps accruing
# CPU ticks. Log-growth alone killed healthy compiles.
STALL_S=${STALL_S:-900}
last_cpu=""
last_cpu_change=0
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
  if [ "$pid" != "$last_pid" ] || [ "$cpu" != "$last_cpu" ]; then
    last_pid="$pid"; last_cpu="$cpu"; last_cpu_change=$now
  fi
  cpu_age=$(( now - last_cpu_change ))
  newest=0
  for log in /tmp/r4_phase1.log /tmp/r4_phase2.log; do
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
