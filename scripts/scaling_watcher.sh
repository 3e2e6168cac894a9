#!/bin/bash
# Hunt for a clean measurement window on the shared host, then launch
# ONE official scaling run (`bench.py --scaling`).
#
# Policy: require 2 CONSECUTIVE clean probes (scripts/window_probe.py:
# bw_ceiling_4_16 >= 0.70 AND alu_ceiling_4_16 >= 0.85) 150 s apart.
# Co-tenant bandwidth storms last hours and decay slowly; launching on
# a single clean probe inside a decaying window contaminated run 43.
# Do NOT run heavy compute on the box while this hunts — it depresses
# the probes (self-protecting, but it delays the launch).
cd "$(dirname "$0")/.." || exit 2
good=0
for i in $(seq 1 90); do
  out=$(python scripts/window_probe.py)
  echo "$(date +%H:%M:%S) probe: $out"
  ok=$(echo "$out" | python -c "import sys,json; d=json.load(sys.stdin); print(1 if d['bw_ceiling_4_16']>=0.70 and d['alu_ceiling_4_16']>=0.85 else 0)")
  if [ "$ok" = "1" ]; then good=$((good+1)); else good=0; fi
  if [ "$good" -ge 2 ]; then
    echo "$(date +%H:%M:%S) WINDOW CLEAN x2 — launching official scaling run"
    python bench.py --scaling
    ec=$?
    echo "RUN_EXIT=$ec"
    exit $ec
  fi
  sleep 150
done
echo "no clean window found in budget"
exit 3
