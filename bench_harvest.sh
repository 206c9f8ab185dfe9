#!/bin/bash
# Collect >=3 clean bench.py runs per docs/PERF.md "Headline measurement
# protocol": sequential runs on an otherwise-idle host, retry loop that
# backs off through link outages.  Appends one line per attempt to
# bench_runs.log:  <epoch> <rc> <json-line>
LOG=${1:-/root/repo/bench_runs.log}
WANT=${2:-3}
clean=0
attempt=0
while [ "$clean" -lt "$WANT" ] && [ "$attempt" -lt 12 ]; do
  attempt=$((attempt+1))
  ts=$(date +%s)
  out=$(cd /root/repo && timeout 1800 python bench.py 2>/tmp/bench_err.$attempt)
  rc=$?
  echo "$ts rc=$rc $out" >> "$LOG"
  # A run is clean when it produced the headline (no "error" key and a
  # non-partial note).
  if [ "$rc" -eq 0 ] && echo "$out" | grep -q '"vs_baseline"' \
     && ! echo "$out" | grep -q '"error"' \
     && ! echo "$out" | grep -q 'partial'; then
    clean=$((clean+1))
  else
    sleep 60   # back off through link weather before retrying
  fi
done
echo "done clean=$clean attempts=$attempt" >> "$LOG"
