#!/bin/bash
# Collect >=3 clean bench.py runs per docs/PERF.md "Headline measurement
# protocol": sequential runs on an otherwise-idle host, retry loop that
# backs off through link outages.  Appends one line per attempt to
# bench_runs.log:  <epoch> <rc> <json-line>
LOG=${1:-/root/repo/bench_runs.log}
WANT=${2:-3}
clean=0
attempt=0
backoff=60
while [ "$clean" -lt "$WANT" ] && [ "$attempt" -lt 40 ]; do
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
    backoff=60
  else
    # Exponential backoff (60s -> 20min cap): measured outages run from
    # minutes to >3h (docs/PERF.md); a constant sleep with a small attempt
    # cap exhausted itself before a long outage cleared.
    sleep "$backoff"
    backoff=$((backoff * 2))
    [ "$backoff" -gt 1200 ] && backoff=1200
  fi
done
echo "done clean=$clean attempts=$attempt" >> "$LOG"
