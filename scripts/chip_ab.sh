#!/bin/bash
# Round-2 chip A/B session: waits for the TPU tunnel to come back, then
# runs the unmeasured-optimization benchmark plan SOLO (one bench
# process at a time; nothing else may touch the chip OR burn host CPU
# while this runs).
#
# Flagged A/Bs run through scripts/ab_bench.py (paired, interleaved
# passes in one process — the chip's hourly drift makes sequential
# whole-config comparisons unreliable).  Plain config benches use
# bench.py.  Results land in bench_ab_r02/<name>.json plus per-pass
# logs in <name>.err.
set -u
cd /root/repo
OUT=bench_ab_r02
mkdir -p "$OUT"

log() { echo "[chip_ab $(date +%H:%M:%S)] $*" >> "$OUT/session.log"; }

log "waiting for tunnel"
while true; do
  if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    log "tunnel UP"
    break
  fi
  sleep 120
done

run() { # name timeout_s script env...
  local name=$1 tmo=$2 script=$3; shift 3
  if [ -s "$OUT/$name.json" ]; then log "skip $name (done)"; return; fi
  log "start $name"
  timeout "$tmo" env "$@" python "$script" \
    > "$OUT/$name.json" 2> "$OUT/$name.err"
  log "done $name rc=$? json=$(cat "$OUT/$name.json" 2>/dev/null)"
}

# Paired A/Bs first: they decide production defaults.
run ab_mono      3600 scripts/ab_bench.py AB_MODE=mono
# fine rows: every new row-bucket shape is a multi-minute executable
# load; the warm pass in ab_bench absorbs most of it.
run ab_fine_rows 5400 scripts/ab_bench.py AB_MODE=fine_rows
run ab_batch     3600 scripts/ab_bench.py AB_MODE=batch

# Headline + secondary configs (bench.py medians of 3).
run default_rbk  1800 bench.py BENCH_CONFIG=rbk114_96
run nbd          1800 bench.py BENCH_CONFIG=nbd114_96
run extended     2400 bench.py BENCH_CONFIG=rbk114_96_extended
run kit_pipeline 2400 bench.py BENCH_CONFIG=kit_nbd_maximize
# staged four-pass runner for comparison with the fused default (both
# pay their own cold start; compare with that in mind)
run kit_staged   2400 bench.py BENCH_CONFIG=kit_nbd_maximize BENCH_KIT_STREAM=0

log "session complete"
