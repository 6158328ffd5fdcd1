#!/bin/bash
# Round-2 chip A/B session: waits for the TPU tunnel to come back, then
# runs the unmeasured-optimization benchmark plan SOLO (one bench.py
# process at a time; nothing else may touch the chip while this runs).
#
# Results land in bench_ab_r02/<name>.json (the bench JSON line) and
# bench_ab_r02/<name>.err (per-pass times + accuracy).  Each config is
# its own process (one cold start each, per CLAUDE.md); BENCH_REPEAT=3
# medians per the measurement discipline.
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
  sleep 180
done

run_cfg() { # name timeout_s env... (env as K=V strings)
  local name=$1 tmo=$2; shift 2
  if [ -s "$OUT/$name.json" ]; then log "skip $name (done)"; return; fi
  log "start $name"
  timeout "$tmo" env "$@" python bench.py \
    > "$OUT/$name.json" 2> "$OUT/$name.err"
  log "done $name rc=$? json=$(cat "$OUT/$name.json" 2>/dev/null)"
}

run_cfg default_rbk    1800 BENCH_CONFIG=rbk114_96
run_cfg permono_off    1800 BENCH_CONFIG=rbk114_96 BARBELL_MONO_UPLOAD=0
run_cfg nbd            1800 BENCH_CONFIG=nbd114_96
run_cfg extended       2400 BENCH_CONFIG=rbk114_96_extended
run_cfg kit_pipeline   2400 BENCH_CONFIG=kit_nbd_maximize
# fine rows last: every new row-bucket shape is a multi-minute
# executable load on this backend, so this one can eat real time.
run_cfg fine_rows      3600 BENCH_CONFIG=rbk114_96 BARBELL_FINE_ROWS=1

log "session complete"
