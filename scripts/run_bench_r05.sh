#!/bin/bash
# Round-5 measured corpus (VERDICT r04 #3): paired A/Bs + every bench
# config, each its own process (one cold start each), all output under
# bench_r05/.  Run SOLO on the chip — nothing else may touch the TPU
# while this runs (CLAUDE.md measurement discipline).
#
# Usage: bash scripts/run_bench_r05.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-bench_r05}
mkdir -p "$OUT"

run() {
  local name=$1; shift
  echo "=== $(date +%H:%M:%S) $name ==="
  "$@" > "$OUT/$name.json" 2> "$OUT/$name.log"
  echo "--- $name: $(tail -1 "$OUT/$name.json" 2>/dev/null)"
}

# Paired A/Bs first (cancel hour drift inside one process)
AB_MODE=twotier AB_REPEAT=3 run ab_twotier python scripts/ab_bench.py
AB_MODE=align2 AB_REPEAT=3 run ab_align2 python scripts/ab_bench.py

# Bench configs (bench.py medians 3 fresh-data passes internally and
# records a per-pass wire probe)
for cfg in rbk114_96 nbd114_96 rbk114_96_extended rbk114_96_noisy kit_nbd_maximize; do
  BENCH_CONFIG=$cfg run "$cfg" python bench.py
done

python - "$OUT" <<'EOF'
import json, sys, os, glob
out = sys.argv[1]
summary = {}
for p in sorted(glob.glob(os.path.join(out, "*.json"))):
    name = os.path.basename(p)[:-5]
    if name == "SUMMARY":
        continue
    try:
        lines = [l for l in open(p) if l.strip().startswith("{")]
        summary[name] = json.loads(lines[-1]) if lines else None
    except Exception as e:
        summary[name] = {"error": str(e)}
with open(os.path.join(out, "SUMMARY.json"), "w") as fh:
    json.dump(summary, fh, indent=2)
print(json.dumps(summary, indent=2))
EOF
