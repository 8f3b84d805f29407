#!/bin/bash
# Round-5 two-parallelism scaling harness — interleaved legs + max-rep
# statistic (the denominator hardening prescribed in the round-4 verdict).
#
# PRE-COMMITTED protocol (written to BENCH.md BEFORE any round-5 window ran):
#   - One WINDOW = 6 pinned legs interleaved 8,32,8,32,8,32 back-to-back,
#     so both parallelisms sample the same ambient-noise process.
#   - Per-parallelism capability = MAX pipeline_rps across the window's 3
#     invocations of that parallelism (each invocation already takes min-of-3
#     in-JVM reps after convergence warm-up). Ambient co-tenant load and
#     hypervisor steal can only SUBTRACT throughput, so the max estimates the
#     un-contended capability — this removes the ambient modulation of the
#     8-core baseline that produced the 29% cross-window denominator spread
#     documented in BENCH.md (rounds 3-4).
#   - Efficiency = max32 / (4 * max8), pipeline and validate separately.
#   - Screening: max32 is taken over the window's CLEAN 32-legs only
#     (spark-section steal <= 2%); if every 32-leg in the window exceeds 2%,
#     the window is rejected (steal lands on the numerator and can only
#     under-state efficiency — same asymmetry rule as r3/r4). Excluding a
#     stolen leg from the numerator max can only lower the reported
#     efficiency, so the screening is conservative by construction. The
#     8-leg max needs no screening: anything ambient only slows it, and a
#     slower 8-leg never raises the denominator.
#   - A slowed 8-leg can no longer flatter efficiency under this rule: the
#     denominator is the FASTEST 8-core leg observed in the window.
#
# Usage: tools/scaling_r5.sh [N] [nFeat] [nImg]   (window = N vs 4N cores)
set -euo pipefail
cd "$(dirname "$0")/.."
N=${1:-8}; NFEAT=${2:-1200000000}; NIMG=${3:-800000}
N4=$((N * 4))
LOG=${LOG:-tools/scaling_r5.log}

run_leg() { # cpus cpulist
  taskset -c "$2" sbt -batch "runMain graft.Scaling $1 $NFEAT $NIMG" 2>/dev/null \
    | grep -o '{"cpus".*}' | tail -1
}

RESULTS=()
for i in 1 2 3; do
  echo "[scaling-r5] leg $((2*i-1))/6: $N cores..." >&2
  A=$(run_leg "$N" "0-$((N - 1))")
  echo "[scaling-r5] $A" >&2
  echo "$A" >> "$LOG"
  echo "[scaling-r5] leg $((2*i))/6: $N4 cores..." >&2
  B=$(run_leg "$N4" "0-$((N4 - 1))")
  echo "[scaling-r5] $B" >&2
  echo "$B" >> "$LOG"
  RESULTS+=("$A" "$B")
done

python3 - "$N" "${RESULTS[@]}" <<'EOF'
import json, sys
n = int(sys.argv[1])
legs = [json.loads(x) for x in sys.argv[2:]]
small = [l for l in legs if l["cpus"] == n]
big = [l for l in legs if l["cpus"] == 4 * n]
def best(ls, key): return max(ls, key=lambda l: l[key]) if ls else None
clean32 = [l for l in big if l["steal_pct"] <= 2.0]
b8p, b8v = best(small, "pipeline_rps"), best(small, "validate_rps")
b32p, b32v = best(clean32, "pipeline_rps"), best(clean32, "validate_rps")
out = {"window_legs": legs, "window_accepted": bool(clean32)}
if clean32:
  out.update({
    "pipeline_eff_maxrule": round(b32p["pipeline_rps"] / (4 * b8p["pipeline_rps"]), 4),
    "validate_eff_maxrule": round(b32v["validate_rps"] / (4 * b8v["validate_rps"]), 4),
    "max32_pipeline": b32p["pipeline_rps"], "max8_pipeline": b8p["pipeline_rps"],
    "max32_steal": b32p["steal_pct"]})
print(json.dumps(out))
EOF
