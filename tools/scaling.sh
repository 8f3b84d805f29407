#!/bin/bash
# Two-parallelism scaling harness (north_rule): the identical job on the
# identical input at N and 4N cores, with the JVM *pinned* to that many CPUs
# (taskset) so GC/JIT threads can't borrow idle cores and skew the baseline.
#
# Measurement discipline (this host is an oversubscribed VM — ambient noise
# moves a leg by ±35% even with hypervisor steal reading ~0):
#   - graft.Scaling warms each workload to CONVERGENCE before timing (the
#     first full-size 32-thread executions can run 10-100x slow: C2/codegen/
#     heap-expansion thundering herd), then takes min of 3 reps;
#   - each leg reports its own /proc/stat steal around the timed section;
#   - the N-leg and 4N-leg run back-to-back as a PAIR sampling the same noise
#     window; PAIRS pairs are run and the MEDIAN-efficiency pair is reported,
#     with the full spread disclosed in BENCH.md.
#
# Writes BENCH.md. Usage: [PAIRS=3] tools/scaling.sh [N] [nFeat] [nImg]
set -euo pipefail
cd "$(dirname "$0")/.."
N=${1:-8}; NFEAT=${2:-1200000000}; NIMG=${3:-800000}
PAIRS=${PAIRS:-3}
N4=$((N * 4))

run_leg() { # cpus cpulist
  taskset -c "$2" sbt -batch "runMain graft.Scaling $1 $NFEAT $NIMG" 2>/dev/null \
    | grep -o '{"cpus".*}' | tail -1
}

RESULTS=()
for p in $(seq 1 "$PAIRS"); do
  echo "[scaling] pair $p: $N-core leg..." >&2
  J1=$(run_leg "$N" "0-$((N - 1))")
  echo "[scaling] pair $p: $J1" >&2
  echo "[scaling] pair $p: $N4-core leg..." >&2
  J2=$(run_leg "$N4" "0-$((N4 - 1))")
  echo "[scaling] pair $p: $J2" >&2
  RESULTS+=("$J1|$J2")
done

python3 - "$N" "$NFEAT" "$NIMG" "${RESULTS[@]}" <<'EOF'
import json, sys
n, nfeat, nimg = int(sys.argv[1]), sys.argv[2], sys.argv[3]
pairs = []
for arg in sys.argv[4:]:
    a, b = (json.loads(x) for x in arg.split("|"))
    pairs.append((a, b, b["pipeline_rps"] / (4 * a["pipeline_rps"]),
                  b["validate_rps"] / (4 * a["validate_rps"])))
pairs_by_ep = sorted(pairs, key=lambda p: p[2])
a, b, ep, ev = pairs_by_ep[len(pairs_by_ep) // 2]  # median pipeline-efficiency pair
eps = [f"{p[2]:.3f}" for p in pairs]
evs = [f"{p[3]:.3f}" for p in pairs]
md = f"""# BENCH — two-parallelism scaling evidence (north_rule)

Same job, same input, JVM pinned with `taskset` to {n} vs {4*n} CPUs
(`local[{n}]` / `local[{4*n}]`). Each leg warms to convergence (two
consecutive full-size runs within 20%) before timing — the first 32-thread
full-size executions can run 10-100x slow (C2/codegen/heap-expansion
thundering herd; measured 384 s → 42 s → 5.0 s → 4.7 s) — then takes min of
3 reps. Legs run as back-to-back N/4N pairs sampling the same ambient-noise
window; {len(pairs)} pairs were run and the MEDIAN pipeline-efficiency pair
is reported. Pinning matters: unpinned local[{n}] on the 32-core host lets
GC/JIT threads use idle cores, inflating the small-N baseline ~1.7x. The host
is an oversubscribed VM; per-leg hypervisor steal (/proc/stat) is recorded.

| workload | rows | {n} cores rows/s | {4*n} cores rows/s | efficiency T(4N)/(4*T(N)) |
|---|---|---|---|---|
| spatial-join + tile-assignment pipeline | {nfeat} | {a['pipeline_rps']} | {b['pipeline_rps']} | {ep:.3f} |
| image synth + decode + PSNR/caption validation | {nimg} | {a['validate_rps']} | {b['validate_rps']} | {ev:.3f} |

Median pair steal: {n}-core {a['steal_pct']}%, {4*n}-core {b['steal_pct']}%.
All pairs, pipeline efficiency: {", ".join(eps)}; validation: {", ".join(evs)}.
Ambient noise on this shared VM moves a single leg by up to ~35% run-to-run
(hardware itself scales a pure-arithmetic spin at 0.95: 5.34G -> 20.3G
iters/s from 8 -> 32 pinned cores), hence the pair-median protocol.

Target: efficiency >= 0.8 (BASELINE.json). Reference sanity anchor: the
original engine sustained ~27.6k interactions/s on a whole multi-core
machine (BASELINE.md); this engine's pinned per-core pipeline throughput is
{a['pipeline_rps'] // n} rows/s/core.
"""
open("BENCH.md", "w").write(md)
print(json.dumps({"pipeline_eff_median": ep, "validate_eff_median": ev,
                  "pipeline_effs": eps, "validate_effs": evs}))
EOF
