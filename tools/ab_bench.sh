#!/usr/bin/env bash
# A/B bench adjudicator: bench the working tree (B) against a baseline git
# ref (A) checked out in a throwaway worktree, alternating full interleaved
# bench runs A,B,A,B,... so both sides sample the same wall-clock noise
# eras (this box swings ±50% between windows — a sequential A-then-B run
# confounds code deltas with era drift; alternation cancels it to first
# order). Emits a per-key ratio table (B_min / A_min) plus totals.
#
# Usage: tools/ab_bench.sh <baseline-ref> [rounds=2] [sf-dir] [cpus]
# Env:   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS respected as defaults.
set -euo pipefail
REF="${1:?usage: ab_bench.sh <baseline-ref> [rounds] [sf-dir] [cpus]}"
ROUNDS="${2:-2}"
SF="${3:-${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}}"
CPUS="${4:-${SPARK_GRAFT_CPUS:-32}}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WT="/tmp/graft_ab_$(git -C "$REPO" rev-parse --short "$REF")"
OUT="/tmp/graft_ab_out_$$"
mkdir -p "$OUT"

if [ ! -d "$WT" ]; then
  git -C "$REPO" worktree add --detach "$WT" "$REF"
fi
trap 'git -C "$REPO" worktree remove --force "$WT" 2>/dev/null || true' EXIT

run_bench() { # $1=dir $2=tag $3=round
  echo "=== bench $2 round $3 ($1) ===" >&2
  ( cd "$1" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
      sbt -batch "runMain graft.Bench" ) > "$OUT/$2_$3.log" 2>&1 || {
    echo "bench $2 round $3 FAILED — see $OUT/$2_$3.log" >&2; exit 1; }
}

for r in $(seq 1 "$ROUNDS"); do
  run_bench "$WT"   A "$r"
  run_bench "$REPO" B "$r"
done

python3 - "$OUT" "$ROUNDS" <<'EOF'
import json, sys, glob
out, rounds = sys.argv[1], int(sys.argv[2])
def mins(tag):
    per = {}
    for f in sorted(glob.glob(f"{out}/{tag}_*.log")):
        for line in open(f, errors="replace"):
            line = line.strip()
            if '"queries_min"' not in line: continue
            try: d = json.loads(line[line.index('{'):])
            except ValueError: continue
            for k, v in d.get("queries_min", {}).items():
                per[k] = min(per.get(k, float("inf")), v)
    return per
a, b = mins("A"), mins("B")
common = sorted(set(a) & set(b))
print(f"{'key':34s} {'A_min':>7s} {'B_min':>7s} {'B/A':>6s}")
rows = sorted(common, key=lambda k: b[k] / a[k])
for k in rows:
    print(f"{k:34s} {a[k]:7.2f} {b[k]:7.2f} {b[k]/a[k]:6.2f}")
ta, tb = sum(a[k] for k in common), sum(b[k] for k in common)
import statistics
med = statistics.median(b[k]/a[k] for k in common) if common else float('nan')
print(f"\nmin-sum A={ta:.1f}s B={tb:.1f}s ratio={tb/ta:.3f} median per-key ratio={med:.3f}")
print(f"(cross-run per-key mins over {rounds} alternating rounds; logs in {out})")
EOF
