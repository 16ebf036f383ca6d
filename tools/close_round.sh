#!/usr/bin/env bash
# Stage and commit a round's driver/judge artifacts in one go — the manual
# ask of rounds 14-16 (VERDICT: "commit the round-N artifacts").  Run at
# round start (to fold the PREVIOUS round's driver-written artifacts in)
# or whenever BENCH_r{N}.json / CORRECTNESS_r{N}.json land.
#
# Usage: tools/close_round.sh <round-number>
set -euo pipefail
cd "$(dirname "$0")/.."

n="${1:?usage: tools/close_round.sh <round-number>}"
rn=$(printf "r%02d" "$n")

staged=()
for f in "BENCH_${rn}.json" "CORRECTNESS_${rn}.json" VERDICT.md ADVICE.md \
         LEAKCHECK.json FLOOR.json bench_runs; do
  if [ -e "$f" ]; then
    git add "$f"
    staged+=("$f")
  fi
done

if git diff --cached --quiet; then
  echo "close_round: nothing to commit for round $n (all artifacts already tracked)"
  exit 0
fi

git commit -m "round $n: verdict/advice/correctness/bench artifacts"
echo "close_round: committed ${staged[*]}"
