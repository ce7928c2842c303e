#!/usr/bin/env bash
# Round-close artifact commit — mechanizes checklist §7.6 item 5, the step
# that slipped four consecutive rounds (r11–r14): the judge found
# BENCH_r*/CORRECTNESS_r*/LEAKCHECK.json untracked or dirty at verdict time.
#
# Usage: tools/round_close.sh <round-number>
#
# Commits every round artifact that exists (BENCH_r{N}.json,
# CORRECTNESS_r{N}.json, LEAKCHECK.json, COPYCHECK.json, BASELINE.md,
# VERDICT.md, ADVICE.md) and then FAILS LOUDLY if the tree is still dirty —
# a dirty tree at round close means work the judge will grade as missing.
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ $# -ne 1 ]]; then
  echo "usage: tools/round_close.sh <round-number>" >&2
  exit 2
fi
N="$1"

to_add=()
for f in "BENCH_r${N}.json" "CORRECTNESS_r${N}.json" LEAKCHECK.json \
         COPYCHECK.json BASELINE.md VERDICT.md ADVICE.md; do
  # skip files .gitignore excludes (git add on them is a hard error)
  [[ -e $f ]] && ! git check-ignore -q -- "$f" && to_add+=("$f")
done

if [[ ${#to_add[@]} -gt 0 ]]; then
  git add -- "${to_add[@]}"
fi

if ! git diff --cached --quiet; then
  git commit -m "Record round ${N} bench/correctness/leakcheck artifacts"
  echo "round_close: committed ${to_add[*]}"
else
  echo "round_close: artifacts already committed"
fi

if [[ -n "$(git status --porcelain)" ]]; then
  echo "round_close: TREE STILL DIRTY at round close:" >&2
  git status --short >&2
  exit 1
fi
echo "round_close: clean tree — round ${N} closed"
