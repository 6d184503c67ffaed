#!/bin/bash
# VERDICT r4 weak #3: fused cold-compile regressed 63.7s (r3) -> 120.9s (r4).
# Bisect the round-4 code commits by compiling the fused bench program at
# each, with a FRESH compilation cache per point (cold compile is the
# user-facing cost being measured).  Run on the real TPU; ~3-6 min/point.
#
# Usage: bash examples/compile_bisect.sh [shas...]
# Output: /tmp/compile_bisect/<sha>.log + a summary table on stdout.
set -u
SHAS=${@:-"e50939b c4e36e9 a800893 175d628 3993b48 8e80946 933c35c"}
mkdir -p /tmp/compile_bisect
for sha in $SHAS; do
  wt=/tmp/compile_bisect/wt_$sha
  [ -d "$wt" ] || git -C /root/repo worktree add -f "$wt" "$sha" >/dev/null
  echo "=== $sha $(git -C /root/repo log -1 --format=%s $sha | cut -c1-60)"
  rm -rf "/tmp/compile_bisect/cache_$sha"
  (cd "$wt" && timeout 1500 env \
      PYTHONPATH="$wt:/root/.axon_site" \
      JAX_COMPILATION_CACHE_DIR="/tmp/compile_bisect/cache_$sha" \
      BENCH_SEQS=1 python bench.py \
      > "/tmp/compile_bisect/$sha.json" 2> "/tmp/compile_bisect/$sha.log")
  grep -E "compile\+run" "/tmp/compile_bisect/$sha.log" | sed 's/^/    /'
done
echo "=== summary (fused compile+run seconds per commit)"
for sha in $SHAS; do
  t=$(grep -oE "fused compile\+run: [0-9.]+" "/tmp/compile_bisect/$sha.log" \
      | grep -oE "[0-9.]+")
  echo "$sha  ${t:-FAILED}"
done
