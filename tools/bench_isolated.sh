#!/usr/bin/env bash
# Isolated re-measure of contention-suspect queries (the BENCH_ROOTCAUSE
# protocol in one command): fresh JVM, only the named queries, min-of-two
# inside Bench itself, full per-query map persisted to a file. Use to
# distinguish host/run-order noise in the 56-minute full-suite pass from
# a real plan change — a genuinely slow plan is slow here too.
#
#   tools/bench_isolated.sh [q_a,q_b,...] [outfile]
#
# Defaults: the five slowest in-suite queries of the round-10 full map
# (q_lsh_recall, q_edit_neardup_prefix, q_ann_ivf_pq, q_hits,
# q_pagerank_dangling) at sf0.1, writing target/bench_isolated.json —
# one command keeps contention-vs-plan adjudication current. Pass the
# old stream-join trio (or anything else) explicitly to re-check it.
set -euo pipefail
cd "$(dirname "$0")/.."
ONLY="${1:-q_lsh_recall,q_edit_neardup_prefix,q_ann_ivf_pq,q_hits,q_pagerank_dangling}"
OUT="${2:-target/bench_isolated.json}"
SPARK_GRAFT_ONLY="$ONLY" SPARK_GRAFT_BENCH_OUT="$OUT" \
  sbt -batch "runMain graft.Bench" 2>&1 | grep -E "^BENCH_TOTAL|^\{\"metric\"" || true
echo "full map: $OUT"
python3 - "$OUT" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
for k, v in sorted(d["queries"].items()):
    print(f"  {k}: {v:.2f}s")
EOF
