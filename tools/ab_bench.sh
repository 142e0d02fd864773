#!/bin/bash
# Interleaved fresh-process A/B: r12 tree vs working tree, per query.
# Usage: tools/ab_bench.sh out.tsv q1 q2 ...
set -u
OUT="$1"; shift
R12=/tmp/r12tree
R13=/root/repo
: > "$OUT"
for round in 1 2; do
  for q in "$@"; do
    for tree in "$R12" "$R13"; do
      t=$( (cd "$tree" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
            SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ISOLATED_TOP=0 \
            SPARK_GRAFT_SUITE_CONSTITUENT_BUDGET_S=0 \
            timeout 1200 python bench.py "$q" 2>/dev/null) \
          | python -c "import json,sys
for ln in sys.stdin:
    try: d=json.loads(ln)
    except Exception: continue
    if 'queries' in d: print(d['queries']['$q']); break")
      echo -e "$q\t$(basename $tree)\tround$round\t${t:-ERR}" | tee -a "$OUT"
    done
  done
done
