#!/usr/bin/env bash
# End-to-end workflow through REAL spark-submit (no sbt classpath): the
# north rule's "run via spark-submit ... at two cluster sizes" contract,
# exercised on the packaged jar at local[8] (N) and local[32] (4N).
#
#   1. sbt -batch package -> target/scala-2.13/*.jar
#   2. spark-submit graft.sources.JsonlGen  -> deterministic corpus
#   3. spark-submit graft.JsonlDedupCli at local[8]  (annotate + stage dir)
#   4. spark-submit graft.JsonlDedupCli at local[32] (same input, fresh out)
#   5. verify both runs annotate the identical (docid -> ranges) set and
#      report wall times + scaling efficiency
#
# Usage: dev/spark_submit_e2e.sh [nDocs]   (default 5000)
set -euo pipefail
cd "$(dirname "$0")/.."

NDOCS="${1:-5000}"
WORK="${SPARK_SUBMIT_E2E_DIR:-/tmp/graft-submit-e2e}"
SUBMIT=/opt/spark/bin/spark-submit

sbt -batch package > "$WORK-package.log" 2>&1 || { tail -20 "$WORK-package.log"; exit 1; }
JAR=$(ls target/scala-2.13/*.jar | head -1)
echo "[e2e] jar: $JAR"

rm -rf "$WORK"; mkdir -p "$WORK"

run_submit() { # run_submit <master> <class> <args...>
  local master="$1" cls="$2"; shift 2
  "$SUBMIT" --master "$master" --class "$cls" \
    --conf spark.sql.shuffle.partitions=32 \
    --conf spark.ui.enabled=false \
    --driver-memory 8g \
    "$JAR" "$@"
}

echo "[e2e] generating $NDOCS docs via spark-submit"
run_submit "local[8]" graft.sources.JsonlGen "$WORK/in" "$NDOCS" 32 \
  > "$WORK/gen.log" 2>&1

echo "[e2e] dedup at local[8] (N cores)"
t0=$(python3 -c "import time; print(time.time())")
run_submit "local[8]" graft.JsonlDedupCli "$WORK/in" "$WORK/out8" \
  --minlen 500 --mode annotate --stage-dir "$WORK/stage8" \
  > "$WORK/run8.log" 2>&1
t8=$(python3 -c "import time; print(f'{time.time()-$t0:.1f}')")

echo "[e2e] dedup at local[32] (4N cores)"
t0=$(python3 -c "import time; print(time.time())")
run_submit "local[32]" graft.JsonlDedupCli "$WORK/in" "$WORK/out32" \
  --minlen 500 --mode annotate \
  > "$WORK/run32.log" 2>&1
t32=$(python3 -c "import time; print(f'{time.time()-$t0:.1f}')")

echo "[e2e] comparing annotations (docid -> sa_remove_ranges) between runs"
python3 - "$WORK/out8" "$WORK/out32" <<'EOF'
import gzip, json, sys, pathlib

def ranges(outdir):
    acc = {}
    for p in sorted(pathlib.Path(outdir).rglob("*.jsonl.gz")):
        with gzip.open(p, "rt") as f:
            for line in f:
                d = json.loads(line)
                r = d.get("sa_remove_ranges", [])
                if r:
                    acc[d["docid"]] = sorted((x["s"], x["e"]) for x in r)
    return acc

a, b = ranges(sys.argv[1]), ranges(sys.argv[2])
assert a == b, f"annotation mismatch: {len(a)} vs {len(b)} annotated docs"
assert a, "no annotated docs at all -- planted duplicates missing?"
print(f"[e2e] PASS: {len(a)} annotated docs identical across local[8] and local[32]")
EOF

echo "[e2e] resume check: re-run local[8] against the existing stage dir"
run_submit "local[8]" graft.JsonlDedupCli "$WORK/in" "$WORK/out8b" \
  --minlen 500 --mode annotate --stage-dir "$WORK/stage8" \
  > "$WORK/run8b.log" 2>&1
# explicit if/else: under `set -euo pipefail` a bare `grep && echo` list
# would abort the script silently when the marker is missing
if grep -q "wrote" "$WORK/run8b.log"; then
  echo "[e2e] resume PASS (stage snapshot reused)"
else
  echo "[e2e] resume FAILED: no 'wrote' marker in $WORK/run8b.log" >&2
  exit 1
fi

eff=$(python3 -c "import sys; print(f'{float(sys.argv[1])/(4*float(sys.argv[2])):.3f}')" "$t8" "$t32")
echo "[e2e] local[8]: ${t8}s  local[32]: ${t32}s  naive 8->32 efficiency: $eff"
echo "[e2e] DONE"
