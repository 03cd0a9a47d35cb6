#!/bin/bash
# ScalarCrossBroadcast A/B (VERDICT r13 next-round #2): same binary, rule
# on vs off (SPARK_GRAFT_NO_SCALAR_CROSS=1 turns the rule into the
# identity), over the queries whose plans the rule changes —
# q_tpcds_v77 (the scalar-cross query it was built for), q_tpcds_v88
# (8-way self-join control) and q_ds_time_bands_cross (cross-family
# control) — at sf0.1 and sf1, interleaved on/off in one host window so
# drift hits both arms equally. Host precheck gates the record.
set -eo pipefail
cd /root/repo
SF1=${1:-/dev/shm/graft/sf1}
OUT=${2:-/tmp/ab_scalar_cross.json}
QUERIES="q_tpcds_v77,q_tpcds_v88,q_ds_time_bands_cross"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
RUN="java $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp target/scala-2.13/classes:/opt/spark/jars/*"

tools/host_precheck.sh /tmp/ab_precheck.json 1.3 || {
  echo "HOST UNSTABLE ($(cat /tmp/ab_precheck.json)) — aborting A/B" >&2
  exit 2
}

if [ ! -d "$SF1/lineitem.parquet" ]; then
  $RUN -Xmx8g graft.tools.ScaleGen /root/testdata/sf0.1 "$SF1" 10 1>&2
fi

bench_once() { # sfdir mode(on|off) -> one JSON line
  local sf=$1 mode=$2 envvar=""
  [ "$mode" = off ] && envvar="SPARK_GRAFT_NO_SCALAR_CROSS=1"
  env $envvar SPARK_GRAFT_SF_DIR="$sf" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$QUERIES" \
    $RUN -Xmx10g graft.Bench 2>/dev/null \
    | grep -v '"queries_n"' | grep -m1 '"metric":"total"'
}

# interleave arms, 2 reps each: on off on off per SF
{
  echo '{"precheck":'"$(cat /tmp/ab_precheck.json)"', "runs":['
  first=1
  for rep in 1 2; do
    for mode in on off; do
      for sf in /root/testdata/sf0.1 "$SF1"; do
        line=$(bench_once "$sf" "$mode")
        [ $first = 1 ] || echo ','
        first=0
        printf '{"sf":"%s","mode":"%s","rep":%s,"bench":%s}' "$sf" "$mode" "$rep" "$line"
      done
    done
  done
  echo '], "queries":"'"$QUERIES"'"}'
} > "$OUT"
echo "A/B record: $OUT"
python3 - "$OUT" <<'PYEOF'
import json, sys
d = json.load(open(sys.argv[1]))
from collections import defaultdict
agg = defaultdict(list)
for r in d["runs"]:
    for q, sec in r["bench"]["queries"].items():
        agg[(r["sf"], r["mode"], q)].append(sec)
sfs = sorted({k[0] for k in agg})
qs = sorted({k[2] for k in agg})
for sf in sfs:
    for q in qs:
        on = min(agg[(sf, "on", q)]); off = min(agg[(sf, "off", q)])
        print(f"{sf:25s} {q:24s} on={on:7.3f}s off={off:7.3f}s ratio(on/off)={on/off:5.3f}")
PYEOF
