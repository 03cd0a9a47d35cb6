#!/usr/bin/env python3
"""Generate the committed DuckDB-oracle goldens for the H1-blocked verbatim
TPC-DS queries (TpcdsVerbatim2Queries.h1Blocked).

The four queries are value-correct but permanently outside the driver gate
(the driver's raw-sort-before-render hash is unsatisfiable for them — see
TPCDS_MAP.md), so TpcdsH1ValueSpec pins rendered-multiset equality in
`sbt test` against these goldens instead: one line per row, columns sorted
by name, values rendered exactly as the driver would hash them (python
str(); 'None' for NULL — decimal.Decimal str() == java BigDecimal.toString,
which is what the spec renders via Row.getDecimal), lines sorted.

Usage: tools/gen_h1_golden.py <excluded_out_dir> [dest_dir]
  where <excluded_out_dir> is run_verify.sh's $OUT.excluded (holding
  oracle_sql_excluded.json) and dest defaults to
  src/test/scala/../resources/h1_golden. Run at sf0.01 — the spec reads
  the same fixture.
"""
import sys, os, json, glob, decimal
import duckdb, numpy as np

SEP = "\x01"

def render(v):
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "None"
    return str(v)

def main():
    exdir = sys.argv[1]
    dest = sys.argv[2] if len(sys.argv) > 2 else "src/test/resources/h1_golden"
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracles = json.load(open(os.path.join(exdir, "oracle_sql_excluded.json")))
    # tolerance-pinned queries (r13: q17/q39a/q39b) golden into a sibling
    # dir read by TpcdsTolValueSpec (keyed epsilon compare), not the
    # exact-render H1 goldens
    toljson = os.path.join(exdir, "tolerance_excluded.json")
    tolmap = json.load(open(toljson)) if os.path.isfile(toljson) else {}
    tol_dest = os.path.join(os.path.dirname(dest.rstrip("/")), "tol_golden")
    os.makedirs(dest, exist_ok=True)
    os.makedirs(tol_dest, exist_ok=True)
    for name, sql in sorted(oracles.items()):
        d = tol_dest if name in tolmap else dest
        df = con.sql(sql).df()
        df = df.reindex(sorted(df.columns), axis=1)
        lines = sorted(SEP.join(render(v) for v in row) for row in df.itertuples(index=False))
        with open(os.path.join(d, f"{name}.txt"), "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        print(f"{name}: {len(lines)} rows -> {d}/{name}.txt")

if __name__ == "__main__":
    main()
