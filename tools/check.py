#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: tools/check.py <sf_dir> <verify_out_dir> [query ...]

Reads each <verify_out_dir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same fixture tables, and
compares: columns sorted by name, rows sorted by all columns, exact values
(small float tolerance reported separately so we can see *how* close).
"""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns, strip tz
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def compare(name, spark_df, oracle_df):
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    bad = []
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            av = av.astype(float); bv = bv.astype(float)
            eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
            if not eq.all():
                close = np.allclose(av, bv, rtol=1e-9, atol=1e-9, equal_nan=True)
                bad.append(f"col {c}: {int((~eq).sum())} diffs (close={close}) e.g. {av[~eq][:2]} vs {bv[~eq][:2]}")
        else:
            eq = (pd.Series(av).astype(str) == pd.Series(bv).astype(str))
            if not eq.all():
                i = int(np.argmax(~eq.values))
                bad.append(f"col {c}: {int((~eq).sum())} diffs e.g. row{i} {av[i]!r} vs {bv[i]!r}")
    return "; ".join(bad) if bad else None

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracles = json.load(open(os.path.join(out, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d)))
    npass = nfail = 0
    for name in names:
        if only and name not in only: continue
        files = glob.glob(os.path.join(out, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); nfail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            ok = len(spark_df) > 0
            print(f"{'PASS' if ok else 'FAIL'} {name}: rows-only ({len(spark_df)} rows)")
            npass += ok; nfail += (not ok); continue
        try:
            rel = con.sql(oracles[name])
            # Type audit: the driver's hash is TYPE-sensitive. DuckDB SUM(BIGINT)
            # → HUGEINT and bare VALUES ints → INTEGER both hash-mismatch a
            # Spark BIGINT even when every value is identical (repo convention:
            # always CAST, Queries.scala:16). Catch the leak here, mechanically.
            tyerr = []
            for cname, ty in zip(rel.columns, [str(t) for t in rel.types]):
                if ty in ("HUGEINT", "UHUGEINT"):
                    tyerr.append(f"col {cname}: oracle {ty} (uncast SUM?) — CAST to BIGINT")
                elif ty.startswith("DECIMAL") and ty.endswith(",0)"):
                    # integral-valued DECIMAL is the r7 census hazard: both
                    # engines agree on values but render the decimal
                    # representation differently in the driver's hash.
                    tyerr.append(f"col {cname}: oracle {ty} (integral decimal) — "
                                 "CAST to BIGINT (guarded) or VARCHAR on BOTH sides")
                elif ty in ("INTEGER", "SMALLINT", "TINYINT") and cname in spark_df.columns \
                        and str(spark_df[cname].dtype) == "int64":
                    tyerr.append(f"col {cname}: oracle {ty} vs spark BIGINT — CAST to BIGINT")
                elif ty.startswith("DECIMAL(") and int(ty.split("(")[1].split(",")[0]) > 18:
                    # DuckDB's pandas client materializes precision>18 DECIMALs
                    # as lossy float64 while Spark keeps true decimals — the
                    # float branch below can pass by luck while the driver's
                    # representation hash fails. Render the exact digit STRING
                    # in the oracle instead (r9 q_tpcds_v49/v61/v90 lesson).
                    tyerr.append(f"col {cname}: oracle {ty} lowers to float64 in "
                                 "pandas — render the exact digit string (VARCHAR)")
            if tyerr:
                print(f"FAIL {name}: TYPE {'; '.join(tyerr)}"); nfail += 1; continue
            oracle_df = rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); nfail += 1; continue
        err = compare(name, spark_df, oracle_df)
        if err: print(f"FAIL {name}: {err}"); nfail += 1
        else: print(f"PASS {name} ({len(spark_df)} rows)"); npass += 1
    print(f"== {npass} pass / {nfail} fail ==")
    sys.exit(1 if nfail else 0)

if __name__ == "__main__":
    main()
