#!/usr/bin/env python3
"""Merge the paired sf0.1 / sf1 graft.Bench JSON lines into the round's
scale-up record: per-query 10x-data wall-clock ratios, sorted worst-first,
plus totals. Usage: tools/sf1_report.py SF01.json SF1.json OUT.json
"""
import json
import sys


def main():
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    ratios = {q: round(qb[q] / qa[q], 3) if qa[q] > 0 else None for q in shared}
    errs = sorted([q for q in shared if qb[q] < 0 or qa[q] < 0])
    worst = sorted(((v, k) for k, v in ratios.items() if v is not None), reverse=True)
    out = {
        "desc": "full-corpus 10x scale-up: per-query sf1/sf0.1 wall-clock ratios"
                " (1.0 = flat cost for 10x data; 10.0 = linear)",
        "n_queries": len(shared),
        "errors": errs,
        "total_sf01_sec": round(a["value"], 1),
        "total_sf1_sec": round(b["value"], 1),
        "total_ratio": round(b["value"] / a["value"], 3),
        "worst10": [{"query": k, "ratio": v, "sf01_sec": round(qa[k], 2),
                     "sf1_sec": round(qb[k], 2)} for v, k in worst[:10]],
        "ratios": ratios,
        "sf01": {k: round(v, 3) for k, v in qa.items()},
        "sf1": {k: round(v, 3) for k, v in qb.items()},
    }
    json.dump(out, open(sys.argv[3], "w"), indent=1)
    print(f"{len(shared)} queries, {len(errs)} errors, total ratio "
          f"{out['total_ratio']}; worst: {worst[0][1]} {worst[0][0]}")


if __name__ == "__main__":
    main()
