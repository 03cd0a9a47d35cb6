#!/usr/bin/env python3
"""Bench contract gate (BASELINE.md normalization contract).

Compares a new graft.Bench JSON line against a prior round's, after
dividing out the host-speed factor measured on the pinned anchor query
(q1_pricing_summary; falls back to the shared-query median when the
anchor is missing from the old record's preserved tail). A query fails
the gate when its host-normalized time exceeds GATE (default 1.5) times
its old time.

Usage: tools/bench_gate.py OLD.json NEW.json [gate]

OLD may be a driver BENCH_r{N}.json (whose full per-query map may be
truncated to a `tail` string — parsed best-effort) or a raw bench line.

Anchor rebase (r13, VERDICT r12 #6): tools/anchors.json records queries
whose DEFINITION intentionally changed scope; their OLD time is taken
from the named rebase record instead of OLD.json, so the gate compares
each query against the last version of itself that actually existed.

Exit 0 = gate holds; 1 = offenders printed.
"""
import json
import os
import re
import statistics
import sys

ANCHOR = "q1_pricing_summary"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_queries(path):
    d = json.load(open(path))
    if "queries" in d:
        return d["queries"]
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]["queries"]
    # driver record with a truncated tail: recover what survives. Query
    # keys are q_* / q1_* — anchored so the compact line's "queries_n":N
    # count field can't be recovered as a fake query (ADVICE r10).
    tail = d.get("tail", "")
    return {m.group(1): float(m.group(2))
            for m in re.finditer(r'"(q_[\w]+|q1_[\w]+)":([\d.]+)', tail)}


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    gate = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old, new = load_queries(old_path), load_queries(new_path)
    # Apply the scope-change rebase table: a rebased query's anchor is its
    # time in the first record that measured the CURRENT definition.
    anchors_path = os.path.join(REPO, "tools", "anchors.json")
    if os.path.isfile(anchors_path):
        for q, spec in json.load(open(anchors_path)).get("rebase", {}).items():
            rec = os.path.join(REPO, spec["record"])
            rebased = load_queries(rec)
            if q in old and q in rebased:
                print(f"rebase {q}: anchor {old[q]:.2f}s -> {rebased[q]:.2f}s "
                      f"({spec['record']}, r{spec['round']} scope change)")
                old[q] = rebased[q]
    shared = sorted(set(old) & set(new))
    if not shared:
        print("no shared queries between the two records")
        return 1
    # Raw median FIRST (r12 adjudication lesson): when the old record's
    # anchor ran hot/cold, every normalized ratio inflates by the anchor
    # drift — the raw median over all shared queries is the honest
    # first-look signal; normalized ratios adjudicate offenders after.
    raw_med = statistics.median(new[q] / old[q] for q in shared)
    print(f"median RAW ratio {raw_med:.3f} over {len(shared)} shared queries")
    if ANCHOR in old and ANCHOR in new:
        host = new[ANCHOR] / old[ANCHOR]
        basis = f"anchor {ANCHOR}"
    else:
        host = statistics.median(new[q] / old[q] for q in shared)
        basis = f"median of {len(shared)} shared queries"
    ratios = {q: (new[q] / host) / old[q] for q in shared}
    med = statistics.median(ratios.values())
    print(f"hostFactor {host:.3f} ({basis}); {len(shared)} shared; "
          f"median normalized ratio {med:.3f}; gate {gate}x")
    bad = {q: r for q, r in ratios.items() if r > gate}
    for q, r in sorted(bad.items(), key=lambda x: -x[1]):
        print(f"FAIL {q}: {r:.2f}x normalized ({old[q]:.2f}s -> {new[q]:.2f}s raw)")
    new_only = sorted(set(new) - set(old))
    if new_only:
        print(f"(new this round, no prior anchor: {len(new_only)} queries)")
    if not bad:
        print("gate holds: no query exceeds the normalized threshold")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
