#!/usr/bin/env python3
"""Reproducible leak check (ADVICE r5): scan the repo's source/docs for
anything that is not derivable from public knowledge — internal package
imports, non-public URLs/buckets, chat links, credentials, or internal
environment variables. Regenerates LEAKCHECK.json so the claim "0 hits"
is a checked-in, re-runnable artifact rather than an ad-hoc grep.

Usage: tools/leakcheck.py [repo_root] [out_json]
(out_json defaults to <repo_root>/LEAKCHECK.json; the RegistryLintSpec
gate passes a /tmp path so a test run never clobbers the driver artifact)

The categories mirror the driver's LEAKCHECK artifact. Patterns are
intentionally broad; FALSE positives are fine (a human adjudicates),
false negatives are the failure mode.
"""
import json
import os
import re
import sys

CATEGORIES = {
    # TLD-rooted package imports that are neither Spark/Hadoop, scalatest/
    # scalacheck, nor this repo's own namespace (relative imports of local
    # vals like `s.implicits._` are not package leaks and stay unflagged)
    # Public libraries BUNDLED IN /opt/spark/jars (jackson, commons-*) are
    # allowlisted (VERDICT r14 #4: the driver's scan already exempts them;
    # this tool flagged CdcPropertySpec's jackson import — adjudicated
    # false positive, Apache-2.0, shipped inside Spark's own distribution).
    # The conservative TLD default stays for everything else.
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache\.(?:spark|hadoop|orc|parquet|avro|log4j|commons)\b|"
        r"org\.scalatest\b|org\.scalacheck\b|org\.slf4j\b|org\.junit\b|"
        r"com\.fasterxml\.jackson\b|org\.apache\.commons\b)"
        r"(?:com|net|io|org|ai|co|dev)\.[\w.]+", re.M),
    # URLs that are not apache.org / github.com / public doc hosts
    "internal-url": re.compile(
        r"https?://(?!(?:[\w.-]*\.)?(?:apache\.org|github\.com|"
        r"githubusercontent\.com|duckdb\.org|scala-lang\.org|"
        r"scala-sbt\.org|openjdk\.org|arxiv\.org|dl\.acm\.org|"
        r"en\.wikipedia\.org|example\.com|example\.org|localhost)"
        r"(?:[:/]|$))(?![Ww][Ww][Ww]\.)[\w.-]+"),
    # package/group ids under non-public namespaces
    "internal-pkg2": re.compile(
        r"\b(?:com|net|io)\.(?!github\b)[a-z][\w]*\.(?:internal|private|corp)\b"),
    # cloud bucket/object-store references
    "internal-bucket": re.compile(r"\b(?:s3a?|gs|abfss?|wasbs?)://[\w./-]+"),
    # chat/ticket shortlinks
    "slack-link": re.compile(r"\b(?:slack\.com/|go/[a-z][\w-]{2,}|#[a-z][\w-]*-(?:eng|team|dev)\b)"),
    # credential-shaped strings
    "api-key": re.compile(
        r"\b(?:sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{30,}|"
        r"xox[bap]-[A-Za-z0-9-]{10,}|-----BEGIN (?:RSA |EC )?PRIVATE KEY)"),
    # environment variables outside the repo's own SPARK_GRAFT_*/standard set
    "axon-env": re.compile(
        r"""sys\.env(?:\.get(?:OrElse)?)?\(\s*"(?!SPARK_|JAVA_|HOME|PATH|TMPDIR|USER)[A-Z][A-Z0-9_]*"""),
}

SCAN_EXT = {".scala", ".sbt", ".py", ".sh", ".md", ".json", ".sql"}
SKIP_DIRS = {".git", "target", ".bloop", ".metals", "project"}
# LEAKCHECK.json quotes every pattern it found; VERDICT.md / ADVICE.md are
# the driver-written judge/advisor briefs, which quote offending strings
# when describing them (r15: the judge quoted the PROBE_ACTION env reads
# this tool flagged). They are not repo source — skip, same class as the
# artifact itself.
SKIP_FILES = {"LEAKCHECK.json", "VERDICT.md", "ADVICE.md"}


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/repo"
    hits = {k: [] for k in CATEGORIES}
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d not in SKIP_DIRS]
        for fn in filenames:
            if os.path.splitext(fn)[1] not in SCAN_EXT or fn in SKIP_FILES:
                continue
            p = os.path.join(dirpath, fn)
            rel = os.path.relpath(p, root)
            if rel == os.path.join("tools", "leakcheck.py"):
                continue  # this file quotes every pattern
            try:
                text = open(p, encoding="utf-8", errors="replace").read()
            except OSError:
                continue
            for cat, rx in CATEGORIES.items():
                for m in rx.finditer(text):
                    line = text.count("\n", 0, m.start()) + 1
                    hits[cat].append(f"{rel}:{line}: {m.group(0)[:120]}")
    n = sum(len(v) for v in hits.values())
    out = {"round": int(os.environ.get("LEAK_ROUND", "6")), "n_hits": n, "hits": hits}
    path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(root, "LEAKCHECK.json")
    json.dump(out, open(path, "w"), indent=2)
    print(f"{path}: {n} hits")
    for cat, v in hits.items():
        for h in v:
            print(f"  [{cat}] {h}")
    sys.exit(1 if n else 0)


if __name__ == "__main__":
    main()
