#!/usr/bin/env python3
"""Builder-side leak scan with provenance (ADVICE r10 #5 / VERDICT r11 #4).

Scans the builder-authored tree (src/, tools/, build.sbt, *.md written
by the builder) for anything that looks like a non-public host, bucket,
key, or environment name, and writes LEAKCHECK_LOCAL.json stamped with
the scan time and a content tree-hash of the scanned inputs — so a
round bump in the artifact provably corresponds to a fresh scan over
the tree as it existed, not a relabel of an old result.

Usage: python3 tools/leakcheck.py [repo_root]
"""
import hashlib
import json
import re
import subprocess
import sys
import time
from pathlib import Path

CATEGORIES = {
    # hosts/URLs that are not the public domains this repo legitimately
    # references (spark.apache.org, duckdb.org, arxiv, github, ...)
    "nonpublic-url": re.compile(
        r"https?://(?!(?:www\.)?(?:github\.com|spark\.apache\.org|"
        r"duckdb\.org|arxiv\.org|dl\.acm\.org|doi\.org|localhost|"
        r"127\.0\.0\.1|example\.com|repo1\.maven\.org|scala-lang\.org|"
        r"scalatest\.org|openjdk\.org|en\.wikipedia\.org|"
        # the reference system's own PUBLIC API endpoints (its ingest
        # sources) and single-label fake hosts in test fixtures
        r"(?:api|accounts)\.spotify\.com|cdn/|x\b))[A-Za-z0-9.-]+"),
    "cloud-bucket": re.compile(r"\b(?:s3|gs|s3a|s3n|abfss?)://[A-Za-z0-9._-]+"),
    "api-key": re.compile(
        r"\b(?:AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|xox[baprs]-[A-Za-z0-9-]+|"
        r"ghp_[A-Za-z0-9]{36})\b"),
    "slack-link": re.compile(r"slack\.com/archives|#[a-z0-9-]*-(?:eng|infra)-"),
    "internal-envvar": re.compile(
        r"\bsys\.env\([\"'](?!SPARK_GRAFT_|PATH|HOME|JAVA|COURSIER)[A-Z_]+"),
}

SCAN_GLOBS = ["src/**/*.scala", "tools/*", "build.sbt", "project/*.scala",
              "project/*.sbt", "README.md", "SCALE_CURVE.md"]


def main():
    root = Path(sys.argv[1] if len(sys.argv) > 1 else ".")
    files = sorted({p for g in SCAN_GLOBS for p in root.glob(g)
                    if p.is_file() and p.name != "leakcheck.py"})
    tree = hashlib.sha256()
    hits = {k: [] for k in CATEGORIES}
    for p in files:
        data = p.read_bytes()
        tree.update(str(p.relative_to(root)).encode())
        tree.update(data)
        text = data.decode("utf-8", errors="replace")
        for lineno, line in enumerate(text.splitlines(), 1):
            for cat, rx in CATEGORIES.items():
                if rx.search(line):
                    hits[cat].append(f"{p.relative_to(root)}:{lineno}: "
                                     f"{line.strip()[:160]}")
    head = subprocess.run(["git", "-C", str(root), "rev-parse", "HEAD"],
                          capture_output=True, text=True).stdout.strip()
    out = {
        "run_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "git_head": head,
        "n_files_scanned": len(files),
        "input_tree_sha256": tree.hexdigest(),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    (root / "LEAKCHECK_LOCAL.json").write_text(json.dumps(out, indent=2) + "\n")
    print(f"scanned {len(files)} files, {out['n_hits']} hits, "
          f"tree {out['input_tree_sha256'][:12]}")
    return 1 if out["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
