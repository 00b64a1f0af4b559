#!/usr/bin/env python3
"""Public-knowledge leak scan: regex sweep over the repo's text files
for anything that would violate the public-sources-only constraint —
non-public package imports, internal-looking URLs/buckets, chat links,
API-key shapes, internal env vars. Writes LEAKCHECK.json.

Usage: python3 tools/leakcheck.py [round_number]
"""
import json
import re
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

EXTS = {".scala", ".sbt", ".md", ".json", ".py", ".txt", ".conf"}
SKIP_DIRS = {".git", "target", "project", "spark-warehouse"}
# this artifact and this scanner legitimately name the patterns
SKIP_FILES = {"LEAKCHECK.json", "leakcheck.py"}

PATTERNS = {
    # TLD-rooted package imports outside the public namespaces the
    # build actually uses (local-val imports like spark.implicits._
    # are not TLD-rooted and must not trip the scan)
    "internal-import": re.compile(
        r"^\s*import\s+(?:(?:com|net|io|ai|dev|co|edu|gov)"
        r"(?!\.fasterxml|\.github)|org\.(?!apache|scalatest"
        r"|scalacheck|slf4j|junit))\.", re.M),
    "internal-url": re.compile(
        r"https?://(?!github\.com|raw\.githubusercontent\.com"
        r"|spark\.apache\.org|duckdb\.org|arxiv\.org|aclanthology\.org"
        r"|dl\.acm\.org|doi\.org|en\.wikipedia\.org|www\.w3\.org"
        r"|maven\.apache\.org|repo1\.maven\.org|openjdk\.org"
        r"|docs\.oracle\.com|localhost|127\.0\.0\.1)[\w.-]+\.\w{2,}"),
    "internal-pkg2": re.compile(
        r"\b(?:com|net|io)\.(?!fasterxml|github)[a-z]+\.internal\b"),
    "internal-bucket": re.compile(r"\b(?:s3|gs|abfss?)://[\w.-]+"),
    "slack-link": re.compile(r"slack\.com/|\bgo/[a-z][\w-]{2,}\b"),
    "api-key": re.compile(
        r"\b(?:sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{30,})"),
    "axon-env": re.compile(r"\b[A-Z][A-Z0-9_]*_(?:INTERNAL|SECRET)_[A-Z0-9_]+\b"),
}


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    root = Path(__file__).resolve().parent.parent
    hits = {k: [] for k in PATTERNS}
    for p in sorted(root.rglob("*")):
        if not p.is_file() or p.suffix not in EXTS:
            continue
        if any(d in p.parts for d in SKIP_DIRS) or p.name in SKIP_FILES:
            continue
        try:
            text = p.read_text(errors="replace")
        except OSError:
            continue
        for name, rx in PATTERNS.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[name].append(
                    f"{p.relative_to(root)}:{line}: {m.group(0)[:80]}")
    out = {
        "round": rnd,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
        "run": {
            "command": "python3 tools/leakcheck.py "
                       f"{rnd} (regex over {'/'.join(sorted(EXTS))}, "
                       f"{'/'.join(sorted(SKIP_DIRS))} excluded)",
            "timestamp": datetime.now(timezone.utc).isoformat(
                timespec="seconds"),
        },
    }
    (root / "LEAKCHECK.json").write_text(json.dumps(out, indent=1) + "\n")
    print(f"n_hits={out['n_hits']}")
    for name, v in hits.items():
        for h in v:
            print(f"  {name}: {h}")
    sys.exit(1 if out["n_hits"] else 0)


if __name__ == "__main__":
    main()
