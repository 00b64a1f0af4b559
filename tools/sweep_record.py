#!/usr/bin/env python3
"""Turn a selfcheck sweep log into the auditable per-query coverage
record the scale rungs promise: every oracle name appears exactly once
with its status (PASS / FAIL / TIMEOUT + the step that tripped).

Usage: python3 tools/sweep_record.py <sweep.log> <out.json> [oracle_sql.json]

Writes {"summary": {...}, "queries": {name: {"status": ..., "detail": ...}}}
sorted by name. If oracle_sql.json is given, any oracle name missing
from the log is recorded as {"status": "MISSING"} and the exit code is
nonzero — a sweep that silently skipped a query cannot read as covered.
"""
import json
import re
import sys
from pathlib import Path


def main():
    log_path, out_path = sys.argv[1], sys.argv[2]
    oracles = (set(json.loads(Path(sys.argv[3]).read_text()))
               if len(sys.argv) > 3 else None)
    queries = {}
    notes = {}
    for line in Path(log_path).read_text().splitlines():
        m = re.match(r"\s*\(oracle (\S+): (.+)\)$", line)
        if m:
            notes[m.group(1)] = m.group(2)
            continue
        m = re.match(r"(PASS|FAIL|TIMEOUT) (\S+?):? \(?(.*?)\)?$", line)
        if m:
            status, name, detail = m.groups()
            queries[name] = {"status": status, "detail": detail}
            if name in notes:  # the retry-ladder rung that made it pass
                queries[name]["ladder"] = notes.pop(name)
    missing = sorted(oracles - set(queries)) if oracles else []
    for name in missing:
        queries[name] = {"status": "MISSING",
                         "detail": "no line in the sweep log"}
    summary = {s: sum(1 for q in queries.values() if q["status"] == s)
               for s in ("PASS", "FAIL", "TIMEOUT", "MISSING")}
    summary["total"] = len(queries)
    Path(out_path).write_text(json.dumps(
        {"summary": summary,
         "queries": dict(sorted(queries.items()))}, indent=1))
    print(f"{summary}")
    for name, q in sorted(queries.items()):
        if q["status"] != "PASS":
            print(f"  {q['status']} {name}: {q['detail']}")
    sys.exit(1 if (summary["FAIL"] or summary["MISSING"]) else 0)


if __name__ == "__main__":
    main()
