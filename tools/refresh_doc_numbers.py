"""Regenerate (or verify) performance numbers quoted in the docs.

Single source of truth: ``docs/evidence/headline.json`` — every headline
figure with its provenance (capture file, date, command). Docs quote a
number by wrapping it in invisible markers:

    <!--num:KEY-->quoted text<!--/num-->

This script rewrites every marker span from the JSON (``--check`` verifies
without writing — the test suite runs that, so a stale quoted number fails
loudly instead of drifting).

Usage:
    python tools/refresh_doc_numbers.py            # rewrite docs in place
    python tools/refresh_doc_numbers.py --check    # exit 1 on any mismatch
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
HEADLINE = REPO / "docs" / "evidence" / "headline.json"
DOCS = ("README.md", "PARITY.md", "BASELINE.md", "docs/ROUND3.md")

_MARK = re.compile(r"<!--num:([a-z0-9_]+)-->(.*?)<!--/num-->", re.S)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="verify only; exit 1 on stale numbers")
    args = ap.parse_args()

    numbers = json.loads(HEADLINE.read_text())["numbers"]
    stale = []
    unknown = []
    for rel in DOCS:
        path = REPO / rel
        if not path.exists():
            continue
        text = path.read_text()

        def sub(m: re.Match) -> str:
            key, current = m.group(1), m.group(2)
            if key not in numbers:
                unknown.append((rel, key))
                return m.group(0)
            want = str(numbers[key])
            if current != want:
                stale.append((rel, key, current, want))
            return f"<!--num:{key}-->{want}<!--/num-->"

        new = _MARK.sub(sub, text)
        if not args.check and new != text:
            path.write_text(new)

    for rel, key in unknown:
        print(f"UNKNOWN KEY {key} in {rel} (add it to {HEADLINE})",
              file=sys.stderr)
    for rel, key, cur, want in stale:
        word = "stale" if args.check else "updated"
        print(f"{word}: {rel} num:{key} {cur!r} -> {want!r}",
              file=sys.stderr)
    if unknown or (args.check and stale):
        return 1
    print(f"{'checked' if args.check else 'refreshed'} "
          f"{len(numbers)} numbers across {len(DOCS)} docs",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
