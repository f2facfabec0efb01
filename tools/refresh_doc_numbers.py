"""Regenerate (or verify) performance numbers quoted in the docs.

Single source of truth: ``docs/evidence/headline.json``. Every entry is
DERIVED from named evidence files — no hand-typed numbers anywhere in the
chain (VERDICT r3 #3: a quoted range whose bound appears in no archived
evidence file must be impossible). Each ``numbers`` entry is an object:

    {"files": [...repo-relative globs...], "field": "library_fps",
     "format": "{lo:g}-{hi:g} frames/s", "text": "<computed>"}
        -> text computed as a RANGE of that JSON field across every
           matching evidence file ({lo}/{hi}; {n} = sample count).
           Driver artifacts (BENCH_r*.json) may wrap the payload in a
           {"parsed": ...} envelope — both shapes are read.

    {"files": ["one.json"], "fields": {"lib": "library_fps", ...},
     "format": "{lib:g} library / ...", "text": "<computed>"}
        -> text computed from several fields of ONE capture.

    {"grep": {"file": "x.log", "patterns": ["2.41 us/step"]},
     "text": "2.1-2.4 µs/step"}
        -> text is anchored by literal pattern(s) that must appear in the
           named evidence file (for log-sourced numbers).

Docs quote a number by wrapping it in invisible markers:

    <!--num:KEY-->quoted text<!--/num-->

This script recomputes every derived text, rewrites headline.json and the
marker spans (``--check`` verifies without writing — the test suite runs
that, so a stale or underivable number fails loudly instead of drifting).

Usage:
    python tools/refresh_doc_numbers.py            # rewrite in place
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
DOCS = ("README.md", "PARITY.md", "BASELINE.md", "docs/ROUND3.md",
        "docs/ROUND4.md", "docs/ROUND5.md", "docs/DESIGN.md")

_MARK = re.compile(r"<!--num:([a-z0-9_]+)-->(.*?)<!--/num-->", re.S)


def _payload(path: Path) -> dict:
    d = json.loads(path.read_text())
    if isinstance(d.get("parsed"), dict):  # driver BENCH_r*.json envelope
        return d["parsed"]
    return d


def _extract(d: dict, dotted: str):
    v = d
    for part in dotted.split("."):
        v = v[int(part)] if isinstance(v, list) else v[part]
    return v


def derive_text(key: str, spec: dict, problems: list) -> str | None:
    """Compute the quoted text for one entry; None if underivable."""
    if "grep" in spec:
        g = spec["grep"]
        path = REPO / g["file"]
        if not path.exists():
            problems.append(f"{key}: evidence file missing: {g['file']}")
            return None
        content = path.read_text(errors="replace")
        for pat in g["patterns"]:
            if pat not in content:
                problems.append(
                    f"{key}: anchor {pat!r} not found in {g['file']}"
                )
                return None
        return spec["text"]  # anchored literal

    if "fields" in spec:
        matches = [p for rel in spec["files"] for p in sorted(REPO.glob(rel))]
        if not matches:
            problems.append(f"{key}: no evidence file matches {spec['files']}")
            return None
        d = _payload(matches[0])
        try:
            vals = {name: _extract(d, f) for name, f in spec["fields"].items()}
        except KeyError as exc:
            problems.append(f"{key}: field {exc} missing in {matches[0].name}")
            return None
        return spec["format"].format(**vals)

    vals = []
    for rel in spec["files"]:
        for p in sorted(REPO.glob(rel)):
            try:
                v = _extract(_payload(p), spec["field"])
            except (KeyError, TypeError):
                continue  # capture predates/postdates this field
            vals.extend(v if isinstance(v, list) else [v])
    if not vals:
        problems.append(
            f"{key}: field {spec['field']!r} found in no evidence file "
            f"matching {spec['files']}"
        )
        return None
    return spec["format"].format(lo=min(vals), hi=max(vals), n=len(vals))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="verify only; exit 1 on stale numbers")
    args = ap.parse_args()

    headline = json.loads(HEADLINE.read_text())
    numbers = headline["numbers"]
    problems: list = []
    stale: list = []
    texts: dict = {}
    for key, spec in numbers.items():
        if not isinstance(spec, dict) or not (
            "grep" in spec or "field" in spec or "fields" in spec
        ):
            problems.append(
                f"{key}: entry has no derivation (field/fields/grep) — "
                "hand-typed numbers are not allowed"
            )
            continue
        text = derive_text(key, spec, problems)
        if text is None:
            continue
        if spec.get("text") != text:
            stale.append(("headline.json", key, spec.get("text"), text))
            spec["text"] = text
        texts[key] = text

    unknown: list = []
    for rel in DOCS:
        path = REPO / rel
        if not path.exists():
            continue
        text = path.read_text()

        def sub(m: re.Match) -> str:
            key, current = m.group(1), m.group(2)
            if key not in texts:
                unknown.append((rel, key))
                return m.group(0)
            want = texts[key]
            if current != want:
                stale.append((rel, key, current, want))
            return f"<!--num:{key}-->{want}<!--/num-->"

        new = _MARK.sub(sub, text)
        if not args.check and new != text:
            path.write_text(new)

    if not args.check and stale:
        HEADLINE.write_text(json.dumps(headline, indent=2,
                                       ensure_ascii=False) + "\n")

    for msg in problems:
        print(f"UNDERIVABLE: {msg}", file=sys.stderr)
    for rel, key in unknown:
        print(f"UNKNOWN KEY {key} in {rel} (add it to {HEADLINE})",
              file=sys.stderr)
    for rel, key, cur, want in stale:
        word = "stale" if args.check else "updated"
        print(f"{word}: {rel} num:{key} {cur!r} -> {want!r}",
              file=sys.stderr)
    if problems or unknown or (args.check and stale):
        return 1
    print(f"{'checked' if args.check else 'refreshed'} "
          f"{len(texts)} derived numbers across {len(DOCS)} docs",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
