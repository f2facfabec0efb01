"""Quoted doc numbers must be DERIVED from named evidence files (VERDICT
r3 #3: no hand-typed numbers anywhere in the chain — a quoted range whose
bound appears in no archived evidence file must be impossible)."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TOOL = REPO / "tools" / "refresh_doc_numbers.py"


def _check(cwd=REPO):
    return subprocess.run(
        [sys.executable, str(TOOL), "--check"],
        capture_output=True, text=True, cwd=cwd,
    )


def test_doc_numbers_match_evidence():
    proc = _check()
    assert proc.returncode == 0, proc.stderr


def test_every_headline_number_has_a_derivation():
    data = json.loads(
        (REPO / "docs" / "evidence" / "headline.json").read_text()
    )
    assert data["numbers"], "headline.json must carry the quoted numbers"
    for key, spec in data["numbers"].items():
        assert isinstance(spec, dict), f"{key}: bare string (hand-typed)"
        assert ("field" in spec or "fields" in spec or "grep" in spec), (
            f"{key}: no derivation — hand-typed numbers are not allowed"
        )
        if "grep" not in spec:
            assert spec.get("files"), f"{key}: no evidence files named"
    prov = data.get("provenance", {})
    assert prov.get("captured"), "capture date missing"
    assert prov.get("source"), "evidence source missing"


def test_chip_claims_cite_archived_evidence():
    """Every 'on the real chip'-class claim in ROUND4+.md must name an
    archived docs/evidence/ log that exists, or carry an explicit
    '(unarchived' marker (VERDICT r4 #4: round 4 asserted on-chip
    results whose logs lived in /tmp; tier/sweep evidence now gets the
    same discipline as bench numbers)."""
    import re

    ev = REPO / "docs" / "evidence"
    claim_re = re.compile(r"real chip|on[- ]chip|on the chip", re.I)
    cite_re = re.compile(r"docs/evidence/([\w.\-]+)")
    for doc in sorted(REPO.glob("docs/ROUND*.md")):
        if doc.name < "ROUND4":  # rule starts where the discipline does
            continue
        paragraphs = doc.read_text().split("\n\n")
        for para in paragraphs:
            if not claim_re.search(para):
                continue
            cited = cite_re.findall(para)
            if "(unarchived" in para:
                continue
            assert cited, (
                f"{doc.name}: on-chip claim cites no docs/evidence/ log "
                f"and carries no '(unarchived' marker:\n{para[:400]}"
            )
            for name in cited:
                assert (ev / name).exists(), (
                    f"{doc.name} cites docs/evidence/{name}, which does "
                    "not exist"
                )


def test_tampered_number_fails_check(tmp_path):
    """A hand-edited headline text (the '~1230' orphan class) must fail."""
    import shutil

    # Mirror just enough of the repo for the tool to run against.
    work = tmp_path / "repo"
    (work / "tools").mkdir(parents=True)
    (work / "docs" / "evidence").mkdir(parents=True)
    shutil.copy(TOOL, work / "tools" / "refresh_doc_numbers.py")
    for src in (REPO / "docs" / "evidence").iterdir():
        if src.is_file():
            shutil.copy(src, work / "docs" / "evidence" / src.name)
    for name in ("BENCH_r02.json", "BENCH_r03.json"):
        if (REPO / name).exists():
            shutil.copy(REPO / name, work / name)
    head = work / "docs" / "evidence" / "headline.json"
    data = json.loads(head.read_text())
    data["numbers"]["r3_library_fps_range"]["text"] = "~1230-1530 frames/s"
    head.write_text(json.dumps(data))
    proc = subprocess.run(
        [sys.executable, str(work / "tools" / "refresh_doc_numbers.py"),
         "--check"],
        capture_output=True, text=True,
    )
    assert proc.returncode == 1
    assert "r3_library_fps_range" in proc.stderr


def test_underivable_number_fails_check(tmp_path):
    """An entry with no derivation spec must fail --check outright."""
    import shutil

    work = tmp_path / "repo"
    (work / "tools").mkdir(parents=True)
    (work / "docs" / "evidence").mkdir(parents=True)
    shutil.copy(TOOL, work / "tools" / "refresh_doc_numbers.py")
    for src in (REPO / "docs" / "evidence").iterdir():
        if src.is_file():
            shutil.copy(src, work / "docs" / "evidence" / src.name)
    for name in ("BENCH_r02.json", "BENCH_r03.json"):
        if (REPO / name).exists():
            shutil.copy(REPO / name, work / name)
    head = work / "docs" / "evidence" / "headline.json"
    data = json.loads(head.read_text())
    data["numbers"]["freehand"] = {"text": "9999 frames/s"}
    head.write_text(json.dumps(data))
    proc = subprocess.run(
        [sys.executable, str(work / "tools" / "refresh_doc_numbers.py"),
         "--check"],
        capture_output=True, text=True,
    )
    assert proc.returncode == 1
    assert "freehand" in proc.stderr
