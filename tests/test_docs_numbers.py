"""Quoted doc numbers must match docs/evidence/headline.json (VERDICT r2
weak #1 / next #8: one source of truth; stale claims fail loudly)."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_doc_numbers_match_evidence():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "refresh_doc_numbers.py"),
         "--check"],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr


def test_headline_numbers_have_provenance():
    data = json.loads(
        (REPO / "docs" / "evidence" / "headline.json").read_text()
    )
    assert data["numbers"], "headline.json must carry the quoted numbers"
    prov = data.get("provenance", {})
    assert prov.get("captured"), "capture date missing"
    assert prov.get("source"), "evidence source missing"
