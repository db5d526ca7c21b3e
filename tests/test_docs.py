"""Doc-to-code audit: the `AETHER_*` env-knob table in MIGRATION.md must
match what the code actually reads (round-3 verdict: a phantom
`AETHER_FUSED_PROLOGUE` row documented a knob no code read, while the real
knob was `AETHER_ATTN_FUSED`). Both directions are asserted so neither
stale docs nor undocumented knobs can reappear silently."""

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
KNOB = re.compile(r"AETHER_[A-Z0-9_]+")


def _knobs_in(text: str) -> set:
    return set(KNOB.findall(text))


def _code_knobs() -> set:
    knobs = set()
    for base in ("aether_tpu", "bench.py", "__graft_entry__.py"):
        p = REPO / base
        files = p.rglob("*.py") if p.is_dir() else [p]
        for f in files:
            knobs |= _knobs_in(f.read_text())
    return knobs


def test_every_documented_knob_is_read_by_code():
    doc = _knobs_in((REPO / "MIGRATION.md").read_text())
    code = _code_knobs()
    phantom = doc - code
    assert not phantom, f"MIGRATION.md documents knobs no code reads: {phantom}"


def test_every_code_knob_is_documented():
    doc = _knobs_in((REPO / "MIGRATION.md").read_text())
    code = _code_knobs()
    undocumented = code - doc
    assert not undocumented, (
        f"code reads knobs MIGRATION.md does not document: {undocumented}")
