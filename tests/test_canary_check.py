"""Pins for tools/canary_check.py — the quiet-reference stamping gate
(r12 verdict ask #2). The r12 round committed a host-taxed session
(140.5s; 28 sub-second relational rows uniformly >=1.3x over r11 quiet
on unchanged code) as the reference of record while the driver's own
full run at the same HEAD (120.5s) was healthy. These tests pin the
gate's calibration against exactly those committed artifacts, so a
threshold edit that would re-admit the r12 mistake goes red."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from canary_check import CANARY_ROWS, _rows, check  # noqa: E402


def _doc(name: str) -> str:
    return str(REPO / name)


def test_known_taxed_session_is_refused():
    # The r12 committed quiet reference IS the taxed session the gate
    # exists to refuse.
    rc = check(
        _doc("BENCH_r12_quiet_full.json"),
        [_doc("BENCH_r11_quiet_full.json"), _doc("BENCH_r11_full.json")],
    )
    assert rc == 1


def test_healthy_sessions_are_stampable():
    # Driver full run at the same HEAD as the taxed quiet run: healthy.
    assert (
        check(
            _doc("BENCH_r12_full.json"),
            [_doc("BENCH_r11_quiet_full.json"), _doc("BENCH_r11_full.json")],
        )
        == 0
    )
    # Same-round quiet-vs-driver pair from a healthy round: both pass
    # in both directions (no direction bias in the best-of rule).
    assert check(_doc("BENCH_r11_quiet_full.json"), [_doc("BENCH_r11_full.json")]) == 0
    assert check(_doc("BENCH_r11_full.json"), [_doc("BENCH_r11_quiet_full.json")]) == 0


def test_canary_rows_resolve_in_committed_docs():
    # Every canary must exist in all four committed r11/r12 full docs —
    # a renamed or retired canary row silently shrinks the cohort.
    for name in (
        "BENCH_r11_full.json",
        "BENCH_r11_quiet_full.json",
        "BENCH_r12_full.json",
        "BENCH_r12_quiet_full.json",
    ):
        rows = _rows(_doc(name))
        missing = [k for k in CANARY_ROWS if k not in rows]
        assert not missing, f"{name} missing canaries: {missing}"


def test_insufficient_canaries_is_an_error(tmp_path):
    import json

    thin = tmp_path / "thin.json"
    thin.write_text(json.dumps({"queries": {"cohort_retention": 0.5}}))
    assert check(str(thin), [_doc("BENCH_r11_full.json")]) == 2
