"""Pins for tools/compare_bench.py — the cross-round comparison that the
r10 round broke silently (0 common rows) and the r11 round could only
feed a truncated tail (37 of 195 rows recovered). The r12 emission
contract (bounded line + full_doc/run_id side file) only works if the
loader's resolution rules hold; these tests make a future break red."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from compare_bench import load_queries  # noqa: E402


def _write(tmp_path, name, doc):
    p = tmp_path / name
    p.write_text(json.dumps(doc))
    return str(p)


def test_full_doc_redirect_on_run_id_match(tmp_path):
    full = {
        "run_id": "run123",
        "queries": {f"q{i}": float(i) for i in range(60)},
    }
    _write(tmp_path, "BENCH_FULL_LATEST.json", full)
    line = {
        "metric": "headline_queries_total_wall",
        "run_id": "run123",
        "full_doc": "BENCH_FULL_LATEST.json",
        "queries": {"q1": 1.0, "q2": 2.0},  # bounded subset
        "value": 3.0,
    }
    artifact = _write(
        tmp_path, "BENCH_r12.json", {"tail": json.dumps(line), "parsed": None}
    )
    got = load_queries(artifact)
    assert len(got) == 60, "run_id match must supersede the bounded subset"


def test_full_doc_fallback_on_run_id_mismatch(tmp_path):
    _write(
        tmp_path,
        "BENCH_FULL_LATEST.json",
        {"run_id": "runNEWER", "queries": {f"x{i}": 1.0 for i in range(60)}},
    )
    line = {
        "run_id": "runOLD",
        "full_doc": "BENCH_FULL_LATEST.json",
        "queries": {"q1": 1.0},
        "value": 1.0,
    }
    artifact = _write(
        tmp_path, "BENCH_r11.json", {"tail": json.dumps(line), "parsed": None}
    )
    got = load_queries(artifact)
    assert got == {"q1": 1.0}, (
        "an overwritten side file must NOT substitute a later run's rows"
    )


def test_plain_full_doc_loads_directly(tmp_path):
    path = _write(
        tmp_path,
        "BENCH_r12_full.json",
        {"run_id": "r", "queries": {"a": 1.5, "b": [2.0, 1.0, 3.0]}},
    )
    got = load_queries(path)
    assert got == {"a": 1.5, "b": 1.0}, "array cells take the min estimator"


def test_truncated_tail_recovery_denies_reps_and_recall(tmp_path):
    # a tail fragment that lost the '{"metric"' head but kept the
    # queries interior — the r10/r11 artifact shape
    tail = '"probe10x_dedup_exact": 1.25, "zipf_slope": 0.5}, "recall": '\
        '{"recall_probe10x_ivf_topk": 0.95}, "reps": 3, '\
        '"reps_override": {"probe100x_exact_topk": 7}}'
    artifact = _write(tmp_path, "BENCH_r10.json", {"tail": tail, "parsed": None})
    got = load_queries(artifact)
    assert got.get("probe10x_dedup_exact") == 1.25
    assert "recall_probe10x_ivf_topk" not in got, "recall is not a timing row"
    assert "reps" not in got and "reps_override" not in got
