"""Compare two bench artifacts round-over-round.

Usage: python tools/compare_bench.py BENCH_r05.json BENCH_r06.json
       python tools/compare_bench.py BENCH_r05.json /tmp/bench_run.log

Accepts either a driver artifact ({"tail": "..."} wrapping the emitted
JSON line, possibly truncated — per-query pairs are regex-recovered) or
a raw bench.py log/JSON line. Prints regressions above a noise threshold
(>1.3x AND >0.3s), improvements, and the common-subset totals — the same
comparison the round verdict performs.
"""

from __future__ import annotations

import json
import re
import sys

NOISE_RATIO = 1.3
NOISE_ABS = 0.3


def _scalar(v) -> float:
    """A timing cell is either the min-estimator scalar (r9, r11+) or a
    per-rep sample array (the r10 format — take its min; contention only
    ADDS time, so min is the estimator every other round records)."""
    if isinstance(v, (list, tuple)):
        return float(min(v))
    return float(v)


def _follow_full_doc(doc: dict, path: str) -> dict | None:
    """r12+: the emitted line is a bounded summary carrying a full_doc
    reference keyed by run_id. When the referenced side file (searched
    next to the artifact, then at the repo root) is from the SAME run,
    its complete queries map supersedes the summary subset; a run_id
    mismatch means BENCH_FULL_LATEST.json was overwritten by a later run
    — fall back to the summary rather than compare the wrong rows."""
    import os

    ref, run_id = doc.get("full_doc"), doc.get("run_id")
    if not ref or not run_id:
        return None
    here = os.path.dirname(os.path.abspath(path))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cand in (os.path.join(here, ref), os.path.join(root, ref)):
        try:
            full = json.load(open(cand))
        except (OSError, ValueError):
            continue
        if full.get("run_id") == run_id and "queries" in full:
            return full
    return None


def load_queries(path: str) -> dict[str, float]:
    text = open(path).read()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "tail" in doc:
            text = doc["tail"]
            try:
                inner = json.loads(text)
            except json.JSONDecodeError:
                inner = None
            if isinstance(inner, dict):
                full = _follow_full_doc(inner, path)
                target = full if full is not None else inner
                return {
                    k: _scalar(v) for k, v in target.get("queries", {}).items()
                }
        elif isinstance(doc, dict) and "queries" in doc:
            full = _follow_full_doc(doc, path)
            if full is not None:
                return {k: _scalar(v) for k, v in full["queries"].items()}
            return {k: _scalar(v) for k, v in doc["queries"].items()}
    except json.JSONDecodeError:
        pass
    # raw log: prefer the emitted JSON line if present
    for line in text.splitlines():
        if line.strip().startswith('{"metric"'):
            return {
                k: _scalar(v)
                for k, v in json.loads(line)["queries"].items()
            }
    # truncated tail: recover name/value pairs, but only from within the
    # queries/samples objects — a deny-list of metadata keys would
    # silently absorb any new numeric field (elapsed, totals) into the
    # timings. The tail may begin mid-object (head truncated), so absent
    # a '"queries"'/'"samples"' anchor the whole text IS the timings
    # interior; with one, match only after it and stop at the closing
    # brace. Values may be scalars (r9, r11+) or per-rep arrays (r10 —
    # minned, matching the recorded estimator); the recall_ prefix keys
    # the r11 recall map deliberately carries keep quality numbers from
    # ever being parsed as timings here.
    anchor = max(text.find('"queries"'), text.find('"samples"'))
    scope = text[anchor:] if anchor >= 0 else text
    brace = scope.find("}")
    if brace >= 0:
        scope = scope[: brace + 1]
    pairs = re.findall(r'"([a-z0-9_]+)":\s*(\[[0-9.,\s]+\]|[0-9.]+)', scope)
    # "reps" also covers reps_override's integer cells: a fragment that
    # lost both anchors but kept head metadata would otherwise parse
    # {"probe100x_exact_topk": 7} as a timing row (r11 ADVICE).
    return {
        k: _scalar(json.loads(v))
        for k, v in pairs
        if not k.startswith(("queries", "samples", "recall_", "reps"))
    }


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    old, new = load_queries(old_path), load_queries(new_path)
    common = sorted(set(old) & set(new))
    worse = [
        (n, old[n], new[n])
        for n in common
        if new[n] > max(old[n] * NOISE_RATIO, old[n] + NOISE_ABS)
    ]
    better = [
        (n, old[n], new[n])
        for n in common
        if new[n] < old[n] / NOISE_RATIO and old[n] - new[n] > NOISE_ABS
    ]
    print(f"common rows: {len(common)} ({old_path} vs {new_path})")
    print(f"REGRESSIONS (> {NOISE_RATIO}x and > {NOISE_ABS}s): {len(worse)}")
    for n, a, b in sorted(worse, key=lambda x: x[1] - x[2]):
        print(f"  {n:38s} {a:8.2f} -> {b:8.2f}")
    print(f"improvements: {len(better)}")
    for n, a, b in sorted(better, key=lambda x: x[2] - x[1]):
        print(f"  {n:38s} {a:8.2f} -> {b:8.2f}")
    t_old = sum(old[n] for n in common)
    t_new = sum(new[n] for n in common)
    print(f"common-subset total: {t_old:.1f}s -> {t_new:.1f}s")
    if worse:
        sys.exit(1)


if __name__ == "__main__":
    main()
