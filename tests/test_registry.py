"""Registry governance tests.

Round 2's verdict flagged that 25 of 75 registered queries had never
received a driver correctness row because the driver verifies only the
first 50 registry entries. These tests pin the invariants that prevent
that gap from reopening: the explicit order list is well-formed, and
every registered query is covered by the union of the previous round's
recorded rows and the current 50-entry window.
"""

from __future__ import annotations

import json
import os

from lakehouse_workshop_spark import operators as ops

DRIVER_WINDOW = 50


def _correctness_files() -> list[str]:
    from glob import glob

    return sorted(glob("/root/repo/CORRECTNESS_r*.json"))


def test_driver_order_is_duplicate_free_and_registered():
    assert len(ops.DRIVER_ORDER) == len(set(ops.DRIVER_ORDER))
    registered = set(ops.all_queries())
    missing = [n for n in ops.DRIVER_ORDER if n not in registered]
    assert not missing, f"DRIVER_ORDER names not registered: {missing}"


def test_window_union_covers_every_registered_query():
    """Every registered query has a driver row already (any recorded round),
    sits in the upcoming window, or is brand-new this round (recorded as
    pending in the manifest — the staleness test hardens that grace to
    exactly one round). Nothing ships unverified for more than a round."""
    files = _correctness_files()
    if not files:
        return
    seen: set[str] = set()
    max_round = 0
    for path in files:
        seen |= set(json.load(open(path)))
        max_round = max(
            max_round, int(os.path.basename(path).split("_r")[1].split(".")[0])
        )
    names = list(ops.all_queries())
    window = set(names[:DRIVER_WINDOW])
    manifest_path = "/root/repo/tools/driver_manifest.json"
    manifest = json.load(open(manifest_path)) if os.path.exists(manifest_path) else {}
    uncovered = [
        n
        for n in names
        if n not in seen
        and n not in window
        and manifest.get(n, {}).get("first_seen_round", 0) <= max_round
    ]
    assert not uncovered, (
        "registered queries with no driver row in ANY recorded round, outside "
        f"the current {DRIVER_WINDOW}-entry window, and older than this round: "
        f"{uncovered} — move them into DRIVER_ORDER's window or they ship "
        "unverified"
    )


def test_stale_queries_lead_the_window():
    """Self-scaling staleness: every query re-verifies at least every
    P-th round, P = max(3, ceil(registry / window) + 1) — a query whose
    latest driver row is P or more rounds old must sit inside the
    upcoming 50-entry window. Derived from the recorded
    CORRECTNESS_r*.json files, so the rule re-evaluates itself each
    round without hand-maintained lists.

    Cadence rationale: the original <=1-round rule became unsatisfiable
    at 121 queries in round 6 (it demanded 71 of 50 slots), and the
    fixed 3-round rotation that replaced it hit exact capacity (150) at
    144 queries the same round — every future round would have spent
    its entire window on staleness with zero budget for new queries or
    out-of-window rewrites. Deriving P from the registry size keeps the
    rule satisfiable with ~window/P slots of headroom per round while
    still bounding how long any row can go unre-verified."""
    from glob import glob

    latest: dict[str, int] = {}
    max_round = 0
    for path in sorted(glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        max_round = max(max_round, rnd)
        for name in json.load(open(path)):
            latest[name] = max(latest.get(name, 0), rnd)
    if not max_round:
        return
    names = list(ops.all_queries())
    window = set(names[:DRIVER_WINDOW])
    manifest_path = "/root/repo/tools/driver_manifest.json"
    manifest = json.load(open(manifest_path)) if os.path.exists(manifest_path) else {}
    # Verified-before queries go overdue when their latest row is P or
    # more rounds old (see docstring); never-verified queries go overdue
    # after waiting one full round (a registry larger than the window
    # makes rotation inevitable, so brand-new queries may wait exactly
    # one round, no more).
    period = max(3, -(-len(names) // DRIVER_WINDOW) + 1)
    horizon = max_round + 1 - period
    overdue = [
        n
        for n in names
        if n not in window
        and (
            0 < latest.get(n, 0) <= horizon
            or (
                latest.get(n, 0) == 0
                and manifest.get(n, {}).get("first_seen_round", max_round + 1)
                <= max_round
            )
        )
    ]
    assert not overdue, (
        f"queries whose driver coverage violates the staleness rule and are "
        f"outside the {DRIVER_WINDOW}-entry window: {overdue} — rebuild "
        "DRIVER_ORDER with tools/make_driver_order.py"
    )


def test_changed_source_is_in_window():
    """Changed-source rule: a query whose registered source (function body +
    @query block, hence oracle SQL) differs from the hash recorded at its
    last window entry must re-enter the window — its old driver row
    vouches for code that no longer exists."""
    import hashlib
    import inspect

    manifest_path = "/root/repo/tools/driver_manifest.json"
    if not os.path.exists(manifest_path):
        return
    manifest = json.load(open(manifest_path))
    queries = ops.all_queries()
    names = list(queries)
    window = set(names[:DRIVER_WINDOW])
    drifted = []
    for n, fn in queries.items():
        cur = hashlib.sha256(inspect.getsource(fn).encode()).hexdigest()[:16]
        if (
            n in manifest
            # pending entries (window_round None) were never verified —
            # no driver row exists for the old hash to vouch for
            and manifest[n].get("window_round") is not None
            and manifest[n]["hash"] != cur
            and n not in window
        ):
            drifted.append(n)
    assert not drifted, (
        f"queries whose source changed since their manifest hash but are "
        f"outside the window: {drifted} — rerun tools/make_driver_order.py "
        "and give them a window slot"
    )


def test_scale_path_targets_resolve():
    paths = ops.all_scale_paths()
    assert paths, "scale-path registry should map each baseline to a twin"
    registered = set(ops.all_queries())
    assert set(paths).issubset(registered)
    assert set(paths.values()).issubset(registered)
