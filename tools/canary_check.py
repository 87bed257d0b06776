"""Canary gate for quiet-reference stamping (r12 verdict ask #2).

The round's quiet bench run only deserves to become the committed
reference of record (``BENCH_r{N}_quiet_full.json``) if the session that
produced it wasn't itself host-taxed. The r12 stamping got this wrong:
the committed quiet reference (140.5s) carried 28 sub-second relational
rows uniformly >=1.3x over r11 quiet on UNCHANGED code — the documented
microVM fault-tax signature — while the driver's own full run at the
same HEAD (120.5s) was the healthier session. Nothing checked.

This tool is that check. It reads a CANDIDATE full bench doc and one or
more REFERENCE docs, compares a fixed cohort of ~20 sub-second
pure-relational canary rows (operators cheap and stable enough that no
code change plausibly moves them 1.3x in one round), and refuses the
stamp when the cohort shows the tax signature:

* ``median`` per-row ratio (candidate / best reference) >= 1.10, or
* >= 25% of canary rows individually >= 1.3x.

Calibrated on the four committed r11/r12 full docs: every healthy
session pair measures median 0.985-1.026 with <=10% of rows >= 1.3x;
the known-taxed r12 quiet run measures 1.159-1.186 with 30-35% — the
gates bisect the gap with ~3x margin on both sides.

Median over the cohort — not any single row — so one legitimately
edited canary operator cannot flip the verdict; a taxed session lifts
the whole cohort at once, which is exactly what single-row noise can't
do. Exit code 0 = stampable, 1 = taxed (do not commit as reference),
2 = usage/data error.

Usage::

    python tools/canary_check.py CANDIDATE.json [REF.json ...]

With no REF given, every committed ``BENCH_r*_full.json`` and
``BENCH_r*_quiet_full.json`` at the repo root is used and each canary
row compares against its BEST (minimum) committed value — the "best
known run" the r12 verdict asked the gate to hold references to.
"""

from __future__ import annotations

import json
import statistics
import sys
from glob import glob
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Sub-second, pure-relational (no embedding/multimodal/probe), long-lived
# rows. Chosen from the r11/r12 committed docs: every one is <=1.1s in
# every healthy session on record, and 15 of them were exactly the rows
# the r12 tax lifted.
CANARY_ROWS = [
    "blocklist_scrub",
    "clv_temporal_holdout",
    "cohort_retention",
    "conversion_funnel",
    "count_distinct_customers",
    "curriculum_stages",
    # customer_ltv_deciles left the cohort in r16: its NTILE moved onto
    # the two-pass global_row_number (a deliberate ~0.5s fixed-cost
    # trade for flat scaling), so "no code change plausibly moves it
    # 1.3x" no longer holds — it would read permanently elevated against
    # its pre-r16 best. 19 rows remain, still well over the 10-row
    # signal floor; gates unchanged.
    "daily_value_anomalies",
    "dedup_exact",
    "dedup_keep_canonical",
    "disjunctive_part_revenue",
    "doc_chunks",
    "embedding_normalized",
    "gapfill_daily_revenue",
    "hll_distinct_rollup",
    "hot_keys_events",
    "hourly_seasonality",
    "integrity_orphans",
    "late_shipment_priority",
    "promo_revenue_monthly",
]

MEDIAN_GATE = 1.10
FRAC_GATE = 0.25
ROW_RATIO = 1.30

# Elevation-profile diagnostic (r16, per the r15 verdict's third-refusal
# clause): split the cohort by plan shape — PLANS.md exchange counts —
# so a TAXED verdict also says WHICH resource is contended. Scan-bound
# rows (<= 1 exchange: the cost is the parquet scan + one partial agg)
# elevate under host CPU/memory contention; shuffle-heavy rows (>= 2
# exchanges) additionally pay shuffle-file I/O, so a profile where
# shuffle rows elevate disproportionately (class-median gap >~ 0.15)
# points at shuffle-filesystem contention instead. Read the two medians
# together; the gate itself is unchanged.
SCAN_BOUND = {
    "blocklist_scrub",       # 0 exchanges
    "dedup_exact",           # 1
    "dedup_keep_canonical",  # 1
    "disjunctive_part_revenue",  # 1
    "doc_chunks",            # 1
    "embedding_normalized",  # 1
    "hot_keys_events",       # 1
}


def _rows(path: str) -> dict[str, float]:
    doc = json.load(open(path))
    q = doc.get("queries", doc)
    return {k: v for k, v in q.items() if isinstance(v, (int, float))}


def check(candidate: str, references: list[str]) -> int:
    cand = _rows(candidate)
    refs = [(_rows(r), r) for r in references]
    best: dict[str, float] = {}
    for rows, _ in refs:
        for k, v in rows.items():
            if k in CANARY_ROWS:
                best[k] = min(best.get(k, v), v)

    ratios: dict[str, float] = {}
    missing = []
    for k in CANARY_ROWS:
        if k in cand and k in best and best[k] > 0:
            ratios[k] = cand[k] / best[k]
        else:
            missing.append(k)
    if len(ratios) < 10:
        print(f"!! only {len(ratios)} canary rows resolvable — not enough signal")
        return 2

    med = statistics.median(ratios.values())
    frac = sum(r >= ROW_RATIO for r in ratios.values()) / len(ratios)
    print(f"candidate: {candidate}")
    print(f"references (best-of): {references}")
    for k in sorted(ratios, key=ratios.get, reverse=True):
        flag = " <-- elevated" if ratios[k] >= ROW_RATIO else ""
        print(f"  {k:35s} {cand[k]:6.2f}s vs best {best[k]:6.2f}s = {ratios[k]:.2f}x{flag}")
    if missing:
        print(f"  (unresolvable canaries skipped: {missing})")
    print(f"median ratio: {med:.3f} (gate {MEDIAN_GATE}); "
          f"rows >= {ROW_RATIO}x: {frac:.0%} (gate {FRAC_GATE:.0%})")
    scan = [r for k, r in ratios.items() if k in SCAN_BOUND]
    shuf = [r for k, r in ratios.items() if k not in SCAN_BOUND]
    if scan and shuf:
        m_scan = statistics.median(scan)
        m_shuf = statistics.median(shuf)
        kind = (
            "shuffle-filesystem contention (shuffle rows disproportionate)"
            if m_shuf - m_scan > 0.15
            else "host CPU/memory contention (both classes elevated alike)"
            if min(m_scan, m_shuf) >= MEDIAN_GATE
            else "profile inconclusive"
        )
        print(
            f"elevation profile: scan-bound median {m_scan:.3f} "
            f"({len(scan)} rows) vs shuffle-heavy median {m_shuf:.3f} "
            f"({len(shuf)} rows) -> {kind}"
        )
    if med >= MEDIAN_GATE or frac >= FRAC_GATE:
        print("VERDICT: TAXED — do NOT stamp this run as the quiet reference")
        return 1
    print("VERDICT: STAMPABLE — canary cohort within noise of the best known run")
    return 0


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    candidate = sys.argv[1]
    references = sys.argv[2:]
    if not references:
        references = sorted(
            set(glob(str(REPO / "BENCH_r*_full.json")))
            | set(glob(str(REPO / "BENCH_r*_quiet_full.json")))
        )
        references = [r for r in references if Path(r).resolve() != Path(candidate).resolve()]
    if not references:
        print("!! no reference docs found")
        return 2
    return check(candidate, references)


if __name__ == "__main__":
    sys.exit(main())
