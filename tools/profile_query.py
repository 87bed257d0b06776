"""Per-stage empirical profile of one registered query (guide §1.1).

Runs the query end-to-end with the noop sink in a UI-enabled session and
dumps every completed stage's task-time, input, and shuffle volumes from
the status REST API — the "where is the time actually going" view that
`explain()` cannot give. Optimization work in r17+ starts here, per
/opt/skills/guides/spark_optimization_guide.md §1.

Usage: python tools/profile_query.py <query_name> [sf_dir] [reps]

sf_dir accepts the probe shorthands ``probe10x``/``probe100x`` which
materialize (or reuse) the bench's perturbed probe corpora.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from lakehouse_workshop_spark import get_spark
    from lakehouse_workshop_spark.operators import all_queries

    spark = get_spark(
        app_name=f"profile-{name}", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    if sf_dir in ("probe10x", "probe100x"):
        import bench

        base = "/root/testdata/sf0.1"
        if sf_dir == "probe10x":
            sf_dir = bench._probe_dir(spark, base)
        else:
            sf_dir = bench._probe_dir(
                spark, base, bench.PROBE100X_REPLICAS,
                tag=bench.PROBE100X_TAG, embeddings=True,
            )

    fn = all_queries()[name]

    # Warm pool (mirrors bench.py) so rep timings are steady-state.
    spark.range(0, 256, 1, 32).write.format("noop").mode("overwrite").save()

    import bench as _bench

    walls = []
    for r in range(reps):
        _bench._reclaim()
        spark.sparkContext.setJobDescription(f"{name} rep{r}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
    print(f"query={name} sf_dir={sf_dir} walls={walls}")

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    stages = json.loads(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=COMPLETE"
        ).read()
    )
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print(
        f"{'stage':>5s} {'runTimeS':>9s} {'cpuS':>8s} {'inMB':>8s} "
        f"{'srMB':>8s} {'swMB':>8s} {'tasks':>5s}  name"
    )
    for s in stages[:30]:
        print(
            f"{s['stageId']:5d} {(s.get('executorRunTime') or 0)/1e3:9.2f} "
            f"{(s.get('executorCpuTime') or 0)/1e9:8.2f} "
            f"{(s.get('inputBytes') or 0)/1e6:8.1f} "
            f"{(s.get('shuffleReadBytes') or 0)/1e6:8.1f} "
            f"{(s.get('shuffleWriteBytes') or 0)/1e6:8.1f} "
            f"{s.get('numCompleteTasks', 0):5d}  "
            f"{(s.get('description') or '')[:28]:28s} {s.get('name', '')[:45]}"
        )
    # Operator-level metrics for the LAST executed SQL query (the final
    # rep's noop write): node name + the headline metric values.
    execs = json.loads(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/sql?length=200"
        ).read()
    )
    execs = [e for e in execs if e.get("status") == "COMPLETED"]
    n_sql = int(os.environ.get("PROFILE_SQL_EXECS", "1"))
    for last in sorted(execs, key=lambda e: -e["id"])[:n_sql]:
        detail = json.loads(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/sql/{last['id']}"
                "?details=true&planDescription=false"
            ).read()
        )
        print(f"\nSQL exec {last['id']} duration={last.get('duration')}ms")
        for node in detail.get("nodes", []):
            mets = {
                m["name"]: m["value"]
                for m in node.get("metrics", [])
                if any(
                    k in m["name"]
                    for k in (
                        "total (min, med, max",
                        "time total",
                        "number of output rows",
                        "data size",
                        "shuffle bytes written",
                        "time to build",
                        "time in aggregation",
                    )
                )
            }
            if mets:
                print(f"  [{node['nodeId']:3d}] {node['nodeName'][:40]:40s} {mets}")
    spark.stop()


if __name__ == "__main__":
    main()
