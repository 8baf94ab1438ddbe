#!/usr/bin/env python
"""Driver-memory headroom proof: run the heaviest registry entries
under a deliberately SMALL driver heap (default 4g vs the session's
48g default, which can mask driver-side bloat) and report pass/fail.

In local mode the driver JVM is also the executor, so passing here is
a STRONGER claim than a 4g driver on a real cluster would make — all
executor-side working memory shares the same small heap. Collect-side
bloat (the class _capped_collect exists to prevent) would OOM or spill
loudly.

Usage: python scripts/driver_headroom.py [N] [sf_dir]
Writes a JSON line per query and a summary; meant to be recorded in
PERF.md per round.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEM", "4g")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
        detail = json.load(fh)
    heaviest = sorted(
        detail["queries"], key=detail["queries"].get, reverse=True
    )[:n]

    from filmdb_data_warehouse___power_bi_dashboard_spark.queries import registry
    from filmdb_data_warehouse___power_bi_dashboard_spark.runtime import (
        release_persisted,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.session import get_spark

    # 8 threads: bounds concurrent task memory so the small heap tests
    # driver-side accumulation, not raw task parallelism.
    spark = get_spark(app_name="driver-headroom", cpus=8, shuffle_partitions=8)
    mem = spark.conf.get("spark.driver.memory")
    reg = registry()
    results: dict[str, dict] = {}
    for name in heaviest:
        try:
            t0 = time.perf_counter()
            reg[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            results[name] = {"ok": True, "sec": round(time.perf_counter() - t0, 2)}
        except Exception as exc:
            results[name] = {"ok": False, "err": str(exc)[:300]}
        release_persisted()
        print(json.dumps({name: results[name]}))
    n_fail = sum(1 for v in results.values() if not v["ok"])
    print(
        json.dumps(
            {
                "driver_mem": mem,
                "sf_dir": sf_dir,
                "n_queries": len(results),
                "n_fail": n_fail,
                "verdict": "PASS" if n_fail == 0 else "FAIL",
            }
        )
    )


if __name__ == "__main__":
    main()
