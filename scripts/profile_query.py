"""Profile one or more registered queries the way bench.py times them.

Usage: python scripts/profile_query.py <name> [<name> ...] [--explain DIR]

For each query: two timed noop-sink runs (plan-build time and execution
time reported separately), with the same canary/Python-worker warmups
bench.py uses so numbers are comparable to BENCH_DETAIL entries.
With --explain DIR, writes <name>.txt with explain("formatted").
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    explain_dir = None
    if "--explain" in args:
        i = args.index("--explain")
        explain_dir = args[i + 1]
        del args[i : i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from filmdb_data_warehouse___power_bi_dashboard_spark.queries import registry
    from filmdb_data_warehouse___power_bi_dashboard_spark.runtime import (
        release_persisted,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.session import get_spark

    spark = get_spark(app_name="profile")
    reg = registry()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    reg["etl_agg_mensuel_magasin"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    release_persisted()
    import pandas as _pd

    def _noop_batches(batches):
        for pdf in batches:
            yield _pd.DataFrame({"x": pdf["id"]})

    spark.range(0, 32, 1, 32).mapInPandas(_noop_batches, "x long").write.format(
        "noop"
    ).mode("overwrite").save()
    from filmdb_data_warehouse___power_bi_dashboard_spark.artifacts import (
        artifact_first_touch,
    )

    artifact_first_touch(spark, sf_dir, errors={})
    release_persisted()

    for name in names:
        fn = reg[name]
        for attempt in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            release_persisted()
            print(
                f"{name} run{attempt}: build={t1 - t0:.3f}s exec={t2 - t1:.3f}s"
                f" total={t2 - t0:.3f}s",
                flush=True,
            )
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as f:
                f.write(txt)
            release_persisted()
    spark.stop()


if __name__ == "__main__":
    main()
