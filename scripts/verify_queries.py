"""Driver-contract oracle check for named queries (or all).

Usage: python scripts/verify_queries.py [--sf DIR] [name ...]

Runs each registered query at the given SF dir (default sf0.01) and
compares against its declared DuckDB oracle with the SAME comparator
the driver uses (tests/oracle_harness.compare). Prints one line per
query (OK / ROWS-ONLY when no oracle / FAIL reason) and a summary.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args

    from tests.oracle_harness import compare, duck_connection

    from filmdb_data_warehouse___power_bi_dashboard_spark.queries import (
        oracles,
        registry,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.runtime import (
        release_persisted,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.session import get_spark

    spark = get_spark(app_name="verify")
    reg = registry()
    orc = oracles()
    if not names:
        names = sorted(reg)
    con = duck_connection(sf_dir)
    n_ok = n_rows_only = n_fail = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            df = reg[name](spark, sf_dir)
            sql = orc.get(name)
            if sql is None:
                df.collect()
                print(f"ROWS-ONLY {name} ({time.perf_counter() - t0:.1f}s)")
                n_rows_only += 1
            else:
                ok, why = compare(df, con, sql)
                if ok:
                    print(f"OK        {name} ({time.perf_counter() - t0:.1f}s)")
                    n_ok += 1
                else:
                    print(f"FAIL      {name}: {why[:300]}")
                    n_fail += 1
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(f"FAIL      {name}: EXC {str(exc)[:300]}")
            n_fail += 1
        finally:
            release_persisted()
        sys.stdout.flush()
    print(f"SUMMARY ok={n_ok} rows_only={n_rows_only} fail={n_fail}")
    spark.stop()


if __name__ == "__main__":
    main()
