#!/usr/bin/env python
"""Regenerate ``last_driver_round`` in queries/gate_history.json from
the driver's CORRECTNESS_r*.json artifacts.

Run once at the start of a round (after the driver recorded the
previous round's gate): a green row (rows+schema+hash, no err) bumps
the query's ``last_driver_round``; ``changed_round`` is HAND-maintained
(set it to the current round whenever a query's plan or oracle is
edited) and is preserved untouched here. Queries new to the registry
must be added by hand with ``last_driver_round: null`` and
``changed_round: <current round>``.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HIST = os.path.join(
    REPO,
    "filmdb_data_warehouse___power_bi_dashboard_spark",
    "queries",
    "gate_history.json",
)


def main() -> None:
    with open(HIST) as fh:
        hist = json.load(fh)
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as fh:
            data = json.load(fh)
        for name, rec in data.items():
            if not isinstance(rec, dict) or name not in hist:
                continue
            green = (
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
                and not rec.get("err")
            )
            if green:
                prev = hist[name].get("last_driver_round") or 0
                hist[name]["last_driver_round"] = max(prev, rnd)
    with open(HIST, "w") as fh:
        json.dump({k: hist[k] for k in sorted(hist)}, fh, indent=1)
    n_stale = sum(
        1
        for v in hist.values()
        if v.get("last_driver_round") is not None
        and (v.get("changed_round") or 0) > v["last_driver_round"]
    )
    print(f"{len(hist)} entries, {n_stale} stale (changed since last driver row)")


if __name__ == "__main__":
    main()
