#!/usr/bin/env python
"""Tabulate the pinned-pair scale-ratio trends across rounds.

Reads every committed BENCH_DETAIL.json revision from git history
(one per bench-recording commit), extracts the pinned entries'
10x-data scale checks, and prints a per-entry trend table — the
regenerable source of PERF.md's "Pinned-pair scale-ratio trends"
section. Run from the repo root:

    python scripts/scale_trends.py [--limit N]
"""

from __future__ import annotations

import argparse
import json
import subprocess

PINNED = [
    "dedup_decontamination",
    "dedup_decontamination_bloom",
    "dedup_decontamination_containment",
    "dedup_decontamination_containment_bloom",
    "dedup_decontamination_scrub",
    "stream_decontamination",
    "part_fuzzy_matches",
    "multimodal_audio_dedup_keep",
    "stream_media_dedup",
    "corpus_release",
    "corpus_importance_weights",
    # round-16: the DSIR pair carried the r15 artifact's only >2.0
    # ratios (3.42 / 3.16 at 10x data — documented fixed-overhead
    # effects); pinning both turns that claim into a measured trend.
    "corpus_dsir_select",
    # round-16: the incremental release maintainer — its "no
    # corpus-scale scan after ingest" claim should read as a ratio
    # tracking the batch corpus_release's, plus trigger floors.
    "stream_release_manifest",
]


def _revisions(limit: int) -> list[tuple[str, str]]:
    out = subprocess.run(
        ["git", "log", f"-{limit}", "--format=%h\t%s", "--", "BENCH_DETAIL.json"],
        capture_output=True,
        text=True,
        check=True,
    )
    revs = []
    for line in out.stdout.strip().splitlines():
        sha, subject = line.split("\t", 1)
        revs.append((sha, subject[:60]))
    return list(reversed(revs))  # oldest first


def _load(sha: str) -> dict | None:
    out = subprocess.run(
        ["git", "show", f"{sha}:BENCH_DETAIL.json"], capture_output=True
    )
    if out.returncode != 0:
        return None
    try:
        return json.loads(out.stdout)
    except json.JSONDecodeError:
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=12, help="revisions to scan")
    args = ap.parse_args()

    cols: list[tuple[str, dict]] = []
    for sha, subject in _revisions(args.limit):
        d = _load(sha)
        if not d:
            continue
        sc = d.get("scale_check_vs_sf0_01", {})
        if not sc:
            continue
        # skip small-SF smoke artifacts: their big side is BELOW the
        # sf0.01 reference, so the "10x" ratio reads inverted
        if (d.get("sf") or 0) <= 0.01:
            continue
        cols.append((f"{sha} {subject}", sc))

    for name, _ in ((s, None) for s, _ in cols):
        print("#", name)
    print()
    header = "entry".ljust(44) + " | " + " | ".join(
        s.split()[0] for s, _ in cols
    )
    print(header)
    print("-" * len(header))
    for entry in PINNED:
        cells = []
        for _, sc in cols:
            rec = sc.get(entry)
            if rec and "ratio" in rec:
                cells.append(f"{rec['ratio']:.2f}/{rec.get('big_warm_sec', 0):.2f}s")
            else:
                cells.append("-")
        print(entry.ljust(44) + " | " + " | ".join(cells))
    print("\ncell = 10x-data warm ratio / big-SF warm seconds")


if __name__ == "__main__":
    main()
