"""Semantic-layer unit tests: filter-context behavior of evaluate()
beyond what the oracle queries cover."""

from __future__ import annotations

import datetime

import pytest

from filmdb_data_warehouse___power_bi_dashboard_spark.plans.etl import build_star_frames
from filmdb_data_warehouse___power_bi_dashboard_spark.plans.metrics import (
    MEASURES,
    evaluate,
)


@pytest.fixture(scope="module")
def star(spark, sf_small):
    return build_star_frames(spark, sf_small)


def test_sixteen_measures_declared():
    assert len(MEASURES) == 16


def test_filter_restricts_context(star):
    all_rows = evaluate(star, ["ca_total"]).collect()[0]
    eur = evaluate(
        star, ["ca_total"], filters=[("region_magasin", "=", "EUROPE")]
    ).collect()[0]
    assert eur["ca_total"] < all_rows["ca_total"]


def test_in_and_between_filters(star):
    df = evaluate(
        star,
        ["nb_paiements"],
        group_by=["annee"],
        filters=[("annee", "between", (1995, 1996)), ("segment", "in", ["BUILDING", "MACHINERY"])],
    )
    years = {r["annee"] for r in df.collect()}
    assert years <= {1995, 1996}


def test_drill_hierarchy_group_by(star):
    # Drill = ordered group_by levels (region -> pays -> magasin).
    df = evaluate(star, ["ca_total"], group_by=["region_magasin", "pays_magasin", "nom_magasin"])
    cols = df.columns
    assert cols[:3] == ["region_magasin", "pays_magasin", "nom_magasin"]
    assert df.count() > 0


def test_unknown_measure_raises(star):
    with pytest.raises(ValueError, match="unknown measures"):
        evaluate(star, ["nope"])


def test_ranked_measure_requires_card_context(star):
    with pytest.raises(ValueError, match="card measure"):
        evaluate(star, ["top_film"], group_by=["annee"])


def test_summary_routing_matches_fact_path(spark, sf_small, star, tmp_path):
    """X6: a month × store additive context answered from the
    materialized summary must equal the fact-path answer, and its plan
    must scan the summary parquet, not the lineitem fact."""
    from filmdb_data_warehouse___power_bi_dashboard_spark.plans.etl import build_warehouse

    dw = str(tmp_path / "dw")
    build_warehouse(spark, sf_small, dw)
    summaries = {
        "v_agg_mensuel_magasin": spark.read.parquet(f"{dw}/v_agg_mensuel_magasin"),
        "v_agg_mensuel_categorie": spark.read.parquet(f"{dw}/v_agg_mensuel_categorie"),
    }
    kwargs = dict(
        measures=["ca_total", "nb_paiements"],
        group_by=["nom_magasin"],
        filters=[("mois", ">=", datetime.date(1995, 1, 1))],
    )
    routed = evaluate(star, summaries=summaries, **kwargs)
    files = routed.inputFiles()
    assert files and all("v_agg_mensuel_magasin" in f for f in files), files
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "lineitem" not in plan
    fact_path = {
        r["nom_magasin"]: (r["ca_total"], r["nb_paiements"])
        for r in evaluate(star, **kwargs).collect()
    }
    routed_rows = {
        r["nom_magasin"]: (r["ca_total"], r["nb_paiements"]) for r in routed.collect()
    }
    assert routed_rows == fact_path


def test_summary_routing_declines_non_additive(star):
    # clients_actifs is not additive — must fall back to the fact.
    from filmdb_data_warehouse___power_bi_dashboard_spark.plans.metrics import (
        _route_to_summary,
    )

    assert (
        _route_to_summary({"v_agg_mensuel_magasin": star["fact_paiement"]},
                          ["clients_actifs"], ["nom_magasin"], [])
        is None
    )


def test_pareto_monotone_ends_at_total(star):
    rows = (
        evaluate(star, ["ca_total", "ca_cumul", "pct_cumul"], group_by=["nom_categorie"])
        .orderBy("ca_cumul")
        .collect()
    )
    cumuls = [float(r["ca_cumul"]) for r in rows]
    assert cumuls == sorted(cumuls)
    assert abs(rows[-1]["pct_cumul"] - 1.0) < 1e-9
    total = sum(float(r["ca_total"]) for r in rows)
    assert abs(cumuls[-1] - total) < 1e-6
