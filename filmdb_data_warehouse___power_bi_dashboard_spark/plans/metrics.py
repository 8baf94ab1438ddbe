"""Semantic metrics layer — the Power BI capability surface.

The reference's pbix model defines a ``Mesures`` table of 16 DAX
measures evaluated under *filter context* (slicers on month / store /
category — SURVEY §2.9, §3.3). The Spark re-architecture is a thin
semantic layer over the star frames:

- a measure registry (16 measures below);
- ``evaluate(star, measures, group_by, filters)`` compiles ONE
  star-join + group-by plan per visual query. Slicer = ``filters``;
  drill hierarchy = ordered ``group_by``; the relationship joins of
  the BI model (J9) are the declared fact→dim keys in ``_ATTRS``.

Filter context semantics: filters restrict the fact rows BEFORE
aggregation (DAX's CALCULATE over related columns); group_by produces
one measure value per group (the visual's axis).

Scale: dims are broadcast; only the dims actually referenced by the
requested attributes are joined (manual relationship pruning), so a
measure over the bare fact never touches a dim. The summary-table
routing of SURVEY §4 X6 lives in :func:`evaluate` — when the context
only needs month × store/category and additive measures, the
pre-aggregated ``v_agg_mensuel_*`` table substitutes for the fact.

Measure inventory (pbix `Mesures` → here):
  CA Total→ca_total, Nombre de paiements→nb_paiements, Panier
  moyen→panier_moyen, Clients actifs→clients_actifs, Nb Clients→
  nb_clients, Nb Magasins→nb_magasins, Nb Pays→nb_pays, Nb Villes→
  nb_regions (corpus has no city level), CA cumul catégories→
  ca_cumul, % cumul CA catégories→pct_cumul, Top Catégorie→
  top_categorie, Top Film→top_film, Top Client→top_client, Mois
  record→mois_record, Année record→annee_record, Taux de réachat→
  taux_reachat.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from ..schemas import MONEY

# ---------------------------------------------------------------------------
# Attribute map: the BI model's relationships. attr -> (dim, fact key,
# dim key, expression over the joined frame).
# ---------------------------------------------------------------------------

_ATTRS: dict[str, tuple[str, str, str]] = {
    # attr            dim              fact key         dim col source
    "nom_categorie": ("dim_categorie", "categorie_key", "nom_categorie"),
    "nom_magasin": ("dim_magasin", "magasin_key", "nom_magasin"),
    "pays_magasin": ("dim_magasin", "magasin_key", "pays"),
    "region_magasin": ("dim_magasin", "magasin_key", "region"),
    "nom_client": ("dim_client", "client_key", "nom_client"),
    "segment": ("dim_client", "client_key", "segment"),
    "pays_client": ("dim_client", "client_key", "pays"),
    "region_client": ("dim_client", "client_key", "region"),
    "titre_film": ("dim_film", "film_key", "titre_film"),
    "type_film": ("dim_film", "film_key", "type_film"),
    "mois": ("dim_date", "date_key", "debut_mois"),
    "annee": ("dim_date", "date_key", "annee"),
    "trimestre": ("dim_date", "date_key", "trimestre"),
    "jour_semaine": ("dim_date", "date_key", "jour_semaine"),
}

def _base_measures() -> dict[str, Column]:
    return {
        "ca_total": F.sum("montant").cast(MONEY),
        "nb_paiements": F.countDistinct("source_paiement_id"),
        "clients_actifs": F.countDistinct("client_key"),
        "nb_clients": F.countDistinct("client_key"),
        "nb_magasins": F.countDistinct("magasin_key"),
        "nb_pays": F.countDistinct(F.col("pays_client")),
        "nb_regions": F.countDistinct(F.col("region_client")),
        "quantite_totale": F.sum("quantite"),
    }


_DERIVED = {"panier_moyen"}
_WINDOWED = {"ca_cumul", "pct_cumul"}
# Attributes whose cardinality is bounded by the dimension DOMAIN
# (25 brands, 5 segments, 25 nations, 5 regions, calendar), not by
# data volume — the only groups an unpartitioned cumulative window
# may run over. Entity-level attrs (client/film/store names) scale
# with the data and are rejected by the evaluate() guard.
_BOUNDED_GROUP_ATTRS = {
    "nom_categorie", "segment", "pays_magasin", "region_magasin",
    "pays_client", "region_client", "type_film",
    "mois", "annee", "trimestre", "jour_semaine",
}
_RANKED = {"top_categorie", "top_film", "top_client", "mois_record", "annee_record"}
_TWO_LEVEL = {"taux_reachat"}

_RANK_ATTR = {
    "top_categorie": "nom_categorie",
    "top_film": "titre_film",
    "top_client": "nom_client",
    "mois_record": "mois",
    "annee_record": "annee",
}

MEASURES: tuple[str, ...] = (
    "ca_total",
    "nb_paiements",
    "panier_moyen",
    "clients_actifs",
    "nb_clients",
    "nb_magasins",
    "nb_pays",
    "nb_regions",
    "ca_cumul",
    "pct_cumul",
    "top_categorie",
    "top_film",
    "top_client",
    "mois_record",
    "annee_record",
    "taux_reachat",
)


def _needed_attrs(measures: Sequence[str], group_by: Sequence[str], filters) -> set[str]:
    need = set(group_by) | {f[0] for f in filters}
    for m in measures:
        if m in ("nb_pays",):
            need.add("pays_client")
        if m in ("nb_regions",):
            need.add("region_client")
        if m in _RANKED:
            need.add(_RANK_ATTR[m])
    return need


def _join_context(star: dict[str, DataFrame], attrs: set[str]) -> DataFrame:
    """Join the fact to exactly the dims the context references (the
    BI relationship joins, J9), aliasing each attribute column."""
    fact = star["fact_paiement"]
    by_dim: dict[str, list[str]] = {}
    for a in attrs:
        by_dim.setdefault(_ATTRS[a][0], []).append(a)
    out = fact
    for dim_name, dim_attrs in by_dim.items():
        fact_key = _ATTRS[dim_attrs[0]][1]
        dim_df = star[dim_name]
        cols = [F.col(_ATTRS[a][2]).alias(a) for a in dim_attrs]
        out = out.join(F.broadcast(dim_df.select(F.col(fact_key), *cols)), fact_key, "left")
    return out


def _apply_filters(df: DataFrame, filters) -> DataFrame:
    """filters: sequence of (attr, op, value) with op ∈ {=, !=, >=,
    <=, in, between}. This is the slicer/page filter context."""
    for attr, op, value in filters:
        c = F.col(attr)
        if op == "=":
            df = df.filter(c == value)
        elif op == "!=":
            df = df.filter(c != value)
        elif op == ">=":
            df = df.filter(c >= value)
        elif op == "<=":
            df = df.filter(c <= value)
        elif op == "in":
            df = df.filter(c.isin(list(value)))
        elif op == "between":
            df = df.filter(c.between(value[0], value[1]))
        else:
            raise ValueError(f"unsupported filter op {op!r}")
    return df


# Summary-table routing (SURVEY §4 X6): contexts answerable from the
# pre-aggregated v_agg_mensuel_* tables. measure -> summary column.
_SUMMARY_ADDITIVE = {"ca_total": "ca", "nb_paiements": "nb_paiements"}
_SUMMARY_ATTRS = {
    "v_agg_mensuel_magasin": {"mois", "nom_magasin"},
    "v_agg_mensuel_categorie": {"mois", "nom_categorie"},
}


def _route_to_summary(
    summaries: dict[str, DataFrame] | None,
    measures: Sequence[str],
    group_by: Sequence[str],
    filters: Sequence[tuple],
) -> DataFrame | None:
    """If the context is month × store/category with additive
    measures, answer from the materialized summary instead of the
    fact — the reference's v_agg_mensuel_* views exist exactly for
    this (dw requetes_clees.sql:270-299). Returns None when the
    context needs the fact."""
    if not summaries:
        return None
    if not measures or any(m not in _SUMMARY_ADDITIVE for m in measures):
        return None
    attrs = set(group_by) | {f[0] for f in filters}
    for name, supported in _SUMMARY_ATTRS.items():
        if name in summaries and attrs <= supported:
            ctx = _apply_filters(summaries[name], filters)
            aggs = [
                F.sum(_SUMMARY_ADDITIVE[m]).cast(MONEY if m == "ca_total" else "long").alias(m)
                for m in measures
            ]
            gcols = list(group_by)
            out = ctx.groupBy(*gcols).agg(*aggs) if gcols else ctx.agg(*aggs)
            return out.select(*gcols, *measures)
    return None


def evaluate(
    star: dict[str, DataFrame],
    measures: Sequence[str],
    group_by: Sequence[str] = (),
    filters: Sequence[tuple] = (),
    summaries: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Evaluate measures under a filter context — one visual query.

    Returns one row per group (one row total when ``group_by`` is
    empty), measure columns named by measure. Ranked measures
    (top_*/record) are only meaningful with empty ``group_by`` (DAX
    evaluates them per-cell; our registered queries use them on cards).

    Pass ``summaries`` (materialized ``v_agg_mensuel_*`` DataFrames,
    e.g. read from the warehouse written by plans/etl.py) to enable
    summary routing: month × store/category contexts with additive
    measures are answered from the pre-aggregate without touching the
    fact.
    """
    unknown = [m for m in measures if m not in MEASURES]
    if unknown:
        raise ValueError(f"unknown measures: {unknown}")
    routed = _route_to_summary(summaries, measures, group_by, filters)
    if routed is not None:
        return routed
    attrs = _needed_attrs(measures, group_by, filters)
    ctx = _apply_filters(_join_context(star, attrs), filters)

    base = _base_measures()
    agg_names = [m for m in measures if m in base]
    # Derived/windowed measures ride on ca_total / nb_paiements.
    if set(measures) & (_DERIVED | _WINDOWED):
        for extra in ("ca_total", "nb_paiements"):
            if extra not in agg_names:
                agg_names.append(extra)
    aggs = [base[m].alias(m) for m in agg_names]

    gcols = list(group_by)
    if aggs:
        out = ctx.groupBy(*gcols).agg(*aggs) if gcols else ctx.agg(*aggs)
    elif gcols:
        out = ctx.select(*gcols).distinct()
    else:
        # Only ranked card measures requested: start from a 1-row frame.
        out = ctx.sparkSession.range(1).drop("id")

    if "panier_moyen" in measures:
        out = out.withColumn(
            "panier_moyen",
            round_half_up(
                F.col("ca_total").cast("double")
                / F.nullif(F.col("nb_paiements"), F.lit(0)),
                4,
            ),
        )
    if set(measures) & _WINDOWED:
        # Pareto running total over groups ranked by CA desc (W4).
        # The window runs over the aggregated group set — safe ONLY
        # when that set is bounded by dimension-attribute cardinality
        # (category/segment/geo/calendar — the reference's Pareto
        # semantics). Guard against silently single-partitioning an
        # entity-level group (client/film/store scale with the data):
        # those need a bucketed cumulative plan (functions/ranking.py),
        # not an unpartitioned window over millions of rows.
        high_card = [g for g in gcols if g not in _BOUNDED_GROUP_ATTRS]
        if high_card:
            raise ValueError(
                f"cumulative measures over unbounded group(s) {high_card} "
                "would single-partition the window; pre-rank with "
                "functions.ranking.global_row_number and aggregate by "
                "rank bucket instead"
            )
        order = [F.desc("ca_total")] + [F.asc(g) for g in gcols]
        w_cum = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
        w_all = Window.partitionBy()
        if "ca_cumul" in measures:
            out = out.withColumn("ca_cumul", F.sum("ca_total").over(w_cum).cast(MONEY))
        if "pct_cumul" in measures:
            out = out.withColumn(
                "pct_cumul",
                round_half_up(
                    F.sum("ca_total").over(w_cum).cast("double")
                    / F.sum("ca_total").over(w_all).cast("double"),
                    6,
                ),
            )

    if set(measures) & _TWO_LEVEL:
        per_client = (
            ctx.groupBy(*gcols, "client_key")
            .agg(F.countDistinct("source_paiement_id").alias("__nb"))
        )
        rate = per_client.groupBy(*gcols).agg(
            round_half_up(
                F.sum(F.when(F.col("__nb") >= 2, 1).otherwise(0)).cast("double")
                / F.count("*")
                * 100.0,
                4,
            ).alias("taux_reachat")
        )
        out = out.join(rate, gcols) if gcols else out.crossJoin(rate)

    for m in measures:
        if m in _RANKED:
            if gcols:
                raise ValueError(f"{m} is a card measure; use empty group_by")
            attr = _RANK_ATTR[m]
            top = (
                ctx.groupBy(attr)
                .agg(F.sum("montant").cast(MONEY).alias("__ca"))
                .orderBy(F.desc("__ca"), F.asc(attr))
                .limit(1)
                .select(
                    F.concat(
                        F.col(attr).cast("string"),
                        F.lit(" ("),
                        F.col("__ca").cast("string"),
                        F.lit(")"),
                    ).alias(m)
                )
            )
            out = out.crossJoin(F.broadcast(top))

    # Column order: groups then measures, as a visual would project.
    return out.select(*gcols, *[m for m in measures])


# ---------------------------------------------------------------------------
# Registered queries + DuckDB oracles. Oracles are written directly
# over the source tables (the dim attributes equal their source
# columns), which independently checks the whole star+metrics stack.
# ---------------------------------------------------------------------------

_SQL_REV = (
    "CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2))), 2) AS DECIMAL(18,2))"
)

_SQL_FACT = f"""
  SELECT o_custkey,
         l_suppkey,
         l_partkey,
         CAST(l_shipdate AS DATE) AS jour,
         CAST(date_trunc('month', l_shipdate) AS DATE) AS mois,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS annee,
         {_SQL_REV} AS montant
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""


def _star(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    from .etl import build_star_frames

    return build_star_frames(spark, sf_dir)


def q_metrics_kpi_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return evaluate(
        _star(spark, sf_dir),
        measures=["ca_total", "nb_paiements", "panier_moyen", "clients_actifs", "taux_reachat"],
    )


_KPI_PANIER = sql_round_half_up(
    "CAST(SUM(montant) AS DOUBLE) / NULLIF(COUNT(*), 0)", 4
)

ORACLE_KPI_GLOBAL = f"""
WITH fact AS ({_SQL_FACT}),
per_client AS (
  SELECT o_custkey, COUNT(*) AS nb FROM fact GROUP BY 1
),
reachat AS (
  SELECT {sql_round_half_up("CAST(SUM(CASE WHEN nb >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 100.0", 4)} AS taux_reachat
  FROM per_client
)
SELECT CAST(CAST(SUM(montant) AS DECIMAL(18,2)) AS DOUBLE) AS ca_total,
       COUNT(*) AS nb_paiements,
       {_KPI_PANIER} AS panier_moyen,
       COUNT(DISTINCT o_custkey) AS clients_actifs,
       (SELECT taux_reachat FROM reachat) AS taux_reachat
FROM fact
"""


def q_metrics_pareto_categorie(spark: SparkSession, sf_dir: str) -> DataFrame:
    return evaluate(
        _star(spark, sf_dir),
        measures=["ca_total", "nb_paiements", "ca_cumul", "pct_cumul"],
        group_by=["nom_categorie"],
    )


_PARETO_PCT = sql_round_half_up(
    "CAST(ca_cumul AS DOUBLE) / CAST(SUM(ca_total) OVER () AS DOUBLE)", 6
)

ORACLE_PARETO = f"""
WITH fact AS ({_SQL_FACT}),
by_cat AS (
  SELECT p.p_brand AS nom_categorie,
         CAST(SUM(f.montant) AS DECIMAL(18,2)) AS ca_total,
         COUNT(*) AS nb_paiements
  FROM fact f JOIN part p ON f.l_partkey = p.p_partkey
  GROUP BY 1
),
cum AS (
  SELECT nom_categorie, ca_total, nb_paiements,
         CAST(SUM(ca_total) OVER (ORDER BY ca_total DESC, nom_categorie ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS ca_cumul
  FROM by_cat
)
SELECT nom_categorie, CAST(ca_total AS DOUBLE) AS ca_total,
       nb_paiements, CAST(ca_cumul AS DOUBLE) AS ca_cumul,
       {_PARETO_PCT} AS pct_cumul
FROM cum
"""


def q_metrics_magasin_mois_europe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter context demo: slicer region_magasin = EUROPE, drill
    nom_magasin × mois (the 'KPI par magasin et par mois' visual under
    a territory slicer)."""
    return evaluate(
        _star(spark, sf_dir),
        measures=["ca_total", "nb_paiements", "panier_moyen", "clients_actifs"],
        group_by=["nom_magasin", "mois"],
        filters=[("region_magasin", "=", "EUROPE")],
    )


_MAG_PANIER = sql_round_half_up(
    "CAST(SUM(f.montant) AS DOUBLE) / NULLIF(COUNT(*), 0)", 4
)

ORACLE_MAGASIN_MOIS = f"""
WITH fact AS ({_SQL_FACT})
SELECT s.s_name AS nom_magasin,
       f.mois,
       CAST(CAST(SUM(f.montant) AS DECIMAL(18,2)) AS DOUBLE) AS ca_total,
       COUNT(*) AS nb_paiements,
       {_MAG_PANIER} AS panier_moyen,
       COUNT(DISTINCT f.o_custkey) AS clients_actifs
FROM fact f
JOIN supplier s ON f.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE'
GROUP BY 1, 2
"""


def q_metrics_top_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The five card measures: rank-1 entity + CA, formatted
    'name (ca)' — DAX Top Catégorie/Top Film/Top Client/Mois
    record/Année record (SURVEY §2.9, W5)."""
    return evaluate(
        _star(spark, sf_dir),
        measures=["top_categorie", "top_film", "top_client", "mois_record", "annee_record"],
    )


def _sql_top(entity_sql: str, join_sql: str, label: str) -> str:
    return f"""(
  SELECT {entity_sql} || ' (' || CAST(CAST(SUM(f.montant) AS DECIMAL(18,2)) AS VARCHAR) || ')'
  FROM fact f {join_sql}
  GROUP BY {entity_sql}
  ORDER BY SUM(f.montant) DESC, {entity_sql} ASC
  LIMIT 1
) AS {label}"""


ORACLE_TOP_ENTITIES = f"""
WITH fact AS ({_SQL_FACT})
SELECT
{_sql_top("p.p_brand", "JOIN part p ON f.l_partkey = p.p_partkey", "top_categorie")},
{_sql_top("p.p_name", "JOIN part p ON f.l_partkey = p.p_partkey", "top_film")},
{_sql_top("c.c_name", "JOIN customer c ON f.o_custkey = c.c_custkey", "top_client")},
{_sql_top("CAST(f.mois AS VARCHAR)", "", "mois_record")},
{_sql_top("CAST(f.annee AS VARCHAR)", "", "annee_record")}
"""


def q_metrics_reachat_par_magasin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return evaluate(
        _star(spark, sf_dir),
        measures=["clients_actifs", "taux_reachat"],
        group_by=["nom_magasin"],
    )


ORACLE_REACHAT_MAGASIN = f"""
WITH fact AS ({_SQL_FACT}),
per_client AS (
  SELECT s.s_name AS nom_magasin, f.o_custkey, COUNT(*) AS nb
  FROM fact f JOIN supplier s ON f.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
)
SELECT nom_magasin,
       COUNT(DISTINCT o_custkey) AS clients_actifs,
       {sql_round_half_up("CAST(SUM(CASE WHEN nb >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 100.0", 4)} AS taux_reachat
FROM per_client
GROUP BY 1
"""


def q_metrics_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'Distribution du CA par jour de semaine' box-plot feed —
    dim_date.Jour_semaine calculated column (pbix page 'Vue
    d'ensemble')."""
    return evaluate(
        _star(spark, sf_dir),
        measures=["ca_total", "nb_paiements", "panier_moyen"],
        group_by=["jour_semaine"],
    )


_WD_PANIER = sql_round_half_up(
    "CAST(SUM(montant) AS DOUBLE) / NULLIF(COUNT(*), 0)", 4
)

ORACLE_WEEKDAY = f"""
WITH fact AS ({_SQL_FACT})
SELECT CAST(isodow(jour) AS INT) AS jour_semaine,
       CAST(CAST(SUM(montant) AS DECIMAL(18,2)) AS DOUBLE) AS ca_total,
       COUNT(*) AS nb_paiements,
       {_WD_PANIER} AS panier_moyen
FROM fact
GROUP BY 1
"""


def q_metrics_drill_localisation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-level drill context — the pbix dim_client 'Localisation'
    hierarchy (pays → ville → nom_client; the corpus has no city, so
    region ⊃ pays ⊃ nom_client) under a segment slicer: proves
    ``evaluate`` compiles an ordered multi-level group_by + filter
    into one star pass (pbix Report/Layout drill; SURVEY §2.9)."""
    return evaluate(
        _star(spark, sf_dir),
        measures=["ca_total", "nb_paiements"],
        group_by=["region_client", "pays_client", "nom_client"],
        filters=[("segment", "=", "BUILDING")],
    )


ORACLE_DRILL_LOCALISATION = f"""
WITH fact AS ({_SQL_FACT})
SELECT r.r_name AS region_client,
       n.n_name AS pays_client,
       c.c_name AS nom_client,
       CAST(CAST(SUM(f.montant) AS DECIMAL(18,2)) AS DOUBLE) AS ca_total,
       COUNT(*) AS nb_paiements
FROM fact f
JOIN customer c ON f.o_custkey = c.c_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY 1, 2, 3
"""


QUERIES = {
    "metrics_kpi_global": q_metrics_kpi_global,
    "metrics_drill_localisation": q_metrics_drill_localisation,
    "metrics_pareto_categorie": q_metrics_pareto_categorie,
    "metrics_magasin_mois_europe": q_metrics_magasin_mois_europe,
    "metrics_top_entities": q_metrics_top_entities,
    "metrics_reachat_par_magasin": q_metrics_reachat_par_magasin,
    "metrics_weekday_profile": q_metrics_weekday_profile,
}

ORACLES = {
    "metrics_kpi_global": ORACLE_KPI_GLOBAL,
    "metrics_drill_localisation": ORACLE_DRILL_LOCALISATION,
    "metrics_pareto_categorie": ORACLE_PARETO,
    "metrics_magasin_mois_europe": ORACLE_MAGASIN_MOIS,
    "metrics_top_entities": ORACLE_TOP_ENTITIES,
    "metrics_reachat_par_magasin": ORACLE_REACHAT_MAGASIN,
    "metrics_weekday_profile": ORACLE_WEEKDAY,
}
