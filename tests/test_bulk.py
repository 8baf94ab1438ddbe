"""Bulk COPY-TSV loader: wire-format fidelity (tabs, \\N nulls, pg
array literals) — the reference's filmdb.sql COPY blocks (S3)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import types as T

from filmdb_data_warehouse___power_bi_dashboard_spark.sources.bulk import read_copy_tsv

SCHEMA = T.StructType(
    [
        T.StructField("film_id", T.IntegerType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("rental_rate", T.DoubleType(), True),
        T.StructField("special_features", T.ArrayType(T.StringType()), True),
    ]
)

TSV = (
    "1\tACADEMY DINOSAUR\t0.99\t{Trailers,\"Deleted Scenes\"}\n"
    "2\tACE GOLDFINGER\t4.99\t{Trailers}\n"
    "3\tADAPTATION HOLES\t\\N\t{\"Behind the Scenes\",Commentaries}\n"
    "4\tAFFAIR PREJUDICE\t2.99\t\\N\n"
    "5\tEMPTY FEATURES\t1.99\t{}\n"
)


@pytest.fixture(scope="module")
def tsv_path():
    d = tempfile.mkdtemp(prefix="copy-")
    p = os.path.join(d, "film.tsv")
    with open(p, "w") as fh:
        fh.write(TSV)
    yield p


def test_jsonl_reads_good_rows_and_quarantines_corrupt(spark, tmp_path):
    """JSONL ingestion: schema-conforming lines parse, mangled lines
    land in the quarantine frame verbatim instead of failing the job
    or silently disappearing."""
    import json

    from filmdb_data_warehouse___power_bi_dashboard_spark.schemas import DOCUMENTS
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.bulk import read_jsonl

    p = str(tmp_path / "docs.jsonl")
    good_lines = [
        {"doc_id": 1, "text": "the quick fox", "lang": "en", "source": "crawl", "n_chars": 13},
        {"doc_id": 2, "text": "el zorro", "lang": "es", "source": "crawl", "n_chars": 8},
    ]
    with open(p, "w") as fh:
        for d in good_lines:
            fh.write(json.dumps(d) + "\n")
        fh.write('{"doc_id": "NOT-A-NUMBER", "text": 7]]\n')
    good, quarantine = read_jsonl(spark, p, DOCUMENTS)
    rows = {r["doc_id"]: r for r in good.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["text"] == "the quick fox"
    assert rows[2]["lang"] == "es"
    bad = quarantine.collect()
    assert len(bad) == 1
    assert "NOT-A-NUMBER" in bad[0]["_corrupt_record"]


def test_copy_tsv_roundtrip(spark, tsv_path):
    rows = {r["film_id"]: r for r in read_copy_tsv(spark, tsv_path, SCHEMA).collect()}
    assert len(rows) == 5
    assert rows[1]["special_features"] == ["Trailers", "Deleted Scenes"]
    assert rows[2]["special_features"] == ["Trailers"]
    assert rows[3]["rental_rate"] is None
    assert rows[3]["special_features"] == ["Behind the Scenes", "Commentaries"]
    assert rows[4]["special_features"] is None
    assert rows[5]["special_features"] == []
    assert rows[2]["title"] == "ACE GOLDFINGER"


def test_validate_domains_splits_and_reports_reasons(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.bulk import (
        DomainRule,
        validate_domains,
    )

    rows = [
        (1, "G", 1994),      # valid
        (2, "PG-13", 2155),  # valid (domain edge)
        (3, "X", 2000),      # enum violation
        (4, "R", 1800),      # domain violation
        (5, None, 3000),     # null rating (passes: not required) + domain violation
        (6, "NC-17", None),  # null year passes
    ]
    df = spark.createDataFrame(rows, "film_id int, rating string, release_year int")
    rules = [
        DomainRule("rating", allowed=["G", "PG", "PG-13", "R", "NC-17"]),
        DomainRule("release_year", lo=1901, hi=2155),
    ]
    valid, quarantine = validate_domains(df, rules)
    assert sorted(r["film_id"] for r in valid.collect()) == [1, 2, 6]
    bad = {r["film_id"]: r["_violations"] for r in quarantine.collect()}
    assert set(bad) == {3, 4, 5}
    assert bad[3] == ["rating: value outside enum"]
    assert bad[4] == ["release_year: below domain minimum"]
    assert bad[5] == ["release_year: above domain maximum"]


def test_validate_domains_multi_violation_and_required(spark):
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.bulk import (
        DomainRule,
        validate_domains,
    )

    df = spark.createDataFrame([(1, None, 1800)], "id int, status string, year int")
    rules = [
        DomainRule("status", allowed=["O", "F"], required=True),
        DomainRule("year", lo=1901),
    ]
    _, quarantine = validate_domains(df, rules)
    [row] = quarantine.collect()
    assert row["_violations"] == [
        "status: null in NOT NULL column",
        "year: below domain minimum",
    ]


def test_validate_domains_clean_on_real_orders(spark, sf_small):
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.bulk import (
        ORDERS_RULES,
        validate_domains,
    )
    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.catalog import read_table

    orders = read_table(spark, sf_small, "orders")
    valid, quarantine = validate_domains(orders, ORDERS_RULES)
    assert quarantine.count() == 0
    assert valid.count() == orders.count()


def test_evolving_parquet_aligns_to_contract(spark, tmp_path):
    """Schema evolution: a landing dir whose older files lack a column
    and whose newer files carry an extra one reads back under the
    declared contract — missing columns as typed NULLs, extras
    dropped, types cast."""
    from pyspark.sql import types as T

    from filmdb_data_warehouse___power_bi_dashboard_spark.sources.bulk import (
        read_evolving_parquet,
    )

    d = str(tmp_path / "landing")
    # v1 batch: no `lang` column yet, doc_id written as INT
    spark.createDataFrame(
        [(1, "old doc")], "doc_id int, text string"
    ).write.mode("append").parquet(d)
    # v2 batch: adds `lang` AND an extra column the contract never had
    spark.createDataFrame(
        [(2, "new doc", "en", "drop-me")],
        "doc_id int, text string, lang string, extra string",
    ).write.mode("append").parquet(d)

    contract = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    out = read_evolving_parquet(spark, d, contract)
    assert [f.name for f in out.schema.fields] == ["doc_id", "text", "lang"]
    assert dict(out.dtypes)["doc_id"] == "bigint"
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].lang is None and rows[1].text == "old doc"
    assert rows[2].lang == "en"
    assert "extra" not in out.columns
