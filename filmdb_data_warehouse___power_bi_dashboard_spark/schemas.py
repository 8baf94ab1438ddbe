"""Explicit StructTypes for every table the engine touches.

The reference declares fixed DDL schemas for all 15 source tables and
6 warehouse tables (SURVEY.md §1.2-1.4; sql/source_filmdb/filmdb.sql,
sql/datawarehouse/creationdatwareh.sql) and its ETL declares result
row types for every federated pull. We mirror that discipline: never
``inferSchema`` — every reader pins the schema below and the loader
validates it.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Synthetic test corpus (/root/testdata/sf*/) — TPC-H-ish star + events +
# documents/embeddings. These are the engine's "source OLTP" tables, the
# analog of the reference's 15-table filmdb schema.
# ---------------------------------------------------------------------------

REGION = T.StructType([
    T.StructField("r_regionkey", T.IntegerType(), False),
    T.StructField("r_name", T.StringType(), False),
])

NATION = T.StructType([
    T.StructField("n_nationkey", T.IntegerType(), False),
    T.StructField("n_name", T.StringType(), False),
    T.StructField("n_regionkey", T.IntegerType(), False),
])

CUSTOMER = T.StructType([
    T.StructField("c_custkey", T.LongType(), False),
    T.StructField("c_name", T.StringType(), False),
    T.StructField("c_nationkey", T.IntegerType(), False),
    T.StructField("c_acctbal", T.DoubleType(), True),
    T.StructField("c_mktsegment", T.StringType(), True),
])

SUPPLIER = T.StructType([
    T.StructField("s_suppkey", T.LongType(), False),
    T.StructField("s_name", T.StringType(), False),
    T.StructField("s_nationkey", T.IntegerType(), False),
    T.StructField("s_acctbal", T.DoubleType(), True),
])

PART = T.StructType([
    T.StructField("p_partkey", T.LongType(), False),
    T.StructField("p_name", T.StringType(), False),
    T.StructField("p_brand", T.StringType(), False),
    T.StructField("p_type", T.StringType(), False),
    T.StructField("p_size", T.IntegerType(), True),
    T.StructField("p_retailprice", T.DoubleType(), True),
])

ORDERS = T.StructType([
    T.StructField("o_orderkey", T.LongType(), False),
    T.StructField("o_custkey", T.LongType(), False),
    T.StructField("o_orderstatus", T.StringType(), True),
    T.StructField("o_totalprice", T.DoubleType(), True),
    T.StructField("o_orderdate", T.TimestampType(), False),
    T.StructField("o_orderpriority", T.StringType(), True),
])

LINEITEM = T.StructType([
    T.StructField("l_orderkey", T.LongType(), False),
    T.StructField("l_partkey", T.LongType(), False),
    T.StructField("l_suppkey", T.LongType(), False),
    T.StructField("l_linenumber", T.IntegerType(), False),
    T.StructField("l_quantity", T.DoubleType(), True),
    T.StructField("l_extendedprice", T.DoubleType(), True),
    T.StructField("l_discount", T.DoubleType(), True),
    T.StructField("l_tax", T.DoubleType(), True),
    T.StructField("l_returnflag", T.StringType(), True),
    T.StructField("l_linestatus", T.StringType(), True),
    T.StructField("l_shipdate", T.TimestampType(), True),
])

EVENTS = T.StructType([
    T.StructField("event_id", T.LongType(), False),
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("user_id", T.LongType(), False),
    T.StructField("event_type", T.StringType(), False),
    T.StructField("value", T.DoubleType(), True),
    T.StructField("props", T.StringType(), True),
])

# On-disk, events.parquet's `ts` shape has drifted across runtimes
# (int64 TIMESTAMP(NANOS) under legacy decode vs native
# timestamp[us]); the reader footer-probes the actual type
# (sources/catalog.py:events_disk_schema) and normalizes to the
# EVENTS contract in convert_event_ts — no pinned raw schema needed.

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
])

EMBEDDINGS = T.StructType([
    T.StructField("vec_id", T.LongType(), False),
    T.StructField("embedding", T.ArrayType(T.FloatType(), True), True),
    T.StructField("label", T.IntegerType(), True),
])

SOURCE_TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ---------------------------------------------------------------------------
# Warehouse star schema — analog of the reference's dim_date/dim_client/
# dim_magasin/dim_categorie/dim_film + fact_paiement
# (sql/datawarehouse/creationdatwareh.sql:10-110). Mapping onto the test
# corpus: customer→dim_client, supplier→dim_magasin (the "store"),
# p_brand→dim_categorie, part→dim_film, lineitem revenue→fact_paiement.
# Money is DecimalType — the reference declares numeric(12,2)/(14,2) and
# decimal arithmetic keeps aggregation exact and order-independent.
# ---------------------------------------------------------------------------

MONEY = T.DecimalType(18, 2)

DIM_DATE = T.StructType([
    T.StructField("date_key", T.IntegerType(), False),       # yyyymmdd smart key
    T.StructField("date", T.DateType(), False),
    T.StructField("annee", T.IntegerType(), False),
    T.StructField("trimestre", T.IntegerType(), False),
    T.StructField("mois", T.IntegerType(), False),
    T.StructField("jour", T.IntegerType(), False),
    T.StructField("jour_semaine", T.IntegerType(), False),   # ISO weekday 1-7
    T.StructField("debut_mois", T.DateType(), False),
    T.StructField("debut_trimestre", T.DateType(), False),
    T.StructField("debut_annee", T.DateType(), False),
])

DIM_CLIENT = T.StructType([
    T.StructField("client_key", T.LongType(), False),
    T.StructField("source_client_id", T.LongType(), False),  # unique business key
    T.StructField("nom_client", T.StringType(), False),
    T.StructField("segment", T.StringType(), True),
    T.StructField("pays", T.StringType(), True),              # nation name
    T.StructField("region", T.StringType(), True),
])

DIM_MAGASIN = T.StructType([
    T.StructField("magasin_key", T.LongType(), False),
    T.StructField("source_magasin_id", T.LongType(), False),
    T.StructField("nom_magasin", T.StringType(), False),
    T.StructField("pays", T.StringType(), True),
    T.StructField("region", T.StringType(), True),
])

DIM_CATEGORIE = T.StructType([
    T.StructField("categorie_key", T.LongType(), False),
    T.StructField("nom_categorie", T.StringType(), False),   # unique business key
])

DIM_FILM = T.StructType([
    T.StructField("film_key", T.LongType(), False),
    T.StructField("source_film_id", T.LongType(), False),
    T.StructField("titre_film", T.StringType(), False),
    T.StructField("type_film", T.StringType(), True),
    T.StructField("taille", T.IntegerType(), True),
    T.StructField("prix_catalogue", MONEY, True),
    T.StructField("categorie_key", T.LongType(), True),
])

FACT_PAIEMENT = T.StructType([
    T.StructField("paiement_key", T.LongType(), False),
    T.StructField("source_paiement_id", T.LongType(), False),  # unique business key
    T.StructField("date_key", T.IntegerType(), False),
    T.StructField("client_key", T.LongType(), True),
    T.StructField("magasin_key", T.LongType(), True),
    T.StructField("film_key", T.LongType(), True),
    T.StructField("categorie_key", T.LongType(), True),        # denormalized (X9)
    T.StructField("montant", MONEY, False),
    T.StructField("quantite", T.DoubleType(), True),
    T.StructField("pay_month", T.StringType(), False),          # partition column
])

WAREHOUSE_TABLES: dict[str, T.StructType] = {
    "dim_date": DIM_DATE,
    "dim_client": DIM_CLIENT,
    "dim_magasin": DIM_MAGASIN,
    "dim_categorie": DIM_CATEGORIE,
    "dim_film": DIM_FILM,
    "fact_paiement": FACT_PAIEMENT,
}
