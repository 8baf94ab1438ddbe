"""PySpark-native analytics engine with the query/data-processing
capability surface of the reference FilmDB data-warehouse + Power BI
dashboard project (see SURVEY.md), re-architected Spark-first.

Layers
------
- ``session``    : SparkSession factory (TZ/AQE/shuffle tuned).
- ``schemas``    : explicit StructTypes — never ``inferSchema``.
- ``sources``    : catalog (parquet readers + temp views) and sinks
                   (partitioned writes, merge/upsert à la ON CONFLICT).
- ``functions``  : scalar helpers (money decimals, smart date keys,
                   interval-day semantics) shared by ETL and queries.
- ``plans``      : warehouse ETL (star schema build) + semantic
                   metrics layer (measure evaluation under filter
                   context — the Power BI surface).
- ``queries``    : the analytic corpus (every operator family from
                   SURVEY.md §2) as named DataFrame builders, each
                   paired with an ANSI-SQL oracle string.
- ``operators``  : large-scale pipeline operators beyond the
                   reference — dedup (exact/MinHash-LSH/SimHash/
                   n-gram Jaccard), similarity search (brute-force +
                   LSH-bucketed ANN), text analysis, multimodal
                   column plumbing.
- ``streaming``  : Structured Streaming ingestion (watermarked
                   tumbling windows, sessionization).
"""

__version__ = "0.1.0"
