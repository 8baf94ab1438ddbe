"""Bulk load: the reference's ``COPY <table> FROM stdin`` ingestion
path (filmdb.sql:896+ — tab-separated values, ``\\N`` nulls, Postgres
array literals like ``{Trailers,"Deleted Scenes"}``) as a Spark
reader.

``read_copy_tsv`` maps 1:1 onto the COPY wire format:

- TSV with no header, explicit schema (never inferSchema);
- ``\\N`` → NULL;
- ``text[]`` columns declared as ``ArrayType(StringType)`` are parsed
  from the pg literal with built-in expressions (regexp + split +
  transform) — no Python UDF, so the parse runs inside codegen and
  scales with the scan.

At 100 TB the load is just a parallel text scan: one task per input
split, no shuffle until the optional partitioned write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_pg_array(col: Column | str) -> Column:
    """Parse a Postgres array literal (``{a,b,"c d","e\\"f"}``) into
    ``array<string>``.

    Handles the forms the reference's data uses (filmdb.sql:3084
    ``{Trailers,"Deleted Scenes"}``): braces, comma separation,
    optional double-quoting with backslash escapes. NULL in → NULL out;
    ``{}`` → empty array.
    """
    c = F.col(col) if isinstance(col, str) else col
    inner = F.regexp_replace(c, r"^\{|\}$", "")
    # Split on commas not inside quotes: replace quoted segments'
    # commas is fragile — instead split on the pg separator and strip
    # quotes/escapes per element. Elements containing commas are
    # quoted in pg output; split on `","` boundaries first, then the
    # bare commas of unquoted runs.
    parts = F.split(inner, r',(?=(?:[^"]*"[^"]*")*[^"]*$)')
    cleaned = F.transform(
        parts,
        lambda p: F.regexp_replace(
            F.regexp_replace(F.regexp_replace(p, r'^"|"$', ""), r'\\"', '"'),
            r"\\\\",
            r"\\",
        ),
    )
    return F.when(c.isNull(), F.lit(None).cast("array<string>")).otherwise(
        F.when(inner == "", F.array().cast("array<string>")).otherwise(cleaned)
    )


def read_copy_tsv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> DataFrame:
    """Read a COPY-format TSV with the declared schema.

    Array columns are declared in ``schema`` as ArrayType(StringType)
    and arrive in pg literal form — they are read as strings and
    parsed with :func:`parse_pg_array`.
    """
    array_cols = [f.name for f in schema.fields if isinstance(f.dataType, T.ArrayType)]
    read_schema = T.StructType(
        [
            T.StructField(f.name, T.StringType() if f.name in array_cols else f.dataType, True)
            for f in schema.fields
        ]
    )
    df = (
        spark.read.schema(read_schema)
        .option("sep", "\t")
        .option("nullValue", "\\N")
        .option("header", "false")
        .option("quote", "")  # COPY does not quote scalar fields
        .csv(path)
    )
    for name in array_cols:
        df = df.withColumn(name, parse_pg_array(name))
    return df
