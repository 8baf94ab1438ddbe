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


_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> tuple[DataFrame, DataFrame]:
    """Read newline-delimited JSON with a PINNED schema — the
    ingestion format of most raw training-data drops (web crawls,
    chat logs, annotation exports).

    Returns ``(good, quarantine)``: records that parse against the
    declared schema, and the raw text of lines that don't
    (PERMISSIVE mode with a corrupt-record column). Quarantining
    instead of failing is the 100 TB posture — one mangled line in a
    billion must not kill a 6-hour job, but it must stay observable
    (count the quarantine, alert on a ratio). Schema is always
    declared, never inferred: inference is a second full pass over
    the data and a schema-drift hazard.

    Both frames come from ONE parse pass (cached split of the same
    scan shape); the parallelism is one task per input split, no
    shuffle.
    """
    read_schema = T.StructType(
        [*schema.fields, T.StructField(_CORRUPT, T.StringType(), True)]
    )
    raw = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    good = raw.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    # Keep the WHOLE row in the quarantine (raw line + any fields that
    # did parse) — also required: Spark refuses a query whose only
    # referenced column from a raw JSON scan is the corrupt column.
    quarantine = raw.filter(F.col(_CORRUPT).isNotNull())
    return good, quarantine


def read_evolving_parquet(
    spark: SparkSession,
    path: str,
    expected: T.StructType,
) -> DataFrame:
    """Read a parquet directory whose batches were written under
    EVOLVING schemas (a landing zone accumulates files for months; new
    pipeline versions add columns) and present them under one declared
    contract.

    ``mergeSchema`` unions the per-file footers (columns absent in
    older files come back NULL — parquet's standard evolution
    semantics), then the frame is aligned to ``expected``: missing
    columns materialize as typed NULLs, extra columns are DROPPED
    (forward-compat: an older reader must not crash on a newer
    writer's additions), and every kept column is cast to the declared
    type. Declared-contract alignment, never inference — the
    read_jsonl posture.

    Scale note: mergeSchema reads EVERY file's footer up front (a
    driver-side listing+footer pass — fine for thousands of files,
    wrong for millions; at that scale the schema belongs in a table
    format's metadata layer, which is exactly what Delta/Iceberg
    are). The data scan itself stays one task per split, no shuffle.
    """
    raw = spark.read.option("mergeSchema", "true").parquet(path)
    cols = []
    present = {f.name: f for f in raw.schema.fields}
    for f in expected.fields:
        if f.name in present:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return raw.select(*cols)


# ---------------------------------------------------------------------------
# Enum/domain validation — the reference's CHECK-style column
# constraints (filmdb.sql:140 `rating public.mpaa_rating`, a 5-value
# enum; filmdb.sql:133 `release_year public.year`, the classic
# 1901-2155 integer domain) as an ingestion-time split. Postgres
# rejects the offending INSERT; at 100 TB the right posture is the
# read_jsonl one — route violating ROWS to a quarantine frame (one
# scan, codegen predicates, no UDF) and keep the job alive while the
# violation stays countable.
# ---------------------------------------------------------------------------


class DomainRule:
    """One declarative column constraint.

    ``allowed`` — enum membership (mpaa_rating-style);
    ``lo``/``hi`` — inclusive range (year-domain-style). NULL passes
    unless ``required`` (pg enum/domain columns are nullable unless
    NOT NULL is declared separately).
    """

    def __init__(self, column, allowed=None, lo=None, hi=None, required=False):
        self.column = column
        self.allowed = allowed
        self.lo = lo
        self.hi = hi
        self.required = required

    def violation(self) -> Column:
        """NULL when the row passes, else a reason string."""
        c = F.col(self.column)
        checks: list[tuple[Column, str]] = []
        if self.required:
            checks.append((c.isNull(), f"{self.column}: null in NOT NULL column"))
        if self.allowed is not None:
            checks.append(
                (
                    c.isNotNull() & ~c.isin(list(self.allowed)),
                    f"{self.column}: value outside enum",
                )
            )
        if self.lo is not None:
            checks.append(
                (c.isNotNull() & (c < F.lit(self.lo)), f"{self.column}: below domain minimum")
            )
        if self.hi is not None:
            checks.append(
                (c.isNotNull() & (c > F.lit(self.hi)), f"{self.column}: above domain maximum")
            )
        out = F.lit(None).cast("string")
        for cond, reason in reversed(checks):
            out = F.when(cond, F.lit(reason)).otherwise(out)
        return out


_VIOLATIONS = "_violations"


def validate_domains(
    df: DataFrame, rules: list[DomainRule]
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into ``(valid, quarantine)`` under the rules.

    Quarantined rows keep every original column plus ``_violations``
    (array of reason strings — a row can break several rules). Both
    frames share one scan shape; the predicates are plain codegen
    expressions, so the split costs what a filter costs and
    parallelizes with the scan at any scale.
    """
    reasons = F.array_compact(F.array(*[r.violation() for r in rules]))
    tagged = df.withColumn(_VIOLATIONS, reasons)
    valid = tagged.filter(F.size(_VIOLATIONS) == 0).drop(_VIOLATIONS)
    quarantine = tagged.filter(F.size(_VIOLATIONS) > 0)
    return valid, quarantine


# The corpus analog of the reference's two constrained columns:
# orders.o_orderstatus is enum-valued like mpaa_rating (filmdb.sql:
# 140), and order dates live inside a fixed domain window like
# public.year (filmdb.sql:133).
ORDERS_RULES = [
    DomainRule("o_orderstatus", allowed=["O", "F", "P"], required=True),
    DomainRule("o_totalprice", lo=0),
]
