"""Document-corpus sources and sinks: JSONL / CSV / parquet readers and
sharded writers for the ``documents`` table shape.

LLM training corpora arrive as line-delimited JSON or CSV long before they
become parquet; this module is the ingestion boundary that turns them into
the typed DataFrames every operator in :mod:`..operators` consumes.

Design rules for 100 TB ingestion:

* **Explicit schema, never inference.**  Schema inference samples or
  re-reads the input and can flip types between runs; a corpus reader
  must be deterministic, so the schema is a declared contract
  (:data:`DOCUMENTS_SCHEMA` by default, caller-overridable).
* **Malformed lines are data, not exceptions.**  A billion-line crawl
  WILL contain broken records; failing the job on line 10⁹ wastes the
  cluster.  Readers parse each line with ``from_json``/``from_csv`` in
  PERMISSIVE mode over a plain ``text`` scan, capturing the raw line of
  every malformed record in ``_corrupt_record``; callers split good/bad
  with :func:`split_corrupt` and route bad lines to a quarantine sink
  instead of dying.  (The text-scan + ``from_json`` shape also sidesteps
  Spark's queries-over-only-the-corrupt-column restriction on native
  JSON/CSV readers — no ``.cache()`` workaround needed.)
* **Line-splittable formats stay splittable.**  Parsing lines keeps every
  executor on its own byte range.  The corollary: CSV fields may be
  RFC-quoted (commas, quotes) but embedded NEWLINES are not supported —
  a record must be one line.  Free text belongs in JSONL (JSON escapes
  newlines); that is also the industry-standard corpus format.
* **Shard the output.**  ``compression`` applies per shard, keeping the
  dataset splittable at the file level even though each member is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

#: the engine's document contract (matches the test fixture layout)
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if _CORRUPT in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())])


def _parse_lines(lines: DataFrame, schema: T.StructType, fmt: str) -> DataFrame:
    s = _with_corrupt(schema)
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT}
    if fmt == "jsonl":
        parsed = F.from_json("value", s, opts)
    else:
        parsed = F.from_csv(F.col("value"), s.simpleString(), {**opts, "escape": '"'})
    return lines.select(parsed.alias("__r")).select("__r.*")


def read_corpus(
    spark: SparkSession,
    path: str,
    fmt: str = "jsonl",
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> DataFrame:
    """Read a document corpus with a declared schema and PERMISSIVE
    corrupt-record capture.  ``fmt``: ``jsonl`` | ``csv`` | ``parquet``.

    The returned frame carries a ``_corrupt_record`` string column (NULL
    for clean rows) holding the raw line of each malformed record; use
    :func:`split_corrupt` to separate them.  CSV files are headerless
    (the writer matches) with RFC-quoted fields; records must be single
    lines (see module docstring).
    """
    if fmt in ("jsonl", "csv"):
        return _parse_lines(spark.read.text(path), schema, fmt)
    if fmt == "parquet":
        df = spark.read.schema(schema).parquet(path)
        return df.withColumn(_CORRUPT, F.lit(None).cast("string"))
    raise ValueError(f"unknown corpus format: {fmt}")


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows with the corrupt column dropped,
    and the raw text of every malformed line for a quarantine sink."""
    clean = df.where(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = df.where(F.col(_CORRUPT).isNotNull()).select(F.col(_CORRUPT).alias("raw"))
    return clean, bad


def write_corpus(
    df: DataFrame,
    path: str,
    fmt: str = "jsonl",
    shards: int | None = None,
    compression: str | None = None,
) -> None:
    """Write a corpus as sharded JSONL / CSV / parquet.

    ``shards`` controls output file count (``repartition`` — at cluster
    scale pick ≈ input-size / 256 MB so each shard is a well-sized read
    unit).  CSV output is headerless with RFC quoting, mirroring
    :func:`read_corpus`."""
    if shards is not None:
        df = df.repartition(shards)
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    if fmt == "jsonl":
        w.json(path)
    elif fmt == "csv":
        w.option("header", "false").option("escape", '"').csv(path)
    elif fmt == "parquet":
        w.parquet(path)
    else:
        raise ValueError(f"unknown corpus format: {fmt}")
