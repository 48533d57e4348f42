"""slice_db_spark — a PySpark-native analytics/ETL engine with the query and
data-processing capabilities of rivethealth/slice-db, re-designed Spark-first.

The reference (studied at /root/reference, cited as ``path:line`` in
docstrings) is a PostgreSQL subsetting tool: it captures a referentially
closed slice of a database via foreign-key graph traversal, scrubs sensitive
columns with deterministic pseudonymization transforms, and restores slices
in dependency order.  This package re-expresses those semantics on Spark
DataFrames — iterative semi-join traversal with distributed visited-sets,
Arrow-vectorized scrub UDFs, dependency-ordered materialization — and adds
the large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing, streaming) a 100 TB pipeline needs.

Nothing here is a translation of the reference's Python/asyncpg engine; the
architecture is DataFrame/Catalyst-native.  See SURVEY.md for the mapping.
"""

__version__ = "0.1.0"
