"""Data-pipeline operators beyond the reference surface: deduplication,
similarity search, text analysis, multimodal plumbing.

These have no counterpart in rivethealth/slice-db (batch subsetting only);
they are specced directly against Spark APIs as the large-scale
training-data operations a 100 TB pipeline needs.  Everything in the hot
path is built-in `pyspark.sql.functions` (JVM, whole-stage codegen);
Python appears only in the multimodal decode stubs (Arrow-batched
`mapInPandas`).
"""
