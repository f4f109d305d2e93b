"""snowflake_to_postgres_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``ajaymahadeven/snowflake-to-postgres`` ETL/validation engine
(see SURVEY.md), built Spark-first:

* declarative DataFrame/SQL plans (Catalyst handles pushdown/pruning/joins)
* columnar end-to-end (no row-at-a-time CSV loops)
* partition-deterministic restart instead of cursor OFFSET resume
* a 5-layer statistical validation engine as DataFrame ops
* LLM-data-pipeline extensions: dedup (exact/MinHash/SimHash/Jaccard/
  embedding), similarity search, text analysis, multimodal plumbing,
  and Structured Streaming over event data.

Nothing here imports from or depends on the reference repo; citations in
docstrings (``file:line``) point at the behavior being re-expressed.
"""

__version__ = "0.1.0"

from snowflake_to_postgres_spark.session import get_spark  # noqa: F401
