"""gmt_dbt_spark — a PySpark-native analytics engine.

A ground-up Spark-first re-expression of the capabilities of the
reference ELT pipeline `whitefantom00/gmt-dbt` (ingest → staged
external tables → bronze CTAS models → incremental MERGE upsert),
extended with the relational SQL surface those dbt models consume and
the LLM-training-data operators (dedup, similarity search, text
analysis, multimodal columns) needed at 100 TB scale.

Design tenets (see SURVEY.md §4, §7):
- DataFrame/SQL declarative plans; Catalyst + AQE pick physical ops.
- Broadcast small dimensions; partition/bucket large facts.
- Built-in `pyspark.sql.functions` in the hot path; Arrow-batched
  pandas UDFs only where built-ins can't express the semantics.
"""

__version__ = "0.1.0"

from gmt_dbt_spark.session import get_spark  # noqa: F401
