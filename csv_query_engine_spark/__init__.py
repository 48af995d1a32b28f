"""csv_query_engine_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference
``MohdSakib535/csv-query-engine`` (a FastAPI + DuckDB CSV Q&A app, studied
read-only at /root/reference) re-expressed Spark-first:

* sources/sinks (CSV/parquet/JSON) -> ``csv_query_engine_spark.io``
* schema + semantic profiling       -> ``csv_query_engine_spark.profiler``
* NL->SQL planning + validation     -> ``csv_query_engine_spark.nlsql``
* query execution + post-processing -> ``csv_query_engine_spark.engine``
* full relational operator surface  -> ``csv_query_engine_spark.operators``
* LLM-data-pipeline ops at scale    -> ``csv_query_engine_spark.pipeline``
* structured streaming analytics    -> ``csv_query_engine_spark.streaming``

Everything relational is declared with the DataFrame/SQL API so Catalyst
(pushdown, pruning, join selection, AQE) owns the physical plan; Python
only touches the data through Arrow-batched pandas UDFs where built-ins
genuinely cannot express the semantics.
"""

from csv_query_engine_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
