"""PySpark-native analytics engine with the capability surface of the
``Vanitha-019076803E/Covid-19_Data_Analysis_BigData`` reference (a Spark
SQL / DataFrame COVID-analytics pipeline — see SURVEY.md §0.3), extended
with LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) and designed for 100 TB scale.

The engine is a thin pure-Python layer over Spark 4.1.2:

- :mod:`.session` — configured SparkSession factory (ns-timestamp repair
  conf, UTC session timezone, AQE on).
- :mod:`.schemas` — pinned ``StructType`` per corpus table (no schema
  inference anywhere; a full-data inference pass is banned at 100 TB).
- :mod:`.sources` — typed scan layer (parquet/CSV/JSONL) + partitioned
  parquet sink.
- :mod:`.operators` — relational operators (filter/join/agg/window/sort/
  set ops) and the LLM-pipeline operators.
- :mod:`.functions` — scalar function families + UDF/UDAF/UDTF surface.
- :mod:`.streaming` — Structured Streaming operators over the events
  stream (availableNow replay harness).
- :mod:`.core` — the query registry that ``__spark_entry__.py`` exposes
  to the driver.

Every operator is registered with :func:`.core.query` under the IDs of
SURVEY.md §2 and (where expressible) carries a DuckDB oracle SQL string
used for hash-checked correctness.
"""

from covid_19_data_analysis_bigdata_spark.core import QUERIES, ORACLES, query

__all__ = ["QUERIES", "ORACLES", "query"]
