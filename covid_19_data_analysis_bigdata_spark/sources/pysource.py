"""Custom Python data source (Spark 4 DataSource API).

Demonstrates the engine's source-extensibility path: when an input
format has no built-in connector, a pure-Python ``DataSource`` plugs
into the same scan machinery as parquet/CSV — with REAL partition
parallelism (``DataSourceReader.partitions`` splits the read into
independent tasks, one per executor slot).

The demo source generates a deterministic numbers table — each row is
pure arithmetic on its id, so any slice can be produced independently
by any task (the property a custom source needs for 100 TB: partitions
must be computable without coordination).  The same arithmetic is
replayed in the DuckDB oracle, giving the source an exact correctness
gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from covid_19_data_analysis_bigdata_spark.core import query

#: LCG constants shared with the deterministic samplers (relational.py).
_A, _C, _P = 1103515245, 12345, 1_000_000_007


class _RangeSlice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticNumbersSource(DataSource):
    """``spark.read.format("synthetic_numbers")`` — deterministic rows."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_numbers"

    def schema(self) -> str:
        return "id bigint, h bigint, bucket int"

    def reader(self, schema) -> DataSourceReader:
        return _NumbersReader(self.options)


class _NumbersReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 10_000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        step = -(-self.rows // self.parts)  # ceil div
        return [
            _RangeSlice(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _RangeSlice):
        for i in range(partition.start, partition.end):
            h = (i * _A + _C) % _P
            yield (i, h, h % 100)


@query(
    "scan_python_datasource",
    oracle=f"""
    SELECT i AS id,
           (i * {_A} + {_C}) % {_P}         AS h,
           CAST((i * {_A} + {_C}) % {_P} % 100 AS INTEGER) AS bucket,
           count(*) OVER (PARTITION BY (i * {_A} + {_C}) % {_P} % 100)
               AS bucket_n
    FROM range(0, 10000) t(i)
    """,
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-parallel custom Python data source, verified exactly.

    Registers the source, reads 10k rows across 8 independent input
    partitions, and joins a per-bucket count on top so the scan feeds a
    normal shuffle stage — proving the custom source composes with the
    rest of the engine like any built-in format.
    """
    spark.dataSource.register(SyntheticNumbersSource)
    df = (
        spark.read.format("synthetic_numbers")
        .option("rows", 10_000)
        .option("parts", 8)
        .load()
    )
    counts = df.groupBy("bucket").agg(F.count(F.lit(1)).alias("bucket_n"))
    return df.join(F.broadcast(counts), "bucket").select(
        "id", "h", "bucket", "bucket_n"
    )
