"""Corpus interchange sinks: JSONL and sharded training output.

LLM data pipelines exchange corpora as JSONL (one JSON object per
line) and feed trainers from bounded-size shards.  Both are thin,
deliberate wrappers over Spark's distributed writers — the point is
pinning the contract (schema-stable roundtrip, bounded shard sizes)
with tests, not reinventing the writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(
    df: DataFrame, path: str, compression: str | None = None
) -> None:
    """Write one JSON object per line (the LLM-corpus interchange
    format).  Distributed: one file per partition; pair with
    ``write_training_shards``'s repartition pattern for bounded file
    counts.  ``compression``: e.g. ``gzip`` for crawl-sized exports."""
    w = df.write.mode("overwrite")
    if compression is not None:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """Read a JSONL corpus with an EXPLICIT schema — schema inference
    on 100 TB of JSON is a full extra pass and silently widens types
    on dirty rows; corrupt lines land in ``_corrupt_record`` when the
    schema declares it instead of failing the job."""
    return spark.read.schema(schema).json(path)


def write_training_shards(
    df: DataFrame,
    path: str,
    records_per_file: int,
    order_col: str | None = None,
) -> None:
    """Write parquet shards of at most ``records_per_file`` rows — the
    bounded-size files a training dataloader streams.

    ``maxRecordsPerFile`` enforces the per-file ceiling inside each
    task; the repartition sizes task inputs so files land NEAR the
    ceiling instead of one tiny file per input partition.  With
    ``order_col`` the shards are range-partitioned on it (globally
    sorted shard sequence — deterministic curriculum order); without
    it a round-robin repartition balances shard sizes exactly."""
    n = df.count()
    n_parts = max(1, -(-n // records_per_file))
    if order_col is not None:
        out = df.repartitionByRange(n_parts, order_col).sortWithinPartitions(
            order_col
        )
    else:
        out = df.repartition(n_parts)
    out.write.mode("overwrite").option(
        "maxRecordsPerFile", records_per_file
    ).parquet(path)
