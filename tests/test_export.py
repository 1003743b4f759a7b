"""Corpus interchange sinks: JSONL roundtrip (explicit schema, corrupt
line isolation) and bounded-size training shards."""

from __future__ import annotations

import glob
import json

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from curw_wrf_data_pusher_spark.sinks.export import (
    read_jsonl,
    write_jsonl,
    write_training_shards,
)
from curw_wrf_data_pusher_spark.sources.lake import load_table


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 50
    )
    path = str(tmp_path / "corpus_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(
        spark, path,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, back.select(*docs.columns).collect()))
    assert a == b
    # every line parses as standalone JSON (interchange contract)
    line = open(glob.glob(f"{path}/part-*")[0]).readline()
    assert set(json.loads(line)) == set(docs.columns)


def test_jsonl_corrupt_line_isolated(spark, tmp_path):
    path = str(tmp_path / "dirty")
    import os

    os.makedirs(path)
    with open(f"{path}/a.jsonl", "w") as f:
        f.write('{"doc_id": 1, "text": "ok"}\n')
        f.write("NOT JSON AT ALL\n")
        f.write('{"doc_id": 2, "text": "also ok"}\n')
    back = read_jsonl(
        spark, path, "doc_id long, text string, _corrupt_record string"
    )
    rows = back.collect()
    good = [r for r in rows if r.doc_id is not None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(good) == 2 and len(bad) == 1


def test_training_shards_bounded_and_complete(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, records_per_file=64)
    files = glob.glob(f"{path}/part-*.parquet")
    sizes = [pq.read_metadata(f).num_rows for f in files]
    assert all(s <= 64 for s in sizes)
    assert sum(sizes) == n
    # balanced: no shard under half the ceiling except possibly one tail
    assert sum(1 for s in sizes if s < 32) <= 1
    back = spark.read.parquet(path)
    assert back.count() == n


def test_training_shards_ordered(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "ordered")
    write_training_shards(docs, path, records_per_file=100,
                          order_col="doc_id")
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["doc_id"])
        ids = t.column("doc_id").to_pylist()
        assert ids == sorted(ids)  # sorted within shard
        ranges.append((min(ids), max(ids)))
    # shards form disjoint ranges (global order across the sequence)
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2


def test_read_csv_table_quarantines_corrupt_rows(spark, tmp_path):
    from curw_wrf_data_pusher_spark.sources.text import (
        read_csv_table,
        split_corrupt,
    )

    p = tmp_path / "drop.csv"
    p.write_text(
        "id,name,score\n"
        "1,alpha,0.5\n"
        "2,beta,not_a_number\n"     # malformed numeric
        "3,gamma,1.25\n"
    )
    df = read_csv_table(
        spark, str(p), "id long, name string, score double"
    )
    clean, bad = split_corrupt(df)
    rows = {r.id: (r.name, r.score) for r in clean.collect()}
    assert rows == {1: ("alpha", 0.5), 3: ("gamma", 1.25)}
    bad_rows = [r._corrupt_record for r in bad.collect()]
    assert bad_rows == ["2,beta,not_a_number"]
    assert "_corrupt_record" not in clean.columns


def test_orc_roundtrip(spark, tmp_path):
    """ORC sits beside parquet as a first-class columnar interchange
    format; the engine needs nothing beyond the builtin reader/writer,
    pinned here so the capability stays exercised."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "t.orc")
    df = spark.range(1000).select(
        "id",
        (F.col("id") % 7).alias("g"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    df.write.orc(p)
    back = spark.read.orc(p)
    # nullability widens on read-back (range() ids are non-null at
    # write); names and types are the roundtrip contract
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in df.schema
    ]
    assert back.count() == 1000
    assert (
        back.agg(F.sum("id")).collect()[0][0]
        == df.agg(F.sum("id")).collect()[0][0]
    )
