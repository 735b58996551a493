"""WARC source (sources/warc_source.py): batch read, and the streaming
restart-continuation proof — archives landing AFTER the first drain are
picked up by a restarted query from the same checkpoint, exactly once.
"""

from __future__ import annotations

import os

import pytest

from bravo_spark.codecs.warc import write_warc
from bravo_spark.sources.warc_source import read_warc, read_warc_stream


def _shard(path: str, name: str, docs: list[tuple[int, bytes]]) -> None:
    recs = [
        ({"WARC-Type": "conversion", "WARC-Target-URI": f"doc://{i}"}, p)
        for i, p in docs
    ]
    with open(os.path.join(path, name), "wb") as f:
        f.write(write_warc(recs))


def test_batch_read(spark, tmp_path):
    d = str(tmp_path / "drop")
    os.makedirs(d)
    _shard(d, "s1.warc.gz", [(1, b"alpha"), (2, b"beta")])
    _shard(d, "s2.warc.gz", [(3, b"gamma")])
    rows = {r.uri: r for r in read_warc(spark, d).collect()}
    assert set(rows) == {"doc://1", "doc://2", "doc://3"}
    assert bytes(rows["doc://3"].payload) == b"gamma"
    assert rows["doc://2"].n_bytes == 4
    assert rows["doc://1"].warc_type == "conversion"
    assert rows["doc://1"].archive.endswith("s1.warc.gz")


def test_streaming_restart_continuation(spark, tmp_path):
    d = str(tmp_path / "drop")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(d)
    _shard(d, "s1.warc.gz", [(1, b"alpha"), (2, b"beta")])

    def drain():
        # parquet sink: fault-tolerant, so a RESTART from the same
        # checkpoint is legal (the memory sink refuses recovery)
        q = (
            read_warc_stream(spark, d)
            .select("uri", "n_bytes")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r.uri for r in spark.read.parquet(out).collect()}

    assert drain() == {"doc://1", "doc://2"}
    # a new shard lands; a restarted query from the same checkpoint must
    # process ONLY the new archive (exactly-once at file grain)
    _shard(d, "s2.warc.gz", [(3, b"gamma"), (4, b"delta")])
    assert drain() == {"doc://1", "doc://2", "doc://3", "doc://4"}
    # nothing new -> the sink gains no rows (no reprocess)
    total_before = spark.read.parquet(out).count()
    assert drain() == {"doc://1", "doc://2", "doc://3", "doc://4"}
    assert spark.read.parquet(out).count() == total_before == 4


def test_glob_filters_non_archives(spark, tmp_path):
    d = str(tmp_path / "drop")
    os.makedirs(d)
    _shard(d, "s1.warc.gz", [(1, b"alpha")])
    with open(os.path.join(d, "notes.txt"), "wb") as f:
        f.write(b"not an archive")
    assert read_warc(spark, d).count() == 1


def test_torn_archive_fails_loudly(spark, tmp_path):
    d = str(tmp_path / "drop")
    os.makedirs(d)
    _shard(d, "s1.warc.gz", [(1, b"alpha" * 100)])
    blob = open(os.path.join(d, "s1.warc.gz"), "rb").read()
    with open(os.path.join(d, "s1.warc.gz"), "wb") as f:
        f.write(blob[:-7])
    with pytest.raises(Exception, match="WarcError|gzip|truncated"):
        read_warc(spark, d).count()
