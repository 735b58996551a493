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


def _response_archive(tmp_path, name, messages):
    """One .warc.gz of WARC-Type: response records."""
    import os

    from bravo_spark.codecs.warc import write_warc

    recs = [
        ({"WARC-Type": "response", "WARC-Target-URI": uri,
          "WARC-Date": "2026-01-01T00:00:00Z",
          "Content-Type": "application/http; msgtype=response"}, msg)
        for uri, msg in messages
    ]
    src = str(tmp_path / "raw")
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "wb") as f:
        f.write(write_warc(recs))
    return src


def test_wet_convert_end_to_end(spark, tmp_path):
    """The Common Crawl WET loop: raw response archives in, conversion
    archives out, torn captures quarantined (counted, never written),
    and the output readable back through the SAME reader the WET ingest
    path uses."""
    from bravo_spark.sources.warc_source import read_warc, wet_convert

    html = b"<html><body><p>hello &amp; goodbye</p></body></html>"
    good = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=UTF-8\r\n"
            + b"Content-Length: %d\r\n\r\n" % len(html) + html)
    chunked = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
               b"Transfer-Encoding: chunked\r\n\r\n"
               + b"%x\r\n" % len(html) + html + b"\r\n0\r\n\r\n")
    torn = (b"HTTP/1.1 200 OK\r\nContent-Length: 999\r\n\r\nshort")
    src = _response_archive(tmp_path, "a.warc.gz", [
        ("http://x.example/1", good),
        ("http://x.example/2", chunked),
        ("http://x.example/3", torn),
    ])
    dst = str(tmp_path / "wet")
    report = wet_convert(spark, src, dst)
    assert report["converted"] == 2
    assert report["quarantined"] == 1
    # the drop profile is observable per cause, with byte offsets
    # collapsed so reason cardinality stays bounded
    assert report["quarantine_reasons"] == {
        "Content-Length # but only # captured body bytes — torn capture": 1
    }

    back = {r.uri: r for r in read_warc(spark, dst).collect()}
    assert set(back) == {"http://x.example/1", "http://x.example/2"}
    for r in back.values():
        assert r.warc_type == "conversion"
        assert bytes(r.payload).decode() == "hello & goodbye"

    # strict mode fails loudly on the torn capture instead
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises(PythonException, match="torn capture"):
        wet_convert(spark, src, str(tmp_path / "wet2"), quarantine=False)


def test_write_warc_shards_deterministic_and_sharded(spark, tmp_path):
    """Same input → byte-identical archives (pinned warc_date, mtime-0
    gzip members), one shard per partition, readable back."""
    import hashlib
    import os

    from bravo_spark.sources.warc_source import read_warc, write_warc_shards

    df = spark.createDataFrame(
        [(f"doc://{i}", f"text {i}".encode()) for i in range(20)],
        "uri string, payload binary",
    ).repartition(4)
    digests = []
    for run in ("w1", "w2"):
        out = str(tmp_path / run)
        n = write_warc_shards(df, out)
        assert n == 20
        shards = sorted(os.listdir(out))
        assert len([s for s in shards if s.endswith(".warc.gz")]) == 4
        digests.append(hashlib.md5(b"".join(
            open(os.path.join(out, s), "rb").read() for s in shards
        )).hexdigest())
    assert digests[0] == digests[1]
    got = read_warc(spark, str(tmp_path / "w1")).collect()
    assert sorted(bytes(r.payload).decode() for r in got) \
        == sorted(f"text {i}" for i in range(20))

    with pytest.raises(ValueError, match="compression"):
        write_warc_shards(df, str(tmp_path / "w3"), compression="7z")


def test_wet_convert_stream_restart_exactly_once(spark, tmp_path):
    """The continuous WET pipeline: drop shard A, drain; drop shard B,
    drain from the SAME checkpoint — A's records appear exactly once in
    the output tree, B's join them; an empty third drain adds nothing."""
    from bravo_spark.sources.warc_source import read_warc, wet_convert_stream

    html = b"<html><p>page body</p></html>"
    msg = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
           + b"Content-Length: %d\r\n\r\n" % len(html) + html)
    src = str(tmp_path / "drop")
    dst = str(tmp_path / "wet")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def shard(name, uris):
        from bravo_spark.codecs.warc import write_warc

        recs = [({"WARC-Type": "response", "WARC-Target-URI": u,
                  "WARC-Date": "2026-01-01T00:00:00Z"}, msg) for u in uris]
        with open(os.path.join(src, name), "wb") as f:
            f.write(write_warc(recs))

    def drain():
        q = wet_convert_stream(spark, src, dst, ckpt)
        assert q.awaitTermination(180)
        got = read_warc(spark, dst, recursive=True)
        return sorted(r.uri for r in got.collect())

    shard("a.warc.gz", ["http://x/1", "http://x/2"])
    assert drain() == ["http://x/1", "http://x/2"]
    shard("b.warc.gz", ["http://x/3"])
    assert drain() == ["http://x/1", "http://x/2", "http://x/3"]
    assert drain() == ["http://x/1", "http://x/2", "http://x/3"]
    # payloads are the stripped text, written as conversion records
    rec = read_warc(spark, dst, recursive=True).collect()[0]
    assert rec.warc_type == "conversion"
    assert bytes(rec.payload).decode() == "page body"


def test_write_warc_shards_file_uri(spark, tmp_path):
    """Shard IO goes through pyarrow.fs, so a filesystem URI target
    works — the posture that reaches object storage on a real cluster
    (a bare executor-side open() only ever reaches local disk). Both
    Hadoop-style file:/ and RFC file:/// forms resolve, the written
    tree is byte-identical to a plain-path write, and read_warc (Spark's
    own Hadoop FS) reads it back."""
    import hashlib

    from bravo_spark.sources.warc_source import write_warc_shards

    df = spark.createDataFrame(
        [(f"doc://{i}", f"text {i}".encode()) for i in range(8)],
        "uri string, payload binary",
    ).repartition(2)

    plain = str(tmp_path / "plain")
    hadoop_uri = "file:" + str(tmp_path / "h1")
    rfc_uri = "file://" + str(tmp_path / "h2")
    assert write_warc_shards(df, plain) == 8
    assert write_warc_shards(df, hadoop_uri) == 8
    assert write_warc_shards(df, rfc_uri) == 8

    def tree_md5(d):
        names = sorted(os.listdir(d))
        assert names, f"no shards under {d}"
        return [
            (n, hashlib.md5(open(os.path.join(d, n), "rb").read())
             .hexdigest())
            for n in names
        ]

    assert tree_md5(plain) == tree_md5(str(tmp_path / "h1")) \
        == tree_md5(str(tmp_path / "h2"))
    got = read_warc(spark, "file://" + str(tmp_path / "h1")).collect()
    assert sorted(bytes(r.payload).decode() for r in got) \
        == sorted(f"text {i}" for i in range(8))


def test_wet_convert_stream_file_uri_dst(spark, tmp_path):
    """The WET loop's epoch-dir replace goes through the same pyarrow
    filesystem as the shard writes: a file:// dst drains and re-drains
    idempotently (the crash-replay delete path exercises the fs route)."""
    from bravo_spark.sources.warc_source import wet_convert_stream

    html = b"<html><p>fs page</p></html>"
    msg = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
           + b"Content-Length: %d\r\n\r\n" % len(html) + html)
    src = str(tmp_path / "drop")
    dst = "file://" + str(tmp_path / "wet")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    recs = [({"WARC-Type": "response", "WARC-Target-URI": "http://x/1",
              "WARC-Date": "2026-01-01T00:00:00Z"}, msg)]
    with open(os.path.join(src, "a.warc.gz"), "wb") as f:
        f.write(write_warc(recs))

    for _ in range(2):  # second drain replays nothing, adds nothing
        q = wet_convert_stream(spark, src, dst, ckpt)
        assert q.awaitTermination(180)
        got = read_warc(spark, dst, recursive=True).collect()
        assert [r.uri for r in got] == ["http://x/1"]
        assert bytes(got[0].payload).decode() == "fs page"


def test_wet_convert_zstd_encoded_capture(spark, tmp_path):
    """A response entity stored with Content-Encoding: zstd (real
    Common Crawl captures carry it) converts through the WET loop."""
    import pyarrow as pa

    from bravo_spark.sources.warc_source import read_warc, wet_convert

    html = b"<html><body><p>zstd page body</p></body></html>"
    buf = pa.BufferOutputStream()
    with pa.output_stream(buf, compression="zstd") as s:
        s.write(html)
    frame = bytes(buf.getvalue())
    msg = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
           b"Content-Encoding: zstd\r\n"
           + b"Content-Length: %d\r\n\r\n" % len(frame) + frame)
    recs = [({"WARC-Type": "response", "WARC-Target-URI": "http://z/1",
              "WARC-Date": "2026-01-01T00:00:00Z"}, msg)]
    src = str(tmp_path / "raw")
    os.makedirs(src)
    with open(os.path.join(src, "a.warc.gz"), "wb") as f:
        f.write(write_warc(recs))
    report = wet_convert(spark, src, str(tmp_path / "wet"))
    assert report["converted"] == 1 and report["quarantined"] == 0
    rec = read_warc(spark, str(tmp_path / "wet")).collect()[0]
    assert bytes(rec.payload).decode() == "zstd page body"
