"""sources/shard_manifest.py: the shard-directory handoff contract —
deterministic manifest, distributed digesting, named refusals for
missing/extra/changed shards, across all four container sinks."""

from __future__ import annotations

import json
import os

import pytest

from bravo_spark.sources.shard_manifest import (
    MANIFEST_NAME,
    ShardManifestError,
    verify_shards,
    write_shard_manifest,
)
from bravo_spark.sources.zip_source import read_zip_shards, write_zip_shards


def _shards(spark, tmp_path, name="drop"):
    df = spark.createDataFrame(
        [(f"{i:04d}.txt", f"body {i}") for i in range(9)],
        "name string, body string",
    ).repartition(3)
    out = str(tmp_path / name)
    write_zip_shards(df, out, "name", "body")
    return out


def test_manifest_roundtrip_and_determinism(spark, tmp_path):
    out = _shards(spark, tmp_path)
    m1 = write_shard_manifest(spark, out)
    assert m1["n_shards"] == 3
    raw1 = open(os.path.join(out, MANIFEST_NAME), "rb").read()
    m2 = write_shard_manifest(spark, out)
    assert m1 == m2
    assert open(os.path.join(out, MANIFEST_NAME), "rb").read() == raw1

    ok = verify_shards(spark, out)
    assert ok["n_shards"] == 3
    assert ok["n_bytes"] == sum(
        v["bytes"] for v in m1["shards"].values())

    # the sidecar is invisible to data readers over the directory
    assert read_zip_shards(spark, out).count() == 9


def test_changed_missing_extra_shards_refuse_by_name(spark, tmp_path):
    out = _shards(spark, tmp_path)
    write_shard_manifest(spark, out)

    # changed: flip one byte in a shard (any byte moves the md5)
    target = os.path.join(out, "shard_00001.zip")
    blob = bytearray(open(target, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(target, "wb").write(bytes(blob))
    with pytest.raises(ShardManifestError, match="shard_00001.zip"):
        verify_shards(spark, out)

    # missing: remove it entirely
    os.remove(target)
    with pytest.raises(ShardManifestError, match="missing.*shard_00001"):
        verify_shards(spark, out)

    # extra: a shard the manifest never recorded
    os.rename(os.path.join(out, "shard_00000.zip"),
              os.path.join(out, "shard_00009.zip"))
    with pytest.raises(ShardManifestError,
                       match="extra.*shard_00009"):
        verify_shards(spark, out)


def test_empty_dir_and_absent_or_torn_manifest_refuse(spark, tmp_path):
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(ShardManifestError, match="refusing to write"):
        write_shard_manifest(spark, empty, glob="*.zip")

    out = _shards(spark, tmp_path, "nomanifest")
    with pytest.raises(ShardManifestError, match="no readable"):
        verify_shards(spark, out)

    write_shard_manifest(spark, out)
    with open(os.path.join(out, MANIFEST_NAME), "wb") as f:
        f.write(b"{torn")
    with pytest.raises(ShardManifestError, match="no readable"):
        verify_shards(spark, out)
    with open(os.path.join(out, MANIFEST_NAME), "w") as f:
        json.dump({"format": "something-else"}, f)
    with pytest.raises(ShardManifestError, match="unknown manifest"):
        verify_shards(spark, out)


def test_works_across_container_types_and_uris(spark, tmp_path):
    """The same manifest primitive covers every container sink — prove
    it on TFRecord and WebDataset output, through a file:// URI."""
    from pyspark.sql import functions as F

    from bravo_spark.sources.tfrecord_source import (
        encode_examples,
        write_tfrecord_shards,
    )
    from bravo_spark.sources.webdataset_source import (
        write_webdataset_shards,
    )

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(6)], "doc_id long, text string"
    ).repartition(2)

    tf_out = str(tmp_path / "tf")
    write_tfrecord_shards(encode_examples(df, ["doc_id", "text"]), tf_out)
    write_shard_manifest(spark, "file://" + tf_out, glob="*.tfrecord")
    assert verify_shards(spark, tf_out)["n_shards"] == 2

    wds = df.select(F.format_string("%06d", "doc_id").alias("key"),
                    F.col("text").alias("txt"))
    w_out = str(tmp_path / "wds")
    write_webdataset_shards(wds, w_out, "key", {"txt": "txt"})
    write_shard_manifest(spark, w_out, glob="*.tar")
    assert verify_shards(spark, "file://" + w_out)["n_shards"] == 2


def test_right_format_wrong_body_refuses_by_name(spark, tmp_path):
    """A manifest with the correct format string but a missing or
    non-dict 'shards' map refuses as ShardManifestError, never a bare
    KeyError/TypeError."""
    out = _shards(spark, tmp_path, "wrongbody")
    for body in ({"format": "bravo-shard-manifest/1"},
                 {"format": "bravo-shard-manifest/1", "shards": ["x"]},
                 {"format": "bravo-shard-manifest/1",
                  "shards": {"a": "notadict"}}):
        with open(os.path.join(out, MANIFEST_NAME), "w") as f:
            json.dump(body, f)
        with pytest.raises(ShardManifestError, match="malformed"):
            verify_shards(spark, out)
