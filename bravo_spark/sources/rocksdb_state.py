"""Spark Structured Streaming RocksDB state-store source.

Completes the state-surgery surface (sources/spark_state.py covers the
HDFSBackedStateStoreProvider): RocksDBStateStoreProvider checkpoints —
Spark's recommended backend for large state — are read WITHOUT the native
RocksDB library, by combining

- the RocksDBFileManager layout (``<ckpt>/state/<op>/<partition>/
  <version>.zip`` holding a ``metadata`` member that lists the live SST
  files as ``localFileName → dfsSstFileName``, the SSTs themselves under
  ``<partition>/SSTs/``), with
- our pure-Python BlockBasedTable reader (sources/sst.py — the same one
  that reads the reference's Flink incremental checkpoints, reference
  RocksDBCheckpointIterator.java:57-254), extended here with the LZ4 block
  codec and format_version≥4 delta-encoded index blocks that Spark's
  RocksDB build emits.

Records are ``[1-byte STATE_ENCODING_VERSION = 0][UnsafeRow bytes]`` on
both key and value (RocksDBStateEncoder); the UnsafeRow codec is shared
with the HDFS-backed reader. Each state partition's SST set is
self-contained, so LSM resolution (highest seq wins, tombstones drop the
key) happens task-locally — one Spark task per state partition, zero
shuffles, the same split the store itself uses. A given ``version``
selects that commit's zip: reading an older version is state time travel.
"""

from __future__ import annotations

import json
import os
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from bravo_spark.sources import sst as sstmod
from bravo_spark.sources.spark_state import (
    _check_schema,
    decode_unsafe_row,
    read_state_schema,
)

STATE_ENCODING_VERSION = 0


def _state_dir(checkpoint_dir: str, operator_id: int, store_name: str) -> str:
    base = os.path.join(checkpoint_dir, "state", str(operator_id))
    return base if store_name == "default" else os.path.join(base, store_name)


def _partition_dirs(sdir: str) -> list[int]:
    return sorted(int(d) for d in os.listdir(sdir) if d.isdigit())


def _version_metadata(pdir: str, version: int) -> dict:
    """The RocksDBFileManager metadata for one committed version: a zip
    member ``metadata`` of ``v1\\n{json}``."""
    with zipfile.ZipFile(os.path.join(pdir, f"{version}.zip")) as z:
        raw = z.read("metadata")
    header, _, body = raw.partition(b"\n")
    if header.strip() != b"v1":
        raise ValueError(f"unsupported RocksDB checkpoint metadata {header!r}")
    return json.loads(body)


def latest_version(
    checkpoint_dir: str, operator_id: int = 0, store_name: str = "default"
) -> int:
    sdir = _state_dir(checkpoint_dir, operator_id, store_name)
    vers = [
        int(stem)
        for p in _partition_dirs(sdir)
        for f in os.listdir(os.path.join(sdir, str(p)))
        for stem, _, ext in [f.partition(".")]
        if ext in ("zip", "changelog") and stem.isdigit()
    ]
    if not vers:
        raise FileNotFoundError(f"no committed RocksDB versions under {sdir}")
    return max(vers)


def _load_partition_state(pdir: str, version: int) -> dict[bytes, bytes]:
    """One partition's state at ``version``.

    Two on-disk shapes, matching RocksDBStateStoreProvider's two commit
    modes: every version has a full ``{v}.zip`` (default), or — with
    changelog checkpointing (``...stateStore.rocksdb.changelogCheckpointing
    .enabled``) — a ``{v}.changelog`` of the version's puts/deletes, with
    zip snapshots only when background maintenance uploads one. State =
    greatest zip ≤ version, then changelogs replayed up to version. The
    changelog is lz4-java/snappy framed with the same int-length-prefixed
    record layout as the HDFS provider's delta files, so the framing and
    record iterator are shared with sources/spark_state.py."""
    if os.path.exists(os.path.join(pdir, f"{version}.changelog")):
        from bravo_spark.sources.spark_state import _iter_records, decode_stream

        zips = [
            int(f.partition(".")[0])
            for f in os.listdir(pdir)
            if f.endswith(".zip")
            and f.partition(".")[0].isdigit()
            and int(f.partition(".")[0]) <= version
        ]
        state = _load_zip_state(pdir, max(zips)) if zips else {}
        for ver in range(max(zips) + 1 if zips else 1, version + 1):
            path = os.path.join(pdir, f"{ver}.changelog")
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"missing changelog {path} for version {version}"
                )
            for k, v in _iter_records(decode_stream(open(path, "rb").read())):
                if v is None:
                    state.pop(k, None)
                else:
                    state[k] = v
        return state
    return _load_zip_state(pdir, version)


def _load_zip_state(pdir: str, version: int) -> dict[bytes, bytes]:
    """Resolve one partition's LSM at ``version``: union the version's live
    SSTs, keep the highest-seq record per key, drop tombstones."""
    meta = _version_metadata(pdir, version)
    if meta.get("columnFamilyMapping"):
        raise ValueError(
            "virtual column families (transformWithState stores) not "
            "supported yet; found mapping "
            f"{sorted(meta['columnFamilyMapping'])}"
        )
    best: dict[bytes, tuple[int, int, bytes]] = {}
    for entry in meta.get("sstFiles", []):
        path = os.path.join(pdir, "SSTs", entry["dfsSstFileName"])
        for ukey, seq, vtype, value in sstmod.SstReader(path).iter_entries():
            if vtype == sstmod.TYPE_MERGE:
                raise ValueError(
                    "merge operands unexpected in Spark state stores"
                )
            cur = best.get(ukey)
            if cur is None or seq > cur[0]:
                best[ukey] = (seq, vtype, value)
    return {
        k: v for k, (_seq, vtype, v) in best.items()
        if vtype == sstmod.TYPE_VALUE
    }


def _strip_version_byte(buf: bytes, what: str) -> bytes:
    if not buf or buf[0] != STATE_ENCODING_VERSION:
        raise ValueError(
            f"unexpected {what} encoding version "
            f"{buf[:1].hex() if buf else '<empty>'}"
        )
    return buf[1:]


def read_rocksdb_spark_state(
    spark: SparkSession,
    checkpoint_dir: str,
    *,
    operator_id: int = 0,
    version: int | None = None,
    store_name: str = "default",
) -> DataFrame:
    """A RocksDB state-store operator's state as a DataFrame —
    ``partition_id`` + key columns + value columns, same surface as the
    HDFS-backed ``read_spark_state``. One task per state partition; each
    task opens only its partition's zip + SSTs."""
    if version is None:
        version = latest_version(checkpoint_dir, operator_id, store_name)
    key_schema, value_schema = read_state_schema(checkpoint_dir, operator_id)
    _check_schema(key_schema)
    _check_schema(value_schema)
    sdir = _state_dir(checkpoint_dir, operator_id, store_name)
    parts = _partition_dirs(sdir)

    key_names = [f.name for f in key_schema.fields]
    val_names = [
        (f"value_{f.name}" if f.name in key_names else f.name)
        for f in value_schema.fields
    ]
    out_schema = T.StructType(
        [T.StructField("partition_id", T.IntegerType(), False)]
        + [T.StructField(n, f.dataType, True) for n, f in zip(key_names, key_schema.fields)]
        + [T.StructField(n, f.dataType, True) for n, f in zip(val_names, value_schema.fields)]
    )

    def scan(pids):
        for pid in pids:
            state = _load_partition_state(os.path.join(sdir, str(pid)), version)
            for kb, vb in state.items():
                yield (
                    (pid,)
                    + decode_unsafe_row(_strip_version_byte(kb, "key"), key_schema)
                    + decode_unsafe_row(_strip_version_byte(vb, "value"), value_schema)
                )

    rdd = spark.sparkContext.parallelize(parts, max(1, len(parts)))
    return spark.createDataFrame(rdd.mapPartitions(lambda it: scan(list(it))), out_schema)
