"""Snapshot sink + source: distributed write and read of keyed-state files.

Mirrors the reference's savepoint lifecycle (SURVEY.md §2.1 S2/S3/S7/S8,
§3 EP2) with Spark-native physics:

- **Write** (S7): the only shuffle in the pipeline —
  ``repartition(parallelism, op_index) → sortWithinPartitions(key_group,
  state_id) → mapInPandas`` streaming one file per operator index in the
  key-group section format (writer/functions/RocksDBSavepointWriter.java:
  132-175: per-keygroup sections, state-id shorts, metadata-follows flag on
  the last key of a run, 0xFFFF end-of-key-group mark, per-keygroup offset
  bookkeeping). Only per-file handle metadata is collected to the driver,
  never data rows (OperatorStateWriter.java:253 collects handles only).
- **Metadata** (S8): a driver-side JSON ``_bravo_metadata`` carrying
  max_parallelism/parallelism, the state-name↔id mapping and per-file
  key-group offsets (StateMetadataUtils.java:103-125,189-194 analog).
- **Read** (S2/S3/S5): splits are (file, key-group-ranges); empty key groups
  (no offset recorded) are skipped like ValidOffsetsIterator.java:25-46. One
  Spark partition per split; finer-than-subtask parallelism (split by key
  group) is supported — the reference noted this as future work
  (RocksDBKeyedStateInputFormat.java:46-47).
- **State-name pushdown** (F1): the reader takes a state-name filter that
  skips key/value payload bytes without decoding
  (RocksDBSavepointIterator.java:178-191 semantics, implemented in
  codecs.flink.iter_key_group_section).

At 100 TB: files scale with parallelism × state volume; reads scale with
#splits = #files × #keygroup-chunks, so a 1000-executor cluster gets full
parallelism regardless of the snapshot's original subtask count.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bravo_spark.codecs import flink as fc
from bravo_spark.sources.staterows import (
    STATE_ROW_SCHEMA,
    with_key_group_column,
    with_operator_index_column,
)

METADATA_FILE = "_bravo_metadata"


def _frame_compress(buf: bytes) -> bytes:
    """Per-key-group Snappy compression (StateMetadataUtils.java:142-146 /
    RocksDBSavepointWriter.java:71-72 analog): sections are framed-Snappy
    streams. Dispatch order: the python-snappy C binding if installed,
    else codecs/fastpath.py (pyarrow's libsnappy chunks + numpy-batched
    chunk CRCs inside our framing writer), else the pure-Python codec —
    same wire format all three ways (pinned against org.xerial framed
    streams in tests/test_snappy.py)."""
    try:
        import snappy  # type: ignore

        return snappy.StreamCompressor().compress(buf)
    except ImportError:
        from bravo_spark.codecs import fastpath

        return fastpath.frame_compress(buf)


def _frame_decompress(buf: bytes) -> bytes:
    try:
        import snappy  # type: ignore

        return snappy.StreamDecompressor().decompress(buf)
    except ImportError:
        from bravo_spark.codecs import fastpath

        return fastpath.frame_decompress(buf)


@dataclass
class SavepointMeta:
    max_parallelism: int
    parallelism: int
    state_ids: dict[str, int]  # state name -> state id (positional, §1.2)
    compression: bool = False  # per-key-group Snappy (framed) when True
    files: list[dict] = field(default_factory=list)
    # each file entry: {"path": str, "op_index": int,
    #                   "offsets": {key_group(str): byte offset}}

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": 1,
                "max_parallelism": self.max_parallelism,
                "parallelism": self.parallelism,
                "state_ids": self.state_ids,
                "compression": self.compression,
                "files": self.files,
            },
            indent=1,
        )

    @staticmethod
    def from_json(s: str) -> "SavepointMeta":
        d = json.loads(s)
        return SavepointMeta(
            max_parallelism=d["max_parallelism"],
            parallelism=d["parallelism"],
            state_ids={k: int(v) for k, v in d["state_ids"].items()},
            compression=bool(d.get("compression", False)),
            files=d["files"],
        )


def write_savepoint(
    rows: DataFrame,
    path: str,
    *,
    max_parallelism: int,
    parallelism: int,
    state_ids: dict[str, int] | None = None,
    compression: bool = False,
) -> SavepointMeta:
    """Shuffle state rows to their operator index, sort by (key_group,
    state_id), stream one section file per operator index; assemble metadata
    on the driver from per-file handles.

    ``max_parallelism`` MUST equal the value the rows were encoded with
    (``kv_to_state_rows`` and friends embed a 1- or 2-byte key-group
    prefix inside ``key_ns`` sized by it); the writer re-derives each
    row's key group from that prefix, so a mismatch mis-reads key bytes
    as group bytes. Sections whose derived group falls outside
    ``[0, max_parallelism)`` are refused by name rather than written."""
    spark = rows.sparkSession
    os.makedirs(path, exist_ok=True)
    if state_ids is None:
        names = [r[0] for r in rows.select("state_name").distinct().collect()]
        state_ids = {n: i for i, n in enumerate(sorted(names))}
    ids = dict(state_ids)

    routed = with_key_group_column(rows, max_parallelism=max_parallelism)
    routed = with_operator_index_column(
        routed, max_parallelism=max_parallelism, parallelism=parallelism
    )
    sid_map = F.create_map(*[x for k, v in ids.items() for x in (F.lit(k), F.lit(v))])
    # a caller-supplied state_ids mapping is validated EXECUTOR-side via a
    # -1 sentinel (checked per section below), not by a driver-side
    # distinct() — that pre-check re-ran the entire upstream pipeline (a
    # second full pass over the state relation at 100 TB) just to name
    # missing states before the real one
    routed = routed.withColumn(
        "state_id",
        F.coalesce(sid_map[F.col("state_name")].cast("int"), F.lit(-1)),
    )

    # repartition hashes op_index into `parallelism` partitions, so a
    # partition can receive several operator indexes (hash collision); the
    # in-partition sort leads with op_index and the writer rolls to a new
    # file whenever it changes — still exactly one file per operator index.
    shuffled = routed.repartition(parallelism, "op_index").sortWithinPartitions(
        "op_index", "key_group", "state_id"
    )

    def write_partition(batches: Iterator[pd.DataFrame]):
        # Streaming single-pass writer: rows arrive sorted by (op_index,
        # key_group, state_id); emit one section per key group, track
        # offsets. Mirrors RocksDBSavepointWriter.java:132-166 but writes
        # sections via the codec layer.
        state = {"fh": None, "path": None, "op": None, "kg": None}
        offsets: dict[int, int] = {}
        entries: list[tuple[int, bytes, bytes]] = []
        done: list[tuple[int, str, dict[int, int]]] = []

        def flush_kg():
            if state["fh"] is not None and entries:
                offsets[state["kg"]] = state["fh"].tell()
                buf = fc.write_key_group_section(entries)
                if compression:
                    buf = _frame_compress(buf)
                state["fh"].write(buf)
            entries.clear()

        def close_file():
            flush_kg()
            if state["fh"] is not None:
                state["fh"].close()
                done.append((state["op"], state["path"], dict(offsets)))
                offsets.clear()
                state.update(fh=None, path=None, op=None, kg=None)

        for pdf in batches:
            for kg, opi, sid, kns, val in zip(
                pdf["key_group"], pdf["op_index"], pdf["state_id"],
                pdf["key_ns"], pdf["value"],
            ):
                opi, kg, sid = int(opi), int(kg), int(sid)
                if sid < 0:
                    raise ValueError(
                        "rows contain a state_name with no state_ids "
                        f"entry (provided: {sorted(ids)}) — cover every "
                        "state present, or omit state_ids to derive the "
                        "mapping from the data"
                    )
                # range-check EVERY row, not just group changes: the first
                # group of a section file is recorded at file open, and a
                # single-group file would otherwise never re-compare
                if not 0 <= kg < max_parallelism:
                    raise ValueError(
                        f"derived key group {kg} is outside "
                        f"[0, {max_parallelism}) — rows were encoded "
                        "with a different max_parallelism than "
                        "write_savepoint was given (the key-group "
                        "prefix width inside key_ns no longer matches)"
                    )
                if state["op"] is not None and opi != state["op"]:
                    close_file()
                if state["fh"] is None:
                    fpath = os.path.join(path, f"op-{opi}-{uuid.uuid4().hex}")
                    state.update(fh=open(fpath, "wb"), path=fpath, op=opi, kg=kg)
                if kg != state["kg"]:
                    flush_kg()
                    state["kg"] = kg
                entries.append((sid, bytes(kns), bytes(val)))
        close_file()
        if done:
            yield pd.DataFrame(
                {
                    "op_index": [d[0] for d in done],
                    "file": [d[1] for d in done],
                    "offsets": [
                        json.dumps({str(k): v for k, v in d[2].items()}) for d in done
                    ],
                }
            )

    handle_schema = "op_index int, file string, offsets string"
    handles = (
        shuffled.select("key_group", "op_index", "state_id", "key_ns", "value")
        .mapInPandas(write_partition, schema=handle_schema)
        .collect()  # handles only — KB-scale, like OperatorStateWriter.java:253
    )

    meta = SavepointMeta(max_parallelism, parallelism, ids, compression=compression)
    for h in handles:
        meta.files.append(
            {
                "path": h["file"],
                "op_index": int(h["op_index"]),
                "offsets": {k: int(v) for k, v in json.loads(h["offsets"]).items()},
            }
        )
    with open(os.path.join(path, METADATA_FILE), "w") as f:
        f.write(meta.to_json())
    _ = spark  # session retained for API symmetry
    return meta


def read_savepoint_meta(path: str) -> SavepointMeta:
    with open(os.path.join(path, METADATA_FILE)) as f:
        return SavepointMeta.from_json(f.read())


def read_savepoint(
    spark: SparkSession,
    path: str,
    *,
    state_filter: Callable[[str], bool] | None = None,
    state_names: list[str] | None = None,
    splits_per_file: int | None = None,
) -> DataFrame:
    """Scan a written savepoint back into the universal state-row relation.

    ``state_names``/``state_filter`` are pushed into the byte scan (F1): the
    decoder skips non-selected states' payloads without materializing them.
    Split sizing is byte-targeted (the ``maxPartitionBytes`` posture): each
    file yields ``ceil(bytes / TARGET_SPLIT_BYTES)`` key-group chunks, so a
    tiny savepoint is one task per file while a multi-GB subtask file fans
    out across the cluster. ``splits_per_file`` overrides with a fixed
    per-file count.
    """
    splits, id_to_name, state_filter, compressed = _plan_scan(
        path, state_names, state_filter, splits_per_file
    )
    return _scan_df(spark, splits, id_to_name, state_filter, compressed)


# Per-split byte target for the adaptive scan plan — the Python-side
# analog of spark.sql.files.maxPartitionBytes, sized smaller because each
# byte here crosses the Arrow boundary and is decoded in Python.
TARGET_SPLIT_BYTES = 32 * 1024 * 1024


def _plan_scan(path, state_names, state_filter, splits_per_file=None):
    meta = read_savepoint_meta(path)
    if state_names is not None:
        selected = set(state_names)
        state_filter = lambda n: n in selected  # noqa: E731
    elif state_filter is None:
        state_filter = lambda _n: True  # noqa: E731

    id_to_name = {v: k for k, v in meta.state_ids.items()}

    splits: list[tuple[str, list[tuple[int, int, int]]]] = []
    for fmeta in meta.files:
        size = os.path.getsize(fmeta["path"])
        # valid-offset iteration (S5): only key groups with recorded offsets
        kgs = sorted((int(k), v) for k, v in fmeta["offsets"].items())
        if not kgs:
            continue
        spans = []
        for i, (kg, off) in enumerate(kgs):
            end = kgs[i + 1][1] if i + 1 < len(kgs) else size
            spans.append((kg, off, end))
        total = sum(end - off for _kg, off, end in spans)
        if splits_per_file is None:
            # adaptive: tiny files → one task (job-overhead floor dominates
            # below ~tens of MB); huge files → one task per TARGET bytes,
            # not a fixed 8 — at 100 TB the per-file fan-out must grow with
            # the file, and key groups are the only safe cut points.
            n = max(1, min(-(-total // TARGET_SPLIT_BYTES), len(spans)))
        else:
            n = max(1, min(splits_per_file, len(spans)))
        if n == 1:
            splits.append((fmeta["path"], spans))
            continue
        # greedy byte-balanced packing: key-group sizes skew (hot keys),
        # so cut on accumulated bytes rather than span count
        budget = total / n
        cur: list[tuple[int, int, int]] = []
        acc = 0
        for span in spans:
            cur.append(span)
            acc += span[2] - span[1]
            if acc >= budget:
                splits.append((fmeta["path"], cur))
                cur = []
                acc = 0
        if cur:
            splits.append((fmeta["path"], cur))
    return splits, id_to_name, state_filter, meta.compression


def _split_frame(spark: SparkSession, splits):
    rows = [
        (fpath, json.dumps(spans)) for fpath, spans in splits
    ]
    n = max(1, len(rows))
    return (
        spark.createDataFrame(rows, schema="file string, spans string")
        .repartition(n)  # one scan split per task
    )


def iter_file_spans(fpath, spans, id_to_name, state_filter, compressed=False):
    """The byte-scan inner loop shared by every scan front end (mapInPandas
    readers here, the bravo_savepoint DataSource): open one section file,
    read the given (key_group, start, end) spans, decompress when the
    savepoint is Snappy-framed, and decode → (state_name, key_ns, value)."""
    with open(fpath, "rb") as f:
        for _kg, off, end in spans:
            f.seek(off)
            buf = f.read(end - off)
            if compressed:
                buf = _frame_decompress(buf)
            yield from fc.iter_key_group_section(buf, id_to_name, state_filter)


def _scan_splits(pdf_iter, id_to_name, state_filter, compressed=False):
    for pdf in pdf_iter:
        for fpath, spans_json in zip(pdf["file"], pdf["spans"]):
            names, keys, vals = [], [], []
            for name, key, val in iter_file_spans(
                fpath, json.loads(spans_json), id_to_name, state_filter,
                compressed,
            ):
                names.append(name)
                keys.append(key)
                vals.append(val)
            yield pd.DataFrame(
                {"state_name": names, "key_ns": keys, "value": vals},
                columns=["state_name", "key_ns", "value"],
            )


def _scan_df(spark, splits, id_to_name, state_filter, compressed=False) -> DataFrame:
    """Arrow-batched scan: split metadata DataFrame → mapInPandas decoder.
    One Python hop, no row pickling (vs. parallelize+createDataFrame)."""
    from bravo_spark.sources.staterows import STATE_ROW_SCHEMA as _schema

    return _split_frame(spark, splits).mapInPandas(
        lambda it: _scan_splits(it, id_to_name, state_filter, compressed),
        schema=_schema,
    )


def read_savepoint_kv(
    spark: SparkSession,
    path: str,
    state_name: str,
    key_codec,
    value_codec,
    *,
    max_parallelism: int | None = None,
    ttl: bool = False,
    splits_per_file: int | None = None,
) -> DataFrame:
    """Fused S2+P1: scan *and* decode one value state in a single Python
    hop — the exact analog of the reference's flatMap readers, which filter
    + project + deserialize inside the scan (reader/ValueStateKVReader.java:
    39-62). Saves one Arrow exchange vs read_savepoint → read_value_kv.

    ``max_parallelism`` defaults to the value recorded in the savepoint's
    own metadata — the key-group prefix width (1 vs 2 bytes) depends on it,
    so a wrong value silently mis-splits every key."""
    from bravo_spark.codecs import flink as _fc
    from bravo_spark.sources.staterows import spark_type_for

    from pyspark.sql.types import StructField, StructType

    if max_parallelism is None:
        max_parallelism = read_savepoint_meta(path).max_parallelism
    key_codec = _fc.unwrap_tuple1_key(key_codec)  # reference Tuple1 parity

    splits, id_to_name, state_filter, compressed = _plan_scan(
        path, [state_name], None, splits_per_file
    )
    prefix = _fc.key_group_prefix_bytes(max_parallelism)
    schema = StructType(
        [
            StructField("key", spark_type_for(key_codec), True),
            StructField("value", spark_type_for(value_codec), True),
        ]
    )

    from bravo_spark.codecs import vectorized as vz

    use_fast = vz.is_fixed(key_codec) and vz.is_fixed(value_codec)

    def scan_decode(pdf_iter):
        for pdf in pdf_iter:
            raw_keys: list[bytes] = []
            raw_vals: list[bytes] = []
            for fpath, spans_json in zip(pdf["file"], pdf["spans"]):
                for _n, kns, raw in iter_file_spans(
                    fpath, json.loads(spans_json), id_to_name, state_filter,
                    compressed,
                ):
                    raw_keys.append(kns)
                    raw_vals.append(raw)
            fast = (
                vz.decode_kv_fixed(
                    raw_keys, raw_vals, key_codec, value_codec,
                    max_parallelism, ttl=ttl,
                )
                if use_fast
                else None
            )
            if fast is not None:
                yield pd.DataFrame({"key": fast[0], "value": fast[1]})
                continue
            keys, vals = [], []
            for kns, raw in zip(raw_keys, raw_vals):
                r = fc.ByteReader(kns, prefix)
                keys.append(key_codec.decode(r))
                vals.append(fc.decode_value_state(raw, value_codec, ttl=ttl))
            yield pd.DataFrame({"key": keys, "value": vals}, columns=["key", "value"])

    return _split_frame(spark, splits).mapInPandas(scan_decode, schema=schema)


LATEST_POINTER = "LATEST"


def streaming_savepoint_sink(
    path: str,
    state_name: str,
    key_codec,
    value_codec,
    *,
    max_parallelism: int = 128,
    parallelism: int = 1,
    key_col: str = "key",
    value_col: str = "value",
    keep_history: bool = True,
):
    """A ``foreachBatch`` function that maintains a FLINK-READABLE mirror
    of a streaming aggregation's state: every micro-batch (complete-mode
    output) is serialized as a full savepoint under
    ``{path}/batch-{id}/`` and ``{path}/LATEST`` flips to it atomically
    (write-temp + ``os.replace``), so a Flink-side consumer — or this
    engine's own savepoint source — always sees one consistent snapshot
    and never a half-written one. ``keep_history=False`` deletes the
    superseded batch dir after the pointer flip (the pointer is already
    durable, so a crash between the two steps leaves only garbage, never
    a dangling pointer).

    Use with ``.outputMode("complete")`` — each batch must carry the
    FULL keyed result, exactly the savepoint semantic. Read the mirror
    back with :func:`latest_savepoint_path` + ``read_savepoint``."""

    def write_batch(df, batch_id: int) -> None:
        import shutil

        from bravo_spark.sources import staterows as sr

        target = os.path.join(path, f"batch-{batch_id}")
        kv = df.select(
            df[key_col].alias("key"), df[value_col].alias("value")
        )
        rows = sr.kv_to_state_rows(
            kv, state_name, key_codec, value_codec,
            max_parallelism=max_parallelism,
        )
        write_savepoint(
            rows, target,
            max_parallelism=max_parallelism, parallelism=parallelism,
        )
        prev = latest_savepoint_path(path)
        tmp = os.path.join(path, f".{LATEST_POINTER}.tmp")
        with open(tmp, "w") as f:
            f.write(f"batch-{batch_id}")
        os.replace(tmp, os.path.join(path, LATEST_POINTER))
        if not keep_history and prev is not None and prev != target:
            shutil.rmtree(prev, ignore_errors=True)

    return write_batch


def latest_savepoint_path(path: str) -> str | None:
    """The directory ``{path}/LATEST`` points to, or None before the
    first committed batch."""
    p = os.path.join(path, LATEST_POINTER)
    if not os.path.exists(p):
        return None
    return os.path.join(path, open(p).read().strip())
