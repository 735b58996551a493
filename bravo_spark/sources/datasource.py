"""Savepoint scan as a first-class PySpark Python DataSource.

``spark.read.format("bravo_savepoint").load(path)`` yields the universal
state-row relation (state_name, key_ns, value) through Spark's own source
integration (``pyspark.sql.datasource``, Spark 4.x) instead of the
mapInPandas fallback — same bytes, same splits, but the scan now
participates in Spark's planning like any native source:

- **Filter pushdown (F1 through the engine API)**: ``EqualTo``/``In``
  predicates on ``state_name`` reach :meth:`DataSourceReader.pushFilters`
  (Spark 4.1) and are translated into the byte-scan's state filter — the
  decoder then length-skips non-selected states' payloads, and the
  pushed predicate disappears from Spark's post-scan filter. The
  reference achieves the same effect inside its InputFormat
  (reader/inputformat/RocksDBKeyedStateInputFormat.java:46-47); here it
  is the engine's own pushdown contract doing it.
- **Byte-targeted partition planning**: one :class:`InputPartition` per
  ``_plan_scan`` split (the ``maxPartitionBytes``-posture sizing shared
  with ``read_savepoint``), so tiny savepoints are one task per file and
  multi-GB subtask files fan out.
- **Arrow batches**: ``read`` yields ``pyarrow.RecordBatch`` — the
  zero-pickling path through the Python worker.

``read_savepoint`` (sources/savepoint.py) remains the library-call path;
this module is the ``spark.read`` front door for the same scan. Register
once per session with :func:`register` (idempotent).
"""

from __future__ import annotations

import json

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    In,
    InputPartition,
    WriterCommitMessage,
)


@dataclass
class SavepointCommit(WriterCommitMessage):
    files: str  # JSON list of {path, op_index, offsets}

STATE_ROW_DDL = "state_name string, key_ns binary, value binary"


class SavepointDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "bravo_savepoint"

    def schema(self) -> str:
        return STATE_ROW_DDL

    def reader(self, schema) -> "SavepointScanReader":
        return SavepointScanReader(self.options)

    def writer(self, schema, overwrite: bool) -> "SavepointWriter":
        return SavepointWriter(self.options, overwrite)


class SavepointScanReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError(
                "bravo_savepoint needs a savepoint directory: "
                ".load('/path/to/savepoint') or .option('path', ...)"
            )
        self.path = path
        names = options.get("state_names")
        # option-level narrowing composes with pushed filters (AND)
        self.state_names: set[str] | None = (
            {n.strip() for n in names.split(",") if n.strip()} if names else None
        )

    def _narrow(self, names: set[str]) -> None:
        self.state_names = (
            names if self.state_names is None else self.state_names & names
        )

    def pushFilters(self, filters):
        """Absorb state_name equality/membership predicates into the byte
        scan; everything else stays with Spark."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("state_name",):
                self._narrow({f.value})
            elif isinstance(f, In) and f.attribute == ("state_name",):
                self._narrow(set(f.value))
            else:
                yield f

    def partitions(self):
        from bravo_spark.sources.savepoint import _plan_scan

        names = sorted(self.state_names) if self.state_names is not None else None
        splits, id_to_name, _filt, compressed = _plan_scan(self.path, names, None)
        payload_base = {
            "ids": {str(k): v for k, v in id_to_name.items()},
            "names": names,
            "compressed": compressed,
        }
        return [
            InputPartition(
                json.dumps({**payload_base, "file": fpath, "spans": spans})
            )
            for fpath, spans in splits
        ] or [InputPartition(json.dumps({**payload_base, "file": None, "spans": []}))]

    def read(self, partition: InputPartition):
        import pyarrow as pa

        from bravo_spark.codecs import flink as fc
        from bravo_spark.sources.savepoint import _frame_decompress

        spec = json.loads(partition.value)
        if spec["file"] is None:
            return
        id_to_name = {int(k): v for k, v in spec["ids"].items()}
        allowed = set(spec["names"]) if spec["names"] is not None else None
        state_filter = (lambda n: n in allowed) if allowed is not None else (lambda _n: True)
        names, keys, vals = [], [], []
        with open(spec["file"], "rb") as f:
            for _kg, off, end in spec["spans"]:
                f.seek(off)
                buf = f.read(end - off)
                if spec["compressed"]:
                    buf = _frame_decompress(buf)
                for name, key, val in fc.iter_key_group_section(
                    buf, id_to_name, state_filter
                ):
                    names.append(name)
                    keys.append(key)
                    vals.append(val)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(names, type=pa.string()),
                pa.array(keys, type=pa.binary()),
                pa.array(vals, type=pa.binary()),
            ],
            names=["state_name", "key_ns", "value"],
        )


class SavepointWriter(DataSourceWriter):
    """``df.write.format("bravo_savepoint")`` — S7 through the engine's
    sink contract. Each task sorts ITS rows by (op_index, key_group,
    state_id) and streams section files (several tasks may contribute
    files for the same operator index; the scan concatenates partial
    key-group sections, so results are correct under ANY upstream
    partitioning). For the one-file-per-operator layout a Flink restore
    expects, pre-shape with ``repartition(parallelism, "op_index")`` —
    or use ``write_savepoint``, which owns its shuffle. Requires
    ``state_ids`` as a JSON option: tasks cannot globally collect names.
    """

    def __init__(self, options, overwrite: bool):
        import os

        path = options.get("path")
        if not path:
            raise ValueError(
                "bravo_savepoint write needs .save('/path') or .option('path', ...)"
            )
        sids = options.get("state_ids")
        if not sids:
            raise ValueError(
                'bravo_savepoint write requires .option("state_ids", '
                '\'{"Name": 0, ...}\') — executor tasks cannot derive the '
                "global name→id mapping"
            )
        self.path = path
        self.state_ids: dict[str, int] = {
            str(k): int(v) for k, v in json.loads(sids).items()
        }
        self.max_parallelism = int(options.get("max_parallelism", "128"))
        self.parallelism = int(options.get("parallelism", "1"))
        self.compression = str(options.get("compression", "false")).lower() == "true"
        if overwrite and os.path.isdir(path):
            import shutil

            shutil.rmtree(path)
        os.makedirs(path, exist_ok=True)

    def write(self, rows):
        import os
        import uuid as _uuid

        from bravo_spark.codecs import flink as fc
        from bravo_spark.sources.savepoint import _frame_compress

        prefix = fc.key_group_prefix_bytes(self.max_parallelism)
        mask = 0x7F if prefix == 1 else 0x7FFF
        buffered = []
        for row in rows:
            kns = bytes(row.key_ns)
            kg = int.from_bytes(kns[:prefix], "big") & mask
            if not 0 <= kg < self.max_parallelism:
                raise ValueError(
                    f"derived key group {kg} is outside "
                    f"[0, {self.max_parallelism}) — rows were encoded with "
                    "a different max_parallelism than the writer was given"
                )
            sid = self.state_ids.get(row.state_name)
            if sid is None:
                raise ValueError(
                    f"state_ids has no entry for {row.state_name!r} "
                    f"(provided: {sorted(self.state_ids)})"
                )
            op = kg * self.parallelism // self.max_parallelism
            buffered.append((op, kg, sid, kns, bytes(row.value)))
        buffered.sort(key=lambda t: t[:3])

        files = []
        i, n = 0, len(buffered)
        while i < n:
            op = buffered[i][0]
            fpath = os.path.join(self.path, f"op-{op}-{_uuid.uuid4().hex}")
            offsets: dict[int, int] = {}
            with open(fpath, "wb") as f:
                while i < n and buffered[i][0] == op:
                    kg = buffered[i][1]
                    entries = []
                    while i < n and buffered[i][0] == op and buffered[i][1] == kg:
                        _op, _kg, sid, kns, val = buffered[i]
                        entries.append((sid, kns, val))
                        i += 1
                    offsets[kg] = f.tell()
                    buf = fc.write_key_group_section(entries)
                    if self.compression:
                        buf = _frame_compress(buf)
                    f.write(buf)
            files.append(
                {"path": fpath, "op_index": op,
                 "offsets": {str(k): v for k, v in offsets.items()}}
            )
        return SavepointCommit(json.dumps(files))

    def commit(self, messages):
        import os

        from bravo_spark.sources.savepoint import METADATA_FILE, SavepointMeta

        meta = SavepointMeta(
            self.max_parallelism, self.parallelism, dict(self.state_ids),
            compression=self.compression,
        )
        for m in messages:
            if m is None:
                continue
            for fm in json.loads(m.files):
                meta.files.append(
                    {"path": fm["path"], "op_index": int(fm["op_index"]),
                     "offsets": {k: int(v) for k, v in fm["offsets"].items()}}
                )
        with open(os.path.join(self.path, METADATA_FILE), "w") as f:
            f.write(meta.to_json())

    def abort(self, messages):
        import os

        for m in messages or []:
            if m is None:
                continue
            for fm in json.loads(m.files):
                try:
                    os.remove(fm["path"])
                except OSError:
                    pass


def register(spark) -> None:
    """Idempotently register the ``bravo_savepoint`` format on a session."""
    try:
        spark.dataSource.register(SavepointDataSource)
    except Exception as exc:  # already registered → keep the session's copy
        if "already" not in str(exc).lower():
            raise
