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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    In,
    InputPartition,
)

STATE_ROW_DDL = "state_name string, key_ns binary, value binary"


class SavepointDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "bravo_savepoint"

    def schema(self) -> str:
        return STATE_ROW_DDL

    def reader(self, schema) -> "SavepointScanReader":
        return SavepointScanReader(self.options)


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


def register(spark) -> None:
    """Idempotently register the ``bravo_savepoint`` format on a session."""
    try:
        spark.dataSource.register(SavepointDataSource)
    except Exception as exc:  # already registered → keep the session's copy
        if "already" not in str(exc).lower():
            raise
