"""Checkpoint maintenance toolkit — one import surface for the offline
operations a state-store operator runs between (or instead of) jobs.

Everything here works on Structured Streaming checkpoints at rest, on
both state-store providers, without the engine running:

- audit:    :func:`read_streaming_progress` (batch history),
            :func:`spark_state_diff` is the query-level analog
            (``__spark_entry__`` registers it)
- surgery:  ``write_spark_state`` / ``write_rocksdb_spark_state``
            (patch state), :func:`patch_watermark` (reopen a window a
            poisoned event time closed), ``migrate_spark_state_schema``
            (schema evolution)
- rewind:   :func:`rewind_checkpoint` (+ ``file_sink_rewind`` for the
            sink half)
- compact:  :func:`compact_spark_checkpoint` /
            :func:`compact_rocksdb_checkpoint` — fold the replay chain
            into one snapshot (the offline ``doSnapshot`` / zip upload)
- reclaim:  :func:`gc_rocksdb_checkpoint` (orphaned SSTs),
            :func:`prune_spark_checkpoint` /
            :func:`prune_rocksdb_checkpoint` (retention, the offline
            ``minVersionsToRetain``)

Each operation is restart-proven in ``tests/test_spark_state.py`` /
``tests/test_rocksdb_state.py`` against real streaming queries.
"""

from __future__ import annotations

from bravo_spark.sources.rocksdb_state import (  # noqa: F401
    compact_rocksdb_checkpoint,
    gc_rocksdb_checkpoint,
    prune_rocksdb_checkpoint,
    read_rocksdb_spark_state,
    write_rocksdb_spark_state,
)
from bravo_spark.sources.spark_state import (  # noqa: F401
    compact_spark_checkpoint,
    migrate_spark_state_schema,
    patch_watermark,
    prune_spark_checkpoint,
    read_spark_state,
    read_streaming_progress,
    rewind_checkpoint,
    write_spark_state,
)

__all__ = [
    "compact_rocksdb_checkpoint",
    "compact_spark_checkpoint",
    "gc_rocksdb_checkpoint",
    "migrate_spark_state_schema",
    "patch_watermark",
    "prune_rocksdb_checkpoint",
    "prune_spark_checkpoint",
    "read_rocksdb_spark_state",
    "read_spark_state",
    "read_streaming_progress",
    "rewind_checkpoint",
    "write_rocksdb_spark_state",
    "write_spark_state",
]
