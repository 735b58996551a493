"""WARC record source over Spark's ``binaryFile`` — batch and streaming.

Batch: :func:`read_warc` — archives under ``path`` become one row per
WARC record. Streaming: :func:`read_warc_stream` — the same relation as
an incremental stream; ``binaryFile`` participates in Structured
Streaming's file-source protocol (explicit schema required), so newly
LANDED archives flow through exactly-once per checkpoint — the
continuous-crawl ingest shape (Common Crawl drops arrive as whole
``.warc.gz`` shards, so file grain IS record-batch grain).

Both return the same schema: ``(archive string, uri string,
warc_type string, n_bytes long, payload binary)``. The parse is the
strict pure-Python codec (``codecs/warc.py``) in Arrow-batched
``mapInPandas`` — a torn archive fails the task loudly rather than
silently dropping tail records.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)

RECORD_SCHEMA = (
    "archive string, uri string, warc_type string,"
    " n_bytes long, payload binary"
)


def _parse_batches(batches):
    import pandas as pd

    from bravo_spark.codecs.warc import parse_warc

    for pdf in batches:
        archives, uris, types, sizes, payloads = [], [], [], [], []
        for path, blob in zip(pdf["path"], pdf["content"]):
            for headers, payload in parse_warc(bytes(blob)):
                archives.append(path)
                uris.append(headers.get("WARC-Target-URI", ""))
                types.append(headers.get("WARC-Type", ""))
                sizes.append(len(payload))
                payloads.append(payload)
        yield pd.DataFrame(
            {
                "archive": archives, "uri": uris, "warc_type": types,
                "n_bytes": sizes, "payload": payloads,
            }
        )


def _records(files: DataFrame) -> DataFrame:
    return files.select("path", "content").mapInPandas(
        _parse_batches, RECORD_SCHEMA
    )


def read_warc(
    spark: SparkSession, path: str, *, glob: str = "*.warc.gz"
) -> DataFrame:
    """Batch WARC ingest: archive-grain tasks (binaryFile never splits a
    file — matching gzip-member reality), zero shuffles."""
    return _records(
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def read_warc_stream(
    spark: SparkSession,
    path: str,
    *,
    glob: str = "*.warc.gz",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming WARC ingest: each micro-batch processes newly landed
    archives exactly once per checkpoint (Structured Streaming's file
    source log). ``max_files_per_trigger`` bounds a batch for backfill
    over a large drop directory."""
    reader = (
        spark.readStream.format("binaryFile")
        .schema(_BINARYFILE_SCHEMA)
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _records(reader.load(path))
