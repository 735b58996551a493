"""ZIP shard source/sink — Spark plumbing over ``codecs/zipfmt.py``.

The third training-shard container after TFRecord and WebDataset tar:
image sets, code dumps, and scraped-document drops ship as ``.zip``
shards. The container framing, integrity rules, and named refusals live
in the pure-Python codec; this module is only the scale shape:

- a shard IS the parallelism grain (``binaryFile`` never splits a
  file, and a ZIP's central directory makes the whole-shard read the
  honest unit anyway), so shard count — set upstream by the writer's
  partitioning — is the knob, exactly as for the tar and TFRecord
  surfaces;
- reading is one Arrow-batched ``mapInPandas`` stage over the
  binaryFile scan: zero shuffles, zero joins at any corpus size;
- writing is ``mapPartitionsWithIndex`` through the deterministic
  codec writer, shard IO through pyarrow.fs (``_resolve_fs``) so
  executor tasks reach object storage, not executor-local disks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bravo_spark.sources.warc_source import _resolve_fs


def write_zip_shards(
    df: DataFrame,
    path: str,
    name_col: str,
    data_col: str,
    *,
    method: str = "deflate",
) -> int:
    """Each partition becomes ONE ``shard_{partition:05d}.zip`` under
    ``path`` (plain path or filesystem URI). Row ``r`` becomes member
    ``r[name_col]`` holding ``r[data_col]``'s bytes (strings encode
    UTF-8). NULL names/payloads refuse by name (filter upstream);
    duplicate names within a shard and zip64-scale inputs refuse inside
    the codec. Returns members written."""
    from bravo_spark.codecs.zipfmt import ZipError, write_zip

    src = df.select(
        F.col(name_col).cast("string").alias("name"),
        F.col(data_col).alias("data"),
    )

    def _write(pid, rows):
        def entries():
            for r in rows:
                if r.name is None:
                    raise ZipError("NULL member name — filter upstream")
                v = r.data
                if v is None:
                    raise ZipError(f"NULL payload for member {r.name!r} "
                                   "— filter upstream")
                yield r.name, (v.encode("utf-8") if isinstance(v, str)
                               else bytes(v))

        count = 0

        def counted():
            nonlocal count
            for name, data in entries():
                count += 1
                yield name, data

        blob = write_zip(counted(), method=method)
        if count:
            tfs, tbase = _resolve_fs(path)
            shard = tbase.rstrip("/") + f"/shard_{pid:05d}.zip"
            with tfs.open_output_stream(shard, compression=None) as f:
                f.write(blob)
        yield count

    fs, base = _resolve_fs(path)
    fs.create_dir(base, recursive=True)
    return sum(src.rdd.mapPartitionsWithIndex(_write).collect())


_MEMBER_SCHEMA = "archive string, name string, data binary"


def _parse_batches(batches):
    from bravo_spark.codecs.zipfmt import ZipError, iter_zip
    import pandas as pd

    for pdf in batches:
        out = {"archive": [], "name": [], "data": []}
        for apath, blob in zip(pdf["path"], pdf["content"]):
            try:
                for name, data in iter_zip(bytes(blob)):
                    out["archive"].append(apath)
                    out["name"].append(name)
                    out["data"].append(data)
            except ZipError as exc:
                raise ZipError(f"{apath}: {exc}") from exc
        yield pd.DataFrame(out)


def read_zip_shards(
    spark: SparkSession,
    path: str,
    *,
    glob: str = "*.zip",
) -> DataFrame:
    """One row per member: ``(archive string, name string, data
    binary)``, in central-directory order within each shard, every
    payload CRC-verified by the codec. Torn/encrypted shards refuse by
    name; foreign zip64 archives (>65535 members / >4 GiB — the
    ImageNet shape) READ fine. Shard-grain binaryFile tasks, one
    Arrow-batched map stage, zero shuffles."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return files.select("path", "content").mapInPandas(
        _parse_batches, _MEMBER_SCHEMA)


def read_zip_stream(
    spark: SparkSession,
    path: str,
    *,
    glob: str = "*.zip",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming ZIP ingest — the drop-directory twin of
    :func:`read_zip_shards` (the warc/avro streaming posture): each
    micro-batch processes newly landed shards exactly once per
    checkpoint (Structured Streaming's file-source log), through the
    SAME Arrow parse stage as the batch reader.
    ``max_files_per_trigger`` bounds a batch for backfill over a large
    drop directory."""
    from bravo_spark.sources.warc_source import _binaryfile_stream

    return _binaryfile_stream(
        spark, path, glob, max_files_per_trigger
    ).select("path", "content").mapInPandas(_parse_batches, _MEMBER_SCHEMA)


__all__ = ["write_zip_shards", "read_zip_shards", "read_zip_stream"]
