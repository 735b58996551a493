"""Pure-Python RocksDB MANIFEST / DB-directory writer.

Builds a complete, openable RocksDB database directory from plain
key/value entries: one SST (sources/sst.py SstWriter), a MANIFEST whose
VersionEdit records register it, CURRENT, and an empty WAL. Real RocksDB
(rocksdbjni — the library a Flink TaskManager and Spark's
RocksDBStateStoreProvider embed) must open the result with no repair;
tests cross-validate exactly that.

This is the missing write half of zip-per-version RocksDB state
checkpoints: reading them only needs the SST parser, but REWRITING one
means producing a directory RocksDB itself will open
(sources/rocksdb_state.write_rocksdb_spark_state uses this for zip-mode
stores).

Format notes (all public, from leveldb/rocksdb docs + source layout):

- MANIFEST is a leveldb-log-format file: 32 KiB blocks, each record
  framed ``[masked crc32c(type+payload) LE][len u16 LE][type u8]`` with
  type full/first/middle/last (1-4); crc uses the same mask constant as
  SST block trailers (codecs/crc32c.py).
- Records are VersionEdits, encoded as (varint32 tag, value) pairs:
  kComparator=1 (len-prefixed name), kLogNumber=2, kNextFileNumber=3,
  kLastSequence=4 (varint64s), kNewFile2=100 (varint32 level, varint64
  file number, varint64 size, len-prefixed smallest/largest INTERNAL
  keys, varint64 smallest/largest seqno).
- CURRENT is the manifest filename + ``\\n``.
- Internal keys are ``user_key + (seq << 8 | value_type)`` packed LE64 —
  the same layout sources/sst.py writes inside SSTs.
"""

from __future__ import annotations

import os

import struct

from bravo_spark.codecs import crc32c as _crc
from bravo_spark.sources import sst as sstmod

LOG_BLOCK_SIZE = 32 * 1024
_FULL, _FIRST, _MIDDLE, _LAST = 1, 2, 3, 4

TAG_COMPARATOR = 1
TAG_LOG_NUMBER = 2
TAG_NEXT_FILE_NUMBER = 3
TAG_LAST_SEQUENCE = 4
TAG_NEW_FILE2 = 100

DEFAULT_COMPARATOR = b"leveldb.BytewiseComparator"


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        if v < 0x80:
            out.append(v)
            return bytes(out)
        out.append((v & 0x7F) | 0x80)
        v >>= 7


def _lenpref(b: bytes) -> bytes:
    return _varint(len(b)) + b


def encode_version_edit(
    *,
    comparator: bytes | None = None,
    log_number: int | None = None,
    next_file_number: int | None = None,
    last_sequence: int | None = None,
    new_files: list[tuple[int, int, int, bytes, bytes, int, int]] = (),
) -> bytes:
    """One VersionEdit. ``new_files`` entries are (level, file_number,
    file_size, smallest_internal_key, largest_internal_key,
    smallest_seqno, largest_seqno)."""
    out = bytearray()
    if comparator is not None:
        out += _varint(TAG_COMPARATOR) + _lenpref(comparator)
    if log_number is not None:
        out += _varint(TAG_LOG_NUMBER) + _varint(log_number)
    if next_file_number is not None:
        out += _varint(TAG_NEXT_FILE_NUMBER) + _varint(next_file_number)
    if last_sequence is not None:
        out += _varint(TAG_LAST_SEQUENCE) + _varint(last_sequence)
    for level, fno, size, smallest, largest, sseq, lseq in new_files:
        out += _varint(TAG_NEW_FILE2)
        out += _varint(level) + _varint(fno) + _varint(size)
        out += _lenpref(smallest) + _lenpref(largest)
        out += _varint(sseq) + _varint(lseq)
    return bytes(out)


def write_log(records: list[bytes]) -> bytes:
    """Frame ``records`` in the leveldb log format (MANIFEST/WAL framing).
    Handles block-boundary splitting (first/middle/last fragments) and the
    <7-byte trailer zero-fill rule."""
    out = bytearray()
    for rec in records:
        pos = 0
        first = True
        while True:
            room = LOG_BLOCK_SIZE - (len(out) % LOG_BLOCK_SIZE)
            if room < 7:
                out += b"\x00" * room
                continue
            avail = room - 7
            frag = rec[pos : pos + avail]
            pos += len(frag)
            done = pos >= len(rec)
            if first and done:
                t = _FULL
            elif first:
                t = _FIRST
            elif done:
                t = _LAST
            else:
                t = _MIDDLE
            crc = _crc.mask(_crc.crc32c(bytes([t]) + frag))
            out += struct.pack("<IH", crc, len(frag)) + bytes([t])
            out += frag
            first = False
            if done:
                break
    return bytes(out)


def build_db_dir(
    path: str,
    entries: list[tuple[bytes, bytes]],
    *,
    sst_file_number: int = 8,
    manifest_number: int = 5,
    wal_number: int = 4,
    seq: int = 1,
) -> dict[str, int]:
    """Create a complete RocksDB DB directory at ``path`` whose single L0
    SST holds ``entries`` (sorted by user key, all at sequence ``seq``,
    value type Put). Returns {filename: size} for every file written —
    callers assembling checkpoint metadata need the SST size.

    Layout mirrors what a fresh RocksDB + one flush produces: the SST,
    MANIFEST-<n>, CURRENT, and an empty WAL (log_number points at it;
    RocksDB accepts an empty WAL and replays nothing)."""
    os.makedirs(path, exist_ok=True)
    entries = sorted(entries)
    sst_name = f"{sst_file_number:06d}.sst"
    sst_path = os.path.join(path, sst_name)
    w = sstmod.SstWriter(sst_path)
    for k, v in entries:
        w.add(k, seq, sstmod.TYPE_VALUE, v)
    w.finish()
    sst_size = os.path.getsize(sst_path)

    sizes = {sst_name: sst_size}
    if entries:
        smallest = sstmod.make_internal_key(entries[0][0], seq, sstmod.TYPE_VALUE)
        largest = sstmod.make_internal_key(entries[-1][0], seq, sstmod.TYPE_VALUE)
        files = [(0, sst_file_number, sst_size, smallest, largest, seq, seq)]
    else:
        files = []
    edit = encode_version_edit(
        comparator=DEFAULT_COMPARATOR,
        log_number=wal_number,
        next_file_number=max(sst_file_number, manifest_number, wal_number) + 1,
        last_sequence=seq,
        new_files=files,
    )
    manifest_name = f"MANIFEST-{manifest_number:06d}"
    with open(os.path.join(path, manifest_name), "wb") as f:
        data = write_log([edit])
        f.write(data)
        sizes[manifest_name] = len(data)
    with open(os.path.join(path, "CURRENT"), "wb") as f:
        cur = manifest_name.encode() + b"\n"
        f.write(cur)
        sizes["CURRENT"] = len(cur)
    wal_name = f"{wal_number:06d}.log"
    open(os.path.join(path, wal_name), "wb").close()
    sizes[wal_name] = 0
    return sizes
