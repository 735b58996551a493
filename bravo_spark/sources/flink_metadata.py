"""Flink SavepointV2 ``_metadata`` binary reader/writer (Flink 1.7 layout).

The reference loads savepoint metadata through Flink's own
``Checkpoints.loadCheckpointMetadata`` (utils/StateMetadataUtils.java:59-74)
and writes it back via ``Checkpoints.storeCheckpointMetadata`` (:189-194).
This module implements that on-disk format byte-for-byte as documented by
Apache Flink 1.7's ``SavepointV2Serializer`` (public source):

- header: i32 magic 0x4960672D, i32 version (2)
- body:   i64 checkpoint id; i32 master-state count, each framed as
          [i32 magic 0xC96B1696][i32 len][len bytes] (skipped on read);
          i32 operator count, each:
          [i64 opid-lower][i64 opid-upper][i32 parallelism]
          [i32 max-parallelism][i32 subtask count], each subtask:
          [i32 subtask index][i64 duration (-1, compat)]
          [i32 legacy-state count (0)]
          [i32 0|1 managed operator-state handle][handle?]
          [i32 0|1 raw operator-state handle][handle?]
          [keyed handle managed][keyed handle raw]
- keyed handles: NULL_HANDLE byte, or KEY_GROUPS_HANDLE
  [i32 start][i32 num][num × i64 offsets][stream handle], or
  INCREMENTAL_KEY_GROUPS_HANDLE [i64 checkpoint id][UTF backend id]
  [i32 start][i32 num][meta stream handle][shared handle map]
  [private handle map] where a map is [i32 n] × ([UTF name][stream handle])
- operator-state handles: PARTITIONABLE_OPERATOR_STATE_HANDLE
  [i32 n] × ([UTF state name][u8 distribution mode][i32 k][k × i64
  offsets]) [delegate stream handle]
- stream handles: NULL_HANDLE, or FILE_STREAM_STATE_HANDLE [i64 size]
  [UTF path], or BYTE_STREAM_STATE_HANDLE [UTF name][i32 len][bytes]

Validated four ways: round-trip; golden byte vectors HAND-ASSEMBLED in
tests/test_flink_metadata.py from the serializer's documented write
sequence (java.io.DataOutputStream big-endian primitives + writeUTF —
MODIFIED UTF-8: NUL as C0 80, astral chars as CESU-8 surrogate pairs);
a foreign-layout vector exercising sections this module's writer
never produces (legacy state entries, zero-subtask operators,
BROADCAST/empty-offset states, incremental handles on the raw side,
literal modified-UTF-8 name bytes); and — removing even the emulation
from the trust chain — a full metadata stream written by the REAL
``java.io.DataOutputStream`` inside Spark's JVM (the exact primitives
SavepointV2Serializer calls), which both deserializes correctly and
re-serializes byte-exactly, with writeUTF cross-pinned per-string. A
file written by an actual Flink cluster is still not available in this
container; that residual risk is recorded in COVERAGE.md.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from bravo_spark.codecs.flink import merge_utf16_surrogates

HEADER_MAGIC_NUMBER = 0x4960672D
MASTER_STATE_MAGIC = 0xC96B1696
SAVEPOINT_V2 = 2

# handle type tags (SavepointV2Serializer constants)
NULL_HANDLE = 0
BYTE_STREAM_STATE_HANDLE = 1
FILE_STREAM_STATE_HANDLE = 2
KEY_GROUPS_HANDLE = 3
PARTITIONABLE_OPERATOR_STATE_HANDLE = 4
INCREMENTAL_KEY_GROUPS_HANDLE = 5

# OperatorStateHandle.Mode ordinals
MODE_SPLIT_DISTRIBUTE = 0
MODE_UNION = 1
MODE_BROADCAST = 2


class FlinkMetadataError(ValueError):
    pass


@dataclass
class StreamStateHandle:
    kind: int  # FILE_STREAM_STATE_HANDLE or BYTE_STREAM_STATE_HANDLE
    size: int
    path: str | None = None  # file path, or byte-handle name
    data: bytes | None = None  # byte handles


@dataclass
class KeyGroupsHandle:
    start_key_group: int
    num_key_groups: int
    offsets: list[int]
    stream: StreamStateHandle


@dataclass
class IncrementalKeyedHandle:
    checkpoint_id: int
    backend_id: str
    start_key_group: int
    num_key_groups: int
    meta: StreamStateHandle
    shared: list[tuple[str, StreamStateHandle]]
    private: list[tuple[str, StreamStateHandle]]


@dataclass
class OperatorStateHandleMeta:
    # state name -> (distribution mode ordinal, per-partition offsets)
    states: list[tuple[str, int, list[int]]]
    stream: StreamStateHandle


@dataclass
class SubtaskState:
    subtask_index: int
    managed_keyed: KeyGroupsHandle | IncrementalKeyedHandle | None = None
    raw_keyed: KeyGroupsHandle | IncrementalKeyedHandle | None = None
    managed_op: OperatorStateHandleMeta | None = None
    raw_op: OperatorStateHandleMeta | None = None


@dataclass
class OperatorStateMeta:
    operator_id: bytes  # 16 bytes (murmur3_128 of the uid, Identifiers.java)
    parallelism: int
    max_parallelism: int
    subtasks: list[SubtaskState] = field(default_factory=list)


@dataclass
class FlinkSavepoint:
    checkpoint_id: int
    operators: list[OperatorStateMeta] = field(default_factory=list)
    # master (coordinator) states, carried as OPAQUE payload frames and
    # re-emitted verbatim — the same splice-don't-reencode policy the
    # reference applies to serializer snapshots
    # (utils/StateMetadataUtils.java:103-125 keeps everything it does not
    # replace). Each entry is the raw bytes between the per-state magic and
    # the next frame (i.e. the length-prefixed payload).
    master_states: list[bytes] = field(default_factory=list)


class _R:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def need(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise FlinkMetadataError(
                f"truncated at offset {self.pos}: wanted {n} bytes"
            )
        self.pos += n
        return b

    def i32(self) -> int:
        return struct.unpack(">i", self.need(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self.need(8))[0]

    def u8(self) -> int:
        return self.need(1)[0]

    def utf(self) -> str:
        n = struct.unpack(">H", self.need(2))[0]  # java writeUTF
        raw = self.need(n)
        try:
            return _java_utf_decode(raw)
        except ValueError as exc:
            raise FlinkMetadataError(
                f"damaged writeUTF payload at {self.pos - n}: {exc}"
            ) from None


def _java_utf_decode(raw: bytes) -> str:
    """``DataInputStream.readUTF`` — MODIFIED UTF-8, not standard: NUL is
    the two-byte form 0xC0 0x80, astral characters are CESU-8 surrogate
    pairs (two 3-byte sequences), and 4-byte sequences never occur."""
    units: list[str] = []
    i, n = 0, len(raw)
    while i < n:
        b = raw[i]
        if b < 0x80:
            units.append(chr(b))
            i += 1
        elif b >> 5 == 0b110:
            if i + 2 > n:
                raise ValueError(f"truncated 2-byte sequence at {i}")
            if raw[i + 1] & 0xC0 != 0x80:
                # readUTF checks (char2 & 0xC0) != 0x80 and throws
                raise ValueError(
                    f"invalid continuation byte {raw[i + 1]:#x} at {i + 1}"
                )
            units.append(chr(((b & 0x1F) << 6) | (raw[i + 1] & 0x3F)))
            i += 2
        elif b >> 4 == 0b1110:
            if i + 3 > n:
                raise ValueError(f"truncated 3-byte sequence at {i}")
            if raw[i + 1] & 0xC0 != 0x80 or raw[i + 2] & 0xC0 != 0x80:
                bad = i + 1 if raw[i + 1] & 0xC0 != 0x80 else i + 2
                raise ValueError(
                    f"invalid continuation byte {raw[bad]:#x} at {bad}"
                )
            units.append(
                chr(
                    ((b & 0x0F) << 12)
                    | ((raw[i + 1] & 0x3F) << 6)
                    | (raw[i + 2] & 0x3F)
                )
            )
            i += 3
        else:
            raise ValueError(
                f"invalid modified-UTF-8 lead byte {b:#x} at {i} "
                "(writeUTF never emits 4-byte sequences)"
            )
    # merge CESU-8 surrogate pairs into astral characters; lone units
    # (legal Java strings) survive
    return merge_utf16_surrogates("".join(units))


def _java_utf_encode(s: str) -> bytes:
    """``DataOutputStream.writeUTF`` body: per UTF-16 unit — 1 byte for
    U+0001..U+007F, 2 bytes for NUL and U+0080..U+07FF, 3 bytes above
    (astral characters become surrogate-pair units first)."""
    u16 = s.encode("utf-16-be", "surrogatepass")
    out = bytearray()
    for i in range(0, len(u16), 2):
        c = (u16[i] << 8) | u16[i + 1]
        if 0x01 <= c <= 0x7F:
            out.append(c)
        elif c <= 0x7FF:
            out.append(0xC0 | (c >> 6))
            out.append(0x80 | (c & 0x3F))
        else:
            out.append(0xE0 | (c >> 12))
            out.append(0x80 | ((c >> 6) & 0x3F))
            out.append(0x80 | (c & 0x3F))
    return bytes(out)


def _w_utf(s: str) -> bytes:
    b = _java_utf_encode(s)
    if len(b) > 0xFFFF:
        raise FlinkMetadataError(
            f"writeUTF body of {len(b)} bytes exceeds the u16 length frame"
        )
    return struct.pack(">H", len(b)) + b


# --- stream handles ---


def _read_stream_handle(r: _R) -> StreamStateHandle | None:
    tag = r.u8()
    if tag == NULL_HANDLE:
        return None
    if tag == FILE_STREAM_STATE_HANDLE:
        size = r.i64()
        path = r.utf()
        return StreamStateHandle(FILE_STREAM_STATE_HANDLE, size, path=path)
    if tag == BYTE_STREAM_STATE_HANDLE:
        handle_name = r.utf()
        n = r.i32()
        data = r.need(n)
        return StreamStateHandle(BYTE_STREAM_STATE_HANDLE, n, path=handle_name, data=data)
    raise FlinkMetadataError(f"unsupported stream handle tag {tag} at {r.pos - 1}")


def _write_stream_handle(h: StreamStateHandle | None) -> bytes:
    if h is None:
        return bytes([NULL_HANDLE])
    if h.kind == FILE_STREAM_STATE_HANDLE:
        return (
            bytes([FILE_STREAM_STATE_HANDLE])
            + struct.pack(">q", h.size)
            + _w_utf(h.path or "")
        )
    if h.kind == BYTE_STREAM_STATE_HANDLE:
        return (
            bytes([BYTE_STREAM_STATE_HANDLE])
            + _w_utf(h.path or "")
            + struct.pack(">i", len(h.data or b""))
            + (h.data or b"")
        )
    raise FlinkMetadataError(f"unsupported stream handle kind {h.kind}")


def _read_handle_map(r: _R) -> list[tuple[str, StreamStateHandle]]:
    n = r.i32()
    out = []
    for _ in range(n):
        name = r.utf()
        h = _read_stream_handle(r)
        if h is None:
            raise FlinkMetadataError("null stream handle inside handle map")
        out.append((name, h))
    return out


def _write_handle_map(m: list[tuple[str, StreamStateHandle]]) -> bytes:
    out = bytearray(struct.pack(">i", len(m)))
    for name, h in m:
        out += _w_utf(name)
        out += _write_stream_handle(h)
    return bytes(out)


# --- keyed handles ---


def _read_keyed_handle(r: _R):
    tag = r.u8()
    if tag == NULL_HANDLE:
        return None
    if tag == KEY_GROUPS_HANDLE:
        start = r.i32()
        num = r.i32()
        offsets = [r.i64() for _ in range(num)]
        stream = _read_stream_handle(r)
        if stream is None:
            raise FlinkMetadataError("keyed handle without stream handle")
        return KeyGroupsHandle(start, num, offsets, stream)
    if tag == INCREMENTAL_KEY_GROUPS_HANDLE:
        cp_id = r.i64()
        backend_id = r.utf()
        start = r.i32()
        num = r.i32()
        meta = _read_stream_handle(r)
        if meta is None:
            raise FlinkMetadataError("incremental handle without meta handle")
        shared = _read_handle_map(r)
        private = _read_handle_map(r)
        return IncrementalKeyedHandle(cp_id, backend_id, start, num, meta, shared, private)
    raise FlinkMetadataError(f"unsupported keyed handle tag {tag} at {r.pos - 1}")


def _write_keyed_handle(h) -> bytes:
    if h is None:
        return bytes([NULL_HANDLE])
    if isinstance(h, KeyGroupsHandle):
        out = bytearray([KEY_GROUPS_HANDLE])
        out += struct.pack(">i", h.start_key_group)
        out += struct.pack(">i", h.num_key_groups)
        for off in h.offsets:
            out += struct.pack(">q", off)
        out += _write_stream_handle(h.stream)
        return bytes(out)
    if isinstance(h, IncrementalKeyedHandle):
        out = bytearray([INCREMENTAL_KEY_GROUPS_HANDLE])
        out += struct.pack(">q", h.checkpoint_id)
        out += _w_utf(h.backend_id)
        out += struct.pack(">i", h.start_key_group)
        out += struct.pack(">i", h.num_key_groups)
        out += _write_stream_handle(h.meta)
        out += _write_handle_map(h.shared)
        out += _write_handle_map(h.private)
        return bytes(out)
    raise FlinkMetadataError(f"unsupported keyed handle {type(h).__name__}")


# --- operator (non-keyed) state handles ---


def _read_operator_handle(r: _R) -> OperatorStateHandleMeta:
    tag = r.u8()
    if tag != PARTITIONABLE_OPERATOR_STATE_HANDLE:
        raise FlinkMetadataError(
            f"unsupported operator-state handle tag {tag} at {r.pos - 1}"
        )
    n = r.i32()
    states = []
    for _ in range(n):
        name = r.utf()
        mode = r.u8()
        k = r.i32()
        offsets = [r.i64() for _ in range(k)]
        states.append((name, mode, offsets))
    stream = _read_stream_handle(r)
    if stream is None:
        raise FlinkMetadataError("operator-state handle without stream handle")
    return OperatorStateHandleMeta(states, stream)


def _write_operator_handle(h: OperatorStateHandleMeta) -> bytes:
    out = bytearray([PARTITIONABLE_OPERATOR_STATE_HANDLE])
    out += struct.pack(">i", len(h.states))
    for name, mode, offsets in h.states:
        out += _w_utf(name)
        out += bytes([mode])
        out += struct.pack(">i", len(offsets))
        for off in offsets:
            out += struct.pack(">q", off)
    out += _write_stream_handle(h.stream)
    return bytes(out)


# --- top level ---


def serialize(sp: FlinkSavepoint) -> bytes:
    out = bytearray()
    out += struct.pack(">i", HEADER_MAGIC_NUMBER)
    out += struct.pack(">i", SAVEPOINT_V2)
    out += struct.pack(">q", sp.checkpoint_id)
    out += struct.pack(">i", len(sp.master_states))
    for payload in sp.master_states:
        out += struct.pack(">I", MASTER_STATE_MAGIC)
        out += struct.pack(">i", len(payload))
        out += payload
    out += struct.pack(">i", len(sp.operators))
    for op in sp.operators:
        # writeLong(lowerPart)+writeLong(upperPart) == raw 16 digest bytes
        out += op.operator_id[:8] + op.operator_id[8:16]
        out += struct.pack(">i", op.parallelism)
        out += struct.pack(">i", op.max_parallelism)
        out += struct.pack(">i", len(op.subtasks))
        for st in op.subtasks:
            out += struct.pack(">i", st.subtask_index)
            out += struct.pack(">q", -1)  # removed duration field, compat
            out += struct.pack(">i", 0)  # legacy state, always empty
            for oh in (st.managed_op, st.raw_op):
                if oh is None:
                    out += struct.pack(">i", 0)
                else:
                    out += struct.pack(">i", 1)
                    out += _write_operator_handle(oh)
            out += _write_keyed_handle(st.managed_keyed)
            out += _write_keyed_handle(st.raw_keyed)
    return bytes(out)


def deserialize(buf: bytes) -> FlinkSavepoint:
    r = _R(buf)
    magic = r.i32()
    if magic != HEADER_MAGIC_NUMBER:
        raise FlinkMetadataError(f"bad magic 0x{magic & 0xFFFFFFFF:08X}")
    version = r.i32()
    if version != SAVEPOINT_V2:
        raise FlinkMetadataError(f"unsupported savepoint version {version}")
    cp_id = r.i64()
    masters: list[bytes] = []
    for _ in range(r.i32()):  # master states: framed, carried opaque
        ms_magic = r.i32() & 0xFFFFFFFF
        if ms_magic != MASTER_STATE_MAGIC:
            raise FlinkMetadataError(f"bad master-state magic 0x{ms_magic:08X}")
        masters.append(r.need(r.i32()))
    sp = FlinkSavepoint(checkpoint_id=cp_id, master_states=masters)
    n_ops = r.i32()
    for _ in range(n_ops):
        op_id = r.need(16)
        par = r.i32()
        maxp = r.i32()
        op = OperatorStateMeta(op_id, par, maxp)
        n_sub = r.i32()
        for _ in range(n_sub):
            idx = r.i32()
            r.i64()  # removed duration field
            n_legacy = r.i32()
            for _ in range(n_legacy):  # absorbed like the reference path
                _read_stream_handle(r)
            st = SubtaskState(idx)
            if r.i32() == 1:
                st.managed_op = _read_operator_handle(r)
            if r.i32() == 1:
                st.raw_op = _read_operator_handle(r)
            st.managed_keyed = _read_keyed_handle(r)
            st.raw_keyed = _read_keyed_handle(r)
            op.subtasks.append(st)
        sp.operators.append(op)
    if r.pos != len(buf):
        raise FlinkMetadataError(f"{len(buf) - r.pos} trailing bytes at {r.pos}")
    return sp
