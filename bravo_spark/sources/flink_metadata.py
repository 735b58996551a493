"""Best-effort Flink SavepointV2 ``_metadata`` binary reader/writer.

The reference loads savepoint metadata through Flink's own
``Checkpoints.loadCheckpointMetadata`` (utils/StateMetadataUtils.java:59-74)
and writes it back via ``Checkpoints.storeCheckpointMetadata``
(:189-194). This module implements the subset of that public on-disk format
(Apache Flink 1.7, SavepointV2Serializer) needed to locate keyed-state
files: header magic + version, checkpoint id, operator states with their
OperatorIDs, per-subtask KeyGroupsStateHandles (key-group range, per-group
offsets, backing file).

Status: implemented from the documented format; **round-trip self-tested
only** — no real Flink savepoint exists in this environment to validate
against, so treat reads of foreign files as best-effort (every parse guard
raises ``FlinkMetadataError`` with offsets rather than mis-reading). Master
states and non-keyed handle variants we don't model are preserved as
opaque bytes where possible and rejected loudly where not.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

HEADER_MAGIC_NUMBER = 0x4960672D
SAVEPOINT_V2 = 2

# handle type tags (SavepointV2Serializer constants)
NULL_HANDLE = 0
BYTE_STREAM_STATE_HANDLE = 1
FILE_STREAM_STATE_HANDLE = 2
KEY_GROUPS_HANDLE = 3
PARTITIONABLE_OPERATOR_STATE_HANDLE = 4
INCREMENTAL_KEY_GROUPS_HANDLE = 5


class FlinkMetadataError(ValueError):
    pass


@dataclass
class StreamStateHandle:
    kind: int  # FILE_STREAM_STATE_HANDLE or BYTE_STREAM_STATE_HANDLE
    size: int
    path: str | None = None  # file handles
    data: bytes | None = None  # byte handles


@dataclass
class KeyGroupsHandle:
    start_key_group: int
    num_key_groups: int
    offsets: list[int]
    stream: StreamStateHandle


@dataclass
class SubtaskState:
    subtask_index: int
    managed_keyed: KeyGroupsHandle | None = None
    raw_keyed: KeyGroupsHandle | None = None


@dataclass
class OperatorStateMeta:
    operator_id: bytes  # 16 bytes
    parallelism: int
    max_parallelism: int
    subtasks: list[SubtaskState] = field(default_factory=list)


@dataclass
class FlinkSavepoint:
    checkpoint_id: int
    operators: list[OperatorStateMeta] = field(default_factory=list)


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
        n = struct.unpack(">H", self.need(2))[0]  # Java writeUTF
        return self.need(n).decode("utf-8")


def _w_utf(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">H", len(b)) + b


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
        h = StreamStateHandle(BYTE_STREAM_STATE_HANDLE, n, path=handle_name, data=data)
        return h
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


def _read_keyed_handle(r: _R) -> KeyGroupsHandle | None:
    tag = r.u8()
    if tag == NULL_HANDLE:
        return None
    if tag != KEY_GROUPS_HANDLE:
        raise FlinkMetadataError(
            f"unsupported keyed handle tag {tag} at {r.pos - 1}"
            " (incremental handles not modeled)"
        )
    start = r.i32()
    num = r.i32()
    offsets = [r.i64() for _ in range(num)]
    stream = _read_stream_handle(r)
    if stream is None:
        raise FlinkMetadataError("keyed handle without stream handle")
    return KeyGroupsHandle(start, num, offsets, stream)


def _write_keyed_handle(h: KeyGroupsHandle | None) -> bytes:
    if h is None:
        return bytes([NULL_HANDLE])
    out = bytearray([KEY_GROUPS_HANDLE])
    out += struct.pack(">i", h.start_key_group)
    out += struct.pack(">i", h.num_key_groups)
    for off in h.offsets:
        out += struct.pack(">q", off)
    out += _write_stream_handle(h.stream)
    return bytes(out)


def serialize(sp: FlinkSavepoint) -> bytes:
    """Write header + V2 body. Operator-state (non-keyed) and channel-state
    slots are written as null/empty — the shape the reference produces for
    keyed-state-only rewrites."""
    out = bytearray()
    out += struct.pack(">i", HEADER_MAGIC_NUMBER)
    out += struct.pack(">i", SAVEPOINT_V2)
    out += struct.pack(">q", sp.checkpoint_id)
    out += struct.pack(">i", 0)  # master states
    out += struct.pack(">i", len(sp.operators))
    for op in sp.operators:
        out += op.operator_id[:8] + op.operator_id[8:16]
        out += struct.pack(">i", op.parallelism)
        out += struct.pack(">i", op.max_parallelism)
        out += struct.pack(">i", len(op.subtasks))
        for st in op.subtasks:
            out += struct.pack(">i", st.subtask_index)
            # operator (non-keyed) managed + raw: null handles
            out += bytes([NULL_HANDLE])
            out += bytes([NULL_HANDLE])
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
    n_master = r.i32()
    if n_master != 0:
        raise FlinkMetadataError(
            f"{n_master} master states present — not modeled, refusing to guess"
        )
    sp = FlinkSavepoint(checkpoint_id=cp_id)
    n_ops = r.i32()
    for _ in range(n_ops):
        op_id = r.need(16)
        par = r.i32()
        maxp = r.i32()
        op = OperatorStateMeta(op_id, par, maxp)
        n_sub = r.i32()
        for _ in range(n_sub):
            idx = r.i32()
            managed_op = _read_stream_handle(r)  # non-keyed managed
            raw_op = _read_stream_handle(r)  # non-keyed raw
            if managed_op is not None or raw_op is not None:
                raise FlinkMetadataError(
                    "operator (non-keyed) state handles present — parse of "
                    "PartitionableOperatorStateHandle not modeled"
                )
            st = SubtaskState(idx)
            st.managed_keyed = _read_keyed_handle(r)
            st.raw_keyed = _read_keyed_handle(r)
            op.subtasks.append(st)
        sp.operators.append(op)
    if r.pos != len(buf):
        raise FlinkMetadataError(f"{len(buf) - r.pos} trailing bytes at {r.pos}")
    return sp
