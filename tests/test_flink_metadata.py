"""Flink SavepointV2 ``_metadata`` codec tests.

The golden vectors below are HAND-ASSEMBLED with a direct emulation of
``java.io.DataOutputStream`` (big-endian primitives + writeUTF), following
Flink 1.7's SavepointV2Serializer write sequence statement by statement —
independently of bravo_spark's own serializer — so ``deserialize`` is
pinned to foreign bytes, not to a self-round-trip."""

from __future__ import annotations

import struct

import pytest

from bravo_spark.codecs.hashes import operator_id
from bravo_spark.sources import flink_metadata as fm


class Dos:
    """java.io.DataOutputStream emulation (the serializer's output side)."""

    def __init__(self):
        self.b = bytearray()

    def write_int(self, v):
        self.b += struct.pack(">i", v)
        return self

    def write_long(self, v):
        self.b += struct.pack(">q", v)
        return self

    def write_byte(self, v):
        self.b.append(v & 0xFF)
        return self

    def write_utf(self, s):
        # DataOutputStream.writeUTF is MODIFIED UTF-8: NUL -> C0 80,
        # astral -> CESU-8 surrogate pairs (emulated independently of the
        # library's encoder: per-UTF-16-unit, straight from the JDK spec)
        e = bytearray()
        u16 = s.encode("utf-16-be", "surrogatepass")
        for i in range(0, len(u16), 2):
            c = (u16[i] << 8) | u16[i + 1]
            if 0x01 <= c <= 0x7F:
                e.append(c)
            elif c <= 0x7FF:
                e += bytes([0xC0 | (c >> 6), 0x80 | (c & 0x3F)])
            else:
                e += bytes([
                    0xE0 | (c >> 12),
                    0x80 | ((c >> 6) & 0x3F),
                    0x80 | (c & 0x3F),
                ])
        self.b += struct.pack(">H", len(e)) + bytes(e)
        return self

    def write(self, raw):
        self.b += raw
        return self


def _golden_savepoint_bytes() -> bytes:
    """Checkpoints.storeCheckpointMetadata + SavepointV2Serializer.serialize
    for: checkpoint 42, one master state (skippable), one operator
    (uid 'my-op', parallelism 2, maxp 128) with two subtasks:
    subtask 0 → managed keyed KeyGroupsStateHandle (groups 0-63, offsets
    i*100, file handle), plus a managed operator-state handle
    (one UNION state 'offsets' with 2 offsets, byte-stream delegate);
    subtask 1 → raw keyed ByteStream-backed handle only."""
    d = Dos()
    d.write_int(0x4960672D)  # header magic
    d.write_int(2)  # savepoint version
    d.write_long(42)  # checkpoint id

    # one master state: magic + framed payload (content arbitrary)
    payload = Dos().write_int(1).write_utf("ms").write_int(3).write(b"abc").b
    d.write_int(1)
    d.write_int(0xC96B1696 - (1 << 32))  # writeInt of the (signed) magic
    d.write_int(len(payload))
    d.write(bytes(payload))

    d.write_int(1)  # one operator
    oid = operator_id("my-op")
    d.write(oid[:8])  # writeLong(lowerPart)
    d.write(oid[8:16])  # writeLong(upperPart)
    d.write_int(2)  # parallelism
    d.write_int(128)  # max parallelism
    d.write_int(2)  # collected subtask states

    # --- subtask 0 ---
    d.write_int(0)  # subtask index
    d.write_long(-1)  # removed duration field
    d.write_int(0)  # legacy state count
    # managed operator state present
    d.write_int(1)
    d.write_byte(4)  # PARTITIONABLE_OPERATOR_STATE_HANDLE
    d.write_int(1)  # one state
    d.write_utf("offsets")
    d.write_byte(1)  # Mode.UNION ordinal
    d.write_int(2)
    d.write_long(0)
    d.write_long(17)
    d.write_byte(1)  # BYTE_STREAM_STATE_HANDLE delegate
    d.write_utf("bytehandle")
    d.write_int(4)
    d.write(b"DATA")
    # raw operator state absent
    d.write_int(0)
    # managed keyed: KEY_GROUPS_HANDLE
    d.write_byte(3)
    d.write_int(0)  # start key group
    d.write_int(64)  # num key groups
    for i in range(64):
        d.write_long(i * 100)
    d.write_byte(2)  # FILE_STREAM_STATE_HANDLE
    d.write_long(12345)
    d.write_utf("file:/cp/op-0-abc")
    # raw keyed: null
    d.write_byte(0)

    # --- subtask 1 ---
    d.write_int(1)
    d.write_long(-1)
    d.write_int(0)
    d.write_int(0)  # no managed op state
    d.write_int(0)  # no raw op state
    d.write_byte(0)  # managed keyed null
    d.write_byte(3)  # raw keyed KEY_GROUPS_HANDLE
    d.write_int(64)
    d.write_int(64)
    for i in range(64):
        d.write_long(7000 + i)
    d.write_byte(1)  # byte-stream handle
    d.write_utf("raw")
    d.write_int(2)
    d.write(b"\x01\x02")

    return bytes(d.b)


def test_parses_foreign_golden_bytes():
    sp = fm.deserialize(_golden_savepoint_bytes())
    assert sp.checkpoint_id == 42
    assert len(sp.operators) == 1
    op = sp.operators[0]
    assert op.operator_id == operator_id("my-op")
    assert (op.parallelism, op.max_parallelism) == (2, 128)

    st0, st1 = op.subtasks
    assert st0.subtask_index == 0
    assert st0.managed_op is not None
    assert st0.managed_op.states == [("offsets", fm.MODE_UNION, [0, 17])]
    assert st0.managed_op.stream.kind == fm.BYTE_STREAM_STATE_HANDLE
    assert st0.managed_op.stream.data == b"DATA"
    mk = st0.managed_keyed
    assert (mk.start_key_group, mk.num_key_groups) == (0, 64)
    assert mk.offsets[13] == 1300
    assert mk.stream.kind == fm.FILE_STREAM_STATE_HANDLE
    assert (mk.stream.size, mk.stream.path) == (12345, "file:/cp/op-0-abc")
    assert st0.raw_keyed is None

    assert st1.managed_keyed is None and st1.managed_op is None
    rk = st1.raw_keyed
    assert (rk.start_key_group, rk.num_key_groups) == (64, 64)
    assert rk.offsets[0] == 7000
    assert rk.stream.data == b"\x01\x02"


def test_golden_bytes_reserialize_identically():
    """serialize(deserialize(x)) == x, INCLUDING the master-state frame,
    which is carried as an opaque payload and re-emitted verbatim."""
    full = _golden_savepoint_bytes()
    sp = fm.deserialize(full)
    assert len(sp.master_states) == 1
    assert fm.serialize(sp) == full


def test_incremental_handle_golden():
    """IncrementalKeyedStateHandle branch of serializeKeyedStateHandle —
    checkpoint id, backend id UTF, range, meta handle, shared+private maps."""
    d = Dos()
    d.write_int(0x4960672D).write_int(2).write_long(7)
    d.write_int(0)  # masters
    d.write_int(1)  # one operator
    oid = operator_id("inc-op")
    d.write(oid)
    d.write_int(1).write_int(128).write_int(1)
    d.write_int(0)  # subtask 0
    d.write_long(-1).write_int(0).write_int(0).write_int(0)
    d.write_byte(5)  # INCREMENTAL_KEY_GROUPS_HANDLE
    d.write_long(99)  # checkpoint id
    d.write_utf("backend-uuid-1")
    d.write_int(0).write_int(128)
    d.write_byte(1).write_utf("meta").write_int(1).write(b"M")  # meta handle
    # shared: two sst files
    d.write_int(2)
    d.write_utf("000007.sst")
    d.write_byte(2).write_long(111).write_utf("file:/shared/000007.sst")
    d.write_utf("000009.sst")
    d.write_byte(2).write_long(222).write_utf("file:/shared/000009.sst")
    # private: MANIFEST
    d.write_int(1)
    d.write_utf("MANIFEST-000004")
    d.write_byte(2).write_long(333).write_utf("file:/private/MANIFEST-000004")
    d.write_byte(0)  # raw keyed null

    sp = fm.deserialize(bytes(d.b))
    h = sp.operators[0].subtasks[0].managed_keyed
    assert isinstance(h, fm.IncrementalKeyedHandle)
    assert (h.checkpoint_id, h.backend_id) == (99, "backend-uuid-1")
    assert (h.start_key_group, h.num_key_groups) == (0, 128)
    assert h.meta.data == b"M"
    assert [(n, s.path) for n, s in h.shared] == [
        ("000007.sst", "file:/shared/000007.sst"),
        ("000009.sst", "file:/shared/000009.sst"),
    ]
    assert h.private[0][0] == "MANIFEST-000004"
    # and the writer reproduces the exact foreign bytes
    assert fm.serialize(sp) == bytes(d.b)


def test_roundtrip():
    h = fm.KeyGroupsHandle(
        0, 64, [0] * 10 + list(range(100, 640, 10)),
        fm.StreamStateHandle(fm.FILE_STREAM_STATE_HANDLE, 12345, path="file:/cp/op-0-abc"),
    )
    op = fm.OperatorStateMeta(operator_id("my-op"), 2, 128)
    op.subtasks.append(fm.SubtaskState(0, managed_keyed=h))
    op.subtasks.append(fm.SubtaskState(1))
    sp = fm.FlinkSavepoint(7, [op])
    back = fm.deserialize(fm.serialize(sp))
    assert back.checkpoint_id == 7
    assert back.operators[0].subtasks[0].managed_keyed.offsets[15] == 150
    assert back.operators[0].subtasks[1].managed_keyed is None


def test_header_layout_golden():
    buf = fm.serialize(fm.FlinkSavepoint(checkpoint_id=1))
    assert buf == bytes.fromhex(
        "4960672d" "00000002" "0000000000000001" "00000000" "00000000"
    )


def test_bad_magic_rejected():
    with pytest.raises(fm.FlinkMetadataError, match="bad magic"):
        fm.deserialize(b"\x00\x00\x00\x00" + b"\x00" * 20)


def test_trailing_bytes_rejected():
    buf = _golden_savepoint_bytes() + b"\x99"
    with pytest.raises(fm.FlinkMetadataError, match="trailing"):
        fm.deserialize(buf)


def test_unknown_keyed_tag_rejected():
    d = Dos()
    d.write_int(0x4960672D).write_int(2).write_long(1).write_int(0)
    d.write_int(1)
    d.write(operator_id("x")).write_int(1).write_int(128).write_int(1)
    d.write_int(0).write_long(-1).write_int(0).write_int(0).write_int(0)
    d.write_byte(9)  # bogus keyed tag
    with pytest.raises(fm.FlinkMetadataError, match="keyed handle tag 9"):
        fm.deserialize(bytes(d.b))


# ---------------------------------------------------------------------------
# refusal + fuzz hardening: the writer must REFUSE what it cannot
# re-serialize, and the parser must fail with FlinkMetadataError (never a
# stray IndexError/struct.error, never a silent mis-parse) on damaged input
# ---------------------------------------------------------------------------


def test_writer_refuses_foreign_handle_kinds():
    sp = fm.FlinkSavepoint(1)
    op = fm.OperatorStateMeta(operator_id("x"), 1, 128)
    bogus_stream = fm.StreamStateHandle(kind=77, size=1, data=b"z")
    op.subtasks.append(
        fm.SubtaskState(
            0,
            managed_keyed=fm.KeyGroupsHandle(0, 128, [0] * 128, bogus_stream),
        )
    )
    sp.operators.append(op)
    with pytest.raises(fm.FlinkMetadataError, match="stream handle kind"):
        fm.serialize(sp)

    class NotAHandle:
        pass

    op.subtasks[0].managed_keyed = NotAHandle()
    with pytest.raises(fm.FlinkMetadataError, match="unsupported keyed"):
        fm.serialize(sp)


def test_fuzz_every_truncation_raises_cleanly():
    buf = _golden_savepoint_bytes()
    for i in range(len(buf)):
        with pytest.raises(fm.FlinkMetadataError):
            fm.deserialize(buf[:i])


def test_fuzz_bitflips_refused_or_stable():
    """Flip every byte of a golden savepoint: deserialize must either
    refuse with FlinkMetadataError or yield an object whose own
    serialization is a FIXPOINT (parse->print->parse->print is stable) —
    i.e. damage is either detected or normalized, never amplified into a
    metadata file the next reader sees differently."""
    base = _golden_savepoint_bytes()
    refused = stable = 0
    for i in range(len(base)):
        mut = bytearray(base)
        mut[i] ^= 0xFF
        try:
            sp = fm.deserialize(bytes(mut))
        except fm.FlinkMetadataError:
            refused += 1
            continue
        out = fm.serialize(sp)
        assert fm.serialize(fm.deserialize(out)) == out, f"unstable at byte {i}"
        stable += 1
    # sanity: both classes must actually occur on a real golden
    assert refused > 0 and stable > 0


# --- sections our own writer NEVER produces: the parser must handle the
# full SavepointV2Serializer surface, not just its own round-trip ---


def _foreign_layout_bytes() -> bytes:
    """A savepoint exercising optional sections and orderings
    bravo_spark's writer has never emitted: two master states, a
    modified-UTF-8 state name with an embedded NUL and an astral char
    (hand-encoded byte literals, straight from the JDK writeUTF spec), a
    BROADCAST-mode state with an empty offsets list, an operator with
    ZERO subtasks, and a subtask whose RAW keyed handle is incremental
    while managed is null."""
    d = Dos()
    d.write_int(0x4960672D).write_int(2).write_long(7)
    # two master states, arbitrary payloads
    d.write_int(2)
    for payload in (b"\x01\x02\x03", b""):
        d.write_int(0xC96B1696 - (1 << 32)).write_int(len(payload)).write(payload)
    d.write_int(2)  # two operators

    # operator 0: zero subtasks (a stateless chain member)
    d.write(operator_id("stateless-op")).write_int(4).write_int(128)
    d.write_int(0)

    # operator 1: one subtask
    d.write(operator_id("weird-op")).write_int(1).write_int(128)
    d.write_int(1)
    d.write_int(0)  # subtask index
    d.write_long(-1)  # removed duration
    d.write_int(0)  # legacy state count
    # managed operator-state handle with a BROADCAST state whose name is
    # "st\x00ate\U0001F389": modified UTF-8 is 73 74 C0 80 61 74 65 then
    # CESU-8 surrogates ED A0 BC ED BE 89 — 13 bytes, written literally
    # so the vector's provenance is the JDK spec, not any encoder
    d.write_int(1)
    d.write_byte(4)  # PARTITIONABLE_OPERATOR_STATE_HANDLE
    d.write_int(1)  # one state
    d.write(struct.pack(">H", 13))
    d.write(bytes([0x73, 0x74, 0xC0, 0x80, 0x61, 0x74, 0x65,
                   0xED, 0xA0, 0xBC, 0xED, 0xBE, 0x89]))
    d.write_byte(2)  # MODE_BROADCAST
    d.write_int(0)  # EMPTY offsets list
    d.write_byte(1)  # byte-stream delegate, empty body
    d.write_utf("empty-delegate")
    d.write_int(0)
    d.write_int(0)  # no raw operator-state handle
    d.write_byte(0)  # managed keyed: NULL
    # raw keyed: INCREMENTAL (our writer only ever put incremental
    # handles on the managed side)
    d.write_byte(5)
    d.write_long(7).write_utf("backend-αβ")
    d.write_int(32).write_int(32)
    d.write_byte(2)  # meta: file handle
    d.write_long(100).write_utf("file:/cp-7/meta")
    d.write_int(1)  # shared map: one entry
    d.write_utf("001.sst")
    d.write_byte(2)
    d.write_long(4096).write_utf("file:/shared/001.sst")
    d.write_int(0)  # private map: empty
    return bytes(d.b)


def test_foreign_layout_parses():
    sp = fm.deserialize(_foreign_layout_bytes())
    assert sp.checkpoint_id == 7
    assert sp.master_states == [b"\x01\x02\x03", b""]
    assert len(sp.operators) == 2
    assert sp.operators[0].subtasks == []
    (st,) = sp.operators[1].subtasks
    (name, mode, offsets) = st.managed_op.states[0]
    assert name == "st\x00ate\U0001F389"  # NUL + astral via modified UTF-8
    assert mode == fm.MODE_BROADCAST
    assert offsets == []
    assert st.managed_op.stream.data == b""
    assert st.managed_keyed is None
    rk = st.raw_keyed
    assert isinstance(rk, fm.IncrementalKeyedHandle)
    assert rk.backend_id == "backend-αβ"
    assert rk.shared == [("001.sst", fm.StreamStateHandle(
        fm.FILE_STREAM_STATE_HANDLE, 4096, path="file:/shared/001.sst"))]


def test_foreign_layout_reserializes_byte_exactly():
    raw = _foreign_layout_bytes()
    assert fm.serialize(fm.deserialize(raw)) == raw


def test_legacy_state_entries_absorbed():
    """Flink <1.4 jobs carried per-subtask legacy operator state; 1.7's
    serializer still reads/writes the (now always-empty-in-new-files)
    section. A foreign file with a legacy entry must parse — the entry is
    absorbed like the reference's load path does — and reserialize to the
    EQUIVALENT file with the legacy section emptied (not byte-exact by
    design; asserting the documented drop)."""
    d = Dos()
    d.write_int(0x4960672D).write_int(2).write_long(3)
    d.write_int(0)  # no master states
    d.write_int(1)
    d.write(operator_id("old-op")).write_int(1).write_int(128)
    d.write_int(1)
    d.write_int(0)  # subtask index
    d.write_long(-1)
    d.write_int(1)  # ONE legacy state handle
    d.write_byte(2)  # file stream handle
    d.write_long(55).write_utf("file:/legacy/blob")
    d.write_int(0)  # no managed op handle
    d.write_int(0)  # no raw op handle
    d.write_byte(0)  # managed keyed null
    d.write_byte(0)  # raw keyed null
    raw = bytes(d.b)
    sp = fm.deserialize(raw)
    (st,) = sp.operators[0].subtasks
    assert st.managed_op is None and st.managed_keyed is None
    out = fm.serialize(sp)
    assert out != raw  # legacy section dropped...
    sp2 = fm.deserialize(out)  # ...but the rest survives equivalent
    assert sp2.operators[0].operator_id == sp.operators[0].operator_id


def test_modified_utf8_roundtrip_through_writer():
    """Names our writer re-emits must use writeUTF's modified UTF-8 so a
    JVM DataInputStream.readUTF can read them back."""
    for name in ("plain", "st\x00ate", "emoji-\U0001F389", "αβγ߿"):
        body = fm._w_utf(name)
        # independent decode per the JDK spec (the Dos emulation inverse)
        n = struct.unpack(">H", body[:2])[0]
        raw = body[2 : 2 + n]
        assert b"\x00" not in raw  # NUL never appears as a raw zero byte
        assert not any(b >= 0xF0 for b in raw)  # no 4-byte sequences
        assert fm._R(body).utf() == name


def test_java_utf_decode_rejects_bad_continuation_bytes():
    """readUTF throws UTFDataFormatException when a multi-byte sequence's
    continuation byte isn't 10xxxxxx; the parser must refuse (not decode a
    garbage character) for the same inputs — in both the 2- and 3-byte
    branches."""
    import pytest as _pytest

    from bravo_spark.sources.flink_metadata import _java_utf_decode

    # valid round-trips still pass
    assert _java_utf_decode(b"\xc3\xa9") == "é"
    assert _java_utf_decode(b"\xe2\x82\xac") == "€"

    for bad in (b"\xc3A", b"\xe2A\xac", b"\xe2\x82A"):
        with _pytest.raises(ValueError, match="continuation byte"):
            _java_utf_decode(bad)


def test_java_utf_property_roundtrip():
    """Property: encode→decode is the identity for any Python string the
    JVM could hold — BMP text, astral characters (CESU-8 pairs), NUL
    (C0 80), and LONE surrogates (legal in Java strings)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bravo_spark.sources.flink_metadata import (
        _java_utf_decode,
        _java_utf_encode,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=60))
    def roundtrip(s):
        assert _java_utf_decode(_java_utf_encode(s)) == s

    roundtrip()

    # explicit cases hypothesis's default alphabet never generates
    for s in ("\x00", "a\x00b", "\ud800", "x\udfffy", "\U0001f600",
              "😀"):  # the last: an already-paired surrogate pair
        got = _java_utf_decode(_java_utf_encode(s))
        # a d800/de00 pair merges to the astral char (Java string equality
        # is on UTF-16 units, where those are the same string)
        want = s.encode("utf-16-be", "surrogatepass").decode(
            "utf-16-be", "surrogatepass"
        )
        assert got == want


def test_writer_property_fuzz_roundtrip():
    """WRITER fuzz (r8): random savepoint object graphs — mixed
    KeyGroups/Incremental keyed handles, file/byte stream handles, all
    operator-state distribution modes, names that stress modified UTF-8
    (NUL, astral, combining) — must deserialize back to an EQUAL graph
    and re-serialize to the IDENTICAL bytes (fixpoint). The dual of the
    truncation/bitflip reader fuzz above: the writer can never emit a
    layout the strict parser reads differently."""
    import random

    alphabet = "ab0/-éĀ\U0001F600\x00́"

    for seed in range(40):
        rnd = random.Random(seed)

        def rnd_str():
            return "".join(
                rnd.choice(alphabet) for _ in range(rnd.randrange(0, 12))
            )

        def rnd_stream():
            if rnd.random() < 0.5:
                return fm.StreamStateHandle(
                    fm.FILE_STREAM_STATE_HANDLE, rnd.randrange(1 << 30),
                    path="file:/cp/" + rnd_str(),
                )
            data = bytes(rnd.randrange(256) for _ in range(rnd.randrange(0, 40)))
            return fm.StreamStateHandle(
                fm.BYTE_STREAM_STATE_HANDLE, len(data),
                path=rnd_str(), data=data,
            )

        def rnd_keyed():
            if rnd.random() < 0.6:
                n = rnd.randrange(1, 16)
                return fm.KeyGroupsHandle(
                    rnd.randrange(0, 64), n,
                    [rnd.randrange(1 << 20) for _ in range(n)], rnd_stream(),
                )
            return fm.IncrementalKeyedHandle(
                rnd.randrange(1 << 16), rnd_str() or "backend",
                rnd.randrange(0, 32), rnd.randrange(1, 8), rnd_stream(),
                [(rnd_str(), rnd_stream()) for _ in range(rnd.randrange(0, 3))],
                [(rnd_str(), rnd_stream()) for _ in range(rnd.randrange(0, 3))],
            )

        def rnd_opstate():
            return fm.OperatorStateHandleMeta(
                [
                    (rnd_str(), rnd.randrange(3),
                     sorted(rnd.randrange(1 << 20)
                            for _ in range(rnd.randrange(1, 4))))
                    for _ in range(rnd.randrange(1, 3))
                ],
                rnd_stream(),
            )

        ops = []
        for _ in range(rnd.randrange(1, 4)):
            parallelism = rnd.randrange(1, 5)
            op = fm.OperatorStateMeta(
                bytes(rnd.randrange(256) for _ in range(16)),
                parallelism, 128,
            )
            for i in range(parallelism):
                op.subtasks.append(
                    fm.SubtaskState(
                        i,
                        managed_keyed=rnd_keyed() if rnd.random() < 0.7 else None,
                        raw_keyed=rnd_keyed() if rnd.random() < 0.3 else None,
                        managed_op=rnd_opstate() if rnd.random() < 0.5 else None,
                        raw_op=rnd_opstate() if rnd.random() < 0.2 else None,
                    )
                )
            ops.append(op)
        sp = fm.FlinkSavepoint(rnd.randrange(1 << 40), ops)
        buf = fm.serialize(sp)
        back = fm.deserialize(buf)
        assert back == sp, f"graph changed through the wire (seed {seed})"
        assert fm.serialize(back) == buf, f"not a fixpoint (seed {seed})"


# --- JVM-written vectors: the REAL java.io.DataOutputStream ---------------
#
# Everything above emulates DataOutputStream; the tests below remove even
# that emulation from the trust chain by producing the bytes inside this
# Spark's JVM with the actual JDK class — the very primitives
# (writeInt/writeLong/writeByte/writeUTF) Flink's SavepointV2Serializer
# calls (StateMetadataUtils.java:59-74 loads what those wrote). A wrong
# modified-UTF-8 table, endianness, or sign convention in our codec would
# diverge from these bytes even if the Python emulation repeated the bug.


@pytest.fixture()
def jdos(spark):
    j = spark._jvm

    class D:
        def __init__(self):
            self.bos = j.java.io.ByteArrayOutputStream()
            self.d = j.java.io.DataOutputStream(self.bos)

        def write_int(self, v):
            self.d.writeInt(v - (1 << 32) if v >= (1 << 31) else v)
            return self

        def write_long(self, v):
            self.d.writeLong(v)
            return self

        def write_byte(self, v):
            self.d.writeByte(v)
            return self

        def write_utf(self, s):
            self.d.writeUTF(s)
            return self

        def write(self, b):
            self.d.write(b, 0, len(b))
            return self

        def bytes(self):
            self.d.flush()
            return bytes(self.bos.toByteArray())

    return D


def test_jvm_writeutf_matches_codec(jdos):
    """Our modified-UTF-8 encoder (length-prefixed _w_utf) must be
    byte-identical to the JDK's DataOutputStream.writeUTF for every
    profile the savepoint format can carry: ASCII, Latin-1, CJK, an
    embedded NUL (C0 80), and astral chars (CESU-8 surrogate pairs)."""
    cases = [
        "",
        "a",
        "state-name",
        "héllo çödec",
        "キー状態",
        "mixed ascii + ünïcode + 漢字",
        "nul\x00inside",
        "astral \U0001D11E\U0001F389 pair",
        "\U0001F600" * 40,
        "x" * 300,
    ]
    for s in cases:
        jvm_bytes = jdos().write_utf(s).bytes()
        assert fm._w_utf(s) == jvm_bytes, f"writeUTF divergence on {s!r}"


def test_jvm_dataoutputstream_metadata_vector(jdos):
    """A full SavepointV2 _metadata stream written by the REAL
    DataOutputStream (the serializer's exact output primitives), covering
    both keyed-handle kinds, an operator-state handle with a NUL+astral
    state name through the real writeUTF, and a master state. Pins
    deserialize against JDK-produced bytes and serialize to a byte-exact
    re-encode of them."""
    d = jdos()
    d.write_int(0x4960672D).write_int(2).write_long(42)
    d.write_int(1)  # one master state
    d.write_int(0xC96B1696).write_int(3).write(b"\x09\x08\x07")
    d.write_int(2)  # two operators

    # operator 0: one subtask, managed KEY_GROUPS + op-state with a
    # modified-UTF-8-hostile name, raw sides null
    d.write(operator_id("jvm-op-a")).write_int(1).write_int(128)
    d.write_int(1)
    d.write_int(0).write_long(-1).write_int(0)
    d.write_int(1)  # managed operator-state handle present
    d.write_byte(4)  # PARTITIONABLE_OPERATOR_STATE_HANDLE
    d.write_int(1)
    d.write_utf("st\x00ate\U0001F389")  # REAL writeUTF does the encoding
    d.write_byte(1)  # MODE_UNION
    d.write_int(2).write_long(0).write_long(77)
    d.write_byte(1)  # byte-stream delegate
    d.write_utf("delegate-ünït")
    d.write_int(2).write(b"\xab\xcd")
    d.write_int(0)  # no raw op-state
    d.write_byte(3)  # managed keyed: KEY_GROUPS_HANDLE
    d.write_int(0).write_int(2).write_long(0).write_long(123)
    d.write_byte(2)  # file stream handle
    d.write_long(4096).write_utf("file:/sp-42/op-a/keyed")
    d.write_byte(0)  # raw keyed: null

    # operator 1: one subtask, managed incremental keyed handle only
    d.write(operator_id("jvm-op-b")).write_int(1).write_int(4096)
    d.write_int(1)
    d.write_int(0).write_long(-1).write_int(0)
    d.write_int(0).write_int(0)
    d.write_byte(5)  # INCREMENTAL_KEY_GROUPS_HANDLE
    d.write_long(42).write_utf("backend-漢字")
    d.write_int(0).write_int(4096)
    d.write_byte(2)
    d.write_long(512).write_utf("file:/cp-42/meta")
    d.write_int(1)
    d.write_utf("000042.sst")
    d.write_byte(2)
    d.write_long(1 << 31).write_utf("file:/shared/000042.sst")
    d.write_int(0)
    d.write_byte(0)  # raw keyed: null

    raw = d.bytes()
    sp = fm.deserialize(raw)
    assert sp.checkpoint_id == 42
    assert sp.master_states == [b"\x09\x08\x07"]
    a, b = sp.operators
    assert a.operator_id == operator_id("jvm-op-a")
    (st,) = a.subtasks
    name, mode, offsets = st.managed_op.states[0]
    assert name == "st\x00ate\U0001F389"
    assert mode == fm.MODE_UNION and offsets == [0, 77]
    assert st.managed_op.stream.data == b"\xab\xcd"
    assert st.managed_keyed.start_key_group == 0
    assert st.managed_keyed.offsets == [0, 123]
    assert st.managed_keyed.stream.path == "file:/sp-42/op-a/keyed"
    (stb,) = b.subtasks
    inc = stb.managed_keyed
    assert isinstance(inc, fm.IncrementalKeyedHandle)
    assert inc.backend_id == "backend-漢字"
    assert inc.shared[0][1].size == 1 << 31
    # and our writer reproduces the JDK bytes exactly
    assert fm.serialize(sp) == raw


def test_audit_flink_savepoint_defect_injection(spark, tmp_path):
    """audit_flink_savepoint (r16): healthy savepoint dir (file handle
    resolved by basename — the relocated case) audits clean; then one
    finding per injected defect — missing handle file, torn copy (size
    mismatch), offset past stream size, offsets/num mismatch,
    overlapping subtask ranges, coverage gap (info), unreadable
    metadata."""
    from bravo_spark import maintenance as mt

    spdir = tmp_path / "sp"
    spdir.mkdir()
    state = spdir / "op-0-abc"
    state.write_bytes(b"\x01" * 640)

    def write_meta(sp):
        (spdir / "_metadata").write_bytes(fm.serialize(sp))

    def handle(start, num, offsets, size=640, path="file:/moved/op-0-abc"):
        return fm.KeyGroupsHandle(
            start, num, offsets,
            fm.StreamStateHandle(fm.FILE_STREAM_STATE_HANDLE, size, path=path),
        )

    op = fm.OperatorStateMeta(operator_id("my-op"), 2, 128)
    op.subtasks.append(fm.SubtaskState(0, managed_keyed=handle(0, 64, list(range(0, 640, 10)))))
    op.subtasks.append(fm.SubtaskState(1, managed_keyed=handle(64, 64, list(range(0, 640, 10)))))
    write_meta(fm.FlinkSavepoint(7, [op]))
    rows = mt.audit_flink_savepoint(spark, str(spdir)).collect()
    assert rows == []  # absolute path dead, basename next to _metadata OK

    # torn copy: shrink the state file
    state.write_bytes(b"\x01" * 600)
    checks = {r["check"] for r in mt.audit_flink_savepoint(spark, str(spdir)).collect()}
    assert checks == {"size_mismatch"}
    state.write_bytes(b"\x01" * 640)

    # missing file + offset out of bounds + count mismatch + overlap + gap
    op2 = fm.OperatorStateMeta(operator_id("my-op"), 3, 128)
    op2.subtasks.append(fm.SubtaskState(0, managed_keyed=handle(0, 64, list(range(0, 640, 10)))))
    # overlaps subtask 0's range and has an offset >= the stream size
    op2.subtasks.append(fm.SubtaskState(1, managed_keyed=handle(32, 2, [0, 700])))
    # file that exists nowhere
    op2.subtasks.append(fm.SubtaskState(
        2, managed_keyed=handle(96, 8, [0] * 8, path="file:/moved/op-9-zzz")))
    write_meta(fm.FlinkSavepoint(8, [op2]))
    rows = mt.audit_flink_savepoint(spark, str(spdir)).collect()
    checks = {r["check"] for r in rows}
    assert {"missing_state_file", "offset_out_of_bounds",
            "keygroup_overlap"} <= checks
    gaps = [r for r in rows if r["check"] == "keygroup_gap"]
    assert gaps and gaps[0]["severity"] == "info"

    # unreadable metadata is a finding, not a crash
    (spdir / "_metadata").write_bytes(b"\x00bogus")
    rows = mt.audit_flink_savepoint(spark, str(spdir)).collect()
    assert [r["check"] for r in rows] == ["metadata_unreadable"]


def test_audit_flink_savepoint_operator_state_defects(spark, tmp_path):
    """The non-keyed audit symmetry (r17): a healthy operator-state
    handle (file stream resolved by basename, in-bounds strictly
    increasing offsets, known modes) audits clean; then one finding per
    injected defect class — offset past the recorded stream size,
    non-increasing offsets, an unknown distribution-mode ordinal, a
    duplicate state name, and the shared stream checks (missing file /
    torn copy) firing for operator-state streams too."""
    from bravo_spark import maintenance as mt

    spdir = tmp_path / "sp"
    spdir.mkdir()
    opfile = spdir / "op-state-xyz"
    opfile.write_bytes(b"\x02" * 200)

    def write_meta(states, *, size=200, path="file:/moved/op-state-xyz",
                   kind=fm.FILE_STREAM_STATE_HANDLE, data=None):
        op = fm.OperatorStateMeta(operator_id("np-op"), 1, 128)
        op.subtasks.append(fm.SubtaskState(0, managed_op=fm.OperatorStateHandleMeta(
            states,
            fm.StreamStateHandle(kind, size, path=path, data=data),
        )))
        (spdir / "_metadata").write_bytes(
            fm.serialize(fm.FlinkSavepoint(9, [op])))

    def checks():
        return sorted(
            r["check"]
            for r in mt.audit_flink_savepoint(spark, str(spdir)).collect()
        )

    # healthy: two states, strictly increasing in-bounds offsets, all
    # three legal modes seen
    write_meta([
        ("bufferA", fm.MODE_SPLIT_DISTRIBUTE, [0, 50, 120]),
        ("bufferB", fm.MODE_UNION, [0]),
        ("rules", fm.MODE_BROADCAST, [10, 180]),
    ])
    assert checks() == []

    # offset at/past the recorded stream size
    write_meta([("bufferA", fm.MODE_SPLIT_DISTRIBUTE, [0, 200])])
    assert checks() == ["op_state_offset_out_of_bounds"]

    # offsets not strictly increasing
    write_meta([("bufferA", fm.MODE_SPLIT_DISTRIBUTE, [0, 50, 50])])
    assert checks() == ["op_state_offset_disorder"]

    # unknown distribution mode ordinal
    write_meta([("bufferA", 7, [0, 50])])
    assert checks() == ["op_state_unknown_mode"]

    # duplicate state name within one handle
    write_meta([
        ("bufferA", fm.MODE_SPLIT_DISTRIBUTE, [0]),
        ("bufferA", fm.MODE_SPLIT_DISTRIBUTE, [50]),
    ])
    assert checks() == ["op_state_duplicate_name"]

    # the shared stream checks also fire for operator-state streams:
    # torn copy
    opfile.write_bytes(b"\x02" * 150)
    write_meta([("bufferA", fm.MODE_SPLIT_DISTRIBUTE, [0, 50])])
    assert checks() == ["size_mismatch"]
    # missing file
    write_meta([("bufferA", fm.MODE_SPLIT_DISTRIBUTE, [0, 50])],
               path="file:/moved/op-state-gone")
    assert checks() == ["missing_state_file"]
    opfile.write_bytes(b"\x02" * 200)

    # byte-stream handles: offsets validate against the inline size too
    write_meta([("bufferA", fm.MODE_SPLIT_DISTRIBUTE, [0, 99])],
               kind=fm.BYTE_STREAM_STATE_HANDLE, size=100,
               path="inline", data=b"\x00" * 100)
    assert checks() == []
    write_meta([("bufferA", fm.MODE_SPLIT_DISTRIBUTE, [0, 100])],
               kind=fm.BYTE_STREAM_STATE_HANDLE, size=100,
               path="inline", data=b"\x00" * 100)
    assert checks() == ["op_state_offset_out_of_bounds"]
