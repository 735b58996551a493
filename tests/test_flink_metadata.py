"""Round-trip self-tests for the best-effort Flink _metadata codec."""

from __future__ import annotations

import pytest

from bravo_spark.codecs.hashes import operator_id
from bravo_spark.sources import flink_metadata as fm


def _sample() -> fm.FlinkSavepoint:
    h = fm.KeyGroupsHandle(
        start_key_group=0,
        num_key_groups=64,
        offsets=[0] * 10 + list(range(100, 640, 10)),
        stream=fm.StreamStateHandle(
            fm.FILE_STREAM_STATE_HANDLE, 12345, path="file:/cp/op-0-abc"
        ),
    )
    op = fm.OperatorStateMeta(operator_id("my-op"), parallelism=2, max_parallelism=128)
    op.subtasks.append(fm.SubtaskState(0, managed_keyed=h))
    op.subtasks.append(fm.SubtaskState(1, managed_keyed=None))
    return fm.FlinkSavepoint(checkpoint_id=7, operators=[op])


def test_roundtrip():
    sp = _sample()
    buf = fm.serialize(sp)
    back = fm.deserialize(buf)
    assert back.checkpoint_id == 7
    assert back.operators[0].operator_id == operator_id("my-op")
    assert back.operators[0].parallelism == 2
    st0 = back.operators[0].subtasks[0]
    assert st0.managed_keyed.num_key_groups == 64
    assert st0.managed_keyed.offsets[15] == 150
    assert st0.managed_keyed.stream.path == "file:/cp/op-0-abc"
    assert back.operators[0].subtasks[1].managed_keyed is None


def test_header_layout_golden():
    buf = fm.serialize(fm.FlinkSavepoint(checkpoint_id=1))
    # magic 0x4960672D, version 2, checkpoint id 1, 0 master, 0 operators
    assert buf == bytes.fromhex("4960672d" "00000002" "0000000000000001"
                                "00000000" "00000000")


def test_bad_magic_rejected():
    with pytest.raises(fm.FlinkMetadataError, match="bad magic"):
        fm.deserialize(b"\x00\x00\x00\x00" + b"\x00" * 20)


def test_trailing_bytes_rejected():
    buf = fm.serialize(_sample()) + b"\x99"
    with pytest.raises(fm.FlinkMetadataError, match="trailing"):
        fm.deserialize(buf)


def test_unsupported_incremental_handle_rejected():
    sp = _sample()
    buf = bytearray(fm.serialize(sp))
    # corrupt the KEY_GROUPS_HANDLE tag into INCREMENTAL (5)
    idx = buf.index(bytes([fm.KEY_GROUPS_HANDLE]))
    buf[idx] = fm.INCREMENTAL_KEY_GROUPS_HANDLE
    with pytest.raises(fm.FlinkMetadataError, match="unsupported keyed handle"):
        fm.deserialize(bytes(buf))
