"""Golden wire-format vectors for the vendored minimal protobuf runtime
(`spark_ifs_spark/vendor/protoshim`), checked against hand-computed
bytes from the public encoding spec. The authoritative validation is the
JVM round-trip in ``test_streaming.py::test_running_user_stats_tws_parity``
(the JVM parses our serializations with real protobuf); these vectors
pin the codec so a regression fails fast with a readable diff.

When the environment has REAL protobuf installed, these tests exercise
it instead (ensure_protobuf never shadows a real install) — the vectors
hold either way, which is exactly the point.
"""

from __future__ import annotations

import pytest

from spark_ifs_spark.streaming.stateful import ensure_protobuf

pytestmark = pytest.mark.skipif(
    not ensure_protobuf(), reason="no protobuf and shim failed to activate"
)


def _sm():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_nested_oneof_request_bytes():
    sm = _sm()
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    # SetHandleState{state=2}=0802; SPCall{f1=<2B>}=0a020802; SR{f2=<4B>}
    assert req.SerializeToString() == bytes.fromhex("12040a020802")


def test_autovivified_submessage_marks_presence():
    sm = _sm()
    cmd = sm.StateCallCommand()
    cmd.stateName = "agg"
    cmd.schema = "s"
    cmd.ttl.durationMs = 5000  # auto-vivified child must serialize
    assert cmd.SerializeToString() == bytes.fromhex(
        "0a03616767" "120173" "2203088827"
    )


def test_unset_submessage_not_serialized():
    sm = _sm()
    cmd = sm.StateCallCommand(stateName="x")
    assert cmd.SerializeToString() == bytes.fromhex("0a0178")


def test_empty_message_field_presence():
    sm = _sm()
    vsc = sm.ValueStateCall(stateName="agg", exists=sm.Exists())
    # empty sub-message still serializes: tag + zero length
    assert vsc.SerializeToString() == bytes.fromhex("0a03616767" "1200")


def test_parse_repeated_message_and_scalars():
    sm = _sm()
    resp = sm.StateResponseWithTimer()
    resp.ParseFromString(
        bytes.fromhex("0802" "12026869" "1a060a016b10e807" "1a060a0208021064")
    )
    assert resp.statusCode == 2
    assert resp.errorMessage == "hi"
    assert [(t.key, t.timestampMs) for t in resp.timer] == [
        (b"k", 1000),
        (b"\x08\x02", 100),
    ]


def test_negative_and_large_int_round_trip():
    sm = _sm()
    for v in (-1, -7, 2**40, 2**62):
        t = sm.TimerInfo(timestampMs=v)
        back = sm.TimerInfo()
        back.ParseFromString(t.SerializeToString())
        assert back.timestampMs == v


def test_enum_constants_module_level():
    sm = _sm()
    assert (sm.PRE_INIT, sm.CREATED, sm.INITIALIZED) == (0, 1, 2)
    assert (sm.DATA_PROCESSED, sm.TIMER_PROCESSED, sm.CLOSED) == (3, 4, 5)


def test_default_scalars_absent_from_wire():
    sm = _sm()
    # proto3 implicit presence: defaults are skipped
    assert sm.StateResponse(statusCode=0, errorMessage="").SerializeToString() == b""


def test_unknown_fields_skipped_on_parse():
    sm = _sm()
    r = sm.StateResponse()
    # field 15 (unknown) varint + field 1 statusCode=3
    r.ParseFromString(bytes.fromhex("782a" "0803"))
    assert r.statusCode == 3
