"""transformWithStateInPandas coverage without the tws runtime.

The tws path (stream_seq_counter_tws) needs google.protobuf + the RocksDB
state store, which this container lacks — so the query registers
conditionally and would otherwise be dead code. These tests exercise what
CAN be exercised here: the registration predicate itself (registry state
must track protobuf availability exactly), and the SeqProcessor's fold
semantics driven directly through a fake state handle — counter
continuation across batches and the mod-100 wrap (MAX_SEND_SEQ,
reference lib/util.js:13,186-196).
"""

from __future__ import annotations

import pandas as pd
import pytest

from quty_server_spark.plans.registry import registry
from quty_server_spark.streaming.ops import _make_seq_processor, _protobuf_available


def test_registration_tracks_protobuf_availability():
    assert ("stream_seq_counter_tws" in registry.queries) == _protobuf_available()
    # oracle registration must track the query registration
    assert ("stream_seq_counter_tws" in registry.oracles) == _protobuf_available()


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


class _FakeHandle:
    def getValueState(self, name, schema):
        return _FakeValueState()


def _batch(start_eid: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "event_id": range(start_eid, start_eid + n),
            "ts": pd.date_range("2024-01-01", periods=n, freq="s"),
            "channel": "ch0",
        }
    )


def _try_processor():
    try:
        proc = _make_seq_processor()
    except ImportError:
        pytest.skip("StatefulProcessor API unavailable in this build")
    proc.init(_FakeHandle())
    return proc


def test_seq_processor_wraps_at_100():
    proc = _try_processor()
    (out,) = proc.handleInputRows(("ch0",), iter([_batch(0, 150)]), None)
    # attach-then-increment from state 0: seqs 1..99, 0, 1.. (mod 100)
    assert out["seq"].tolist() == [(i + 1) % 100 for i in range(150)]
    assert out["event_id"].tolist() == list(range(150))


def test_seq_processor_counter_survives_batches():
    proc = _try_processor()
    (out1,) = proc.handleInputRows(("ch0",), iter([_batch(0, 3)]), None)
    (out2,) = proc.handleInputRows(("ch0",), iter([_batch(3, 3)]), None)
    assert out1["seq"].tolist() == [1, 2, 3]
    # continuation, not reset: the ValueState carried 3 across the batches
    assert out2["seq"].tolist() == [4, 5, 6]


def test_seq_processor_orders_by_event_time():
    proc = _try_processor()
    shuffled = _batch(0, 5).iloc[[3, 1, 4, 0, 2]]
    (out,) = proc.handleInputRows(("ch0",), iter([shuffled]), None)
    # rows are re-sorted by (ts, event_id) before numbering
    assert out["event_id"].tolist() == list(range(5))
    assert out["seq"].tolist() == [1, 2, 3, 4, 5]
