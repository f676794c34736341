"""transformWithStateInPandas coverage without the tws runtime.

The tws path (stream_seq_counter_tws) needs google.protobuf + the RocksDB
state store, which this container lacks. The NAME registers
unconditionally — backed by the tws implementation when its runtime deps
exist, else by the applyInPandasWithState twin (same fold, same output
schema, same oracle). These tests pin: the registration invariant (always
present, implementation tracks protobuf availability), the SeqProcessor's
fold semantics driven through a fake state handle, and that the two
implementations' folds agree — counter continuation across batches and
the mod-100 wrap (MAX_SEND_SEQ, reference lib/util.js:13,186-196).
"""

from __future__ import annotations

import pandas as pd
import pytest

from quty_server_spark.plans.registry import registry
from quty_server_spark.streaming.ops import (
    _make_seq_processor,
    _protobuf_available,
    _seq_counter_fold,
    stream_seq_counter_apws,
    stream_seq_counter_tws,
)


def test_registered_unconditionally_and_impl_tracks_protobuf():
    assert "stream_seq_counter_tws" in registry.queries
    assert "stream_seq_counter_tws" in registry.oracles
    expected = (
        stream_seq_counter_tws if _protobuf_available() else stream_seq_counter_apws
    )
    assert registry.queries["stream_seq_counter_tws"] is expected


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


class _FakeGroupState:
    """Minimal GroupState stand-in for driving _seq_counter_fold directly."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


def test_apws_fold_matches_tws_processor():
    """The two implementations must produce identical numbering for the
    same batch choreography (wrap, continuation, event-time ordering)."""
    st = _FakeGroupState()
    (a1,) = _seq_counter_fold(("ch0",), iter([_batch(0, 150)]), st)
    (a2,) = _seq_counter_fold(("ch0",), iter([_batch(150, 3)]), st)
    assert a1["seq"].tolist() == [(i + 1) % 100 for i in range(150)]
    assert a2["seq"].tolist() == [51, 52, 53]  # 150 carried in state

    st2 = _FakeGroupState()
    shuffled = _batch(0, 5).iloc[[3, 1, 4, 0, 2]]
    (a3,) = _seq_counter_fold(("ch0",), iter([shuffled]), st2)
    assert a3["event_id"].tolist() == list(range(5))
    assert a3["seq"].tolist() == [1, 2, 3, 4, 5]

    proc = _try_processor()
    (t1,) = proc.handleInputRows(("ch0",), iter([_batch(0, 150)]), None)
    (t2,) = proc.handleInputRows(("ch0",), iter([_batch(150, 3)]), None)
    assert t1["seq"].tolist() == a1["seq"].tolist()
    assert t2["seq"].tolist() == a2["seq"].tolist()
