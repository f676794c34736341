"""Property-based tests of the wire-envelope contract (SURVEY §2.A #1-#2).

The oracle queries prove parse/serialize on the fixture's frames; these
prove the CONTRACT on adversarial inputs hypothesis invents: payload
strings containing pipes, quotes, backslashes, unicode, JSON look-alikes.
Invariants (util.sendSocketEvent / parseSocketEvent,
``/root/reference/lib/util.js:174-246``):

- roundtrip: parse(serialize(channel, message, sender)) returns the
  original fields for ANY message text (the frame splits at the FIRST
  pipe, so pipes inside the JSON payload never corrupt the split);
- malformed drop: frames with no '|' or a non-JSON payload vanish
  silently — never an error, never a mangled row.

Each hypothesis example batches its strings into ONE Spark job so the
property runs in seconds, not minutes.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from quty_server_spark.operators.pubsub import parse_frame_cols

# Lone surrogates (category Cs) don't survive the Python->JVM string
# boundary itself, which is not the property under test.
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=40
)
CHANNEL = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=1, max_size=20
)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(CHANNEL, TEXT, TEXT), min_size=1, max_size=40))
def test_serialize_parse_roundtrip_any_payload(spark, rows):
    df = spark.createDataFrame(
        [(i, c, m, s) for i, (c, m, s) in enumerate(rows)],
        "id long, c string, m string, s string",
    )
    framed = df.select(
        "id",
        F.concat(
            F.lit("M|"),
            F.to_json(F.struct(F.col("c"), F.col("m"), F.col("s"))),
        ).alias("frame"),
    )
    parsed = parse_frame_cols(framed).select(
        "id",
        "event_code",
        F.get_json_object("payload", "$.c").alias("c"),
        F.get_json_object("payload", "$.m").alias("m"),
        F.get_json_object("payload", "$.s").alias("s"),
    )
    got = {r.id: (r.event_code, r.c, r.m, r.s) for r in parsed.collect()}
    # get_json_object returns null for JSON-null / empty-string-as-missing?
    # No: empty strings roundtrip; every row must survive with its fields.
    assert got == {i: ("M", c, m, s) for i, (c, m, s) in enumerate(rows)}


@settings(max_examples=8, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=40))
def test_malformed_frames_drop_silently(spark, raws):
    # Arbitrary raw strings: a row may only survive if it has a pipe AND
    # the remainder parses as JSON with a non-null $.c — nothing errors,
    # nothing survives mangled.
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(raws)], "id long, frame string"
    )
    out = parse_frame_cols(df).select("id", "payload", "c").collect()
    import json

    for r in out:
        raw = raws[r.id]
        assert "|" in raw
        payload = raw.split("|", 1)[1]
        assert r.payload == payload
        doc = json.loads(payload)  # must be valid JSON if it survived
        assert isinstance(doc, dict) and doc.get("c") is not None
