"""quty_server_spark — a PySpark-native analytics/streaming engine.

A from-scratch re-expression of the capabilities of quty-io/quty-server
(a distributed pub/sub event-streaming server, see /root/reference) as an
idiomatic Spark engine, plus the relational + LLM-data-pipeline surface
required for large-scale (100 TB design point) analytics:

- ``session``    — SparkSession factory tuned for scale (AQE, Arrow, pushdown)
- ``sources``    — batch/streaming table loaders for the canonical tables
- ``operators``  — relational, pub/sub-routing, dedup, similarity, text ops
- ``functions``  — scalar/vector helpers (hashing, vectors, text, tokens)
- ``streaming``  — Structured Streaming equivalents (windows, state, routing)
- ``plans``      — query registry: every operator exposes (queries, oracles)

The reference's node mesh (gossip, handshakes, WebSocket fan-out;
``lib/QutyCluster.js``) is deliberately NOT rebuilt: Spark's shuffle service
replaces node-to-node routing, checkpointed sources replace client-side
offline queues, and state timeouts replace socket heartbeats (SURVEY.md §7).
What is preserved is the reference's *semantics*: channel routing with
broadcast fallback (lib/ChannelHub.js:241-279), the subscription lifecycle
(lib/ChannelHub.js:53-238), the ``{event}|{json}`` wire envelope
(lib/util.js:174-246), and at-most-once drop of subscriber-less messages.
"""

__version__ = "0.1.0"
