"""Live-socket ingress — the reference's actual transport (SURVEY §2.B).

The reference ingests wire frames over WebSockets (lib/Server.js); the
Spark engine's production path is durable sources (files/Kafka), but the
SOCKET SHAPE itself is coverable: a TCP server feeds ``event|json``
frames to Spark's socket source, the stream parses the envelope with the
same expressions as the batch/file paths (split at first '|', from_json,
malformed drop), and the parsed messages are route-ready. The socket
source is demo-grade by design (no offset recovery — Spark warns so);
the checkpointed file-source path is the durable twin
(tests/test_streaming_recovery.py).
"""

from __future__ import annotations

import socket
import threading
import time

from pyspark.sql import functions as F

FRAMES = [
    'M|{"c": "ch0", "m": "1.00", "s": "7", "_q": "0"}',
    'M|{"c": "ch1", "m": "2.00", "s": "8", "_q": "1"}',
    "corrupt frame without pipe",
    'M|{"c": "ch0", "m": "3.00", "s": "7", "_q": "2"}',
    'M|not json at all',
]


def test_socket_ingress_parses_envelope(spark):
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    srv.listen(1)

    def serve():
        conn, _ = srv.accept()
        conn.sendall(("\n".join(FRAMES) + "\n").encode())
        time.sleep(10)
        conn.close()

    threading.Thread(target=serve, daemon=True).start()
    try:
        raw = (
            spark.readStream.format("socket")
            .option("host", "127.0.0.1")
            .option("port", port)
            .load()
        )
        parsed = (
            raw.filter(F.instr("value", "|") > 0)
            .withColumn(
                "payload", F.expr("substring(value, instr(value, '|') + 1)")
            )
            .withColumn(
                "p", F.from_json("payload", "c string, m string, s string, _q string")
            )
            .filter(F.col("p.c").isNotNull())
            .select(
                F.col("p.c").alias("channel"),
                F.col("p.m").alias("message"),
                F.col("p._q").cast("int").alias("seq"),
            )
        )
        q = (
            parsed.writeStream.format("memory")
            .queryName("mem_socket_parsed")
            .outputMode("append")
            .start()
        )
        # poll until the 3 valid frames arrive (bounded wait)
        deadline = time.time() + 30
        while time.time() < deadline:
            rows = spark.table("mem_socket_parsed").collect()
            if len(rows) >= 3:
                break
            time.sleep(0.5)
        q.stop()
        got = {(r.channel, r.message, r.seq) for r in rows}
        # both malformed frames (no pipe / bad json) silently dropped
        assert got == {("ch0", "1.00", 0), ("ch1", "2.00", 1), ("ch0", "3.00", 2)}
    finally:
        srv.close()

def test_connector_queries_survive_plain_driver_session():
    """The driver builds its OWN bare SparkSession; every local gate runs
    through get_spark() (RUNTIME_CONFS applied), so a builder that
    silently depends on a session conf passes every local check and
    fails only in the driver — the round-7 near-miss: a pushFilters
    Python data source reader ERRORS unless
    spark.sql.python.filterPushdown.enabled is set. A subprocess with a
    bare PRIMARY session is the only faithful simulation: newSession()
    children cannot resolve Python data source WRITES at all (the V1
    write lookup bypasses the child's registry), which is a Spark
    limitation, not a driver-visible state."""
    import os
    import subprocess
    import sys

    code = r"""
import sys
sys.path.insert(0, %r)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
import __spark_entry__ as se
for name in ["source_python_datasource", "sink_python_datasource_writer",
             "stream_python_datasource"]:
    rows = se.queries()[name](spark, "/root/testdata/sf0.001").collect()
    assert rows, name
print("PLAIN_OK")
""" % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    p = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        timeout=420,
    )
    assert "PLAIN_OK" in p.stdout, p.stderr[-2000:]
