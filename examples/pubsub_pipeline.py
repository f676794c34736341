"""Runnable end-to-end pub/sub demo — the Spark twin of the reference's
example tier (``/root/reference/example/engine-io.server.js`` +
``quty-publisher.js``, its only runnable verification, SURVEY §5).

One process plays all three roles:

1. **publisher** — a background TCP server emitting wire frames
   ``"M|{json}"`` on a loop (the reference publisher sends one frame
   every 2 s; here the cadence is configurable), including deliberately
   corrupt frames to exercise the silent-drop path;
2. **cluster/router** — a Structured Streaming query: socket source →
   envelope parse (the same ``parse_frame_cols`` logic as the batch and
   file paths) → routing join against the subscription table (inner
   join on channel = targeted fan-out; messages to channels without
   subscribers drop, the reference's at-most-once contract);
3. **delivery** — a console sink printing ``(channel, cid, message)``
   rows, the exact rows the reference hands its embedding app.

Run:  python examples/pubsub_pipeline.py [seconds]   (default 12)

The socket source is demo-grade by design (no offset recovery — the
durable production twin is the checkpointed file/Kafka path shown in
quty_server_spark/streaming/ops.py).
"""

from __future__ import annotations

import json
import os
import socket
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from quty_server_spark.operators.pubsub import parse_frame_cols  # noqa: E402
from quty_server_spark.session import get_spark  # noqa: E402

# The subscription table the router joins against — in production this is
# the compacted fold of the join/leave/kick changelog (subs_current_state).
SUBSCRIPTIONS = [
    ("ch0", 101),
    ("ch0", 102),
    ("ch1", 103),
    # ch2 has no subscribers: its messages must vanish silently.
]


def publisher(port_holder: list, stop: threading.Event) -> None:
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    port_holder.append(srv.getsockname()[1])
    srv.listen(1)
    conn, _ = srv.accept()
    seq = 0
    try:
        while not stop.is_set():
            channel = f"ch{seq % 3}"
            frame = "M|" + json.dumps(
                {"c": channel, "m": f"hello #{seq}", "s": "pub-1", "_q": str(seq % 100)}
            )
            if seq % 7 == 3:  # inject malformed traffic
                frame = "corrupt frame without pipe"
            conn.sendall((frame + "\n").encode())
            seq += 1
            time.sleep(0.5)
    except BrokenPipeError:
        pass
    finally:
        conn.close()
        srv.close()


def main() -> None:
    duration = float(sys.argv[1]) if len(sys.argv) > 1 else 12.0
    stop = threading.Event()
    holder: list = []
    threading.Thread(target=publisher, args=(holder, stop), daemon=True).start()
    while not holder:
        time.sleep(0.05)

    spark = get_spark("pubsub-demo", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    subs = spark.createDataFrame(SUBSCRIPTIONS, "channel string, cid long")

    raw = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", holder[0])
        .load()
        .withColumnRenamed("value", "frame")
    )
    parsed = parse_frame_cols(raw).select(
        F.col("c").alias("channel"),
        F.get_json_object("payload", "$.m").alias("message"),
        F.get_json_object("payload", "$.s").alias("sender"),
    )
    delivered = parsed.join(F.broadcast(subs), "channel")  # targeted fan-out

    q = (
        delivered.writeStream.format("console")
        .option("truncate", "false")
        .outputMode("append")
        .start()
    )
    print(f"routing frames from tcp://127.0.0.1:{holder[0]} for {duration:.0f}s ...")
    time.sleep(duration)
    stop.set()
    q.stop()
    spark.stop()
    print("done — ch0 messages fanned out to cids 101+102, ch1 to 103, "
          "ch2 and corrupt frames dropped silently.")


if __name__ == "__main__":
    main()
