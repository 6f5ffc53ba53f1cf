"""Streaming-tier scaling probe at replica SFs (round 5, VERDICT r4 #7
— the one operator family with no SCALE.md entry).

For each streaming operator, drive the finite file-source replay to
completion in a FRESH subprocess JVM per (query, sf) pair (same
methodology as tools/scale_probe_sketches.py) and record, from the
StreamingQuery's own progress events:

- ``drain_s``   — wall seconds from start() to processAllAvailable()
                  returning (source replay + state maintenance + final
                  watermark-closure batch; this IS closure latency on a
                  finite replay);
- ``state_rows``  — max ``stateOperators[].numRowsTotal`` across
                  batches (peak state-store cardinality);
- ``state_mb``  — max ``stateOperators[].memoryUsedBytes`` (MiB);
- ``out_rows``  — rows landed in the memory sink.

What "good" looks like at 10x event volume: state_rows should scale
with the operator's DESIGNED state key space, not with event volume —
(window x event_type) for hourly counts (constant when replicas keep
the base time range), (day x id-word) for the bitmap (user-id space /
32), |users| for sessions/totals, |event ids inside watermark| for
dedup, |clicks + purchases inside watermark| for the join. drain_s
should scale ~linearly (the replay reads 10x rows no matter what).

Usage: python tools/scale_probe_streaming.py [sf_dir ...]
Default dirs: /root/testdata/sf0.1 .scratch/sf1 .scratch/sf10.
"""

from __future__ import annotations

import json
import subprocess
import sys

QUERIES = [
    "hourly_counts",
    "sessionize",
    "dedup",
    "stream_stream_join",
    "bitmap_distinct",
    "user_totals",
]

_CHILD = r"""
import json, sys, time, uuid
sys.path.insert(0, "/root/repo")
from udacity_data_engineering_capstone_project_spark.session import get_spark
from udacity_data_engineering_capstone_project_spark.streaming import events as ev

name, sf_dir = sys.argv[1], sys.argv[2]
spark = get_spark("streamprobe", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

BUILDERS = {
    "hourly_counts": (lambda s: ev.hourly_counts(s), "append"),
    "sessionize": (lambda s: ev.sessionized_stream(s), "append"),
    "dedup": (lambda s: ev.dedup_stream(s), "append"),
    "stream_stream_join": (lambda s: ev.click_purchase_join_stream(s), "append"),
    "bitmap_distinct": (lambda s: ev.bitmap_daily_distinct_stream(s), "update"),
    "user_totals": (lambda s: ev.stateful_user_totals(s), "update"),
}
builder, mode = BUILDERS[name]
stream_df = builder(ev.read_events_stream(spark, sf_dir))
sink = f"probe_{uuid.uuid4().hex[:8]}"
t0 = time.time()
q = (stream_df.writeStream.outputMode(mode).format("memory")
     .queryName(sink).start())
try:
    q.processAllAvailable()
    drain = time.time() - t0
    state_rows, state_bytes, drop_wm = 0, 0, 0
    for prog in q.recentProgress:
        for op in prog.get("stateOperators", []):
            state_rows = max(state_rows, op.get("numRowsTotal", 0))
            state_bytes = max(state_bytes, op.get("memoryUsedBytes", 0))
            drop_wm += op.get("numRowsDroppedByWatermark", 0)
finally:
    q.stop()
out_rows = spark.table(sink).count()
print("RESULT " + json.dumps({
    "drain_s": round(drain, 3),
    "state_rows": int(state_rows),
    "state_mb": round(state_bytes / (1 << 20), 2),
    "rows_dropped_by_watermark": int(drop_wm),
    "out_rows": int(out_rows),
}))
spark.stop()
"""


def main() -> int:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        ".scratch/sf1",
        ".scratch/sf10",
    ]
    out: dict = {}
    for name in QUERIES:
        out[name] = {}
        for d in dirs:
            p = subprocess.run(
                [sys.executable, "-c", _CHILD, name, d],
                capture_output=True,
                text=True,
                cwd="/root/repo",
            )
            rec = None
            for line in p.stdout.splitlines():
                if line.startswith("RESULT "):
                    rec = json.loads(line[len("RESULT "):])
            if rec is None:
                print(f"[FAIL] {name} @ {d}: {p.stderr[-800:]}", file=sys.stderr)
                return 1
            out[name][d] = rec
            print(
                f"# {name:20s} {d:24s} drain={rec['drain_s']:7.2f}s "
                f"state_rows={rec['state_rows']:>9} state={rec['state_mb']:7.2f}MiB "
                f"out={rec['out_rows']}",
                flush=True,
            )
    print(json.dumps({"probe": "streaming_family", "metrics": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
