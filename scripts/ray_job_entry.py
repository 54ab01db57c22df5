"""Cluster entry point for the headline streaming pipeline — the script
`ray job submit` runs on a fixed-size multi-node cluster:

    ray job submit --address http://<head>:8265 \
        --working-dir . \
        -- python scripts/ray_job_entry.py \
               --input /data/audio --output /data/out \
               --engine join --partitions 64 --rowgroups-per-epoch 8

On a cluster the job connects to the running Ray (address="auto"); in
this sandbox it falls back to a local session, so the same script backs
the local scaling evidence (`bench.py --scaling`) and the cluster
launch path. Resumable: rerunning the same command after a failure
skips committed epochs (2PC sink manifest).

The scaling criterion (N vs 4N nodes, efficiency >= 0.8) is evidenced
in this sandbox by running this job at two parallelism levels in fresh
processes — see `bench.py --scaling` and SCALING.json; on a real
cluster the same two submissions against N- and 4N-node clusters
produce the measurement the north rule asks for.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ENGINES = {
    "join": ("dataflows_ray.streaming.engine", "StreamingJoinEngine"),
    "window": ("dataflows_ray.streaming.window_engine",
               "StreamingWindowEngine"),
    "sliding": ("dataflows_ray.streaming.window_engine",
                "StreamingSlidingEngine"),
    "session": ("dataflows_ray.streaming.window_engine",
                "StreamingSessionEngine"),
    "topk": ("dataflows_ray.streaming.topk_engine", "StreamingTopKEngine"),
    "ndv": ("dataflows_ray.streaming.ndv_engine", "StreamingNdvEngine"),
    "dedup": ("dataflows_ray.streaming.dedup_engine",
              "StreamingDedupEngine"),
    "transcode": None,   # StreamingMapEngine + FLAC transcode (below)
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--engine", choices=sorted(ENGINES), default="join")
    ap.add_argument("--partitions", type=int, default=None,
                    help="state partitions (default: cluster CPUs // 4)")
    ap.add_argument("--rowgroups-per-epoch", type=int, default=8)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        try:
            ray.init(address="auto")       # running cluster (ray job submit)
        except ConnectionError:
            ray.init(address="local")      # sandbox fallback
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    parts = args.partitions or max(4, ncpu // 4)

    import importlib
    if args.engine == "transcode":
        # corpus normalization job: every clip (any source codec)
        # re-encoded to FLAC through the exactly-once sink (q105 ETL)
        from dataflows_ray.pipelines.relational import _FlacTranscode
        from dataflows_ray.streaming.map_engine import StreamingMapEngine
        eng = StreamingMapEngine(
            args.input, args.output,
            transform=_FlacTranscode(first_n=10**15),
            key="clip_id", ts_col="event_ms", num_partitions=parts,
            rowgroups_per_epoch=args.rowgroups_per_epoch)
    else:
        mod, cls = ENGINES[args.engine]
        Engine = getattr(importlib.import_module(mod), cls)
        eng = Engine(args.input, args.output, num_partitions=parts,
                     rowgroups_per_epoch=args.rowgroups_per_epoch)
    t0 = time.time()
    metrics = eng.run()
    metrics.update({"sec": round(time.time() - t0, 3), "cpus": ncpu,
                    "partitions": parts, "engine": args.engine})
    print(json.dumps(metrics))
    ray.shutdown()


if __name__ == "__main__":
    main()
