"""Multi-host test worker: one process of an N-process CPU-mesh search job.

Launched by tests/test_multihost.py.  Builds the shared fixture index,
shards it over the global mesh, runs the query set and writes results as
JSON.  With --loop it keeps re-running batches (writing a heartbeat) so the
parent can kill it mid-batch for the fault-injection test."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = [
    "telephone", "telegraph", "photograph", "telescope", "microphone",
    "phonograph", "graphite", "telephony", "phone", "graph", "tele",
    "scope", "micro", "mic", "LWMS", "LWM", "LWMA", "L", "a b c",
    "abc def ghi", "widget alpha", "widget beta", "gadget", "wdgt",
] + [f"item {i:04d} base" for i in range(200)]

QUERIES = ["telephon", "graph", "LWMS", "tele", "micro phone",
           "item 0042", "widget", "a", "*"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--loop", action="store_true")
    ap.add_argument("--heartbeat", default="")
    args = ap.parse_args()

    from stringsearchlib_tpu.parallel.multihost import (
        MultiHostShardedEngine, global_mesh, init_distributed,
    )

    nproc, ndev = init_distributed(
        args.coordinator, args.nprocs, args.pid,
        local_cpu_devices=args.devices_per_proc,
    )
    assert nproc == args.nprocs, (nproc, args.nprocs)

    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.index.build import build_index
    from stringsearchlib_tpu.parallel.dist import shard_index

    host = build_index(WORDS, 1, None, IndexConfig(), to_device=False)
    mesh = global_mesh()
    engine = MultiHostShardedEngine(shard_index(host, ndev), mesh)

    def run_once():
        outs = engine.search_batch(QUERIES, 0.2, 10)
        return [[list(k), [round(float(x), 6) for x in s]] for k, s in outs]

    results = run_once()
    if args.loop:
        deadline = time.time() + 60
        i = 0
        while time.time() < deadline:
            got = run_once()
            assert got == results, "nondeterministic batch"
            i += 1
            if args.heartbeat:
                with open(args.heartbeat, "w") as f:
                    f.write(str(i))
    with open(args.out, "w") as f:
        json.dump({"pid": args.pid, "ndev": ndev, "results": results}, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
