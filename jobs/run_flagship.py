"""Production entrypoint for the flagship pipeline (north rule: run via
``ray job submit`` on a fixed-size multi-node cluster).

    ray job submit --working-dir . -- \
        python jobs/run_flagship.py --sf-dir /data/pages --out /data/tiles

Resumable by construction: re-submitting after a kill skips every cell
range whose lineage manifest exists (posm_ray.state.checkpoint). Prints a
one-line JSON metrics record (rows in, partitions written/skipped, secs).

Locally (no cluster) it runs against the default local Ray session.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# repo root importable in the driver AND in Ray workers: sys.path only
# affects this process, while PYTHONPATH (set before ray.init) is inherited
# by worker processes — without it workers fail to unpickle posm_ray UDFs
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = (
    _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")).rstrip(os.pathsep)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                   help="input dir with documents.parquet (pages source)")
    p.add_argument("--out", default="/tmp/posm_ray_flagship",
                   help="checkpointed tile output dir")
    p.add_argument("--replicate", type=int, default=1,
                   help="in-stream input replication factor (bench scale)")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only for LOCAL runs; on a cluster the job uses "
                        "the cluster's resources")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():  # driver contract: never re-init
        kwargs = dict(include_dashboard=False, logging_level="ERROR")
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from posm_ray.pipelines import builder

    cfg = builder.PipelineConfig(sf_dir=args.sf_dir, task="flagship",
                                 replicate=args.replicate, out_dir=args.out)
    t0 = time.perf_counter()
    result = builder.build(cfg)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "out": args.out,
        "partitions_written": len(result["written"]),
        "partitions_skipped": result["skipped"],
        "sec": round(dt, 3),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
