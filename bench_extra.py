"""Per-query isolation bench (guide §1.4) — NOT the driver bench.

bench.py is the frozen driver contract; this file exists so individual
queries can be timed (noop sink, best-of-N) and their formatted plans
captured WITHOUT re-running the whole 40-minute headline suite. Numbers
from here are cited in OPTIMIZATION_r06.md; plans land in plans/r06/.

Usage:
    PYTHONPATH=. python bench_extra.py [--sf DIR] [--trials N] \
        [--plans-dir plans/r06] [--suffix before] q14_minhash_signature ...

Prints one JSON line: {"sf": ..., "trials": N, "queries": {name: best_sec},
"samples": {name: [sec, ...]}, "load_1min": ...}. With --plans-dir, writes
<plans-dir>/<query>_<suffix>.txt containing explain("formatted").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench as benchmod
    import __spark_entry__ as entrymod
    from generative_ner_spark.plans.session import build_session

    spark = build_session(app_name="bench_extra")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000_000).selectExpr("sum(id)").collect()  # warm workers

    qs = dict(entrymod.queries())
    qs.update(benchmod._fast_family_queries())

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in args.queries:
        fn = qs[name]
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, args.sf)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(os.path.join(
                    args.plans_dir,
                    f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(txt)
        best = None
        runs = []
        for _ in range(args.trials):
            spark.sparkContext.setJobDescription(f"{name} [{args.suffix}]")
            t0 = time.time()
            benchmod.force(fn(spark, args.sf))
            dt = time.time() - t0
            runs.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        if best is not None:
            timings[name] = round(best, 3)
            samples[name] = runs
    print(json.dumps({
        "sf": args.sf, "trials": args.trials, "queries": timings,
        "samples": samples, "load_1min": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
