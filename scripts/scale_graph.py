"""PageRank scale evidence: graph.pagerank on a deterministic synthetic
skewed graph at TWO parallelism levels (same harness contract as
scale_fuzzy.py / bench_scaling.py — local[LO] vs local[HI] in separate
JVMs, per-core heap, best-of-N, order-independent result fingerprints).

The graph is generated INSIDE each level's session as pure column
expressions of the edge index (no RNG, no files): endpoint a is uniform
over N nodes, endpoint b is cubed-uniform (floor(N * u^3)) so low ids
become hubs — a power-law-ish degree skew that exercises exactly the
shuffle the contribution groupBy must survive. Self-loops dropped,
canonicalized src<dst, distinct.

Correctness across levels: the degree multiset is EXACT (bit_xor
fingerprint over (node, degree) must be identical), and the round-6
PageRank vector is fingerprinted the same way; sum(pr) must be 1 to 1e-9
(no dangling mass on an undirected graph).

Usage: python scripts/scale_graph.py [n_nodes] [n_edges] [n_iter] [trials]
       (defaults 2000000, 10000000, 5, 2; SCALE_LEVELS="LO,HI")
Writes BENCH/SCALING_GRAPH.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = r"""
import json, sys, time
master, n_nodes, n_edges, n_iter, trials = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
    int(sys.argv[5]))
cores = int(master.split("[")[1].rstrip("]"))
from pyspark.sql import functions as F
from generative_ner_spark.plans.session import build_session
from generative_ner_spark.operators import graph
spark = build_session(app_name=f"pagerank-scale-{cores}", master=master,
                      shuffle_partitions=cores * 2)
spark.sparkContext.setLogLevel("ERROR")

def edges(n_e):
    # u in [0,1) from a 31-bit hash slice (ANSI-safe); b = floor(N*u^3)
    raw = spark.range(0, n_e).select(
        F.pmod(F.xxhash64("id", F.lit("a")), F.lit(n_nodes)).alias("x"),
        (F.pmod(F.xxhash64("id", F.lit("b")), F.lit(1 << 31))
         / F.lit(float(1 << 31))).alias("u"),
    ).select(
        "x",
        F.floor(F.lit(float(n_nodes)) * F.pow("u", F.lit(3.0)))
         .cast("long").alias("y"),
    ).where(F.col("x") != F.col("y"))
    return raw.select(
        F.least("x", "y").alias("src"), F.greatest("x", "y").alias("dst")
    ).distinct()

graph.pagerank(edges(20000), n_iter=2).count()  # warm up plans/workers

e = edges(n_edges).repartition(cores * 2).persist()
n_real = e.count()  # materialized before the clock

best = None
for _ in range(trials):
    t0 = time.time()
    # round_to=None: per-node round-6 would put a random-walk ~1e-4
    # error on the mass sum over 2M nodes; round only inside the
    # fingerprints instead
    pr = graph.pagerank(e, n_iter=n_iter, round_to=None)
    row = pr.agg(
        F.count("*").alias("n"),
        F.sum("pr").alias("s"),
        F.expr("bit_xor(xxhash64(node, degree))").alias("fp_deg"),
        F.expr("bit_xor(xxhash64(node, cast(round(pr, 6) as string)))")
            .alias("fp_pr6"),
        F.expr("bit_xor(xxhash64(node, cast(round(pr, 4) as string)))")
            .alias("fp_pr4"),
    ).first()
    wall = time.time() - t0
    best = (wall, row) if best is None or wall < best[0] else best
wall, row = best
print("GRAPHRESULT " + json.dumps({
    "master": master, "cores": cores, "n_nodes_param": n_nodes,
    "n_edges": n_real, "n_iter": n_iter, "wall_sec": round(wall, 2),
    "edges_per_sec": round(n_real * n_iter / wall, 2),
    "n_ranked": row["n"], "sum_pr": float(row["s"]),
    "fp_degree": str(row["fp_deg"]), "fp_pr6": str(row["fp_pr6"]),
    "fp_pr4": str(row["fp_pr4"]),
}))
"""


def run_level(master: str, n_nodes: int, n_edges: int, n_iter: int,
              trials: int, timeout: int | None = None) -> dict:
    timeout = timeout or 3600
    cores = int(master.split("[")[1].rstrip("]"))
    env = dict(os.environ, SPARK_DRIVER_MEM=f"{2 * cores}g")
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, master, str(n_nodes), str(n_edges),
         str(n_iter), str(trials)],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=timeout,
    )
    for line in out.stdout.splitlines():
        if line.startswith("GRAPHRESULT "):
            return json.loads(line[len("GRAPHRESULT "):])
    raise RuntimeError(
        f"no result from {master}: stdout={out.stdout[-2000:]} "
        f"stderr={out.stderr[-2000:]}")


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    n_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    trials = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    spec = os.environ.get("SCALE_LEVELS", "4,16")
    n_lo, n_hi = (int(x) for x in spec.split(","))
    lo = run_level(f"local[{n_lo}]", n_nodes, n_edges, n_iter, trials)
    hi = run_level(f"local[{n_hi}]", n_nodes, n_edges, n_iter, trials)
    # graph structure + round-4 ranks must match exactly; round-6 is
    # reported too (a single 0.5e-6-boundary float flip would break it
    # without meaning anything — the oracle contract rounds AFTER the
    # engines agree to ~1e-12)
    identical = (lo["n_ranked"] == hi["n_ranked"]
                 and lo["fp_degree"] == hi["fp_degree"]
                 and lo["fp_pr4"] == hi["fp_pr4"])
    pr6_identical = lo["fp_pr6"] == hi["fp_pr6"]
    speedup = hi["edges_per_sec"] / lo["edges_per_sec"]
    summary = {
        "n_nodes": n_nodes, "n_edges": lo["n_edges"], "n_iter": n_iter,
        "trials": trials, "levels": [n_lo, n_hi], "lo": lo, "hi": hi,
        "speedup_lo_to_hi": round(speedup, 3),
        "scaling_efficiency": round(speedup / (n_hi / n_lo), 3),
        "rank_fingerprints_identical": identical,
        "round6_fingerprints_identical": pr6_identical,
        "mass_conserved": abs(lo["sum_pr"] - 1.0) < 1e-9
                          and abs(hi["sum_pr"] - 1.0) < 1e-9,
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    with open(os.path.join(repo, "BENCH", "SCALING_GRAPH.md"), "w") as f:
        f.write(
            "# PageRank scale evidence (graph.pagerank, skewed synthetic "
            "graph)\n\n"
            f"{lo['n_edges']:,} distinct edges over <= {n_nodes:,} nodes "
            "(cubed-uniform hub skew),\n"
            f"{n_iter} power iterations, best of {trials} trial(s) per "
            "level in separate JVMs.\n\n"
            "| level | cores | wall (s) | edge-iterations/s |\n"
            "|---|---|---|---|\n"
            f"| local[{n_lo}] | {n_lo} | {lo['wall_sec']} | "
            f"{lo['edges_per_sec']:,.0f} |\n"
            f"| local[{n_hi}] | {n_hi} | {hi['wall_sec']} | "
            f"{hi['edges_per_sec']:,.0f} |\n\n"
            f"speedup {n_lo}->{n_hi}: **{summary['speedup_lo_to_hi']}x**; "
            f"efficiency **{summary['scaling_efficiency']}**\n\n"
            f"degree + round-4 rank fingerprints identical across levels: "
            f"**{identical}** (round-6: {pr6_identical})\n\n"
            f"rank mass conserved (sum pr == 1 +- 1e-9 at both levels): "
            f"**{summary['mass_conserved']}**\n"
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
