"""Line-boilerplate-removal scale evidence: remove_boilerplate_lines at
>= 1M docs at TWO parallelism levels, byte-identical rebuilt corpora.

Input is generated INSIDE each level's session as pure deterministic
column expressions of doc_id (no RNG, no files). Each doc has 4 lines:

  1. a GLOBAL banner (every doc)                  -> boilerplate, removed
  2. a GROUP line shared by n_docs/1000 docs      -> boilerplate, removed
  3. a UNIQUE ~40-token md5 line                  -> survives
  4. an exact repeat of line 3                    -> within-doc dup, removed

So the expected output is EXACTLY one (unique) line per doc — count is
analytic (== n_docs) and the rebuilt text fingerprint must match across
levels byte-for-byte. This is the touch-every-byte curation pass, so the
two-level run exercises the "text crosses exactly one exchange" shape at
realistic byte volume (~0.4 GB of line text at 1M docs).

Usage: python scripts/scale_lines.py [n_docs] [trials]
       (defaults 1000000, 2; SCALE_LEVELS="LO,HI" like bench_scaling)
Writes BENCH/SCALING_LINES.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = r"""
import json, sys, time
master, n_docs, trials = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
cores = int(master.split("[")[1].rstrip("]"))
from pyspark.sql import functions as F
from generative_ner_spark.plans.session import build_session
from generative_ner_spark.operators import dedup
spark = build_session(app_name=f"lines-scale-{cores}", master=master,
                      shuffle_partitions=cores * 2)
spark.sparkContext.setLogLevel("ERROR")

def corpus(n):
    uniq = F.concat_ws(" ", F.expr(
        "transform(sequence(0, 39), i -> substring(md5(concat("
        "cast(id as string), ':', cast(i as string))), 1, 8))"))
    group_line = F.concat(F.lit("group boilerplate notice "),
                          (F.col("id") % F.lit(max(n // 1000, 1)))
                          .cast("string"))
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws("\n",
                    F.lit("subscribe to the global banner"),
                    group_line, uniq, uniq).alias("text"),
    )

# warm up (plan compile + workers) on a small slice
dedup.remove_boilerplate_lines(corpus(2000), min_docs=10).count()

docs = corpus(n_docs).repartition(cores * 2).persist()
docs.count()  # input materialized before the clock

best = None
for _ in range(trials):
    t0 = time.time()
    out = dedup.remove_boilerplate_lines(docs, min_docs=10)
    fp_row = out.agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(doc_id, text))").alias("fp"),
        F.sum(F.length("text")).alias("bytes"),
    ).first()
    wall = time.time() - t0
    best = (wall, fp_row) if best is None or wall < best[0] else best
wall, fp_row = best
print("LINESRESULT " + json.dumps({
    "master": master, "cores": cores, "n_docs": n_docs,
    "wall_sec": round(wall, 2),
    "docs_per_sec": round(n_docs / wall, 2),
    "out_docs": fp_row["n"],
    "out_fingerprint": str(fp_row["fp"]),
    "out_text_bytes": str(fp_row["bytes"]),
    "expected_docs": n_docs,
}))
"""


def run_level(master: str, n_docs: int, trials: int,
              timeout: int | None = None) -> dict:
    timeout = timeout or max(3600, int(n_docs / 1_000_000 * 3600 * trials))
    # constant memory PER CORE (the honest multi-node proxy — see
    # scale_fuzzy.run_level for the GC rationale)
    cores = int(master.split("[")[1].rstrip("]"))
    env = dict(os.environ, SPARK_DRIVER_MEM=f"{2 * cores}g")
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, master, str(n_docs), str(trials)],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=timeout,
    )
    for line in out.stdout.splitlines():
        if line.startswith("LINESRESULT "):
            return json.loads(line[len("LINESRESULT "):])
    raise RuntimeError(
        f"no result from {master}: stdout={out.stdout[-2000:]} "
        f"stderr={out.stderr[-2000:]}")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spec = os.environ.get("SCALE_LEVELS", "4,16")
    n_lo, n_hi = (int(x) for x in spec.split(","))
    lo = run_level(f"local[{n_lo}]", n_docs, trials)
    hi = run_level(f"local[{n_hi}]", n_docs, trials)
    identical = (lo["out_docs"] == hi["out_docs"]
                 and lo["out_fingerprint"] == hi["out_fingerprint"]
                 and lo["out_text_bytes"] == hi["out_text_bytes"])
    exact = lo["out_docs"] == lo["expected_docs"]
    speedup = hi["docs_per_sec"] / lo["docs_per_sec"]
    summary = {
        "n_docs": n_docs, "trials": trials,
        "levels": [n_lo, n_hi], "lo": lo, "hi": hi,
        "speedup_lo_to_hi": round(speedup, 3),
        "scaling_efficiency": round(speedup / (n_hi / n_lo), 3),
        "outputs_identical": identical,
        "output_exactly_expected": exact,
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    with open(os.path.join(repo, "BENCH", "SCALING_LINES.md"), "w") as f:
        f.write(
            "# Line-boilerplate-removal scale evidence "
            "(dedup.remove_boilerplate_lines)\n\n"
            f"{n_docs:,} docs x 4 lines (global banner + 1000-doc group "
            "line + unique 40-token\nline + its within-doc repeat); "
            "expected output = exactly the unique line per doc.\n"
            f"Best of {trials} trial(s) per level in separate JVMs.\n\n"
            "| level | cores | wall (s) | docs/s | out docs |\n"
            "|---|---|---|---|---|\n"
            f"| local[{n_lo}] | {n_lo} | {lo['wall_sec']} | "
            f"{lo['docs_per_sec']} | {lo['out_docs']} |\n"
            f"| local[{n_hi}] | {n_hi} | {hi['wall_sec']} | "
            f"{hi['docs_per_sec']} | {hi['out_docs']} |\n\n"
            f"speedup {n_lo}->{n_hi}: **{summary['speedup_lo_to_hi']}x**; "
            f"efficiency **{summary['scaling_efficiency']}**\n\n"
            "rebuilt corpora identical across levels (count + "
            f"xxhash64(doc, text) fingerprint + byte sum): "
            f"**{identical}**\n\n"
            + f"output == the analytic expectation (one unique line per "
              f"doc, {n_docs:,} docs): **{exact}**\n\n"
            "Shuffle-bound caveat: like fuzzy dedup (see "
            "SCALING_FUZZY.md), the rebuild\njoin ships line text through "
            "one exchange over ONE shared local disk/memory\nbus at both "
            "levels — the dimension a real 4x cluster grows per node — "
            "so local\nefficiency is a lower bound on cluster "
            "efficiency.\n"
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
