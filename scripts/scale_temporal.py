"""Temporal/CDC family scale evidence: sessionize + merge_changelog at
>= 10M events at TWO parallelism levels, byte-identical outputs.

Input is generated INSIDE each level's session as pure deterministic
column expressions of the row id (no RNG, no files):

* sessionize — 10M events over 100k users; per user, event k fires at
  k*600 s with an extra 4,000 s gap before every 7th event, so every
  user has a deterministic multi-session stream (gap = 1800 s); event
  id breaks timestamp ties (there are none, but the contract wants it).
* merge_changelog — a 2M-key snapshot and a 10M-row changelog over the
  same key space (~1/10 of changes are deletes, chosen by xxhash64 of
  the change id; last change per key wins by (ts, seq)). The merged
  snapshot's size and content are a pure function of the inputs.

Both outputs are fingerprinted (count + order-independent
bit_xor(xxhash64(...)) over every column) and must match EXACTLY
across parallelism levels — the determinism criterion all the other
scale docs use.

Usage: python scripts/scale_temporal.py [n_events] [trials]
       (defaults 10000000, 2; SCALE_LEVELS="LO,HI" like bench_scaling)
Writes BENCH/SCALING_TEMPORAL.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = r"""
import json, sys, time
master, n_events, trials = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
cores = int(master.split("[")[1].rstrip("]"))
from pyspark.sql import functions as F
from generative_ner_spark.plans.session import build_session
from generative_ner_spark.operators import temporal
spark = build_session(app_name=f"temporal-scale-{cores}", master=master,
                      shuffle_partitions=cores * 2)
spark.sparkContext.setLogLevel("ERROR")

N_USERS = 100_000
N_KEYS = 2_000_000

def session_events(n):
    u = (F.col("id") % N_USERS).alias("user_id")
    k = (F.col("id") / N_USERS).cast("long")
    sec = k * 600 + F.floor(k / 7) * 4000
    return spark.range(0, n).select(
        u, F.col("id").alias("event_id"),
        F.timestamp_micros((F.lit(1_700_000_000) + sec)
                           * F.lit(1_000_000)).alias("ts"),
        (F.col("id") % 997).cast("double").alias("value"),
    )

def cdc_inputs(n):
    snap = spark.range(0, N_KEYS).select(
        F.col("id").alias("k"),
        F.concat(F.lit("base:"), F.col("id").cast("string")).alias("val"),
    )
    ch = spark.range(0, n).select(
        (F.pmod(F.xxhash64("id"), F.lit(N_KEYS))).alias("k"),
        F.concat(F.lit("chg:"), F.col("id").cast("string")).alias("val"),
        F.timestamp_micros((F.lit(1_700_000_000)
                            + (F.col("id") % 86_400))
                           * F.lit(1_000_000)).alias("ts"),
        F.when(F.pmod(F.xxhash64("id", F.lit(7)), F.lit(10)) == 0,
               F.lit("delete")).otherwise(F.lit("upsert")).alias("op"),
        F.col("id").alias("seq"),
    )
    return snap, ch

def fp(df):
    cols = [F.col(c).cast("string") for c in df.columns]
    row = df.agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(" + ", ".join(
            f"cast({c} as string)" for c in df.columns) + "))").alias("h"),
    ).first()
    return int(row["n"]), str(row["h"])

# warm-up: compile plans + workers on a small slice
temporal.sessionize(session_events(5000), key_cols="user_id",
                    ts_col="ts", gap_seconds=1800,
                    seq_col="event_id").count()
s0, c0 = cdc_inputs(5000)
temporal.merge_changelog(s0.limit(1000), c0, key_cols="k", ts_col="ts",
                         op_col="op", seq_col="seq").count()

ev = session_events(n_events).repartition(cores * 2).persist()
ev.count()
snap, ch = cdc_inputs(n_events)
snap = snap.repartition(cores * 2).persist(); snap.count()
ch = ch.repartition(cores * 2).persist(); ch.count()

res = {}
for name, fn in [
    ("sessionize", lambda: temporal.sessionize(
        ev, key_cols="user_id", ts_col="ts", gap_seconds=1800,
        seq_col="event_id",
        value_aggs={"v_sum": ("value", "sum")})),
    ("merge_changelog", lambda: temporal.merge_changelog(
        snap, ch, key_cols="k", ts_col="ts", op_col="op", seq_col="seq")),
]:
    best = None
    for _ in range(trials):
        spark.sparkContext.setJobDescription(f"{name} scale {master}")
        t0 = time.time()
        f = fp(fn())
        wall = time.time() - t0
        best = (wall, f) if best is None or wall < best[0] else best
    res[name] = {"wall_sec": round(best[0], 2),
                 "rows_per_sec": round(n_events / best[0], 2),
                 "out_rows": best[1][0], "fingerprint": best[1][1]}
print("TEMPORALRESULT " + json.dumps({
    "master": master, "cores": cores, "n_events": n_events, **res}))
"""


def run_level(master: str, n_events: int, trials: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, master, str(n_events), str(trials)],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "PYTHONPATH": "."},
    )
    for line in out.stdout.splitlines():
        if line.startswith("TEMPORALRESULT "):
            return json.loads(line[len("TEMPORALRESULT "):])
    raise SystemExit(
        f"level {master} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    lo, hi = (os.environ.get("SCALE_LEVELS") or "4,16").split(",")
    levels = [run_level(f"local[{int(lo)}]", n_events, trials),
              run_level(f"local[{int(hi)}]", n_events, trials)]
    lines = [
        "# Temporal/CDC family scale evidence (sessionize, merge_changelog)",
        "",
        f"{n_events:,} events / changes, deterministic column-expression "
        f"inputs, best of {trials} trial(s) per level in separate JVMs.",
        "",
    ]
    ok = True
    for op in ("sessionize", "merge_changelog"):
        lines.append("| operator | level | wall (s) | rows/s | out rows |")
        lines.append("|---|---|---|---|---|")
        for lv in levels:
            r = lv[op]
            lines.append(
                f"| {op} | local[{lv['cores']}] | {r['wall_sec']} "
                f"| {r['rows_per_sec']} | {r['out_rows']} |")
        same = (levels[0][op]["fingerprint"] == levels[1][op]["fingerprint"]
                and levels[0][op]["out_rows"] == levels[1][op]["out_rows"])
        ok = ok and same
        sp = levels[0][op]["wall_sec"] / levels[1][op]["wall_sec"]
        eff = sp / (levels[1]["cores"] / levels[0]["cores"])
        lines.append("")
        lines.append(
            f"{op}: speedup {levels[0]['cores']}->{levels[1]['cores']}: "
            f"**{sp:.2f}x**; efficiency **{eff:.3f}**; outputs identical "
            f"across levels (count + order-independent xxhash64 "
            f"fingerprint): **{same}**")
        lines.append("")
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/SCALING_TEMPORAL.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"levels": levels, "identical": ok}))


if __name__ == "__main__":
    main()
