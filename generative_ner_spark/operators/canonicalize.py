"""Canonicalization: MinHash-LSH blocking + connected components.

North-rule stage: near-duplicate entity names (e.g. "Acme Systems" vs
"Acme Systems Corporation") are merged into one canonical id. Published
technique stack, implemented 100% with JVM-side Spark SQL expressions (no
Python in the hot path):

  1. character n-gram shingles of the normalized name         (array ops)
  2. k MinHash values via xxhash64(shingle, seed_i), min-agg   (codegen'd)
  3. b bands of r hashes -> band_hash, explode, self-join on
     band_hash = candidate pairs                               (LSH blocking)
  4. exact Jaccard verification on the candidate pairs only    (array ops)
  5. connected components by alternating large-star/small-star
     DataFrame joins (Kiveris et al., "Connected Components in
     MapReduce and Beyond", SoCC'14) with localCheckpoint per
     iteration to truncate lineage.

Scale notes: LSH makes pair generation O(candidates), never O(n^2); the
self-join shuffles on band_hash whose cardinality we control via (b, r);
CC converges in O(log n) rounds and each round is two shuffles on a
pair table that only shrinks. Band buckets with pathological size (a
popular token) are capped by ``max_bucket`` to bound worst-case pair
blowup — pass ``metrics`` to lsh_candidate_pairs to get the capped
bucket/row counts (otherwise the cap is silent by design: no extra job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_shingles(df: DataFrame, name_col: str = "name", n: int = 3,
                  out: str = "shingles") -> DataFrame:
    """Add a distinct character-n-gram shingle array column (JVM-side).

    Strings shorter than n get a single shingle = the whole string, so every
    entity has a non-empty set.
    """
    expr = (
        f"CASE WHEN length({name_col}) < {n} THEN array({name_col}) "
        f"ELSE array_distinct(transform(sequence(1, length({name_col}) - {n - 1}), "
        f"i -> substring({name_col}, i, {n}))) END"
    )
    return df.withColumn(out, F.expr(expr))


# Universal-hash family over the Mersenne prime 2^31-1: keeps every product
# below 2^62, so the expressions are safe under Spark 4's default ANSI mode
# (long-overflow would otherwise raise).
_MH_P = (1 << 31) - 1


def _mh_coeffs(k: int) -> list[tuple[int, int]]:
    import random

    rng = random.Random("minhash-coeffs")
    return [(rng.randrange(1, _MH_P), rng.randrange(0, _MH_P)) for _ in range(k)]


def _raw_shingle_hash(col, hash_family: str):
    """shingle -> full-width hash long: xxhash64 (fast path) or the
    60-bit md5 prefix (cross-engine path — DuckDB computes the identical
    value from the same 15 hex chars, see dedup.simhash_width). The full
    width is what shingle SETS are represented by (collision odds ~2^-60
    within one compared pair); the signature path folds it to [0, p)
    with pmod (_shingle_hash)."""
    if hash_family == "xxhash64":
        return F.xxhash64(col)
    if hash_family == "md5":
        return F.conv(
            F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hash_family: {hash_family}")


def _shingle_hash(col: str, hash_family: str):
    """shingle -> value in [0, p): xxhash64 (fast path) or md5-prefix
    (cross-engine path — DuckDB computes the identical value from the same
    15 hex chars, see dedup.simhash_width for the width rationale)."""
    return F.pmod(_raw_shingle_hash(col, hash_family), F.lit(_MH_P))


def shingle_hash_rows(
    entities: DataFrame,
    id_col: str = "entity_id",
    name_col: str = "name",
    n: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(id, name) -> exploded (id, _sh) rows, _sh = full-width shingle
    hash (r6, guide §4.1 "prefer built-ins"): position explode +
    substring + hash is plain whole-stage codegen, replacing the
    interpreted transform/array_distinct higher-order pass that built
    shingle ARRAYS for every document before anything else ran.
    DUPLICATE positions are retained — every consumer is either a
    min-aggregate (minhash: min over a multiset equals min over its set)
    or a collect_set. Same <n contract as with_shingles: a short string
    yields its whole self as the single shingle (substring truncates),
    so every named entity has at least one row."""
    return (
        entities.select(F.col(id_col).alias("id"),
                        F.col(name_col).alias("nm"))
        .select(
            "id", "nm",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.length("nm") - F.lit(n - 1), F.lit(1)))
            ).alias("_i"),
        )
        .select(
            "id",
            _raw_shingle_hash(
                F.col("nm").substr(F.col("_i"), F.lit(n)), hash_family
            ).alias("_sh"),
        )
    )


def minhash_df(sh_df: DataFrame, id_col: str = "id",
               shingle_col: str = "shingles", k: int = 64,
               hash_family: str = "xxhash64") -> DataFrame:
    """(id, shingles) -> (id, minhash ARRAY<LONG>) via explode + groupBy.

    One string hash per shingle, k arithmetic min-aggregates, columnar
    codegen. Map-side partial aggregation collapses each id to 64 values
    BEFORE the shuffle (ids live in one input partition), so the exchange
    carries n_ids x 64 longs regardless of shingle counts — both the fastest
    local form (2.7x over the array-aggregate expression at sf0.1) and the
    scale-correct one.
    """
    exploded = sh_df.select(
        F.col(id_col).alias("id"), F.explode(shingle_col).alias("_s")
    ).select("id", _shingle_hash("_s", hash_family).alias("_h"))
    return _minhash_from_hash_rows(exploded, k)


def _minhash_from_hash_rows(rows: DataFrame, k: int) -> DataFrame:
    """(id, _h in [0, p)) rows -> (id, minhash ARRAY<LONG>), k-min scheme.
    Shared by the array API above and the exploded-row fast path
    (shingle_band_rows); duplicates in rows are harmless (min over a
    multiset == min over its set)."""
    coeffs = _mh_coeffs(k)
    aggs = [
        F.min(F.pmod(F.col("_h") * F.lit(a) + F.lit(b), F.lit(_MH_P))).alias(f"_m{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    return (
        rows.groupBy("id")
        .agg(*aggs)
        .select("id", F.array(*[F.col(f"_m{i}") for i in range(k)]).alias("minhash"))
    )


def minhash_df_oph(sh_df: DataFrame, id_col: str = "id",
                   shingle_col: str = "shingles", k: int = 64,
                   hash_family: str = "xxhash64") -> DataFrame:
    """(id, shingles) -> (id, minhash ARRAY<LONG>) via ONE-PERMUTATION
    HASHING (Li, Owen & Zhang, NeurIPS 2012): each shingle's single hash
    lands in bucket h mod k and each bucket keeps its min — ONE aggregate
    update per shingle instead of the k-universal-hash family's k, i.e.
    ~k× less aggregation CPU on the stage that dominates corpus-scale
    dedup. The trade: per-signature-slot variance is higher and short
    documents leave empty buckets.

    Empty buckets are DENSIFIED deterministically as a pure function of
    the set (pmod(global_min + bucket * C, p)), so identical shingle sets
    always produce identical signatures (byte-reproducible, any cluster
    size); near-identical sets may disagree on densified slots, mildly
    lowering banding recall for short docs — the exact-Jaccard verify
    stage is unaffected, so precision is identical to the k-min scheme.

    Distributed shape: explode -> ONE groupBy(id) with k conditional
    min aggregates + the global min (map-side combine collapses each id
    to k+1 values BEFORE the shuffle), densification as a flat coalesce
    projection — see _minhash_oph_from_hash_rows.
    """
    exploded = sh_df.select(
        F.col(id_col).alias("id"), F.explode(shingle_col).alias("_s")
    ).select("id", _shingle_hash("_s", hash_family).alias("_h"))
    return _minhash_oph_from_hash_rows(exploded, k)


def _minhash_oph_from_hash_rows(rows: DataFrame, k: int) -> DataFrame:
    """(id, _h in [0, p)) rows -> (id, minhash), one-permutation scheme
    (see minhash_df_oph); duplicate rows per shingle are harmless.

    r6 shape: ONE groupBy with k conditional mins
    (min(when(_b = i, _h))) plus the global min — value-identical to
    the r5 two-stage form (per-bucket min -> map_from_entries ->
    transform densification) but with one exchange instead of two and
    zero interpreted HOF work; the conditional is a comparison per
    (row, slot), strictly cheaper than the k-universal family's
    mul+add+pmod per (row, slot). Benched 20.9 s -> kmin-parity on the
    sf1.0 salted corpus where the two-stage shape was 2.5x slower than
    the k-min scheme it was meant to beat."""
    C = 0x9E3779B1  # odd constant spreads densified slots over [0, p)
    bucketed = rows.withColumn("_b", F.pmod("_h", F.lit(k)).cast("int"))
    aggs = [
        F.min(F.when(F.col("_b") == i, F.col("_h"))).alias(f"_m{i}")
        for i in range(k)
    ]
    per_id = bucketed.groupBy("id").agg(*aggs, F.min("_h").alias("_gmin"))
    slots = [
        F.coalesce(
            F.col(f"_m{i}"),
            F.pmod(F.col("_gmin") + F.lit(i) * F.lit(C), F.lit(_MH_P)),
        )
        for i in range(k)
    ]
    return per_id.select("id", F.array(*slots).alias("minhash"))


def capped_self_join_pairs(
    rows: DataFrame,
    bucket_cols: tuple,
    id_col: str = "id",
    max_bucket: int | None = 64,
    metrics: dict | None = None,
    payload_cols: tuple = (),
) -> DataFrame:
    """THE candidate-pair lifecycle shared by every banding family
    (MinHash bands here, SimHash chunks in dedup.py, hyperplane buckets
    in similarity.py): count bucket occupancy (persisted — the optional
    metrics job must not re-run the agg), drop buckets above
    ``max_bucket`` (bounding the worst-case pair blowup a degenerate
    corpus causes), self-join within surviving buckets, and emit
    deduplicated (a, b[, <payload>_a, <payload>_b]) with a < b,
    eagerly ``localCheckpoint``ed so callers can release their upstream
    caches immediately. ``metrics`` receives {"capped_buckets",
    "capped_rows"} — the reported recall loss of the cap.
    """
    keys = list(bucket_cols)
    counts = None
    if max_bucket is None:
        # cap disabled (oracle-replay callers lift it): skip the
        # occupancy aggregate + join entirely — one less job and one
        # less exchange per pair stage (r6)
        if metrics is not None:
            metrics["capped_buckets"] = 0
            metrics["capped_rows"] = 0
        capped = rows
    else:
        counts = rows.groupBy(*keys).agg(
            F.count("*").alias("_bc")).persist()
        if metrics is not None:
            over = (
                counts.where(F.col("_bc") > max_bucket)
                .agg(F.count("*").alias("b"),
                     F.coalesce(F.sum("_bc"), F.lit(0)).alias("r"))
                .first()
            )
            metrics["capped_buckets"] = over["b"]
            metrics["capped_rows"] = int(over["r"])
        capped = rows.join(counts.where(F.col("_bc") <= max_bucket), keys)
    left = capped.select(
        *keys, F.col(id_col).alias("a"),
        *[F.col(p).alias(f"{p}_a") for p in payload_cols],
    )
    right = capped.select(
        *keys, F.col(id_col).alias("b"),
        *[F.col(p).alias(f"{p}_b") for p in payload_cols],
    )
    pairs = (
        left.join(right, keys)
        .where(F.col("a") < F.col("b"))
        .select("a", "b",
                *[f"{p}_a" for p in payload_cols],
                *[f"{p}_b" for p in payload_cols])
        .dropDuplicates(["a", "b"])
        .localCheckpoint()  # eager: materialize candidates once
    )
    if counts is not None:
        counts.unpersist()
    return pairs


def shingle_band_rows(
    entities: DataFrame,
    id_col: str = "entity_id",
    name_col: str = "name",
    k: int = 64,
    bands: int = 16,
    n: int = 3,
    hash_family: str = "xxhash64",
    scheme: str = "kmin",
) -> tuple:
    """Shared signature/banding front half of every MinHash consumer
    (lsh_candidate_pairs here, the written incremental index in
    dedup.py): returns (shingles_df PERSISTED as (id, shingles) where
    ``shingles`` is the document's sorted DISTINCT full-width
    shingle-hash set (array<long>; r6 — set identity by hash, ~2^-60
    per-pair collision odds), banding rows (id, band, band_hash)). The
    CALLER owns the shingle cache — unpersist it once its pair set /
    index write is materialized.

    SLIM banding rows: (id, band, band_hash) only. Carrying the shingle
    arrays through a self-join shuffles ~|shingles| strings per banded
    row — the dominant cost at corpus scale; join them back per-id after
    pair generation instead. band_hash = xxhash64 over the band's slice
    of the signature — a single transform lambda, so the expression tree
    is O(1) in (bands, r) (the unrolled per-band concat_ws/element_at
    tree cost seconds of driver-side Catalyst/janino time per fresh
    plan).
    """
    if k % bands != 0:
        raise ValueError(
            f"k={k} not divisible by bands={bands}: the banding would "
            f"silently ignore the last {k - bands * (k // bands)} minhash "
            f"slots and the effective S-curve would differ from the "
            f"requested (k, bands) tuning")
    r = k // bands
    # r6 shape: the signature path consumes EXPLODED codegen hash rows
    # (shingle_hash_rows) — no interpreted array build, no distinct (min
    # aggregates ignore duplicates). The returned `sh` frame now carries
    # each document's DISTINCT shingle-hash set (array<long>, full-width
    # hash) instead of the string array: the exact-Jaccard verify and the
    # written index operate on 8-byte longs with ~2^-60 per-pair
    # collision odds, cutting both the verify-join bytes and the
    # interpreted per-shingle work that dominated the signature stage.
    rows = shingle_hash_rows(entities, id_col, name_col, n=n,
                             hash_family=hash_family)
    sh = (
        rows.groupBy("id")
        .agg(F.sort_array(F.collect_set("_sh")).alias("shingles"))
        .persist()
    )
    # signature rows re-explode the CACHED distinct sets (min aggregates
    # are set functions, so distinct vs multiset is identical) — the
    # corpus text is scanned and hashed exactly ONCE per banding pass
    sig_rows = (
        sh.select("id", F.explode("shingles").alias("_sh"))
        .select("id", F.pmod("_sh", F.lit(_MH_P)).alias("_h"))
    )
    if scheme == "oph":
        # one-permutation hashing: ~k× less aggregation CPU on the
        # signature stage (see minhash_df_oph); banding/verify unchanged
        mh = _minhash_oph_from_hash_rows(sig_rows, k)
    elif scheme == "kmin":
        mh = _minhash_from_hash_rows(sig_rows, k)
    else:
        raise ValueError(f"unknown minhash scheme: {scheme}")
    banded = mh.select(
        "id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> xxhash64(slice(minhash, b * {r} + 1, {r}), b))"
            )
        ).alias("band", "band_hash"),
    )
    return sh, banded


def lsh_candidate_pairs(
    entities: DataFrame,
    id_col: str = "entity_id",
    name_col: str = "name",
    k: int = 64,
    bands: int = 16,
    n: int = 3,
    jaccard_threshold: float = 0.6,
    max_bucket: int | None = 64,
    metrics: dict | None = None,
    hash_family: str = "xxhash64",
    scheme: str = "kmin",
) -> DataFrame:
    """(id, name) -> verified near-duplicate pairs (a < b, jaccard >= t).

    LSH blocking with b=bands, r=k/bands, then EXACT Jaccard verification on
    the blocked candidates (so precision is exact; only recall depends on
    the S-curve of (b, r)).

    Pass ``metrics`` (a dict) to receive {"capped_buckets", "capped_rows"}:
    the recall loss from the ``max_bucket`` hot-bucket cap, at the cost of
    one extra small aggregate job. Without it the cap is silent.

    ``hash_family``: 'xxhash64' (fast path, the production default) or
    'md5' (cross-engine path whose signatures a DuckDB oracle recomputes
    exactly — see _shingle_hash; backs the q20/q31 driver oracles).

    The verified pairs are eagerly ``localCheckpoint``ed before returning:
    the shingle-set cache backing three plan branches is then unpersisted
    immediately (the r1 form leaked it across calls), and downstream
    consumers (connected components' multi-pass loop) never re-run the
    blocking plan.
    """
    if k % bands != 0:
        raise ValueError(
            f"k={k} not divisible by bands={bands}: the banding would "
            f"silently ignore the last {k - bands * (k // bands)} minhash "
            f"slots and the effective S-curve would differ from the "
            f"requested (k, bands) tuning")
    sh, banded = shingle_band_rows(entities, id_col, name_col, k=k,
                                   bands=bands, n=n,
                                   hash_family=hash_family, scheme=scheme)
    # cap pathological buckets (hot shingle patterns) — bounded pair blowup
    pairs = capped_self_join_pairs(
        banded, ("band", "band_hash"), "id", max_bucket, metrics)
    verified = (
        pairs
        .join(sh.select(F.col("id").alias("a"), F.col("shingles").alias("sh_a")), "a")
        .join(sh.select(F.col("id").alias("b"), F.col("shingles").alias("sh_b")), "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("a", "b", "jaccard")
    )
    verified = verified.localCheckpoint()  # eager: materialize pairs once
    sh.unpersist()  # shingle cache no longer needed — don't leak it
    return verified


def _large_star(e_sym: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., SoCC'14, Algorithm 2).

    Input: symmetric edge list (u, v), u != v. For each node u let
    m = min(Γ(u) ∪ {u}); emit (v, m) for every neighbor v > u. Output is
    directed (l, s) with l > s by construction (s = m <= u < v = l).
    """
    mins = e_sym.groupBy("u").agg(F.min("v").alias("mv")).select(
        "u", F.least("u", "mv").alias("m")
    )
    # NO .distinct() here (r6): different u's can emit the same (l, s),
    # but the only consumer is _small_star, whose min-aggregate ignores
    # duplicates and whose own output IS deduplicated — the r5 distinct
    # was a full extra exchange of the round's largest frame per round.
    return (
        e_sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("l"), F.col("m").alias("s"))
        .where(F.col("l") != F.col("s"))
    )


def _small_star(e_dir: DataFrame) -> DataFrame:
    """Small-star round (Kiveris et al., Algorithm 3).

    Input: directed (l, s) with l > s. For each l let m = min of its (all
    smaller) neighbors; re-point every neighbor s (and l itself) at m.
    Output stays in (l, s) l > s form.
    """
    mins = e_dir.groupBy("l").agg(F.min("s").alias("m"))
    moved = (
        e_dir.join(mins, "l")
        .select(F.col("s").alias("l"), F.col("m").alias("s"))
        .where(F.col("l") != F.col("s"))
    )
    pointed = mins.select(F.col("l"), F.col("m").alias("s"))
    return moved.union(pointed).distinct()


def connected_components(
    edges: DataFrame, max_iter: int = 20, driver_threshold: int = 2_000_000,
    stats: dict | None = None,
) -> DataFrame:
    """Undirected edges (a, b) -> (id, component) with component = min member.

    Two regimes:
    * edge count <= ``driver_threshold``: collect + union-find on the driver
      (milliseconds, zero extra jobs). Near-dup edge sets are SPARSE — even a
      10^9-entity catalog typically yields << 10^8 verified near-dup pairs,
      and 2M pairs is a few tens of MB on the driver. This collapses ~15
      tiny-task Spark jobs of loop overhead that dominated wall-clock.
    * larger: alternating large-star/small-star rounds (Kiveris et al.,
      "Connected Components in MapReduce and Beyond", SoCC'14) with
      ``localCheckpoint`` per round to truncate lineage. Converges in
      O(log n) rounds even on pathological long chains (pinned by the
      10^4-node path-graph test) — the r1 min-label propagation needed
      O(diameter) rounds there. At the fixed point every edge points
      directly at its component's minimum node.

    ``stats`` (optional dict) receives {"rounds": int, "converged": bool,
    "regime": "driver"|"distributed"}.
    """
    spark = edges.sparkSession
    # materialize ONCE up front: the regime-selecting count plus either
    # regime's consumption (driver collect / distributed symmetrize) would
    # otherwise execute the caller's whole upstream plan twice — for a
    # generic caller that can be an entire LSH blocking pass
    edges = edges.localCheckpoint()
    n_edges = edges.count()
    if n_edges <= driver_threshold:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:
                parent[x], x = r, parent[x]
            return r

        # Arrow collect (toPandas + tolist -> python natives), NOT
        # .collect(): row-at-a-time pickle deserialization of 1.5M edge
        # Rows cost ~30s of pure driver serial time in the 1M-doc scale
        # profile; the Arrow path moves the same edges in ~1s and the
        # union-find loop itself is the only remaining serial work
        pdf = edges.select("a", "b").toPandas()
        col_a, col_b = pdf["a"].tolist(), pdf["b"].tolist()
        for ea, eb in zip(col_a, col_b):
            ra, rb = find(ea), find(eb)
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
        nodes = set(col_a)
        nodes.update(col_b)
        out = [(x, find(x)) for x in sorted(nodes)]
        if stats is not None:
            stats.update(rounds=0, converged=True, regime="driver")
        # schema DERIVED from the input id type: a hardcoded string schema
        # silently coerced long ids to strings here while the distributed
        # regime preserved them — the output type would flip with edge
        # count, and downstream joins would lean on implicit casts
        id_t = edges.schema["a"].dataType.simpleString()
        return spark.createDataFrame(out, f"id {id_t}, component {id_t}")

    cur = (
        edges.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .union(edges.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .where(F.col("u") != F.col("v"))
        # NO .distinct() (r6c): it cost a full exchange of the 2E-row
        # symmetrized set before round 1, and no round needs it — both
        # stars' min-aggregates ignore duplicates, _small_star ends in
        # its own .distinct(), and from round 2 on ``cur`` is rebuilt
        # from the already-deduplicated star output. Duplicate INPUT
        # edges (a generic caller's) only add round-1 join rows, never
        # change the fixpoint.
        .localCheckpoint()  # cut the upstream (LSH) DAG once, or every
        # round re-runs the whole blocking plan
    )
    def _edge_sig(df: DataFrame) -> tuple:
        """(count, order-independent xxhash64 fingerprint) in ONE pass —
        the r6 convergence probe. The r5 check ran count() PLUS a full
        exceptAll anti-join job per round; two scalar aggregates compare
        the same sets with collision odds ~2^-64 per round (the star
        rounds are monotone label-lowering, so a collision would merely
        stop one round early on an astronomically unlikely fingerprint
        tie — and both stars' output is already deduplicated, making
        count+multiset-hash equality set equality)."""
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(l, s))").alias("h"),
        ).first()
        return row["n"], row["h"]

    prev = None
    prev_sig = None
    stars = None
    converged = False
    rounds = 0
    for rounds in range(1, max_iter + 1):
        ss = _small_star(_large_star(cur)).localCheckpoint()
        sig = _edge_sig(ss)
        if prev_sig is not None and sig == prev_sig:
            stars, converged = ss, True
            break
        prev, prev_sig = ss, sig
        # no distinct (r6): ss is deduplicated and strictly l > s, so the
        # two directed copies cannot collide — the r5 distinct re-shuffled
        # 2x the round's edges for nothing. And no localCheckpoint (r6b):
        # ss IS checkpointed above, so this union is two shallow scans of
        # that RDD — materializing it again copied 2x the round's edges
        # to disk per round for a frame the next round's single action
        # reads once per star.
        cur = (
            ss.select(F.col("l").alias("u"), F.col("s").alias("v"))
            .union(ss.select(F.col("s").alias("u"), F.col("l").alias("v")))
        )
    if stars is None:
        stars = prev  # best effort at max_iter (same contract as before)
    if stats is not None:
        stats.update(rounds=rounds, converged=converged, regime="distributed")
    out = (
        stars.select(F.col("l").alias("id"), F.col("s").alias("component"))
        .union(stars.select(F.col("s").alias("id"), F.col("s").alias("component")))
        .distinct()
    )
    # regime parity: the u != v filter above drops nodes that appear ONLY
    # in self-loop edges (a, a); the driver regime emits them as their own
    # singleton component — do the same here (LSH pairs are strictly a < b,
    # so this branch is empty on the canonicalization path)
    self_only = (
        edges.where(F.col("a") == F.col("b"))
        .select(F.col("a").alias("id"))
        .distinct()
        .join(out.select("id"), "id", "left_anti")
        .select("id", F.col("id").alias("component"))
    )
    return out.unionByName(self_only)


def canonical_map(
    entities: DataFrame,
    id_col: str = "entity_id",
    name_col: str = "name",
    **lsh_kwargs,
) -> DataFrame:
    """entities -> (entity_id, canonical_id); singletons map to themselves."""
    pairs = lsh_candidate_pairs(entities, id_col, name_col, **lsh_kwargs)
    comp = connected_components(pairs.select("a", "b"))
    # comp only contains ids that appear in a near-dup pair — a small
    # fraction of the catalog — so broadcast it explicitly (without the hint
    # the pre-AQE plan is a SortMergeJoin that shuffles the whole catalog)
    return (
        entities.select(F.col(id_col).alias("entity_id"))
        .join(F.broadcast(comp), F.col("entity_id") == comp.id, "left")
        .select(
            "entity_id",
            F.coalesce("component", F.col("entity_id")).alias("canonical_id"),
        )
    )


def catalog_fingerprint(
    entities: DataFrame,
    cols: tuple[str, ...] = ("entity_id", "name", "entity_type"),
) -> str:
    """Order-independent fingerprint of an entity catalog, as a decimal
    string. A committed canonical map is only valid for the catalog it was
    computed from (jobs/kg_construct.py gates reuse on this).

    bit_xor, NOT sum: under Spark 4 ANSI mode a long sum over full-range
    signed xxhash64 values throws ARITHMETIC_OVERFLOW for any catalog
    beyond a few hundred rows; XOR is overflow-free, order-independent,
    and rows are unique by entity_id so pairwise cancellation cannot
    collapse two different catalogs onto each other in practice.
    """
    return str(
        entities.agg(
            F.expr(f"bit_xor(xxhash64({', '.join(cols)}))")
        ).first()[0]
    )
