"""Graph analytics over the constructed knowledge graph.

The KG pipeline's output is a graph (entities = nodes, triples/co-mentions
= edges); downstream curation wants graph-shaped signals: entity salience
(PageRank), local clustering (triangles), and seed-expansion neighborhoods
(k-hop BFS) for building focused subcorpora. No reference counterpart —
this extends the pipeline the same way jobs/curate_corpus.py does; the
algorithms are the published MapReduce formulations (Brin & Page 1998;
Suri & Vassilvitskii WWW'11 "Counting triangles and the curse of the last
reducer"; Kiveris et al. SoCC'14 already powers canonicalize.
connected_components).

Scale shape, sized for 100 TB of edges:
* Everything is (long, long) edge rows — node payloads never enter the
  iteration dataframes.
* ``pagerank`` pre-materializes the out-degree-annotated symmetric
  adjacency ONCE, hash-partitioned by src, and persists it; each
  iteration's rank frame comes out of a groupBy(dst) hash-partitioned on
  the SAME key domain, so the per-iteration join reuses both sides'
  partitioning — the only per-iteration Exchange is the contribution
  groupBy. Ranks are ``localCheckpoint``ed every iteration to truncate
  lineage (an unrolled 5-deep join tree re-optimizes the whole history
  per step otherwise).
* ``triangle_counts`` orients every edge from lower to higher
  (degree, id) rank before generating wedges — the classic fix for the
  curse-of-the-last-reducer: a hub of degree D contributes O(D^2) wedges
  un-oriented, but oriented out-degrees are bounded by O(sqrt(E)), so no
  reducer sees a quadratic bucket.
* ``khop_neighbors`` is frontier BFS: hop i joins ONLY the hop-(i-1)
  frontier (not the whole visited set) against the adjacency, anti-joins
  the visited set, unions. Frontiers are localCheckpointed per hop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Iterative operators truncate lineage every this-many steps instead of
# every step (see pagerank's docstring for the rationale): short lazy
# chains are planned once by their single downstream action.
_CHECKPOINT_EVERY = 4


def cooccurrence_edges(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket: int | None = None,
    metrics: dict | None = None,
) -> DataFrame:
    """(basket, item) rows -> undirected weighted co-occurrence edges
    ``(src, dst, weight)`` with ``src < dst``; weight = number of baskets
    containing both items. The market-basket / co-mention graph builder:
    for the KG it is "entities mentioned in the same document".

    Distributed shape: distinct (basket, item), self-join within basket
    (src < dst halves the output and canonicalizes in one step), one
    map-side-combined groupBy for the weights. ``max_basket`` bounds the
    quadratic per-basket blowup exactly like the banding families'
    ``capped_self_join_pairs``: baskets above the cap are dropped whole
    (a 10^6-item basket contributes 10^12 pairs otherwise), and
    ``metrics`` receives {"capped_baskets", "capped_rows"}.
    """
    # r6 shape (guide §2.4 "remove shuffles outright"): ONE groupBy folds
    # each basket to its sorted distinct item array (collect_set absorbs
    # the former standalone .distinct() exchange, and size(_its) replaces
    # the separate occupancy-count frame + cap join), then the per-basket
    # pair generation runs IN-ARRAY (sorted array => src < dst by
    # construction) and explodes straight into the weight groupBy. The
    # r5 form paid 4 exchanges (distinct, cap-count join, self-join,
    # weight groupBy) and probed the basket self-join row by row; this
    # pays 2. The quadratic-basket guard is unchanged in meaning:
    # baskets above ``max_basket`` are dropped whole, metrics reports
    # {"capped_baskets", "capped_rows"} (rows = distinct items of the
    # dropped baskets, as before).
    baskets = (
        df.select(F.col(basket_col).alias("_bk"), F.col(item_col).alias("_it"))
        .groupBy("_bk")
        .agg(F.sort_array(F.collect_set("_it")).alias("_its"))
    )
    if max_basket is not None:
        # localCheckpoint, not persist: eager, shared by the metrics agg
        # and the cap filter, and released by GC when this frame drops
        # out of scope — a persist here would leak cache for the session
        baskets = baskets.localCheckpoint()
        if metrics is not None:
            over = (
                baskets.where(F.size("_its") > max_basket)
                .agg(F.count("*").alias("b"),
                     F.coalesce(F.sum(F.size("_its")), F.lit(0)).alias("r"))
                .first()
            )
            metrics["capped_baskets"] = over["b"]
            metrics["capped_rows"] = int(over["r"])
        baskets = baskets.where(F.size("_its") <= max_basket)
    pairs = F.flatten(
        F.transform(
            "_its",
            lambda x, i: F.transform(
                F.slice("_its", i + F.lit(2),
                        F.size("_its") - i - F.lit(1)),
                lambda y: F.struct(x.alias("src"), y.alias("dst")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pairs).alias("_p"))
        .groupBy(F.col("_p.src").alias("src"), F.col("_p.dst").alias("dst"))
        .agg(F.count("*").alias("weight"))
    )


def _symmetric(edges: DataFrame) -> DataFrame:
    """Canonical (src<dst) edge list -> both-direction (src, dst) rows."""
    e = edges.select("src", "dst")
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def degrees(edges: DataFrame) -> DataFrame:
    """(node, degree) over a canonical undirected edge list — one
    map-side-combined groupBy over the symmetrized edges."""
    return (
        _symmetric(edges)
        .groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("degree"))
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    round_to: int | None = 6,
) -> DataFrame:
    """Power-iteration PageRank over an undirected (canonical src<dst)
    edge list -> ``(node, degree, pr)``. Uniform 1/N init; per step
    ``pr'(v) = (1-d)/N + d * sum_{u~v} pr(u)/deg(u)``. Nodes are "in the
    graph" iff they appear in an edge, so every node has degree >= 1 and
    there is no dangling mass to redistribute — the update is exactly the
    q58 oracle's unrolled SQL.

    Per-iteration cost: ONE Exchange (the contribution groupBy). The
    degree-annotated symmetric adjacency is repartitioned by src and
    persisted up front; the rank frame arrives hash-partitioned on
    ``node`` from the previous groupBy, so the join aligns both sides
    without reshuffling. Lineage is truncated with ``localCheckpoint``
    every ``_CHECKPOINT_EVERY`` iterations rather than every step (r6):
    each step's output feeds exactly one consumer, so a short lazy chain
    is planned ONCE by the single downstream action — the per-step
    checkpoint paid an eager job + a full rank materialization per
    iteration for a lineage problem that only exists past ~5 chained
    steps (quadratic re-planning per ACTION was the r1 failure mode;
    with one action per chunk, planning is linear in chunk length).
    """
    spark = edges.sparkSession
    # persist the SLIM canonical list first (r6b, guide §5): ``edges`` is
    # typically a lazy builder (the co-occurrence groupBy chain) and this
    # operator expands it twice — once under degrees, once under the
    # symmetric adjacency; uncached, each expansion re-ran the whole
    # upstream build
    e = edges.select("src", "dst").persist()
    deg = degrees(e).persist()
    adj = (
        _symmetric(e)
        .join(deg.withColumnRenamed("node", "src"), "src")
        .repartition("src")
        .persist()
    )
    n = deg.count()  # also materializes deg (and seeds adj's build)
    if n == 0:  # empty graph: empty (node, degree, pr) frame, no 1/0
        deg.unpersist()
        adj.unpersist()
        e.unpersist()
        return deg.withColumn("pr", F.lit(0.0)).where(F.lit(False))
    ranks = deg.select(
        "node", (F.lit(1.0) / F.lit(float(n))).alias("pr")
    ).localCheckpoint()
    teleport = (1.0 - damping) / float(n)
    for it in range(n_iter):
        contribs = (
            adj.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("degree")).alias("_in"))
        )
        ranks = (
            deg.select("node")
            .join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(teleport)
                 + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                 ).alias("pr"),
            )
        )
        if (it + 1) % _CHECKPOINT_EVERY == 0 and (it + 1) < n_iter:
            ranks = ranks.localCheckpoint()
    out = ranks.join(deg, "node").select(
        "node", "degree",
        (F.round("pr", round_to) if round_to is not None
         else F.col("pr")).alias("pr"),
    )
    # pin BEFORE releasing the caches: the result joins deg lazily, so
    # an unpersist-then-materialize recomputed degrees from raw edges —
    # exactly the double-compute the persist was bought for
    out = out.localCheckpoint()
    adj.unpersist()
    deg.unpersist()
    e.unpersist()
    return out


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Exact per-node triangle counts ``(node, n_triangles)`` over a
    canonical undirected edge list; nodes in no triangle are omitted.

    Degree-ordered orientation (Suri & Vassilvitskii WWW'11): each edge
    points from its lower (degree, id) endpoint to the higher, so every
    triangle produces exactly ONE wedge at its unique lowest-rank vertex
    and hub vertices generate O(sqrt(E)) out-neighbors instead of O(D)
    — the wedge self-join can't melt a reducer. Wedge (apex, b, c) with
    b < c (id order) closes iff canonical edge (b, c) exists; the
    closing join is on the slim canonical list. Each triangle then
    credits its three vertices via a 3-way unpivot + groupBy.
    """
    # NO persist of the input here (r6b, measured): this operator runs
    # as ONE action (the output checkpoint), and Spark's exchange reuse
    # dedups the identical co-occurrence subtrees under degrees and the
    # ranked frame within a single plan — a persist only added an eager
    # materialization (q59/q73 flat-to-worse at sf0.1). Cross-ACTION
    # reuse, where persist does pay, is the callers' job
    # (clustering_coefficient persists; triangle_count_approx
    # checkpoints its sample).
    e = edges.select("src", "dst")
    deg = degrees(e)
    ranked = (
        _symmetric(e)
        .join(deg.withColumnRenamed("node", "src")
                 .withColumnRenamed("degree", "_ds"), "src")
        .join(deg.withColumnRenamed("node", "dst")
                 .withColumnRenamed("degree", "_dd"), "dst")
    )
    oriented = ranked.where(
        (F.col("_ds") < F.col("_dd"))
        | ((F.col("_ds") == F.col("_dd")) & (F.col("src") < F.col("dst")))
    ).select("src", "dst").persist()
    # Edge-iterator intersection (the r6 rewrite, guide §2.3 "shuffle
    # fewer bytes"): a triangle {a,b,c} ordered by rank is THREE oriented
    # edges a->b, a->c, b->c, so it is found exactly once at its base
    # edge (a, b) as |out(a) ∩ out(b)| — the wedge materialization
    # (sum_a C(out_a, 2) rows through an exchange + a row-per-wedge hash
    # join; ~200M rows on the sf1.0 co-occurrence graph) is replaced by
    # ONE out-neighbor-list aggregation (<= E rows, out-degree O(sqrt E)
    # by the orientation) and two E-row joins whose intersection runs
    # in-memory per edge. Per-triangle credits are identical: apex a and
    # middle b each get |common|, every c in common gets 1.
    adjl = oriented.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("_nb"))
    # re-derive each base edge by exploding the adjacency list itself —
    # (src, dst, _nba) comes out of ONE generator over adjl instead of a
    # second E-row join shipping the src-side arrays
    # shuffle_hash hint: Catalyst's size ESTIMATE for adjl ignores the
    # neighbor arrays' real width, so it picks a broadcast build that
    # OOMs the driver on sf1.0's ~200k x 45-long arrays; a per-partition
    # hash build is the right strategy at every scale here
    tri = (
        adjl.select("src", F.col("_nb").alias("_nba"),
                    F.explode("_nb").alias("dst"))
        .join(adjl.select(F.col("src").alias("dst"),
                          F.col("_nb").alias("_nbb")).hint("shuffle_hash"),
              "dst")
        .withColumn("_common", F.array_intersect("_nba", "_nbb"))
        .withColumn("_n", F.size("_common"))
        .where(F.col("_n") > 0)
        .select("src", "dst", "_common", "_n")
    )
    # ONE explode emits all three credits per base edge (a 3-way union of
    # selects over this subtree re-evaluates the join+intersect three
    # times — union branches share exchanges, not compute)
    credit = F.concat(
        F.array(
            F.struct(F.col("src").alias("node"), F.col("_n").alias("_c")),
            F.struct(F.col("dst").alias("node"), F.col("_n").alias("_c")),
        ),
        F.transform(
            "_common",
            lambda c: F.struct(c.alias("node"), F.lit(1).alias("_c")),
        ),
    )
    out = (
        tri.select(F.explode(credit).alias("_e"))
        .groupBy(F.col("_e.node").alias("node"))
        .agg(F.sum("_e._c").cast("long").alias("n_triangles"))
    )
    out = out.localCheckpoint()
    oriented.unpersist()
    return out


def _adjacency_lists(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge list -> ``(src, _nb)`` with ``_nb`` the
    dst-SORTED neighbor array of src (duplicates retained, mirroring the
    row form). The per-step/hop probe structure for frontier iterations
    (r6c, guide §2.3/§2.4): the row-form adjacency join re-shuffled and
    re-SORTED the full 2E-row frame on every iteration (a two-key
    (src, rank) equi-join defeats the src-only cache partitioning; even
    the one-key form re-sorts 2E rows per step because a groupBy cache
    carries no ordering). The array form is |V| rows; the in-partition
    ``sortWithinPartitions`` is paid ONCE and recorded in the cache's
    outputOrdering, so every later sort-merge join against ``src``
    skips both the exchange AND the sort. Neighbor arrays never cross
    an exchange: consumers element_at/explode them in the join
    projection. A hub's array is one row in one partition — the same
    per-partition bound as the collect_list in triangle_counts."""
    return (
        _symmetric(edges)
        .groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("_nb"))
        .sortWithinPartitions("src")
    )


def khop_neighbors(
    edges: DataFrame,
    seeds: DataFrame,
    k: int = 3,
    node_col: str = "node",
) -> DataFrame:
    """Minimal-hop BFS from a seed set over a canonical undirected edge
    list -> ``(node, hop)`` for every node within ``k`` hops (seeds at
    hop 0, whether or not they touch an edge). The seed-expansion
    primitive for building focused subcorpora ("every entity within 3
    hops of these companies").

    Frontier BFS: hop i expands ONLY the hop-(i-1) frontier against the
    persisted symmetric adjacency and anti-joins the visited set — work
    per hop is O(frontier x avg-degree), never O(visited). Early-exits
    when a frontier empties. Each hop's frames are localCheckpointed so
    the final union is k shallow scans, not a k-deep join tree.

    The adjacency is persisted partitioned AND in-partition sorted by
    ``src`` (r6c): the cache records the sort order, so when the
    per-hop join planner picks sort-merge (a large frontier at scale),
    the 2E-row side skips both its exchange and its per-hop re-sort —
    only the slim frontier moves. (The neighbor-ARRAY form used by
    ``random_walks`` measured SLOWER here: khop's hops are cheap single
    -key probes already, and the collect_list build costs more than the
    three probes combined.)
    """
    adj = (_symmetric(edges).repartition("src")
           .sortWithinPartitions("src").persist())
    # hop frames accumulate as SEPARATE checkpointed frames (r6b): the
    # per-hop anti-join consumes the visited set as a LAZY union of
    # those shallow scans, so the r5 per-hop visited-union checkpoint —
    # which re-materialized the whole history every hop, O(k^2) rows —
    # is gone; only each hop's own (new) frontier is materialized.
    hops = [
        seeds.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("hop", F.lit(0))
        .localCheckpoint()
    ]
    visited = hops[0]
    frontier = visited.select("node")
    for i in range(1, k + 1):
        nxt = (
            adj.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(i))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        hops.append(nxt)
        visited = visited.unionByName(nxt)
        frontier = nxt.select("node")
    adj.unpersist()
    return visited


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 1,
    seeds: DataFrame | None = None,
    node_col: str = "node",
    salt: str = "walk",
) -> DataFrame:
    """Deterministic "random" walks over a canonical undirected edge
    list -> ``(walk_id, start_node, step, node)``: ``walks_per_node``
    walks of ``walk_len`` steps from every node (or from ``seeds``).
    The DeepWalk/node2vec corpus generator — walk co-windows become
    skip-gram training pairs — restated reproducibly: the neighbor
    chosen at step ``i`` of walk ``w`` is

        rank = md5_60bit(salt:w:i) mod degree(current)

    over the current node's dst-sorted neighbor list. md5 is md5 on
    every engine, so a fixed (edge list, salt) yields byte-identical
    walks on any cluster size — and the q69 DuckDB oracle replays them
    exactly. No RNG state, no driver loop over nodes.

    Scale shape (r6c): the adjacency rides as the dst-SORTED neighbor
    ARRAY per node (``_adjacency_lists``, |V| rows, ordering recorded in
    the cache so per-step joins skip both exchange and sort on the
    adjacency side). Each step is ONE single-key equi-join: the degree
    is ``size(_nb)`` and the chosen neighbor ``element_at(_nb, rank+1)``
    — both evaluated in the join projection, so neither the degree
    frame, the rank-annotated 2E-row frame, nor any neighbor array ever
    crosses an exchange. (The r6 row form was two joins per step; its
    (src, rank) equi-join re-shuffled AND re-sorted the full 2E-row
    adjacency every step — measured 5-6 s/step on a 24M-row adjacency
    vs <1 s for this form.) A hub's array is one row in one partition;
    the join output projects a single element from it. Frontiers are
    localCheckpointed per step; a walk from a degree-0 seed emits its
    start row only (inner join: no _nb row, walk stops).
    """
    adj = _adjacency_lists(edges).persist()
    # default start set = every node touching an edge == exactly adj's
    # (unique) src keys: reading it off the persisted frame avoids a
    # SECOND expansion of the (usually lazy) upstream edge build that
    # the r6c form paid for the symmetric-distinct (guide §5)
    start_nodes = (
        seeds.select(F.col(node_col).alias("node")).distinct()
        if seeds is not None
        else adj.select(F.col("src").alias("node"))
    )
    # walk_id is a STRING key ("node:w"): node * walks_per_node + w
    # would be an ANSI long multiply that THROWS on hash-derived ids
    # near the 64-bit range (the CLAUDE.md overflow gotcha)
    walks = start_nodes.select(
        "node",
        F.explode(F.expr(f"sequence(0, {int(walks_per_node) - 1})"))
        .alias("_w"),
    ).select(
        F.concat_ws(":", F.col("node").cast("string"),
                    F.col("_w").cast("string")).alias("walk_id"),
        F.col("node").alias("start_node"),
    )
    # the ONE md5-prefix hash home (quality._md5_rank) — salt:walk:step
    from generative_ner_spark.operators.quality import _md5_rank

    # steps accumulate as SEPARATE checkpointed frames, unioned once at
    # the end (r6): the iteration only ever consumes the previous step's
    # frontier, never the visited union, so the r5 per-step
    # visited-union localCheckpoint re-materialized the whole walk
    # history every step — O(steps^2) rows copied for nothing. The
    # final union is walk_len + 1 shallow scans of checkpointed frames.
    steps = [walks.select(
        "walk_id", "start_node", F.lit(0).alias("step"),
        F.col("start_node").alias("node"),
    ).localCheckpoint()]
    frontier = steps[0].select("walk_id", "start_node",
                               F.col("node").alias("_cur"))
    for i in range(1, walk_len + 1):
        h = _md5_rank(
            F.concat_ws(":", F.col("walk_id").cast("string"),
                        F.lit(str(i))), salt)
        nxt = (
            frontier  # inner join: degree-0 walks stop here (no _nb row)
            .join(adj.withColumnRenamed("src", "_cur"), "_cur")
            .select(
                "walk_id", "start_node", F.lit(i).alias("step"),
                F.element_at(
                    "_nb",
                    (F.pmod(h, F.size("_nb")) + F.lit(1)).cast("int"),
                ).alias("node"),
            )
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        steps.append(nxt)
        frontier = nxt.select("walk_id", "start_node",
                              F.col("node").alias("_cur"))
    adj.unpersist()
    visited = steps[0]
    for s in steps[1:]:
        visited = visited.unionByName(s)
    return visited


def components(edges: DataFrame, max_iter: int = 20,
               stats: dict | None = None) -> DataFrame:
    """Connected components over a canonical undirected edge list ->
    ``(node, component)`` with component = the minimum member id — the
    dedup-cluster / community-seed primitive, exposed on the graph API.
    Thin adapter over ``canonicalize.connected_components`` (alternating
    large-star/small-star, Kiveris et al. SoCC'14: O(log n) rounds with
    per-round localCheckpoint; small edge sets short-circuit to a
    driver-side union-find). Nodes touching no edge emit no row.
    """
    from generative_ner_spark.operators.canonicalize import (
        connected_components,
    )

    return connected_components(
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        max_iter=max_iter, stats=stats,
    ).select(F.col("id").alias("node"), "component")


def label_propagation(edges: DataFrame, n_iter: int = 3) -> DataFrame:
    """Semi-synchronous label propagation (Raghavan et al. 2007) with a
    deterministic tie-break -> ``(node, label)`` after exactly
    ``n_iter`` synchronous rounds — the cheap community detector for
    topic-grouping a co-occurrence graph. Labels start as node ids;
    each round every node adopts the most frequent label among its
    neighbors, ties to the SMALLEST label. Classic async LPA is
    run-order-dependent; fixing synchronous rounds + (count desc,
    label asc) argmax makes the output a pure function of (edges,
    n_iter) — reproducible on any cluster size, replayed exactly by
    the q71 oracle's unrolled SQL.

    Scale shape: per round, one join of the persisted adjacency against
    the label frame and TWO map-side-combined aggregates ((node, label)
    counts, then a max_by argmax per node) — all keyed on uniform
    node/label ids; localCheckpoint per round truncates lineage. The
    adjacency is persisted partitioned by ``dst`` — the key every
    round's join actually probes (labels arrive hash-partitioned on
    node from the previous argmax, so BOTH join sides align and the
    per-round Exchange count drops from 3 to 2; the r5 shape
    partitioned by src, which no per-round operation used, and paid a
    full adjacency reshuffle every round). The initial label frame
    reads node ids off the ``dst`` column for the same reason — in a
    symmetric adjacency src and dst carry the identical node set, and
    dst-partitioning makes that distinct exchange-free.
    """
    adj = _symmetric(edges).repartition("dst").persist()
    labels = (
        adj.select(F.col("dst").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(n_iter):
        nbr = (
            adj.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        labels = (
            nbr.groupBy("node")
            .agg(F.max_by(
                "label",
                F.struct(F.col("cnt"), (-F.col("label")).alias("_negl")),
            ).alias("label"))
            .localCheckpoint()
        )
    adj.unpersist()
    return labels


def triangle_count_approx(
    edges: DataFrame,
    p: float = 0.5,
    salt: str = "tri",
) -> DataFrame:
    """DOULION-style approximate GLOBAL triangle count (Tsourakakis et
    al. KDD'09): keep each edge independently with probability ``p``,
    count triangles exactly on the sampled subgraph, scale by 1/p^3 ->
    one row ``(n_edges_sampled, n_triangles_sampled, est_triangles)``.
    The scale path when the exact per-node count (``triangle_counts``)
    is too expensive: sampling at p cuts the dominant wedge-join work by
    ~p^2 while the estimator stays unbiased with relative error
    O(1/sqrt(p^3 * T)).

    "Random" but reproducible: the coin for edge (src, dst) is the
    md5-60bit hash of ``salt:src:dst`` against ``p * 2^60`` — the same
    subgraph is sampled on every run, engine, and cluster size, so the
    q73 DuckDB oracle replays the estimate EXACTLY (sampling noise is a
    property of (edges, salt), not of the run).
    """
    if not 0 < p <= 1:
        raise ValueError("need 0 < p <= 1")
    cut = int(p * float(1 << 60))
    # the ONE md5-prefix hash home (quality._md5_rank) — salt:src:dst
    from generative_ner_spark.operators.quality import _md5_rank

    coin = _md5_rank(
        F.concat_ws(":", F.col("src").cast("string"),
                    F.col("dst").cast("string")), salt)
    sampled = edges.select("src", "dst").where(coin < cut).persist()
    tri = triangle_counts(sampled)
    n_tri = tri.agg(
        F.coalesce(F.sum("n_triangles"), F.lit(0)).alias("s")
    ).select((F.col("s") / 3).cast("long").alias("t"))  # 3 credits/triangle
    out = sampled.agg(F.count("*").alias("n_edges_sampled")).crossJoin(
        n_tri
    ).select(
        "n_edges_sampled",
        F.col("t").alias("n_triangles_sampled"),
        F.round(F.col("t") / F.lit(float(p) ** 3), 6)
        .alias("est_triangles"),
    )
    out = out.localCheckpoint()
    sampled.unpersist()
    return out


def hits(
    edges: DataFrame,
    n_iter: int = 2,
    round_to: int | None = 6,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg JACM'99) over a DIRECTED edge
    list ``(src, dst)`` -> ``(node, hub, auth)`` — the complement of
    PageRank for bipartite-ish link structure (suppliers -> customers,
    pages -> cited pages): a good HUB points at good authorities, a
    good AUTHORITY is pointed at by good hubs.

    Update per iteration: ``auth(v) = Σ_{u→v} hub(u)`` then ``hub(u) =
    Σ_{u→v} auth(v)``, each L1-normalized (scores sum to 1 — the L2
    norm of the classical formulation needs a sqrt that adds nothing
    for ranking and costs cross-engine float parity). Uniform hub init;
    nodes never cited / never linking have auth / hub 0. Deterministic
    for fixed (edges, n_iter) — the q84 oracle replays the unrolled
    rounds.

    Scale shape (the PageRank argument): the distinct edge list is
    persisted TWICE, partitioned by src and by dst — the two keys the
    alternating half-steps join on — so neither half-step reshuffles
    the edges (the score frame arrives hash-partitioned on node from
    the previous groupBy, and both join sides align; the r5 single
    unpartitioned copy paid a full edge reshuffle on every half-step).
    Each half-step is ONE map-side-combined groupBy; normalization
    totals cross the driver as single scalars; the RAW per-half-step
    aggregate is localCheckpointed (it feeds both the total and the
    normalized frame) and the normalized frames stay lazy projections
    of it — checkpointing them too (r5) materialized every score frame
    twice.
    """
    base = edges.select("src", "dst")
    # repartition BEFORE distinct: hashpartitioning(src) satisfies the
    # (src, dst) aggregation's clustering, so the copy costs one
    # exchange and comes out partitioned on its join key; the dst copy
    # is derived FROM the cached src copy (already distinct — one more
    # slim exchange, no second expansion of the upstream edge build)
    e_src = base.repartition("src").distinct().persist()
    e_dst = e_src.repartition("dst").persist()
    nodes = (
        e_src.select(F.col("src").alias("node"))
        .unionByName(e_dst.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        e_src.unpersist()
        e_dst.unpersist()
        return nodes.select(
            "node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("auth"))
    hub = nodes.select(
        "node", (F.lit(1.0) / F.lit(float(n))).alias("hub")
    ).localCheckpoint()
    auth = None
    for _ in range(n_iter):
        araw = (
            e_src.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("_raw"))
        ).localCheckpoint()
        atot = araw.agg(F.sum("_raw")).first()[0]
        auth = araw.select(
            "node", (F.col("_raw") / F.lit(float(atot))).alias("auth")
        )
        hraw = (
            e_dst.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("_raw"))
        ).localCheckpoint()
        htot = hraw.agg(F.sum("_raw")).first()[0]
        hub = hraw.select(
            "node", (F.col("_raw") / F.lit(float(htot))).alias("hub")
        )
    out = (
        nodes.join(hub, "node", "left")
        .join(auth, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub"),
            F.coalesce(F.col("auth"), F.lit(0.0)).alias("auth"),
        )
    )
    if round_to is not None:
        out = out.select(
            "node", F.round("hub", round_to).alias("hub"),
            F.round("auth", round_to).alias("auth"))
    out = out.localCheckpoint()
    e_src.unpersist()
    e_dst.unpersist()
    nodes.unpersist()
    return out


def clustering_coefficient(
    edges: DataFrame,
    round_to: int | None = 6,
) -> DataFrame:
    """Per-node LOCAL clustering coefficient over a canonical undirected
    edge list: ``cc(v) = 2 * T(v) / (deg(v) * (deg(v) - 1))`` — the
    fraction of v's neighbor pairs that are themselves connected, the
    standard "how clique-like is this entity's neighborhood" signal
    (Watts & Strogatz 1998). Output ``(node, degree, n_triangles, cc)``
    for every node in the graph; degree-<2 nodes have cc 0.0 by
    convention (no neighbor pair exists).

    Scale shape: one join on top of the machinery both inputs already
    use at scale — ``triangle_counts`` (degree-ordered orientation,
    O(sqrt E) wedge bound) and ``degrees`` (map-side-combined agg);
    the final per-node join is on the uniform node key. Fully
    SQL-expressible => full q86 oracle.
    """
    # persist the slim list once (r6b, guide §5): degrees here AND the
    # whole triangle machinery below both expand ``edges``; the final
    # join runs as its own action, which re-ran the co-occurrence build
    # a second time uncached
    e = edges.select("src", "dst").persist()
    deg = degrees(e)
    tri = triangle_counts(e)  # eager: returns a checkpointed frame
    cc = F.when(
        F.col("degree") >= 2,
        (F.lit(2.0) * F.col("n_triangles").cast("double"))
        / (F.col("degree") * (F.col("degree") - F.lit(1))).cast("double"),
    ).otherwise(F.lit(0.0))
    out = deg.join(tri, "node", "left").select(
        "node", "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
    ).select(
        "node", "degree", "n_triangles",
        (F.round(cc, round_to) if round_to is not None else cc).alias("cc"),
    )
    # pin before releasing the cache the lazy deg side still references
    out = out.localCheckpoint()
    e.unpersist()
    return out


def adamic_adar(
    edges: DataFrame,
    min_score: float = 0.0,
    exclude_existing: bool = True,
    round_to: int = 6,
    max_apex_degree: int | None = None,
    metrics: dict | None = None,
) -> DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar 2003) over a canonical
    undirected edge list: for every node pair sharing >= 1 neighbor,
    ``aa(a, b) = Σ_{z ∈ N(a) ∩ N(b)} 1 / ln(deg z)`` — common neighbors
    weighted down by how promiscuous they are, the classic "which KG
    entities should probably be linked" score. Output ``(a, b,
    n_common, aa)`` with a < b; ``exclude_existing`` (default) drops
    pairs already connected — the link-PREDICTION framing.

    Scale shape: wedges are generated once per apex from the
    degree-annotated symmetric adjacency with a dst< dst ordering (each
    unordered pair once per common neighbor — the same Σ deg² wedge
    budget as exact triangle counting, which is the inherent cost of
    exact common-neighbor scores; cap hub degrees upstream via
    cooccurrence_edges(max_basket=...) exactly like the triangle path);
    the per-pair agg is map-side combined; the existing-edge anti-join
    is on the slim canonical list. ln(deg) from exact integers =>
    only the pair sum carries the round-``round_to`` contract (q90
    oracle).

    ``max_apex_degree`` (r6, closing the one operator left without an
    in-operator hub bound): a single apex of degree D contributes
    C(D, 2) wedge rows — a 10^6-degree hub fed directly as an edge list
    melts one reducer with 5*10^11 rows. Apexes above the cap are
    EXCLUDED whole (their 1/ln(deg) terms are the smallest in any pair's
    sum, so dropping them biases scores down, never up — the same
    drop-don't-sample policy as cooccurrence_edges' basket cap), and
    ``metrics`` receives {"capped_apexes", "capped_wedge_rows"} — the
    reported score-mass loss. None (default) keeps the exact
    definition; callers feeding untrusted edge lists should set it.
    """
    # single-action operator: exchange reuse dedups the repeated
    # ``edges`` subtrees within the one plan — a persist + checkpoint
    # here measured as pure overhead (see triangle_counts)
    e0 = edges.select("src", "dst")
    deg = degrees(e0)
    if max_apex_degree is not None:
        if metrics is not None:
            over = (
                deg.where(F.col("degree") > max_apex_degree)
                .agg(
                    F.count("*").alias("n"),
                    F.coalesce(
                        F.sum(F.col("degree") * (F.col("degree") - 1) / 2),
                        F.lit(0.0)).alias("w"),
                )
                .first()
            )
            metrics["capped_apexes"] = over["n"]
            metrics["capped_wedge_rows"] = int(over["w"])
        deg = deg.where(F.col("degree") <= max_apex_degree)
    adj = _symmetric(e0).join(
        deg.withColumnRenamed("node", "src"), "src")
    # wedge at apex=src: every dst pair (b < c) sharing the apex
    left = adj.select(F.col("src").alias("_z"), F.col("dst").alias("a"),
                      F.col("degree").alias("_dz"))
    right = adj.select(F.col("src").alias("_z"), F.col("dst").alias("b"))
    pairs = (
        left.join(right, "_z")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("n_common"),
            F.round(
                F.sum(F.lit(1.0) / F.log(F.col("_dz").cast("double"))),
                round_to,
            ).alias("aa"),
        )
    )
    if exclude_existing:
        ex = e0.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        pairs = pairs.join(ex, ["a", "b"], "left_anti")
    return pairs.where(F.col("aa") >= min_score)


def bounded_closure(
    edges: DataFrame,
    max_depth: int = 3,
) -> DataFrame:
    """Bounded transitive closure of a DIRECTED edge list ``(src, dst)``
    -> ``(src, dst, depth)``: every pair connected by a path of length
    <= ``max_depth``, with the MINIMAL path length — the ontology-
    subsumption expansion ("all ancestors within 3 hops of part_of /
    subclass_of") every KG type system materializes for query time.

    Scale shape (the khop argument generalized to all sources at once):
    the adjacency is repartitioned on src and persisted; each round
    extends the frontier by ONE join against it and anti-joins pairs
    already reached (minimal depth wins — a pair re-reached by a longer
    path never survives); localCheckpoint truncates lineage per round.
    Rounds = max_depth, each ONE Exchange on the join key. Bounded
    depth keeps the result polynomial — the full closure of a deep
    hierarchy is the caller's (documented) responsibility.
    """
    if int(max_depth) < 1:
        raise ValueError("bounded_closure: max_depth must be >= 1")
    adj = edges.select("src", "dst").distinct().repartition("src").persist()
    reached = adj.select("src", "dst", F.lit(1).alias("depth"))
    reached = reached.localCheckpoint()
    frontier = reached
    for d in range(2, int(max_depth) + 1):
        step = (
            frontier.select(F.col("src"), F.col("dst").alias("_mid"))
            .join(adj.select(F.col("src").alias("_mid"),
                             F.col("dst")), "_mid")
            .select("src", "dst")
            .distinct()
            .where(F.col("src") != F.col("dst"))  # no self-loops
            .join(reached.select("src", "dst"), ["src", "dst"],
                  "left_anti")
            .withColumn("depth", F.lit(d))
            .localCheckpoint()
        )
        if step.isEmpty():  # converged before max_depth: stop expanding
            break
        reached = reached.unionByName(step).localCheckpoint()
        frontier = step
    adj.unpersist()
    return reached


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    round_to: int | None = 6,
) -> DataFrame:
    """Personalized PageRank (Haveliwala WWW'02) over an undirected
    canonical edge list: teleport mass returns to the SEED set instead
    of everywhere, so the stationary scores rank nodes by relatedness
    TO THE SEEDS — the KG "entities relevant to this query set"
    primitive behind entity recommendation and query expansion.
    ``seeds`` is a (node) frame; seeds absent from the graph are
    ignored; init = the seed distribution. Output (node, degree, pr).

    Scale shape = pagerank's: degree-annotated adjacency repartitioned
    + persisted once, ONE Exchange per iteration (contribution
    groupBy), teleport vector joined as a slim broadcast frame,
    localCheckpoint per step. The q98 oracle unrolls the identical
    updates.
    """
    # slim canonical list persisted once (r6b, guide §5): degrees and
    # the symmetric adjacency both expand the (usually lazy) builder
    e = edges.select("src", "dst").persist()
    deg = degrees(e).persist()
    seed_nodes = deg.join(
        seeds.select("node").distinct(), "node", "left_semi")
    ns = seed_nodes.count()
    if ns == 0:
        deg.unpersist()
        e.unpersist()
        raise ValueError(
            "personalized_pagerank: no seed appears in the graph")
    adj = (
        _symmetric(e)
        .join(deg.withColumnRenamed("node", "src"), "src")
        .repartition("src")
        .persist()
    )
    tele = (
        deg.select("node")
        .join(F.broadcast(
            seed_nodes.select("node").withColumn(
                "_s", F.lit(1.0 / float(ns)))), "node", "left")
        .select("node", F.coalesce(F.col("_s"), F.lit(0.0)).alias("s"))
        .localCheckpoint()
    )
    ranks = tele.select("node", F.col("s").alias("pr")).localCheckpoint()
    for _ in range(n_iter):
        contribs = (
            adj.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("degree")).alias("_in"))
        )
        ranks = (
            tele.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(1.0 - damping) * F.col("s")
                 + F.lit(damping)
                 * F.coalesce(F.col("_in"), F.lit(0.0))).alias("pr"),
            )
            .localCheckpoint()
        )
    out = ranks.join(deg, "node").select(
        "node", "degree",
        (F.round("pr", round_to) if round_to is not None
         else F.col("pr")).alias("pr"),
    )
    out = out.localCheckpoint()
    adj.unpersist()
    deg.unpersist()
    e.unpersist()
    return out
