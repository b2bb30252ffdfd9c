"""Connected components over a pair/edge relation.

The missing last step of every near-dup pipeline: pair output (doc_a,
doc_b) must become *groups* (each doc -> one canonical keeper) before a
corpus can actually be deduplicated — pairs alone can chain (A~B, B~C
with A!~C), so group identity is the transitive closure.

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round a node takes the min of its own label and its
neighbors' labels; at fixpoint label(n) = min node id in n's component.

Scale posture (100 TB):
- the edge relation is the *pair output of a near-dup stage*, i.e.
  ~(dup_rate x corpus) rows — orders of magnitude smaller than the
  corpus. When it fits in driver memory (threshold-guarded, like
  Spark's own broadcast-join threshold) an exact union-find on the
  driver is optimal: zero shuffles, zero iterations. The result is
  identical (min node id per component) and deterministic.
- above the threshold, iterative min-label propagation, distributed:
  - per round: ONE equi-join keyed on the neighbor id + ONE groupBy
    min — both partial-aggregation-eligible, skew bounded by max
    degree;
  - rounds = graph diameter. Near-dup graphs are unions of
    near-cliques (similarity is ~transitive), so diameter is tiny
    (2-4) regardless of corpus size — the driver loop does not grow
    with data volume;
  - ``localCheckpoint`` truncates lineage each round, keeping the
    plan O(1) instead of O(rounds);
  - convergence = the per-round sum of labels (a single scalar agg):
    labels only ever decrease, so an unchanged sum IS the fixpoint —
    no row-level diff join needed.

Reference scope note: the reference has no graph operator (SURVEY §2 —
its dedup is key-equality upsert only, enhanced_kpi_consumer.py:395-434);
this is part of the training-data extension set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


LOCAL_EDGE_THRESHOLD = 2_000_000


def _local_components(edge_rows, spark, node_type) -> DataFrame:
    """Union-find over a driver-resident edge list; component = min
    node id, matching the distributed fixpoint exactly."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep the smaller id as root so root == min of component
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [(n, find(n)) for n in parent]
    schema = T.StructType(
        [
            T.StructField("node", node_type, False),
            T.StructField("label", node_type, False),
        ]
    )
    if not rows:
        return spark.createDataFrame([], schema)
    # Arrow path: a pandas frame ships to the JVM as one Arrow batch;
    # the row-list path pickles tuple-by-tuple (~2s for 5k rows)
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["node", "label"]), schema
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    local_edge_threshold: int = LOCAL_EDGE_THRESHOLD,
    _took_local_path: list | None = None,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min
    reachable node id. Deterministic for any edge order.

    Adaptive physical strategy: pair graphs from near-dup stages are
    tiny relative to the corpus, so when the raw pair count is under
    ``local_edge_threshold`` the transitive closure runs as an exact
    union-find on the driver — the graph analog of a broadcast join;
    union-find tolerates duplicate/directed edges, so the local path
    never pays the symmetrize + distinct shuffle. Larger graphs use
    distributed min-label propagation; both paths produce identical
    output.
    """
    # Union-find is insensitive to edge direction and multiplicity, so the
    # local-path decision works on the RAW pair projection. Two-tier
    # probe: a bounded limit(K).collect() executes the pair plan exactly
    # once and IS the data fetch for the common case (near-dup pair
    # graphs are tiny relative to the corpus) — no separate count +
    # cached re-read. Only when the probe overflows K do we cache and
    # count; edge lists between K and the threshold then collect FROM
    # the cache, so nothing executes twice and the driver never holds
    # more than max(K, threshold) rows it won't use.
    # Symmetrization + distinct — a full shuffle of the pair relation —
    # is paid only on the distributed path, where label propagation
    # genuinely needs a deduplicated symmetric adjacency.
    probe_cap = min(200_000, local_edge_threshold)
    proj = edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
    probe = proj.limit(probe_cap + 1).collect()
    if len(probe) <= probe_cap:
        if _took_local_path is not None:
            _took_local_path.append(True)
        rows = [(r[0], r[1]) for r in probe]
        out = _local_components(rows, edges.sparkSession, edges.schema[src].dataType)
        return out.withColumnRenamed("label", "component")
    proj = proj.cache()
    n_edges = proj.count()
    if n_edges <= local_edge_threshold:
        if _took_local_path is not None:
            _took_local_path.append(True)
        rows = [(r[0], r[1]) for r in proj.collect()]
        proj.unpersist()
        out = _local_components(rows, edges.sparkSession, edges.schema[src].dataType)
        return out.withColumnRenamed("label", "component")
    sym = (
        proj.unionByName(
            proj.select(F.col("nbr").alias("node"), F.col("node").alias("nbr"))
        )
        .distinct()
        .cache()
    )
    labels = sym.select("node").distinct().withColumn("label", F.col("node"))
    prev_sum = None
    converged = False
    for _ in range(max_iter):
        # (a) propagate: every node takes the min label in its closed
        # neighborhood — advances a component's min by one hop per round
        nbr_labels = (
            sym.join(labels.withColumnRenamed("node", "nbr"), "nbr")
            .select("node", "label")
        )
        labels = (
            labels.unionByName(nbr_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # (b) pointer-doubling shortcut: replace each node's label by its
        # LABEL's label. Labels are always node ids (min over reachable
        # ids), so the self-join resolves one more dereference — combined
        # with (a) the reachable-min horizon doubles per round, bounding
        # convergence at O(log diameter) rounds instead of O(diameter)
        # (a path/chain graph from pathological substring dupes would
        # otherwise crawl one hop per round). One extra equi-join per
        # round on the (node-count-sized, 2-column) label relation.
        lab2 = labels.select(
            F.col("node").alias("__lnode"), F.col("label").alias("__llabel")
        )
        labels = (
            labels.join(lab2, labels["label"] == lab2["__lnode"], "left")
            .select("node", F.coalesce("__llabel", "label").alias("label"))
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    sym.unpersist()
    proj.unpersist()
    if not converged:
        # an unconverged label relation is a WRONG answer (components
        # would split); with shortcutting, rounds are O(log diameter),
        # so max_iter=25 covers any graph a dedup pipeline can produce
        # (diameter < 2^24) — hitting this means something is broken
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    return labels.withColumnRenamed("label", "component")


def duplicate_groups_from_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Every document mapped to its duplicate-group id (transitive
    closure of the pair graph); singletons map to themselves.

    Output: (id, component, is_keeper) — keep ``is_keeper`` rows to
    deduplicate the corpus.
    """
    took_local: list = []
    comp = connected_components(pairs, src=a_col, dst=b_col, _took_local_path=took_local)
    comp = comp.withColumnRenamed("node", id_col)
    if took_local:
        # local path => comp is bounded by the edge threshold: broadcast so
        # the corpus side never shuffles. Distributed path => comp can be
        # arbitrarily large; leave the strategy to Catalyst/AQE.
        comp = F.broadcast(comp)
    return (
        docs.select(F.col(id_col))
        .join(comp, id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("component"),
        )
        .withColumn("is_keeper", F.col(id_col) == F.col("component"))
    )


def pagerank_fixed(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    scale: int = 1_000_000,
    weight_col: str | None = None,
    broadcast_nodes_max: int = 10_000_000,
) -> DataFrame:
    """Fixed-iteration PageRank in exact integer micro-units.

    Every quantity is a BIGINT count of ``1/scale`` units and every
    division is ``div`` floor division, so the result is bit-identical
    in any engine (the docs/DETERMINISM.md discipline — double
    summation order would drift across engines/partitionings).
    Damping is 17/20 (0.85): the per-edge contribution is
    ``pr_src * 17 div (20 * outdeg)`` and the teleport term is
    ``(scale * 15 div 100) div n`` per node. Dangling-node mass is
    dropped (the standard simple-implementation choice), so totals
    shrink slightly per round — identically in both engines.

    Scale shape: the out-degree (or weight-sum) is folded into the edge
    relation ONCE before the loop, so each iteration is exactly ONE
    equi-join of the rank relation onto the edges (keyed on src) and ONE
    groupBy(dst) sum — both partial-agg eligible; the rank relation is
    |nodes| rows, orders smaller than the edges. When |nodes| is small
    enough to broadcast (``<= broadcast_nodes_max``, default 10M ids ≈
    160 MB), the per-round joins are hinted BROADCAST on the rank side —
    the edge relation is then NEVER re-shuffled across rounds (the only
    exchange per round is the partial-agg groupBy(dst), whose input is
    already combiner-reduced map-side). Above the threshold the joins
    fall back to shuffle joins — the correct posture for billion-node
    graphs where the rank relation itself is cluster-scale. The
    iteration count is fixed (not data-dependent), so the driver loop is
    O(1) in data volume; EAGER ``localCheckpoint`` per round truncates
    lineage as it goes — the final action computes only the last round,
    not a re-derivation of the whole chain.

    Weighted mode requires positive weights: edges whose summed weight
    is <= 0 are dropped before the degree computation (a zero weight-sum
    would floor-divide by zero — NULL in Spark, an error in strict
    engines — silently diverging from the exact-oracle contract).

    Returns (node, pr_micro) for every node.
    """
    from pyspark.sql.window import Window

    # Single-shuffle edge build: ONE repartition on src, then the
    # per-pair dedup/weight-sum AND the per-src divisor both reuse that
    # partitioning (groupBy(src,dst) and Window.partitionBy(src) are
    # satisfied by hash(src) clustering — no further exchange). The
    # window buffers one src-group at a time and spills if a hub source
    # has a pathological out-degree, so power-law graphs degrade to disk
    # rather than fail; the src-hash layout also gives the per-round
    # broadcast joins an already-fanned-out edge relation.
    src_part = edges.repartition(F.col(src_col))
    if weight_col is None:
        # weighted mode below: integer edge weights, contribution
        # pr * 17 * w div (20 * wsum_src) — still pure integer floor
        # arithmetic, so the exact-oracle property holds.
        proj = src_part.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        ).dropDuplicates(["src", "dst"])
        deg_col = F.count(F.lit(1))
        contrib_expr = "pr * 17 div (20 * outdeg)"
    else:
        proj = (
            src_part.groupBy(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
            .agg(F.sum(F.col(weight_col)).cast("long").alias("w"))
            .where(F.col("w") > 0)
        )
        deg_col = F.sum("w")
        contrib_expr = "pr * 17 * w div (20 * outdeg)"
    e = proj.withColumn(
        "outdeg", deg_col.over(Window.partitionBy("src"))
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        # empty graph: an empty result, not a ZeroDivisionError
        return nodes.select(
            F.col("node"), F.lit(0).cast("long").alias("pr_micro")
        )
    teleport = (scale * 15 // 100) // n
    # rank relation small → broadcast it into both per-round joins: the
    # big edge relation is never re-shuffled, round after round
    hint = F.broadcast if n <= broadcast_nodes_max else (lambda df: df)
    pr = nodes.withColumn("pr", F.lit(scale // n).cast("long"))
    for _ in range(iters):
        contrib = (
            e.join(hint(pr), e["src"] == pr["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr(contrib_expr).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        pr = (
            nodes.join(hint(contrib), "node", "left")
            .select(
                "node",
                (F.lit(teleport) + F.coalesce(F.col("inflow"), F.lit(0))).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr.select("node", F.col("pr").alias("pr_micro"))


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact distributed triangle counting with DEGREE-ORDERED wedge
    generation (the MapReduce classic — Suri & Vassilvitskii 2011,
    "Counting Triangles and the Curse of the Last Reducer").

    Input: undirected edges, either orientation, duplicates tolerated
    (canonicalized + distinct'd here). Output: (node, n_tri) for every
    node that participates in >= 1 triangle.

    Why orientation matters at 100 TB: naive wedge generation pivots on
    every vertex and emits sum(deg^2) wedges — a single celebrity
    vertex ("the last reducer") emits deg^2 of them. Orienting every
    edge from its lower-(degree, id) endpoint caps every pivot's
    out-degree at O(sqrt(m)), bounding total wedges by O(m^1.5)
    regardless of skew, and each triangle is generated EXACTLY once
    (from its lowest-ordered vertex), so no post-hoc dedup or /3. The
    plan: one distinct (shuffle on the canonical edge), one degree
    aggregate, the oriented self-join on the pivot, and one closing
    semi-equi-join — every join key a vertex id.
    """
    u = F.least(F.col(src), F.col(dst))
    v = F.greatest(F.col(src), F.col(dst))
    e = (
        edges.where(F.col(src) != F.col(dst))
        .select(u.alias("u"), v.alias("v"))
        .distinct()
        # the edge list is referenced by the degree union (twice), the
        # orientation join, and the closing semi-join — pin it so an
        # expensive upstream edge construction (e.g. the cosine block
        # join feeding x_graph_triangles) executes ONCE, not 4x
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient from lower (deg, id) to higher; carry the head's order key
    # so wedge pairs can be ordered the same way without a re-join
    ed = (
        e.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
    )
    fwd = F.struct(F.col("du").alias("d"), F.col("u").alias("n")) < F.struct(
        F.col("dv").alias("d"), F.col("v").alias("n")
    )
    oriented = ed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("bd"),
    )
    o1 = oriented.select("a", F.col("b").alias("b1"), F.col("bd").alias("bd1"))
    o2 = oriented.select("a", F.col("b").alias("b2"), F.col("bd").alias("bd2"))
    lo_first = F.struct(F.col("bd1").alias("d"), F.col("b1").alias("n")) < F.struct(
        F.col("bd2").alias("d"), F.col("b2").alias("n")
    )
    wedges = (
        o1.join(o2, "a")
        .where(F.col("b1") != F.col("b2"))
        # emit each unordered out-neighbor pair once, ordered by the
        # SAME (deg, id) key the orientation uses — the closing edge,
        # if present, is oriented lo -> hi by construction
        .where(lo_first)
        .select("a", F.col("b1").alias("lo"), F.col("b2").alias("hi"))
    )
    tri = wedges.join(
        oriented.select(F.col("a").alias("lo"), F.col("b").alias("hi")),
        ["lo", "hi"],
        "left_semi",
    )
    return (
        tri.select(
            F.explode(F.array("a", "lo", "hi")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 12,
) -> DataFrame:
    """The k-CORE of an undirected graph: the maximal subgraph where
    every surviving node keeps degree >= k — computed by the standard
    iterative peel (drop sub-k nodes, recompute degrees, repeat to
    fixpoint). Classic degeneracy primitive (Seidman 1983); over the
    near-dup graph a node's core membership flags DENSELY duplicated
    regions (every member near-dups >= k OTHER core members — a much
    stronger clump signal than pairwise degree).

    Distributed shape: the edge relation is canonicalized + pinned
    once; each round is one degree partial-agg + two semi-joins
    (surviving endpoints), with an EAGER localCheckpoint per round so
    the final action never re-derives the whole chain (the
    pagerank_fixed discipline). The peel is MONOTONE — the survivor
    set only shrinks and a stable round is a fixpoint — so iteration
    stops at the first no-drop round; ``max_rounds`` bounds the number
    of DROPPING rounds (the no-drop detection round is allowed on top,
    so ``max_rounds`` here and ``rounds`` in an unrolled oracle fail at
    the SAME peel depth) and a non-converged graph RAISES rather than
    returning a non-core (same contract as connected_components'
    pointer doubling; real graphs peel in a handful of rounds — each
    round removes every currently-sub-k node at once). Edge counts are
    carried forward round-to-round: ONE count action per round, not a
    recount of the already-counted previous relation.

    Returns (node, degree) for the surviving core, degrees within it.
    """
    e = _canonical_edges(edges, src, dst)
    _core, _n, deg = _peel_to_core(e, k, max_rounds, n_edges=e.count())
    return deg


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge canonicalization (u < v, loops dropped, distinct),
    eagerly pinned — every peel consumer re-reads checkpoint blocks, not
    the upstream pair-generation plan."""
    u = F.least(F.col(src), F.col(dst))
    v = F.greatest(F.col(src), F.col(dst))
    return (
        edges.where(F.col(src) != F.col(dst))
        .select(u.alias("u"), v.alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )


def _degrees(e: DataFrame) -> DataFrame:
    return (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def _peel_to_core(
    e: DataFrame, k: int, max_rounds: int, n_edges: int
) -> tuple[DataFrame, int, DataFrame]:
    """Peel an already-canonicalized, pinned edge relation to its k-core
    fixpoint. ``n_edges`` is the caller's already-known count of ``e``
    (so an empty input costs zero actions). Returns the converged
    (edge_frame, edge_count, degree_frame) — the degree frame is the
    fixpoint's own degrees, handed back lazily so callers reuse the
    plan without recomputing it eagerly (kcore returns it; coreness
    derives the level's node set from it). Raises past ``max_rounds``
    dropping rounds.

    Round shape (round 9 — measured, not guessed): ONE job per round —
    build the peeled relation (degree aggregate feeding two keep
    semi-joins; the duplicated degree subplan deduplicates via
    ReuseExchange), checkpoint it, count it. Convergence is the edge
    count being UNCHANGED across a round — sound because every sub-k
    node carries >= 1 edge, so a peel that drops anything strictly
    shrinks the edge set. Interleaved same-session min-of-3 at sf0.1
    ranked the three candidate shapes on x_graph_coreness: this one
    8.75s (the r7 shape), a separate persisted degree-frame
    materialization per round 11.9s (r8/early r9 — the extra job per
    round costs more than the shared aggregate saves at near-converged
    sizes), 3x-unrolled peels per checkpoint 20.7s (the chained
    shuffle stages AQE must re-plan dwarf the saved driver
    round-trips). The price of this shape is one identical-frame
    checkpoint rewrite per LEVEL at the fixpoint — edge-scale but
    already-shrunken, and strictly cheaper than any per-round extra
    job once a peel runs more than ~2 rounds, which every measured
    level does."""
    n_after = n_edges
    if n_after == 0:
        return e, 0, _degrees(e)
    # max_rounds dropping rounds + 1 no-drop detection round: an
    # unrolled oracle with `rounds = max_rounds` no-op peels past its
    # fixpoint, so engine and oracle diverge only at peel depths where
    # BOTH fail loudly (the engine raises; the oracle's e_rounds would
    # be unconverged but the engine never silently returns one)
    for _ in range(max_rounds + 1):
        deg = _degrees(e)
        keep = deg.filter(F.col("degree") >= k).select("node")
        e2 = (
            e.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
        n2 = e2.count()
        if n2 == n_after:
            # nothing dropped: e was already the k-core (e2 is the same
            # relation, checkpointed — hand IT back so downstream reads
            # the freshest pin)
            return e2, n_after, _degrees(e2)
        e, n_after = e2, n2
        if n_after == 0:
            return e, 0, _degrees(e)
    raise RuntimeError(
        f"k-core peel did not converge in {max_rounds} dropping rounds — "
        "raise max_rounds (each round drops every currently-sub-k node, "
        "so this means an adversarial onion of deeper layering)"
    )


def coreness(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_k: int = 64,
    max_rounds: int = 12,
) -> DataFrame:
    """CORE NUMBER per node: the largest k for which the node survives
    in the k-core (Seidman 1983 degeneracy decomposition) — the standard
    per-node density artifact (kcore(k) answers one threshold; coreness
    ranks every node). Over the near-dup graph, coreness is the
    graded clump-depth signal a curation pipeline thresholds AFTER
    seeing the distribution, without re-running the peel per k.

    Shape: cores are NESTED (the k-core of the (k-1)-core IS the graph's
    k-core), so one pass peels k = 2, 3, ... each STARTING FROM the
    previous core's already-pinned edge relation — total work is the sum
    of per-level peels over monotonically shrinking relations, not
    max_k independent full peels. Nodes present in the (k-1)-core but
    not the k-core get coreness k-1 (an anti-join on the two pinned node
    sets); the loop ends when a core empties. ``max_k`` bounds the
    driver loop at the graph's degeneracy + 1 levels and RAISES beyond
    (the kcore non-convergence contract); per-level peel rounds are
    bounded by ``max_rounds`` the same way kcore's are.

    Returns (node, coreness) for every non-isolated node (coreness >= 1).
    """
    e = _canonical_edges(edges, src, dst)
    n = e.count()
    spark = e.sparkSession
    if n == 0:
        return spark.createDataFrame([], "node long, coreness int")
    out: list[DataFrame] = []
    # every endpoint of a non-empty canonical edge set has degree >= 1:
    # the 1-core is the whole (loop-free) graph
    prev_nodes = _degrees(e).select("node").localCheckpoint(eager=True)
    for k in range(2, max_k + 2):
        e, n, deg = _peel_to_core(e, k, max_rounds, n_edges=n)
        nodes_k = deg.select("node").localCheckpoint(eager=True)
        out.append(
            prev_nodes.join(nodes_k, "node", "left_anti").select(
                "node", F.lit(k - 1).alias("coreness")
            )
        )
        prev_nodes = nodes_k
        if n == 0:
            break
    else:
        raise RuntimeError(
            f"coreness exceeded max_k={max_k} levels — the graph's "
            "degeneracy is higher than the bound; raise max_k"
        )
    from functools import reduce

    return reduce(DataFrame.unionAll, out)
