"""Iterative graph operators over edge DataFrames.

Complements the min-label-propagation connected components in
``ext/dedup.py`` with PageRank — the canonical iterative-aggregate
workload a 100 TB pipeline runs over co-occurrence / link graphs
(document citation graphs, part-affinity graphs, user-interaction
graphs).

All rank arithmetic is **exact int64 micro-units** (rank × 1e6),
never floating point: each iteration's per-node sum of contributions
is an integer sum, which is order- and partitioning-independent — the
same result on 1 partition or 10,000, and bit-identical to a DuckDB
oracle evaluating the identical integer recurrence. Float PageRank
would drift between engines via summation order.

Scale shape per iteration: one equi-join of the (node, rank) table
onto the edge table (edges pre-cached with out-degree attached, so the
per-edge contribution ``rank div outdeg`` needs no second join), one
partial-aggregated groupBy on dst. Edges are the big side and never
move: at production scale, pre-partition edges by ``src`` and the
rank table (key-grain, small) re-shuffles to meet them; with AQE the
rank side broadcasts outright once it fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_UNIT = 1_000_000  # 1.0 of rank mass, in micro-units
DAMP_PCT = 85  # damping factor 0.85 as an integer percentage


def pagerank_int(
    edges: DataFrame,
    iters: int = 6,
    damp_pct: int = DAMP_PCT,
    symmetric: bool = False,
) -> DataFrame:
    """Integer-exact PageRank over a directed edge list (``src``,
    ``dst``), uniform initial rank of ``RANK_UNIT`` per node.

    Recurrence (all int64, truncating division)::

        contrib(e)   = rank[src] div outdeg[src]
        rank'[n]     = (100 - damp_pct) * RANK_UNIT div 100
                       + damp_pct * sum(contrib over in-edges) div 100

    Nodes are the distinct ``src`` values (a symmetric co-occurrence
    graph gives every node an out-edge, so no dangling-mass term).
    Returns (node, rank_micro) after ``iters`` rounds.
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # every iteration scans ed; without the persist each of the
    # ``iters`` references re-derives the degree join from the raw
    # edge list — O(iters) redundant passes over the big table
    ed = edges.join(deg, "src")
    if symmetric:
        # pre-partition the cached edges by dst ONCE: the per-round
        # broadcast join preserves the stream side's partitioning, so
        # every round's groupBy(dst) satisfies its distribution with
        # ZERO exchange — the 6 per-round shuffles collapse into this
        # single up-front one
        ed = ed.repartition("dst")
    ed = ed.persist()
    # zero-contribution seed rows: one per node, riding the SAME
    # groupBy shuffle as the edge contributions, so every node appears
    # in the aggregate output and no second join (a broadcast barrier
    # per iteration — half the iteration's stage overhead) is needed
    # to re-attach nodes with no in-edges. A SYMMETRIC graph needs no
    # seeds at all — every node with an out-edge has an in-edge — and
    # skipping the union keeps the round exchange-free (a Union node
    # erases the children's reported partitioning).
    zeros = deg.select(
        F.col("src").alias("dst"), F.lit(0).cast("long").alias("c")
    )
    if not symmetric:
        zeros = zeros.persist()
    base = (100 - damp_pct) * RANK_UNIT // 100
    ranks = deg.select(
        F.col("src").alias("node"),
        F.lit(RANK_UNIT).cast("long").alias("rank_micro"),
    )
    for _ in range(iters):
        # the rank table is node-grain — broadcast it so the edge table
        # (the big side, cached) never re-shuffles; without the hint the
        # nested iteration lineage defeats AQE's size estimation and
        # every round pays a full sort-merge shuffle of the edges
        contrib = ed.join(F.broadcast(ranks), ed.src == ranks.node).select(
            F.col("dst"),
            F.expr("rank_micro div outdeg").alias("c"),
        )
        if not symmetric:
            contrib = contrib.unionByName(zeros)
        contrib = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = contrib.select(
            F.col("dst").alias("node"),
            (
                F.lit(base) + F.expr(f"s * {damp_pct} div 100")
            ).cast("long").alias("rank_micro"),
        )
        # truncate lineage each round (same discipline as the CC loop):
        # without this, round k's plan nests all k-1 prior broadcast
        # subtrees and Catalyst re-optimizes a plan that doubles per
        # iteration — at bench scale plan compilation dominated the
        # actual 7k-edge compute. Values are untouched (exact integer
        # recurrence), so the unrolled SQL oracle still matches.
        ranks = ranks.localCheckpoint(eager=False)
    return ranks


def cooccurrence_edges(
    df: DataFrame, group_col: str, item_col: str, min_groups: int = 1
) -> DataFrame:
    """Symmetric co-occurrence edge list: (src, dst) whenever two
    distinct items share at least ``min_groups`` groups, deduplicated
    across groups. ``min_groups > 1`` drops the long tail of
    single-co-occurrence noise pairs — in a random-basket corpus most
    pairs appear exactly once, so a threshold of 2 shrinks the edge
    table (and every PageRank iteration over it) by an order of
    magnitude at identical build cost: the dedup shuffle becomes a
    count-aggregate shuffle on the same key.

    Shape: ONE partial-aggregated ``collect_set`` shuffle on the group
    key packs each group's distinct items into an array, then the
    ordered pairs expand IN PLACE with higher-order array functions (a
    generate, no join, no second shuffle) before the final edge
    distinct. Fan-out is bounded by group size squared (a dozen parts
    per order at any corpus scale), never all-pairs; a self-equi-join
    formulation pays an extra full shuffle of both sides for the same
    candidate set.
    """
    arrs = df.groupBy(F.col(group_col).alias("g")).agg(
        F.collect_set(F.col(item_col)).alias("items")
    )
    pairs = F.expr(
        "flatten(transform(items, x ->"
        " transform(filter(items, y -> y != x), y -> struct(x AS src, y AS dst))))"
    )
    exploded = arrs.select(F.explode(pairs).alias("e")).select("e.src", "e.dst")
    if min_groups <= 1:
        return exploded.distinct()
    return (
        exploded.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .filter(F.col("n_groups") >= min_groups)
        .select("src", "dst")
    )


def pagerank_oracle_sql(
    edges_cte: str, iters: int = 6, damp_pct: int = DAMP_PCT
) -> str:
    """Unrolled ANSI-SQL mirror of :func:`pagerank_int` for the DuckDB
    oracle — one CTE per iteration (recursive CTEs cannot aggregate
    over the recursive term), identical integer recurrence."""
    base = (100 - damp_pct) * RANK_UNIT // 100
    parts = [
        f"WITH edges AS ({edges_cte}),",
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg"
        " FROM edges GROUP BY src),",
        "ed AS (SELECT e.src, e.dst, d.outdeg FROM edges e"
        " JOIN deg d ON e.src = d.src),",
        "nodes AS (SELECT src AS node FROM deg),",
        f"r0 AS (SELECT node, CAST({RANK_UNIT} AS BIGINT) AS rank_micro"
        " FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f", r{i + 1} AS (SELECT n.node, CAST({base} + "
            f"COALESCE(c.s, 0) * {damp_pct} // 100 AS BIGINT) AS rank_micro "
            f"FROM nodes n LEFT JOIN (SELECT ed.dst, "
            f"SUM(r.rank_micro // ed.outdeg) AS s FROM ed "
            f"JOIN r{i} r ON ed.src = r.node GROUP BY ed.dst) c "
            f"ON n.node = c.dst)"
        )
    parts.append(f"SELECT node, rank_micro FROM r{iters}")
    return "\n".join(parts)


def triangle_stats(edges: DataFrame, min_degree: int = 2) -> DataFrame:
    """Per-node triangle count and local clustering coefficient over a
    symmetric edge list — the cohesion audit of a co-occurrence graph.

    Degree-ordered (compact-forward) enumeration: orient each
    undirected edge from its lower-(degree, id) endpoint to the higher
    one, pair the out-edges of each node (the wedge), and probe the
    closing edge with one more equi-join. Every triangle has exactly
    one corner that is minimal in the (degree, id) order, so each
    triangle still materializes exactly once — the output is identical
    to the id-canonical (a<b<c) form, property-tested in
    tests/test_graph_merge.py. The win is the fan-out bound: oriented
    out-degree is O(sqrt(m)) for EVERY node (a node of degree d only
    keeps out-edges to neighbors of degree >= d, and there are at most
    2m/d of those), so the wedge join is Σ outdeg² ≤ m^1.5 even on
    power-law degree skew, where the id-ordered form blows up on hub
    nodes. Run this on a noise-thresholded graph
    (``cooccurrence_edges(min_groups=...)``), never a raw pair
    explosion. Clustering coefficient ``2T / (d (d-1))`` quantizes to 4
    decimals through the shared IEEE floor-round so engines agree
    bitwise.
    """
    sym = edges.select("src", "dst").distinct()
    deg = (
        sym.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select(F.col("src").alias("node"), "deg")
    )
    # oriented edges carry the head's (deg, id) key so wedge ordering
    # needs no extra degree join; struct comparison is lexicographic
    oe = (
        sym.join(deg.select(F.col("node").alias("src"), F.col("deg").alias("sdeg")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("deg").alias("ddeg")), "dst")
        .filter(
            F.struct(F.col("sdeg"), F.col("src")) < F.struct(F.col("ddeg"), F.col("dst"))
        )
        .select("src", "dst", "ddeg")
        # three self-references below — without a persist Spark rebuilds
        # the degree joins once per alias (measured 4x at sf0.1)
        .persist()
    )
    e1, e2, e3 = oe.alias("e1"), oe.alias("e2"), oe.alias("e3")
    tri = (
        e1.join(
            e2,
            (F.col("e1.src") == F.col("e2.src"))
            & (
                F.struct(F.col("e1.ddeg"), F.col("e1.dst"))
                < F.struct(F.col("e2.ddeg"), F.col("e2.dst"))
            ),
        )
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.dst")) & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
    )
    tcount = corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))
    out = deg.join(tcount, "node", "left").filter(F.col("deg") >= min_degree)
    cc = (
        F.coalesce(F.col("n_tri"), F.lit(0)).cast("double")
        * 2.0
        / (F.col("deg").cast("double") * (F.col("deg") - 1).cast("double"))
    )
    return out.select(
        "node",
        "deg",
        F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
        (F.floor(cc * 10000 + F.lit(0.5)) / 10000.0).alias("cc4"),
    )


def label_propagation(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over a
    symmetric edge list — the linear-time community detector: labels
    init to node ids; each round every node adopts the most frequent
    label among its neighbors (ties → smallest label). SYNCHRONOUS
    update is deliberate: the async variant's result depends on visit
    order and cannot be reproduced across engines or partitionings,
    the sync one is a pure function of the graph (and hash-matches the
    unrolled SQL oracle). Returns the final community profile
    (community label, member count, lowest member id).

    Scale shape — the PageRank zero-exchange discipline: edges persist
    pre-partitioned by ``dst`` ONCE; each round broadcasts the
    node-grain label table, counts (dst, lbl) — HashPartitioning(dst)
    satisfies the (dst, lbl) clustering, so the aggregate inserts NO
    exchange — and takes the per-node argmax as ``min(struct(-n,
    lbl))`` on the same partitioning (zero exchange again). Labels
    localCheckpoint between rounds (the lineage-doubling fix)."""
    ed = edges.repartition("dst").persist()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
    )
    for _ in range(rounds):
        nb = ed.join(F.broadcast(labels), ed.src == labels.node).select(
            "dst", "lbl"
        )
        cnt = nb.groupBy("dst", "lbl").agg(F.count(F.lit(1)).alias("n"))
        labels = (
            cnt.select(
                "dst",
                F.struct(
                    (-F.col("n")).alias("neg"), F.col("lbl").alias("lbl")
                ).alias("s"),
            )
            .groupBy("dst")
            .agg(F.min("s").alias("m"))
            .select(F.col("dst").alias("node"), F.col("m.lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
    return (
        labels.groupBy("lbl")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("node").alias("rep_id"),
        )
        .select(F.col("lbl").alias("community"), "n_members", "rep_id")
        .orderBy("community")
    )


def label_propagation_oracle_sql(edges_cte: str, rounds: int = 3) -> str:
    """Unrolled ANSI-SQL mirror of :func:`label_propagation` (one CTE
    pair per round — aggregate then ranked argmax), the
    pagerank_oracle_sql pattern."""
    parts = [
        f"WITH edges AS ({edges_cte}),",
        "nodes AS (SELECT DISTINCT src AS node FROM edges),",
        "l0 AS (SELECT node, node AS lbl FROM nodes),",
    ]
    for r in range(rounds):
        parts.append(
            f"c{r} AS (SELECT e.dst, l.lbl, CAST(count(*) AS BIGINT) AS n"
            f" FROM edges e JOIN l{r} l ON l.node = e.src GROUP BY e.dst, l.lbl),"
        )
        parts.append(
            f"l{r + 1} AS (SELECT dst AS node, lbl FROM ("
            f"SELECT dst, lbl, row_number() OVER (PARTITION BY dst"
            f" ORDER BY n DESC, lbl ASC) AS rn FROM c{r}) WHERE rn = 1),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_members,"
        f" CAST(min(node) AS BIGINT) AS rep_id FROM l{rounds}"
        f" GROUP BY lbl ORDER BY community"
    )
    return "\n".join(parts)


def kcore_peel(edges: DataFrame, k: int = 4, rounds: int = 3) -> DataFrame:
    """Synchronous k-core peeling (Seidman 1983; the degeneracy-order
    workhorse behind graph cleaning and dense-subgraph seeding): each
    round drops every node whose degree among STILL-ACTIVE nodes is
    < k, together with its incident edges, and reports the per-round
    profile (round, n_nodes active at entry, n_edges active at entry,
    n_removed this round). Synchronous rounds are a pure function of
    the graph — reproducible across engines and partitionings, like
    label_propagation's sync update.

    Scale shape — the LPA discipline: edges persist pre-partitioned by
    ``dst`` ONCE; each round intersects them with the (node-grain,
    broadcast) active set via two broadcast semi-shaped joins that
    PRESERVE the dst partitioning, so the degree aggregate inserts no
    exchange; the three per-round counts combine as 1-row broadcast
    attaches (the q14 scalar shape). Active sets localCheckpoint
    between rounds (lineage-doubling fix). Zero-degree actives are
    removed correctly: they simply vanish from the degree table, and
    removal is counted as |active| - |kept|."""
    ed = edges.repartition("dst").persist()
    active = (
        ed.select(F.col("src").alias("node"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outs = []
    for r in range(rounds):
        ae = (
            ed.join(
                F.broadcast(active.select(F.col("node").alias("_s"))),
                F.col("src") == F.col("_s"),
            )
            .drop("_s")
            .join(
                F.broadcast(active.select(F.col("node").alias("_d"))),
                F.col("dst") == F.col("_d"),
            )
            .drop("_d")
        )
        deg = ae.groupBy("dst").agg(F.count(F.lit(1)).alias("n"))
        nxt = (
            deg.filter(F.col("n") >= k)
            .select(F.col("dst").alias("node"))
            .localCheckpoint(eager=False)
        )
        row = (
            active.agg(F.count(F.lit(1)).alias("n_nodes"))
            .join(F.broadcast(ae.agg(F.count(F.lit(1)).alias("n_edges"))))
            .join(F.broadcast(nxt.agg(F.count(F.lit(1)).alias("_kept"))))
            .select(
                F.lit(r).cast("int").alias("round"),
                "n_nodes",
                "n_edges",
                (F.col("n_nodes") - F.col("_kept")).alias("n_removed"),
            )
        )
        outs.append(row)
        active = nxt
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("round")


def kcore_oracle_sql(edges_cte: str, k: int = 4, rounds: int = 3) -> str:
    """Unrolled ANSI-SQL mirror of :func:`kcore_peel` — one
    (edge-filter, degree, survivor) CTE triple per round, per-round
    stat rows UNION ALL'd (the label_propagation_oracle_sql pattern)."""
    parts = [
        f"WITH edges AS ({edges_cte}),",
        "a0 AS (SELECT DISTINCT src AS node FROM edges),",
    ]
    for r in range(rounds):
        parts.append(
            f"e{r} AS (SELECT e.src, e.dst FROM edges e"
            f" JOIN a{r} x ON x.node = e.src"
            f" JOIN a{r} y ON y.node = e.dst),"
        )
        parts.append(
            f"d{r} AS (SELECT dst AS node, count(*) AS n FROM e{r}"
            f" GROUP BY dst),"
        )
        parts.append(
            f"a{r + 1} AS (SELECT node FROM d{r} WHERE n >= {k}),"
        )
    parts[-1] = parts[-1].rstrip(",")
    selects = [
        f"SELECT CAST({r} AS INTEGER) AS round,"
        f" (SELECT CAST(count(*) AS BIGINT) FROM a{r}) AS n_nodes,"
        f" (SELECT CAST(count(*) AS BIGINT) FROM e{r}) AS n_edges,"
        f" (SELECT CAST(count(*) AS BIGINT) FROM a{r})"
        f" - (SELECT CAST(count(*) AS BIGINT) FROM a{r + 1}) AS n_removed"
        for r in range(rounds)
    ]
    parts.append(" UNION ALL ".join(selects) + " ORDER BY round")
    return "\n".join(parts)


def bfs_hops(
    edges: DataFrame, seed_mod: int = 37, seed_rem: int = 1, rounds: int = 4
) -> DataFrame:
    """Synchronous multi-source BFS frontier expansion: seeds are the
    graph nodes with ``node % seed_mod == seed_rem``; each round the
    frontier advances one hop and newly-reached nodes join the visited
    set. Reports the per-hop reachability profile (round, newly reached
    count, id-sum of the new frontier, cumulative visited) — the
    connectivity/expansion audit behind contamination-spread and
    blast-radius questions.

    Scale shape — the kcore_peel discipline: edges persist
    pre-partitioned by ``dst`` ONCE; each round's hop is a BROADCAST
    join of the (node-grain) frontier on ``src`` that preserves the dst
    partitioning, so the dst-grain dedup aggregate inserts no exchange;
    the visited exclusion is a broadcast anti-join on the same
    partitioning, and frontiers localCheckpoint between rounds (the
    lineage-doubling fix). Per-round stats combine as 1-row broadcast
    attaches."""
    ed = edges.repartition("dst").persist()
    seeds = (
        ed.select(F.col("src").alias("node"))
        .distinct()
        .where(F.col("node") % seed_mod == seed_rem)
        .localCheckpoint(eager=False)
    )
    frontier = seeds
    visited = seeds
    outs = []
    for r in range(rounds):
        row = frontier.agg(
            F.count(F.lit(1)).alias("n_new"),
            F.coalesce(F.sum("node"), F.lit(0)).alias("sum_new"),
        ).join(
            F.broadcast(visited.agg(F.count(F.lit(1)).alias("n_visited")))
        ).select(
            F.lit(r).cast("int").alias("hop"),
            "n_new",
            "sum_new",
            "n_visited",
        )
        outs.append(row)
        if r == rounds - 1:
            break
        nxt = (
            ed.join(
                F.broadcast(frontier.select(F.col("node").alias("_f"))),
                F.col("src") == F.col("_f"),
            )
            .groupBy("dst")
            .agg(F.count(F.lit(1)).alias("_n"))
            .select(F.col("dst").alias("node"))
            .join(
                F.broadcast(visited.select(F.col("node").alias("_v"))),
                F.col("node") == F.col("_v"),
                "left_anti",
            )
            .localCheckpoint(eager=False)
        )
        visited = visited.unionAll(nxt).localCheckpoint(eager=False)
        frontier = nxt
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("hop")


def bfs_oracle_sql(
    edges_cte: str, seed_mod: int = 37, seed_rem: int = 1, rounds: int = 4
) -> str:
    """Unrolled ANSI-SQL mirror of :func:`bfs_hops` — one (frontier,
    visited) CTE pair per hop, per-hop stat rows UNION ALL'd (the
    kcore_oracle_sql pattern)."""
    parts = [
        f"WITH edges AS ({edges_cte}),",
        f"f0 AS (SELECT DISTINCT src AS node FROM edges"
        f" WHERE src % {seed_mod} = {seed_rem}),",
        "v0 AS (SELECT node FROM f0),",
    ]
    for r in range(1, rounds):
        parts.append(
            f"f{r} AS (SELECT DISTINCT e.dst AS node FROM edges e"
            f" JOIN f{r - 1} f ON f.node = e.src"
            f" WHERE e.dst NOT IN (SELECT node FROM v{r - 1})),"
        )
        parts.append(
            f"v{r} AS (SELECT node FROM v{r - 1}"
            f" UNION ALL SELECT node FROM f{r}),"
        )
    parts[-1] = parts[-1].rstrip(",")
    selects = [
        f"SELECT CAST({r} AS INTEGER) AS hop,"
        f" (SELECT CAST(count(*) AS BIGINT) FROM f{r}) AS n_new,"
        f" (SELECT CAST(COALESCE(sum(node), 0) AS BIGINT) FROM f{r})"
        f" AS sum_new,"
        f" (SELECT CAST(count(*) AS BIGINT) FROM v{r}) AS n_visited"
        for r in range(rounds)
    ]
    parts.append(" UNION ALL ".join(selects) + " ORDER BY hop")
    return "\n".join(parts)


def lpa_labels(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Per-node community labels after ``rounds`` synchronous LPA
    updates — the label table :func:`label_propagation` profiles,
    exposed for downstream composition (modularity scoring). Identical
    update rule and scale shape (dst-partitioned persisted edges,
    broadcast label table, zero-per-round-exchange aggregate +
    min(struct) argmax, localCheckpoint between rounds)."""
    ed = edges.repartition("dst").persist()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
    )
    for _ in range(rounds):
        nb = ed.join(F.broadcast(labels), ed.src == labels.node).select(
            "dst", "lbl"
        )
        cnt = nb.groupBy("dst", "lbl").agg(F.count(F.lit(1)).alias("n"))
        labels = (
            cnt.select(
                "dst",
                F.struct(
                    (-F.col("n")).alias("neg"), F.col("lbl").alias("lbl")
                ).alias("s"),
            )
            .groupBy("dst")
            .agg(F.min("s").alias("m"))
            .select(F.col("dst").alias("node"), F.col("m.lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
    return labels


def lpa_labels_oracle_cte(edges_cte: str, rounds: int = 3) -> str:
    """The CTE prefix of :func:`label_propagation_oracle_sql` ending at
    the per-node label table ``l{rounds}`` — for oracles that compose
    on the labels (modularity). Returns the text up to and including
    the last CTE (caller appends its own final SELECT after a comma)."""
    parts = [
        f"WITH edges AS ({edges_cte}),",
        "nodes AS (SELECT DISTINCT src AS node FROM edges),",
        "l0 AS (SELECT node, node AS lbl FROM nodes),",
    ]
    for r in range(rounds):
        parts.append(
            f"c{r} AS (SELECT e.dst, l.lbl, CAST(count(*) AS BIGINT) AS n"
            f" FROM edges e JOIN l{r} l ON l.node = e.src GROUP BY e.dst, l.lbl),"
        )
        parts.append(
            f"l{r + 1} AS (SELECT dst AS node, lbl FROM ("
            f"SELECT dst, lbl, row_number() OVER (PARTITION BY dst"
            f" ORDER BY n DESC, lbl ASC) AS rn FROM c{r}) WHERE rn = 1),"
        )
    return "\n".join(parts)
