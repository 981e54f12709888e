"""Iterative graph analytics as DataFrame compositions: PageRank.

Companion to the min-label connected components in operators/dedup.py
(the other iterative operator): each PageRank iteration is one keyed
join + one aggregate — no driver-side graph, no RDD checkpoint chains —
so a 100 TB edge list iterates at the cost of `iters` shuffles on the
node key. Spark's well-known PageRank example is RDD-based; this is the
DataFrame/Catalyst form, where AQE handles the skew of hub nodes.

Determinism note for the oracle gate: the per-node contribution sum is
a float aggregate, so engines may add in different orders; the error is
bounded by n·eps per iteration (~1e-12 for thousands of in-edges),
which is far below the 1e-6 rounding the d51 oracle compares at. All
other arithmetic — (1-d)/N, rank/degree — is a fixed expression tree
evaluated identically by IEEE doubles in any engine.

Semantics: the textbook simplified update
    rank'(v) = (1-d)/N + d · Σ_{u→v} rank(u)/outdeg(u)
without dangling-mass redistribution (a node with no out-edges leaks
its rank). That keeps the recurrence a pure join+agg — exactly
SQL-unrollable, which is what lets DuckDB replay all iterations as
stacked CTEs and value-check the result (d51).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iters: int = 5, damping: float = 0.85,
             checkpoint_every: int | None = None,
             dangling: bool = False) -> DataFrame:
    """PageRank over a directed edge list: returns (node, rank) after
    ``iters`` synchronous iterations from a uniform start. Nodes are
    the union of sources and destinations; parallel edges count once
    (dedupe upstream if your edge source can emit duplicates — their
    weight would silently double).

    Plan shape per iteration: edges join ranks on src (one shuffle,
    reused key), groupBy dst (second shuffle), left join back to the
    node set. The node count enters via a broadcast 1-row aggregate —
    never a driver-side collect.

    ``dangling=True`` adds the standard dangling-mass redistribution
    (VERDICT r5 item 7): each iteration, the summed rank of nodes with
    NO out-edges is spread uniformly —
        rank'(v) = (1-d)/N + d·(Σ_{u→v} rank(u)/outdeg(u) + dm/N)
    so Σ rank stays exactly 1 per iteration (pinned in tests; the
    simplified default leaks sink mass, documented below).

    CHECKPOINT-FREE dangling recurrence (r7, VERDICT r6 Next #3): the
    r6 form computed dm with a second reference to ``ranks`` per
    iteration, which doubles the LOGICAL plan each round (persist
    caches execution, not the plan — the 2^7-node tree OOMed the plan
    printer at 7 iterations) and therefore forced a per-iteration
    localCheckpoint barrier. This form references each state frame
    exactly ONCE, so the plan stays LINEAR in ``iters`` with no
    lineage cut at all:
      1. ``ranks LEFT JOIN out-degree edges``: a non-sink emits one
         row per out-edge (key=dst, contrib=rank/deg); a sink emits
         exactly one unmatched row (key=NULL, mass=rank) — the sink
         markers fold into the SAME pass, no separate anti-join.
      2. one groupBy(key): per-node spread rows PLUS one NULL-key row
         whose mass sum IS the dangling mass dm.
      3. the static node set, doubled with (node, key=node) and
         (node, key=NULL) rows, null-safe-equi-joins (<=>) the
         aggregate: each node picks up its own spread row through the
         first key and the dm row through the NULL key — Spark plans
         EqualNullSafe as a hash join, so this is an equi-shuffle,
         never a nested loop.
      4. groupBy(node) folds the ≤2 rows back into
         rank' = (1-d)/N + d·(spread + dm/N).
    Cost: one extra narrow shuffle (step 4) vs the non-dangling arm,
    against which it removes a join, an aggregate, and the checkpoint
    barrier per iteration.

    ``checkpoint_every`` truncates the rank frame's lineage every k
    iterations (localCheckpoint, same pattern as connected_components'
    per-round cut, dedup.py): each rank frame is consumed exactly once
    so nothing re-executes without it, but Catalyst planning cost grows
    with lineage depth. Leave it OFF for shallow runs — measured at 5
    iterations over 488k edges (sf0.1), checkpointing every 2 was 1.9s
    -> 6.6s warm: the materialization barriers cost more than the
    planning they save. It pays only when iteration counts grow past
    ~10 and whole-plan optimization time dominates.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    # edges/nodes lineage re-executes once per iteration; we MEASURED
    # localCheckpoint'ing them (d51, 488k edges, 5 iters) and it LOST —
    # warm 1.9s -> 2.6s, cold also worse: the materialization barrier
    # costs more than re-running a cheap self-join. Checkpoint the
    # EDGES YOURSELF before calling when their derivation is expensive
    # (a multi-stage similarity pipeline), not as a default here.
    nodes = (e.select(F.col("_src").alias("node"))
             .union(e.select(F.col("_dst").alias("node")))
             .distinct())
    n1 = nodes.agg(F.count(F.lit(1)).alias("_n"))
    nodes = nodes.crossJoin(F.broadcast(n1))
    deg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg"))
    e_deg = e.join(deg, "_src")

    ranks = nodes.select(
        "node", "_n",
        (F.lit(1.0) / F.col("_n").cast("double")).alias("rank"))
    base = F.lit(1.0 - damping) / F.col("_n").cast("double")

    if dangling:
        # r10 (VERDICT r9 Next #2 — the d68 suite-ceiling profile):
        # the dangling recurrence references e_deg and the node set
        # EVERY iteration, so without a cut each round re-runs the
        # degree groupBy and the node-set distinct from raw edges.
        # Unlike the non-dangling arm (where checkpointing measured
        # as a loss — see above), these frames feed multiple shuffles
        # per iteration; materializing them once was measured at
        # sf0.1 (5 iters, 488k edges, warm, 3 reps): 4.3-5.5 s ->
        # 2.4-2.9 s. Eager: every iteration reads the blocks, so
        # racing the first-use build buys nothing.
        #
        # r13 (optimization round, guide §2.4): the dangling-mass
        # distribution no longer goes through the doubled node set +
        # null-safe join + second groupBy (3 exchanges over 2|V|
        # rows). The per-round aggregate is lazily checkpointed (a
        # LogicalRDD, so referencing it twice neither doubles the
        # logical plan nor re-executes it — the q88 fixpoint pattern),
        # the NULL-key row's mass becomes a 1-row BROADCAST, and one
        # plain LEFT join attaches the spread to the |V|-row node set.
        # Per iteration that is one exchange and one aggregate pass
        # fewer, and the static join input halves; the rank expression
        # tree is unchanged term for term, so emitted doubles are
        # bit-identical (hand-reference tests at 1e-12; d68 oracle).
        e_deg = e_deg.localCheckpoint()
        nodes = nodes.localCheckpoint()
        for it in range(1, iters + 1):
            # ONE left join: edge fan-out for non-sinks, a single
            # NULL-key marker row carrying the rank for each sink
            allrows = ranks.join(e_deg,
                                 ranks["node"] == e_deg["_src"], "left")
            grouped = (allrows.select(
                F.col("_dst").alias("_k"),
                F.when(F.col("_deg").isNotNull(),
                       F.col("rank") / F.col("_deg").cast("double"))
                 .otherwise(F.lit(0.0)).alias("_c"),
                F.when(F.col("_deg").isNull(), F.col("rank"))
                 .otherwise(F.lit(0.0)).alias("_m"))
                .groupBy("_k")
                .agg(F.sum("_c").alias("_s"), F.sum("_m").alias("_dm"))
                .localCheckpoint(eager=False))
            # dangling mass: the NULL-key row's _dm (0.0 when the
            # graph has no sinks and the row therefore never forms)
            dmrow = (grouped.filter(F.col("_k").isNull())
                     .agg(F.coalesce(F.sum("_dm"), F.lit(0.0))
                          .alias("_d")))
            spread = (grouped.filter(F.col("_k").isNotNull())
                      .select(F.col("_k"), F.col("_s")))
            joined = (nodes.join(spread,
                                 nodes["node"] == spread["_k"], "left")
                      .crossJoin(F.broadcast(dmrow)))
            ranks = joined.select(
                nodes["node"], nodes["_n"],
                (base + F.lit(damping)
                 * (F.coalesce(F.col("_s"), F.lit(0.0))
                    + F.col("_d")
                    / nodes["_n"].cast("double"))).alias("rank"))
            # same opt-in lineage cut as the non-dangling arm (review
            # r7: the parameter was silently dead on this branch) —
            # the recurrence is plan-LINEAR without it, but Catalyst
            # analysis time still grows with depth, so deep runs
            # (iters >> 10) can cap planning cost per k iterations
            if checkpoint_every and it % checkpoint_every == 0 \
                    and it < iters:
                ranks = ranks.localCheckpoint(eager=False)
        return ranks.select("node", "rank")

    # COMPACT-STATE recurrence (r13 optimization round, guide §2.4 —
    # remove shuffles outright): the per-iteration state holds ONLY
    # nodes with in-edges. A node absent from the state has rank ==
    # base EXACTLY (its old stored value was base + d*0.0, and IEEE
    # gives d*0.0 == 0.0 and x + 0.0 == x for x > 0), so the edge join
    # reads absent ranks back via coalesce(rank, base) — bit-identical
    # to the stored value. This drops the per-iteration LEFT join
    # against the full node set AND the node set's union+distinct
    # lineage from every round: the r12 plan carried 68 Exchanges / 30
    # SortMergeJoins at 5 iterations, the compact form ~24/10 (d51
    # before/after in plans/r13; oracle d51 hash unchanged, hand-
    # reference tests at 1e-12 green). The node set is joined ONCE at
    # the end to surface no-in-edge nodes at base rank. Iteration 1
    # needs no join at all: every rank is the uniform 1/N.
    e_deg_n = e_deg.crossJoin(F.broadcast(n1)).localCheckpoint()
    cranks = None
    for it in range(1, iters + 1):
        base_e = (F.lit(1.0 - damping)
                  / e_deg_n["_n"].cast("double"))
        if cranks is None:
            j = e_deg_n
            src_rank = F.lit(1.0) / e_deg_n["_n"].cast("double")
        else:
            j = e_deg_n.join(cranks,
                             e_deg_n["_src"] == cranks["node"], "left")
            src_rank = F.coalesce(cranks["rank"], base_e)
        cranks = (j.groupBy(e_deg_n["_dst"], e_deg_n["_n"])
                  .agg(F.sum(src_rank / e_deg_n["_deg"].cast("double"))
                       .alias("_s"))
                  .select(F.col("_dst").alias("node"),
                          (F.lit(1.0 - damping)
                           / F.col("_n").cast("double")
                           + F.lit(damping) * F.col("_s"))
                          .alias("rank")))
        if checkpoint_every and it % checkpoint_every == 0 \
                and it < iters:
            cranks = cranks.localCheckpoint(eager=False)
    return (nodes.join(cranks, "node", "left")
            .select("node",
                    F.coalesce(F.col("rank"), base).alias("rank")))


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst",
                    materialize: bool = True) -> DataFrame:
    """Per-node triangle participation counts over an UNDIRECTED view
    of the edge list: (node, triangles) for every node in at least one
    triangle. Direction and duplicates are ignored (each unordered
    pair contributes one undirected edge; self-loops drop).

    Degree-ordered orientation (Schank & Wagner 2005; the MapReduce
    form is Suri & Vassilvitskii 2011, "Counting triangles and the
    curse of the last reducer"): orient every undirected edge from the
    endpoint that is SMALLER in the total order (degree, node) to the
    larger. Every node's out-degree is then O(sqrt(2m)) regardless of
    how skewed the raw degree distribution is — a celebrity node with
    10^6 followers holds almost no out-edges, because nearly all its
    neighbors have lower degree. Each triangle {a,b,c} (a <o b <o c)
    is found EXACTLY once: as the wedge b <- a -> c at its
    minimum-order apex a, closed by the oriented edge b -> c.

    Plan shape: two self-equi-joins (wedge build on the apex, closure
    probe on the (v,w) pair) + one explode + one count — no cartesian,
    no iteration. The wedge join's fan-out is bounded by the oriented
    out-degree (the sqrt(2m) cap), which is the whole point of the
    orientation: the curse-of-the-last-reducer hub wedge explosion
    cannot happen. 100 TB: all three joins shuffle on node-sized keys;
    skewed apexes are AQE-splittable because the join is pure equi.

    ``materialize`` (default True) cuts the oriented-edge frame's
    lineage once (lazy localCheckpoint): e1/e2/e3 are three plan
    references to the same frame, so without the cut the whole
    dedupe+degree pipeline executes three times (measured sf0.1,
    245k-edge co-purchase graph: 8.1s cold / 1.65s warm plain vs
    1.9s / 1.1s materialized; the executed plan shrinks 77->~20
    exchanges). This is the memory-note exception where the barrier
    WINS: the frame is consumed k=3 times, not once. At 100 TB the
    oriented edge table is exactly what you'd persist to storage
    between stages; pass False to keep the operator barrier-free
    inside a larger pipelined plan."""
    a, b = F.col(src), F.col(dst)
    und = (edges.select(F.least(a, b).alias("_u"),
                        F.greatest(a, b).alias("_v"))
           .filter(F.col("_u") != F.col("_v"))
           .filter(F.col("_u").isNotNull() & F.col("_v").isNotNull())
           .distinct())
    deg = (und.select(F.col("_u").alias("node"))
           .unionAll(und.select(F.col("_v").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("_d")))
    du = deg.select(F.col("node").alias("_u"), F.col("_d").alias("_du"))
    dv = deg.select(F.col("node").alias("_v"), F.col("_d").alias("_dv"))
    ed = und.join(du, "_u").join(dv, "_v")
    lower_first = (F.struct(F.col("_du"), F.col("_u"))
                   < F.struct(F.col("_dv"), F.col("_v")))
    # oriented edge s -> t with t's order key carried for the wedge
    # comparison (the closing edge's direction is decided by the order
    # of the two FAR endpoints, so their keys must ride along)
    o = ed.select(
        F.when(lower_first, F.col("_u")).otherwise(F.col("_v"))
         .alias("s"),
        F.when(lower_first, F.col("_v")).otherwise(F.col("_u"))
         .alias("t"),
        F.when(lower_first,
               F.struct(F.col("_dv").alias("d"), F.col("_v").alias("n")))
         .otherwise(
               F.struct(F.col("_du").alias("d"), F.col("_u").alias("n")))
         .alias("to"))
    if materialize:
        o = o.localCheckpoint(eager=False)
    e1, e2, e3 = o.alias("e1"), o.alias("e2"), o.alias("e3")
    wedges = e1.join(e2, (F.col("e1.s") == F.col("e2.s"))
                     & (F.col("e1.to") < F.col("e2.to")))
    tri = wedges.join(e3, (F.col("e3.s") == F.col("e1.t"))
                      & (F.col("e3.t") == F.col("e2.t")))
    return (tri.select(F.explode(F.array(F.col("e1.s"), F.col("e1.t"),
                                         F.col("e2.t"))).alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("triangles")))


def label_propagation(edges: DataFrame, src: str = "src",
                      dst: str = "dst", iters: int = 3,
                      materialize: bool = True) -> DataFrame:
    """Synchronous label-propagation community detection over the
    UNDIRECTED view of the edge list: every node starts as its own
    label; each iteration adopts the most frequent label among its
    neighbors, ties -> smallest label (Raghavan et al. 2007). Returns
    (node, label) after exactly ``iters`` rounds — the fixed-round
    synchronous form is a pure function of the graph, so a SQL engine
    replays it as stacked CTEs (the d51 PageRank oracle pattern);
    run-to-convergence LPA is seed/order-dependent and could never be
    oracle-checked.

    Plan shape per iteration: one equi join (neighbor labels) + two
    aggregates (per-(node,label) count, then per-node argmax via
    min_by over (-count, label) — struct-min picks the max count, then
    the LOWEST label on a count tie, engine-deterministically, for ANY
    orderable label type). The label state is
    referenced ONCE per iteration, so the logical plan stays linear in
    ``iters`` (the dangling-PageRank lesson, r7). 100 TB: both
    shuffles key on node ids; hub-node skew is AQE-splittable equi
    shuffle, and synchronous rounds mean no driver-side state.

    ``materialize`` (default True, r13 optimization round): the
    symmetric edge table is referenced iters+1 times (every round's
    neighbor join + the label init), so without a cut its whole
    dedupe+symmetrize lineage — and whatever upstream derivation the
    caller built — re-plans and re-executes per round (the d80 plan
    carried 68 Exchanges at 3 iterations; the triangle_counts
    materialize rationale, applied to the same k>=2-reference shape).
    One lazy localCheckpoint cuts it; pass False to keep the operator
    barrier-free inside a larger pipelined plan."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    a, b = F.col(src), F.col(dst)
    und = (edges.select(F.least(a, b).alias("_u"),
                        F.greatest(a, b).alias("_v"))
           .filter(F.col("_u") != F.col("_v"))
           .filter(F.col("_u").isNotNull() & F.col("_v").isNotNull())
           .distinct())
    # both directions: neighbor lists are symmetric
    e = und.unionAll(und.select(F.col("_v").alias("_u"),
                                F.col("_u").alias("_v")))
    if materialize:
        e = e.localCheckpoint(eager=False)
    labels = (e.select(F.col("_u").alias("node"))
              .distinct()
              .select("node", F.col("node").alias("label")))
    for _ in range(iters):
        counts = (e.join(labels, labels["node"] == e["_v"])
                  .groupBy(e["_u"].alias("node"), F.col("label"))
                  .agg(F.count(F.lit(1)).alias("_c")))
        # min over (-count, label): max count, then SMALLEST label —
        # negating the COUNT (always numeric) instead of the label
        # keeps the tie-break valid for string/any orderable node ids
        # (review r7: -label raised under ANSI for non-numeric ids)
        labels = (counts.groupBy("node")
                  .agg(F.min_by("label",
                                F.struct((-F.col("_c")).alias("c"),
                                         F.col("label").alias("l")))
                       .alias("label")))
    return labels


def kcore_prune(edges: DataFrame, src: str = "src", dst: str = "dst",
                k: int = 3, rounds: int = 3) -> DataFrame:
    """Fixed-round k-core peeling over the UNDIRECTED view: each round
    drops every edge incident to a node of current degree < k, then
    degrees recompute on the survivors. Returns (node, degree) for
    the nodes remaining after ``rounds`` — an upper envelope of the
    true k-core that equals it once a round removes nothing (the
    run-to-fixpoint form is data-dependent in depth, so the FIXED
    count is what a SQL oracle can replay, like the d51/d80 pattern).

    Formulation note (r13 optimization round, guide §2.1/§3.4; the
    earlier two-window form's before/after plans are in
    plans/r13/d81_kcore_*.txt): the edge state is ONE canonical
    (u<v) table, lazily checkpointed per round so the two references
    each round (degree count + survivor filter) read materialized
    blocks instead of doubling the logical plan (the r6
    dangling-PageRank trap). Degrees come from exploding both
    endpoints into a map-side-combined groupBy — the shuffle carries
    at most one tiny (node, count) row per node per input partition —
    and the < k nodes (the peeled set, usually the small side) ship
    back as two semi-joins (SMJ in the static plan; AQE converts to
    broadcast at runtime when the surviving-node aggregate is small).
    The old form shuffled AND sorted the full symmetric (2x) edge
    table twice per round; now the shuffled state per round is one
    node-sized aggregate plus the canonical (1x) edge table through
    the semi-joins (measured: exchanges 26 -> 10, sorts 12 -> 8,
    plan lines 389 -> 180 at 3 rounds). 100 TB: zero edge movement
    while the surviving-node set fits a broadcast, degraded by AQE
    to a keyed shuffle when it does not."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    a, b = F.col(src), F.col(dst)
    e = (edges.select(F.least(a, b).alias("_u"),
                      F.greatest(a, b).alias("_v"))
         .filter(F.col("_u") != F.col("_v"))
         .filter(F.col("_u").isNotNull() & F.col("_v").isNotNull())
         .distinct())
    for _ in range(rounds):
        e = e.localCheckpoint(eager=False)
        deg = (e.select(F.explode(F.array("_u", "_v")).alias("_n"))
               .groupBy("_n").agg(F.count(F.lit(1)).alias("_d")))
        ok = deg.filter(F.col("_d") >= k).select("_n")
        e = (e.join(ok.withColumnRenamed("_n", "_u"), "_u", "semi")
             .join(ok.withColumnRenamed("_n", "_v"), "_v", "semi")
             .select("_u", "_v"))
    return (e.select(F.explode(F.array("_u", "_v")).alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("degree")))
