"""Link-graph analytics: PageRank-style host ranking for crawl
prioritization (the score a production frontier joins against its
priority column — SURVEY.md F1/F5; the reference's static two-level
priority is the degenerate case).

Integer fixed-point throughout: ranks are micro-units (1e6 = 1.0) and
every step is floor-divided, so the result is bit-identical across
engines and across partitionings — no float summation order anywhere.
This is the property that makes an *iterative* Spark job
oracle-checkable: the DuckDB twin unrolls the same iterations as chained
CTEs and must match hash-for-hash.

Scale shape: each iteration is one join edges⋈ranks on src (ranks is the
small side early on — broadcastable; AQE decides) plus one groupBy dst
with map-side partial sums.  Lineage grows linearly with iterations;
``checkpoint_every`` truncates it with localCheckpoint so 50-iteration
runs don't replan O(n²) DAGs.  Dangling mass is dropped (simplified
PageRank), matching the unrolled oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BASE_MICRO = 1_000_000


def pagerank_micro(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Fixed-point PageRank over ``edges (src, dst)``.  Returns
    ``(node, rank_micro)`` for every node appearing as src or dst.

    Per iteration, in integers only:
        contrib(e)  = floor(rank(src) / out_deg(src))
        rank'(n)    = floor((100-d)*1e6 / 100)
                      + floor(d * sum(contrib over in-edges) / 100)
    """
    edges = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).distinct()
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    teleport = (100 - damping_pct) * BASE_MICRO // 100

    ranks = nodes.withColumn("rank_micro", F.lit(BASE_MICRO).cast("long"))
    for i in range(iterations):
        contribs = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("rank_micro") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("csum"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.floor(
                    F.lit(damping_pct) * F.coalesce(F.col("csum"), F.lit(0)) / 100
                )
            ).cast("long").alias("rank_micro"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def connected_components(
    pairs: DataFrame,
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components over an undirected pair list ``(a, b)``.
    Returns ``(node, component)`` where ``component`` is the minimum
    node id reachable from ``node`` — the canonical cluster label a
    dedup pipeline keys on (keep ``node == component``, drop the rest).

    Hash-min label propagation WITH POINTER JUMPING, run to
    convergence: each sweep every node takes the min label over itself
    and its neighbours (one edge join + groupBy-min), then follows its
    own label one step (labels self-join — path compression), so label
    reach roughly doubles per sweep and convergence is O(log diameter)
    sweeps, not O(diameter) — the same doubling idea as the
    large-star/small-star algorithm (Kiveris et al., "Connected
    Components in MapReduce and Beyond").  The loop stops when a sweep
    changes nothing; labels only ever decrease, so "sum(component)
    unchanged" ⇔ fixed point — one cheap agg per sweep on
    materialized partitions, no comparison join (driver-side
    convergence checks are the idiomatic Spark shape for iterative
    jobs, cf. GraphX Pregel).

    Scale shape per sweep: one join labels⋈edges on src (shuffle on
    node id) + one groupBy dst min — map-side partial min, no skew
    beyond the graph's own degree skew (hub nodes are exactly the rows
    AQE skew-split handles).  The edge set and each sweep's labels are
    eagerly localCheckpoint'ed: edges are scanned/distinct'ed ONCE (not
    once per sweep), the convergence count reads materialized
    partitions instead of recomputing the whole chain, and lineage
    stays flat so 50-sweep runs don't replan O(n²) DAGs.  Integer
    labels only — bit-identical across engines and partitionings.
    """
    both = pairs.select(
        F.col(pairs.columns[0]).cast("long").alias("src"),
        F.col(pairs.columns[1]).cast("long").alias("dst"),
    )
    # symmetrize in ONE pass over the pair plan: explode [(s,d),(d,s)]
    # per row.  union(both, both.swapped) would evaluate the upstream
    # plan twice before the checkpoint — for a cheap synthesized edge
    # list that's invisible, but when the pairs come off a full
    # minhash-LSH chain (q_fuzzy_dedup_e2e) it doubles the most
    # expensive stage of the whole job.
    edges = (
        both.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    for _ in range(max_iterations):
        neigh_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("nmin"))
        )
        half = labels.join(neigh_min, "node", "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
            ).alias("component"),
        )
        # pointer jump: component <- min(component, label(component)).
        # Every label is itself a node id, so the lookup always lands.
        lookup = half.select(
            F.col("node").alias("_ln"), F.col("component").alias("_lc")
        )
        labels = (
            half.join(lookup, half.component == lookup._ln, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("_lc"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("component")).first()[0]
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} sweeps "
        "(diameter too large — switch to the large-star/small-star variant)"
    )


def keep_best(
    pairs: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    max_iterations: int = 50,
) -> DataFrame:
    """The curation step AFTER near-dup pair emission (minhash/simhash/
    cosine): collapse the pair graph into components and keep exactly
    one representative per component — the highest ``score_col``, ties
    broken to the smallest id, so the winner is deterministic across
    engines and partitionings.  Docs appearing in no pair are their own
    singleton component and always kept.  Returns every input doc as
    ``(id, component, kept)`` so downstream can either filter
    ``kept`` or audit what was dropped.

    Scale shape: components from :func:`connected_components` (O(log
    diameter) sweeps), then the per-component winner is ONE map-side-
    combined max(struct(score, -id)) aggregation — no per-group window
    sort, so a pathological giant component (template boilerplate
    clustering half the corpus) costs a partial-agg merge, not a
    single-partition sort.  The winner table (one row per component) is
    joined back on component; AQE broadcasts it when small.
    """
    cc = connected_components(pairs, max_iterations)
    labeled = (
        scores.join(cc, scores[id_col] == cc.node, "left")
        .select(
            scores[id_col].cast("long").alias("id"),
            F.coalesce(F.col("component"), scores[id_col].cast("long"))
            .alias("component"),
            F.col(score_col).alias("s"),
        )
    )
    best = labeled.groupBy("component").agg(
        F.max(F.struct(F.col("s"), (-F.col("id")).alias("negid"))).alias("w")
    )
    return (
        labeled.join(best, "component")
        .select(
            F.col("id").alias(id_col),
            "component",
            (F.col("id") == -F.col("w.negid")).alias("kept"),
        )
    )


def resolve_redirects(edges: DataFrame, max_sweeps: int = 8) -> DataFrame:
    """Resolve HTTP redirect chains to their terminal url: ``edges
    (src, dst)`` holds one redirect hop per row (functional on src —
    a url redirects to at most one place; the crawl engine's fetch
    stage emits exactly that).  Returns ``(src, final, is_cycle)`` for
    every redirecting url: ``final`` is the fixed point reached by
    following hops, null for members of a redirect cycle
    (``is_cycle`` true) — the canonicalization a frontier applies
    before the seen-check so a chain's aliases collapse to one
    frontier row.

    POINTER DOUBLING, not hop-at-a-time: each sweep composes the
    mapping with itself (f -> f∘f), so a length-H chain resolves in
    ceil(log2 H) self-joins — max_sweeps=8 covers chains of 256 hops,
    far past the 5-10 real fetchers tolerate.  Scale shape per sweep:
    one self-join on the url key (shuffle) + one left-semi count for
    convergence on materialized (localCheckpoint) partitions; the same
    doubling discipline as connected_components above.
    """
    ptr = edges.select(
        F.col(edges.columns[0]).cast("long").alias("src"),
        F.col(edges.columns[1]).cast("long").alias("cur"),
    ).localCheckpoint(eager=True)
    srcs = ptr.select(F.col("src").alias("k")).distinct().localCheckpoint(eager=True)
    for _ in range(max_sweeps):
        m = ptr.select(F.col("src").alias("m_src"), F.col("cur").alias("m_cur"))
        ptr = (
            ptr.join(m, ptr.cur == m.m_src, "left")
            .select("src", F.coalesce("m_cur", "cur").alias("cur"))
            .localCheckpoint(eager=True)
        )
        pending = ptr.join(srcs, ptr.cur == srcs.k, "left_semi").count()
        if pending == 0:
            break
    still = ptr.join(srcs, ptr.cur == srcs.k, "left_semi").select(
        F.col("src").alias("cyc_src")
    )
    return ptr.join(still, ptr.src == still.cyc_src, "left").select(
        "src",
        F.when(F.col("cyc_src").isNull(), F.col("cur")).alias("final"),
        F.col("cyc_src").isNotNull().alias("is_cycle"),
    )


def link_spam_stats(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    min_recip_ppm: int = 500_000,
    min_outdeg: int = 2,
) -> DataFrame:
    """Per-host link-farm stats: ``(host, outdeg, n_recip, recip_ppm,
    link_farm)``.

    Link farms manufacture rank by reciprocal linking (host A links B,
    B links A); organic hosts link mostly one-way.  ``recip_ppm`` is
    the fraction (integer ppm) of a host's distinct outlinks whose
    reverse edge exists anywhere in the graph; a host is flagged when
    that fraction and its outdegree both clear their thresholds.
    Downstream this joins against host_rank the same way the blocklist
    does — demoting or zeroing flagged hosts' priority.

    Scale shape: one ``distinct`` on (src, dst) — the canonical edge
    set, partially aggregated map-side — then one self-join on the
    composite key (hash-partitioned both sides, no broadcast of an
    unbounded edge list) and two groupBys with map-side partial counts.
    No iteration, no driver collect.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(F.col("src").alias("r_src"), F.col("dst").alias("r_dst"))
    recip = e.join(
        rev, (e.src == F.col("r_dst")) & (e.dst == F.col("r_src")), "left_semi"
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("outdeg"))
    rec = recip.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("n_recip")
    )
    return (
        deg.join(rec, "src", "left")
        .select(
            F.col("src").alias("host"),
            "outdeg",
            F.coalesce(F.col("n_recip"), F.lit(0)).cast("long").alias("n_recip"),
        )
        .withColumn(
            "recip_ppm",
            F.floor(F.col("n_recip") * 1_000_000 / F.col("outdeg")).cast("long"),
        )
        .withColumn(
            "link_farm",
            (F.col("recip_ppm") >= min_recip_ppm)
            & (F.col("outdeg") >= min_outdeg),
        )
    )


def hits_micro(edges: DataFrame, iterations: int = 2) -> DataFrame:
    """Kleinberg HITS hubs/authorities over ``edges (src, dst)``,
    integer fixed-point.  Returns ``(node, hub_micro, auth_micro)`` for
    every node appearing as src or dst.

    Complements ``pagerank_micro`` for crawl prioritization: PageRank
    finds endorsed hosts; HITS separates *directories* (hubs — pages
    whose outlinks point at good content, e.g. sitemap/portal hosts a
    crawler should revisit for discovery) from *content* (authorities —
    hosts good hubs point at, which deserve fetch budget).  The
    reference's static rule priorities (rule.go:50) are the degenerate
    one-hop case.

    Per iteration, in integers only (micro units, 1e6 = 1.0):

        a_sum(n)  = sum(hub(src) over in-edges of n)        [0 if none]
        auth(n)   = floor(a_sum(n) * 1e6 / max(a_sum))
        h_sum(n)  = sum(auth(dst) over out-edges of n)      [0 if none]
        hub(n)    = floor(h_sum(n) * 1e6 / max(h_sum))

    Max-normalization (not L2) keeps every step exact integer floor
    arithmetic, so the iterative computation is bit-identical across
    engines/partitionings and the DuckDB oracle can unroll it as CTEs.
    The two per-iteration maxima are bounded driver scalars (one row
    each — the kmeans/perceptron bounded-model-state discipline) folded
    back into the plan as literals.  Magnitude domain: sums stay exact
    through the float floor while max_sum * 1e6 < 2**53 (~9e9 micro
    mass), the same micro-unit domain every fixed-point kernel in this
    package documents; beyond that, swap the two floors to decimal(38).

    Scale shape: per half-step one join keyed on node (AQE handles
    hot-host in-degree skew) + one map-side-combined sum; the node and
    edge sets are never collected.  The two frames persisted per
    iteration are node-sized; superseded ones are released eagerly.
    """
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )

    def _half(mass: DataFrame, mass_col: str, key: str, out: str) -> DataFrame:
        # mass joined onto edges at `key` endpoint, summed at the other
        other = "dst" if key == "src" else "src"
        sums = (
            e.join(mass.withColumnRenamed("node", key), key)
            .groupBy(F.col(other).alias("node"))
            .agg(F.sum(mass_col).alias("s"))
        )
        raw = nodes.join(sums, "node", "left").select(
            "node", F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("s")
        ).persist()
        mx = raw.agg(F.max("s")).first()[0] or 0  # bounded: one scalar
        return raw.select(
            "node",
            F.floor(F.col("s") * F.lit(BASE_MICRO) / F.lit(max(mx, 1)))
            .cast("long")
            .alias(out),
        ), raw

    hub = nodes.select("node", F.lit(BASE_MICRO).cast("long").alias("hub_micro"))
    auth = None
    kept: list[DataFrame] = []
    for _ in range(iterations):
        auth, raw_a = _half(hub, "hub_micro", "src", "auth_micro")
        hub, raw_h = _half(auth, "auth_micro", "dst", "hub_micro")
        for old in kept:  # superseded iteration's raw frames
            old.unpersist()
        kept = [raw_a, raw_h]
    out = auth.join(hub, "node").select("node", "hub_micro", "auth_micro")
    return out


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 2,
) -> DataFrame:
    """Semi-supervised label propagation over ``edges (src, dst)`` with
    clamped integer-labeled ``seeds (node, label)`` — the topic-seed
    expansion step of a focused crawl: a handful of hosts labeled by
    topic (e.g. by anchors.focused_priority lexicon hits) spread their
    labels over the link graph, and the propagated labels feed frontier
    prioritization exactly like pagerank_micro / hits_micro scores.

    Classic LPA (Zhu & Ghahramani / Raghavan et al.), made
    engine-deterministic: edges are treated as UNDIRECTED (both
    directions vote); per synchronous iteration every non-seed node
    adopts the label with the most labeled neighbors, ties broken by
    SMALLEST label id; a node with no labeled neighbors keeps its
    current label (null until a labeled neighbor appears); seed labels
    never change (clamped — the semi-supervised variant, so the
    labeling cannot drift off its anchor set).  Integer votes + total
    tie order = bit-identical across engines and partitionings, so the
    DuckDB oracle unrolls iterations as CTEs (the pagerank/hits
    discipline).  Returns ``(node, label, is_seed)`` — label null only
    for nodes still unreached after ``iterations``.

    Scale shape: per iteration ONE join keyed on node (labels onto the
    undirected edge list; hot-host skew handled by AQE) + one
    map-side-combined (node, label) vote count + one argmax aggregate
    (max_by over a (votes, -label) struct — no window, no global sort)
    + the seed-clamp left join (seeds are the SMALL side — broadcast).
    Nothing is ever collected to the driver; label state is node-sized
    and persisted per iteration, superseded frames released eagerly.
    """
    e = (
        edges.select(
            F.col("src").cast("long").alias("a"),
            F.col("dst").cast("long").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct().persist()
    nodes = und.select(F.col("a").alias("node")).distinct().persist()
    sd = (
        seeds.select(
            F.col("node").cast("long").alias("node"),
            F.col("label").cast("long").alias("seed_label"),
        )
        .groupBy("node")
        .agg(F.min("seed_label").alias("seed_label"))  # dedup: min label
        .persist()
    )
    labels = nodes.join(sd, "node", "left").select(
        "node", F.col("seed_label").alias("label")
    ).persist()
    prev = None
    for _ in range(iterations):
        votes = (
            und.join(
                labels.where(F.col("label").isNotNull())
                .withColumnRenamed("node", "b")
                .withColumnRenamed("label", "nb_label"),
                "b",
            )
            .groupBy(F.col("a").alias("node"), F.col("nb_label"))
            .agg(F.count(F.lit(1)).cast("long").alias("votes"))
        )
        adopted = votes.groupBy("node").agg(
            F.max_by(
                "nb_label",
                F.struct(F.col("votes"), (-F.col("nb_label")).alias("nl")),
            ).alias("adopted")
        )
        nxt = (
            labels.join(adopted, "node", "left")
            .join(F.broadcast(sd), "node", "left")
            .select(
                "node",
                F.coalesce(
                    F.col("seed_label"),       # clamp
                    F.col("adopted"),          # majority neighbor label
                    F.col("label"),            # keep when unreached
                ).alias("label"),
            )
            .persist()
        )
        if prev is not None:
            prev.unpersist()
        prev, labels = labels, nxt
    return labels.join(F.broadcast(sd), "node", "left").select(
        "node",
        "label",
        F.col("seed_label").isNotNull().alias("is_seed"),
    )


def trustrank_micro(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """TrustRank (Gyongyi, Garcia-Molina & Pedersen, VLDB'04) —
    PageRank with the teleport mass restricted to a vetted seed set:
    trust flows out of hand-verified good hosts through links, so spam
    farms (unreachable from the seed neighbourhood) score ~0 however
    densely they interlink, the property plain PageRank lacks and the
    reason link farms target it.  Completes the crawl-priority family:
    pagerank (endorsement), hits (hub/authority split),
    label_propagation (topical spread), trustrank (spam demotion).

    Same integer fixed-point arithmetic as :func:`pagerank_micro` with
    one change — the teleport term is ``(100-d)% * 1e6`` for seed
    nodes and 0 for everyone else (the seed-biased personalization
    vector, unnormalized so seed count never changes per-node scale):

        rank'(n) = (n in seeds ? floor((100-d)*1e6/100) : 0)
                   + floor(d * sum(floor(rank(src)/deg(src))) / 100)

    Initial rank = 1e6 on seeds, 0 elsewhere.  Returns
    ``(node, trust_micro, is_seed)`` for every node in the edge set.

    Scale shape: identical to pagerank_micro — per iteration one join
    keyed on src + one map-side-combined in-edge sum; the seed flag
    joins by BROADCAST (seed lists are small by definition: they are
    hand-vetted).  Nothing collected; lineage linear in iterations.
    """
    e = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    sd = seeds.select(F.col("node").cast("long").alias("node")).distinct()
    flagged = nodes.join(
        F.broadcast(sd.withColumn("is_seed", F.lit(True))), "node", "left"
    ).select(
        "node", F.coalesce(F.col("is_seed"), F.lit(False)).alias("is_seed")
    ).persist()
    teleport = (100 - damping_pct) * BASE_MICRO // 100

    ranks = flagged.select(
        "node",
        F.when(F.col("is_seed"), F.lit(BASE_MICRO))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("trust_micro"),
    )
    for _ in range(iterations):
        contribs = (
            e.join(ranks, e.src == ranks.node)
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("trust_micro") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("csum"))
        )
        ranks = flagged.join(contribs, "node", "left").select(
            "node",
            (
                F.when(F.col("is_seed"), F.lit(teleport)).otherwise(F.lit(0))
                + F.floor(
                    F.lit(damping_pct)
                    * F.coalesce(F.col("csum"), F.lit(0))
                    / 100
                )
            ).cast("long").alias("trust_micro"),
        )
    return ranks.join(flagged, "node").select(
        "node", "trust_micro", "is_seed"
    )


def opic_micro(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Adaptive OPIC (Abiteboul, Preda & Cobéna, WWW'03 — "Adaptive
    On-Line Page Importance Computation"), the crawl-frontier
    prioritization algorithm designed to run *while* crawling: unlike
    PageRank it needs no convergence loop over the full graph before
    scores are useful — cash flow accumulates importance online, which
    is why production crawlers schedule fetches by it.  Completes the
    link-analysis family (pagerank / hits / label_propagation /
    trustrank) with the member that is specifically a *crawler's*
    importance measure; the reference's static rule priorities
    (rule.go:50) are again the degenerate one-hop case.

    Batch-synchronous variant in integer micro units (1e6 = 1.0 unit
    of cash per node): every node starts with ``cash = 1e6, hist = 0``;
    per round each node spends its whole cash —

        give(e)   = floor(cash(src) / odeg(src))   per out-edge
        vshare    = floor(sum(cash over dangling nodes) / n_nodes)
        hist'(n)  = hist(n) + cash(n)
        cash'(n)  = sum(give over in-edges of n) + vshare

    Dangling nodes (no out-links) pay the *virtual node*, which
    redistributes uniformly next round — the paper's trick to keep
    total cash constant (up to floor loss) without a dense teleport.
    Importance estimate = ``hist + cash`` after the last round
    (proportional to total flow through the node).  Returns
    ``(node, cash_micro, hist_micro, importance_micro)``.

    The two per-round scalars (n_nodes once, the dangling-cash sum per
    round) are bounded driver scalars folded back as literals — the
    kmeans/perceptron/HITS bounded-model-state discipline — so the
    DuckDB oracle unrolls every round as CTEs and must match
    hash-for-hash (all arithmetic is integer floor division).

    Scale shape: per round one join keyed on src (AQE handles hot-host
    out-degree skew) + one map-side-combined in-edge sum + one 1-row
    aggregate for the dangling sum; node/edge sets are never
    collected.  Lineage is linear in rounds; the per-round state frame
    is persisted and the superseded one released eagerly.
    """
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n_nodes = nodes.count()  # bounded scalar: one long

    state = nodes.select(
        "node",
        F.lit(BASE_MICRO).cast("long").alias("cash_micro"),
        F.lit(0).cast("long").alias("hist_micro"),
    )
    prev = None
    for _ in range(iterations):
        st = state.join(
            deg.withColumnRenamed("src", "node"), "node", "left"
        ).persist()
        # bounded scalar: total cash sitting on dangling nodes
        vsum = (
            st.where(F.col("deg").isNull()).agg(F.sum("cash_micro")).first()[0]
            or 0
        )
        vshare = vsum // n_nodes
        gives = (
            e.join(st.withColumnRenamed("node", "src").select(
                "src", "cash_micro", "deg"), "src")
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("cash_micro") / F.col("deg")).alias("g"),
            )
            .groupBy("node")
            .agg(F.sum("g").alias("gsum"))
        )
        state = st.join(gives, "node", "left").select(
            "node",
            (F.coalesce(F.col("gsum"), F.lit(0)) + F.lit(vshare))
            .cast("long")
            .alias("cash_micro"),
            (F.col("hist_micro") + F.col("cash_micro"))
            .cast("long")
            .alias("hist_micro"),
        )
        if prev is not None:
            prev.unpersist()
        prev = st
    return state.select(
        "node",
        "cash_micro",
        "hist_micro",
        (F.col("cash_micro") + F.col("hist_micro"))
        .cast("long")
        .alias("importance_micro"),
    )


def seed_hops(
    edges: DataFrame, seeds: DataFrame, max_hops: int = 3
) -> DataFrame:
    """Minimum-hop distance from a seed set by synchronous BFS —
    the graph analytic behind the crawler's depth-cutoff semantics
    (SURVEY F3: the reference's Depth field is exactly "hops from the
    task seed", schedule.go depth propagation): given a link graph it
    answers "what does a depth-k crawl from these seeds reach", which
    the frontier only knows implicitly, per-URL, at fetch time.

    Returns ``(node, hops)`` for every node in the edge set: 0 for
    seeds, k for first reachability at round k <= max_hops, -1 for
    nodes unreached within the budget (a long sentinel — nullable
    ints hash as float driver-side).

    Each round is one src-keyed join of the just-reached frontier
    onto edges + one distinct + one left join back onto state —
    the LPA/trustrank per-iteration shape; the seed frame joins
    BROADCAST (seed lists are small by definition).  Lineage linear
    in rounds; nothing collected.
    """
    e = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    sd = seeds.select(F.col("node").cast("long").alias("node")).distinct()
    state = nodes.join(
        F.broadcast(sd.withColumn("h", F.lit(0))), "node", "left"
    ).select("node", F.col("h").cast("long").alias("hops"))
    for k in range(1, max_hops + 1):
        frontier = state.where(F.col("hops") == k - 1).select("node")
        reached = (
            e.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .withColumn("r", F.lit(1))
        )
        state = state.join(reached, "node", "left").select(
            "node",
            F.coalesce(
                F.col("hops"),
                F.when(F.col("r") == 1, F.lit(k)).cast("long"),
            ).alias("hops"),
        )
    return state.select(
        "node", F.coalesce(F.col("hops"), F.lit(-1)).cast("long").alias("hops")
    )


def cocitation_pairs(
    edges: DataFrame, min_count: int = 2, max_out_degree: int = 64
) -> DataFrame:
    """Co-citation related-host mining (Small, JASIS'73; the classic
    "related pages" signal): two targets are related when many
    distinct sources link to BOTH.  The inverted-index self-join on
    the source key only pairs targets sharing a source — never
    all-pairs — and sources with out-degree > ``max_out_degree`` are
    dropped first (a directory page linking 10k hosts asserts nothing
    pairwise; the same stop-key cap as the shingle/posting-list
    dedup family, bounding the per-source pair fan-out at
    max_out_degree^2).  Returns ``(host_a, host_b, cocite)`` with
    host_a < host_b and cocite = distinct common sources >=
    ``min_count``.
    """
    e = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).distinct()
    od = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    kept = e.join(
        od.where(F.col("od") <= max_out_degree).select("src"), "src"
    )
    a = kept.alias("a")
    b = kept.alias("b")
    return (
        a.join(b, (F.col("a.src") == F.col("b.src"))
               & (F.col("a.dst") < F.col("b.dst")))
        .groupBy(
            F.col("a.dst").alias("host_a"), F.col("b.dst").alias("host_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cocite"))
        .where(F.col("cocite") >= min_count)
    )
