package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph clustering for near-duplicate resolution.
  *
  * Pairwise dedup (MinHash/LSH verify) yields EDGES — "A duplicates B" —
  * but a corpus cleanse needs COMPONENTS: one keeper per transitive
  * cluster (A~B, B~C ⇒ {A,B,C} keep one). This is connected components
  * over the dup-pair graph, computed as iterative min-label propagation
  * on DataFrames:
  *
  *   - every node starts labeled with its own id;
  *   - each round, a node takes the min of its own label and its
  *     neighbors' labels (one join edges⋈labels + one groupBy-min —
  *     two key-partitioned shuffles, both AQE-skew-splittable);
  *   - converged when no label changed.
  *
  * Scale design (100 TB): rounds = graph diameter. Near-dup clusters are
  * dense and shallow (copies of one underlying document, diameter ≤ 3-4
  * in practice), so the loop runs a handful of rounds regardless of
  * corpus size — the per-round cost is two shuffles of the EDGE table,
  * never a corpus-sized all-pairs structure. Each round is
  * `localCheckpoint`ed: without truncation the loop's lineage doubles per
  * iteration and Catalyst re-derives the whole history every round (the
  * classic iterative-DataFrame trap). For adversarial long-chain graphs
  * (diameter ≫ log n), swap the body for the large-star/small-star
  * rounds of Kiveris et al. "Connected Components in MapReduce and
  * Beyond" (SoCC'14) — same join/groupBy primitives, O(log²) rounds; the
  * dup-graph shape doesn't need it.
  */
object Cluster {

  /** Connected components of the undirected graph given as a pair list
    * (columns `id_a`, `id_b`). Returns (`node`, `label`) where `label` is
    * the component's minimum node id. Only nodes that appear in a pair
    * are returned (singletons are their own trivial component and carry
    * no dedup decision). */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 25): DataFrame = {
    // Undirected: materialize both directions once; every round re-reads
    // this table, so it must not re-derive the (possibly expensive)
    // pair-generation lineage each time. Pre-partitioned on dst — the
    // per-round join key — BEFORE the checkpoint: the checkpointed plan
    // keeps its partitioning, so every round's edges⋈labels join reuses
    // it instead of re-shuffling the (largest) edge side each iteration.
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .repartition(col("dst"))
      .localCheckpoint(true)

    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)

    var changed = 1L
    var round = 0
    // Superseded round checkpoints must be UNPINNED: each localCheckpoint
    // holds its rows in the block manager until explicitly released, so a
    // converging loop otherwise accumulates rounds × |labels| of storage —
    // at corpus scale that evicts everything else long before convergence.
    // `labels` is always the checkpointed Dataset itself (never a
    // projection of it), so retiring it releases the actual blocks.
    var retired = List.empty[DataFrame]
    while (changed > 0 && round < maxRounds) {
      // neighbor minimum: label(dst) pulled across each edge to src
      val neighborMin = edges
        .join(labels.select(col("node").as("dst"), col("label").as("dlabel")), "dst")
        .groupBy(col("src").as("node"))
        .agg(min("dlabel").as("nlabel"))
      // Convergence check rides the checkpoint job itself: observe() folds
      // the changed-label count into the round's materialization (metrics
      // accumulate during execution), so each round runs ONE job instead of
      // checkpoint + a separate count() action over the checkpointed blocks.
      val obs = new org.apache.spark.sql.Observation(s"cc-changed-$round")
      val next = labels
        .join(neighborMin, Seq("node"), "left")
        .select(
          col("node"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"),
          col("label").as("prev"))
        .observe(obs, sum(when(col("label") < col("prev"), 1L).otherwise(0L)).as("changed"))
        .localCheckpoint(true) // truncate per-round lineage growth
      changed = Option(obs.get("changed")).map(_.asInstanceOf[Long]).getOrElse(0L)
      retired ::= labels
      labels = next
      round += 1
    }
    if (changed > 0) {
      (labels :: edges :: retired).foreach(
        org.apache.spark.sql.graftshim.GraftSessions.unpersistLocalCheckpoint)
      throw new IllegalStateException(
        s"connected components did not converge in $maxRounds rounds " +
          "(graph diameter exceeds the bound; raise maxRounds or switch " +
          "to large-star/small-star rounds)")
    }
    // Flush the converged labels through the index store and release
    // EVERY checkpoint (rounds, edges, final) — the caller's terminal
    // action reads parquet, and the loop leaves nothing pinned in the
    // block manager.
    val out = Materialize.index(labels.select("node", "label"), "components")
    (labels :: edges :: retired).foreach(
      org.apache.spark.sql.graftshim.GraftSessions.unpersistLocalCheckpoint)
    out
  }

  /** Connected components by alternating large-star/small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the adversarial-diameter path. Where plain label
    * propagation needs diameter rounds (a 10⁶-node chain = 10⁶ rounds),
    * star rounds contract the graph in O(log² n): large-star hangs every
    * larger neighbor under the neighborhood minimum, small-star re-hangs
    * the smaller ones, and the fixed point is a star per component whose
    * center is the component minimum.
    *
    * Per round: one groupBy-min + one join per star phase — the same
    * two-shuffle primitives as label propagation, so the scale story is
    * identical per round; only the ROUND COUNT changes class. Use this
    * for graphs whose diameter is not known to be shallow; near-dup
    * graphs (shallow, dense) converge faster under [[connectedComponents]].
    */
  def connectedComponentsStar(pairs: DataFrame, maxRounds: Int = 40): DataFrame = {
    val spark = pairs.sparkSession
    import org.apache.spark.sql.graftshim.GraftSessions.unpersistLocalCheckpoint

    def star(edges: DataFrame, large: Boolean): DataFrame = {
      // neighborhoods from both directions + self, so the minimum m(u) is
      // over Γ(u) ∪ {u}
      val neigh = edges.select(col("src").as("u"), col("dst").as("v"))
        .union(edges.select(col("dst").as("u"), col("src").as("v")))
      val mins = neigh.groupBy("u")
        .agg(least(min("v"), col("u")).as("m"))
      val withM = neigh.join(mins, "u")
      // large-star(u): strictly larger neighbors hang under m(u);
      // small-star(u): v ∈ Γ(u) ∪ {u} with v ≤ u hang under m(u) — u's
      // own (u, m) edge is what keeps u attached when all its neighbors
      // are smaller (paper Algorithm 3)
      val rehung =
        if (large) withM.filter(col("v") > col("u"))
          .select(col("v").as("src"), col("m").as("dst"))
        else withM.filter(col("v") <= col("u"))
          .select(col("v").as("src"), col("m").as("dst"))
          .union(mins.select(col("u").as("src"), col("m").as("dst")))
      rehung.filter(col("src") =!= col("dst")).distinct()
    }

    // Fixed point: the edge set stopped changing. The per-round check
    // rides the checkpoint job itself via observe() — a (count, xor-hash)
    // signature of the DISTINCT edge set (XOR: order-independent and
    // overflow-free under ANSI). A signature change proves not-converged
    // with ZERO extra actions; only a signature MATCH pays the one exact
    // exceptAll confirmation (normally just the final round), so
    // exactness is preserved — a hash collision can never declare a false
    // fixed point, only cost one wasted job. The INITIAL edge set seeds
    // the signature from its own checkpoint job, so an already-star input
    // converges at round 0 (not after a wasted extra round).
    def sigOf(obs: org.apache.spark.sql.Observation): (Long, Long) = (
      Option(obs.get("n")).map(_.asInstanceOf[Long]).getOrElse(0L),
      Option(obs.get("sig")).map(_.asInstanceOf[Long]).getOrElse(0L))
    def signed(df: DataFrame, obs: org.apache.spark.sql.Observation): DataFrame =
      df.observe(obs,
        count(lit(1)).as("n"),
        expr("bit_xor(xxhash64(src, dst))").as("sig"))

    val obs0 = new org.apache.spark.sql.Observation("star-sig-init")
    var edges = signed(pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct(), obs0)
      .localCheckpoint(true)
    var prevSig: Option[(Long, Long)] = Some(sigOf(obs0))
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val obs = new org.apache.spark.sql.Observation(s"star-sig-$round")
      val next = signed(star(star(edges, large = true), large = false), obs)
        .localCheckpoint(true)
      val sig = sigOf(obs)
      converged = prevSig.contains(sig) && next.exceptAll(edges).isEmpty
      prevSig = Some(sig)
      val old = edges
      edges = next
      unpersistLocalCheckpoint(old)
      round += 1
    }
    if (!converged) {
      unpersistLocalCheckpoint(edges)
      throw new IllegalStateException(
        s"star rounds did not converge in $maxRounds rounds")
    }
    // fixed point is a star per component: every src hangs directly under
    // its component minimum; add the centers themselves
    val labels = edges.select(col("src").as("node"), col("dst").as("label"))
      .union(edges.select(col("dst").as("node"), col("dst").as("label")))
      .distinct()
    val out = Materialize.index(labels, "components-star")
    unpersistLocalCheckpoint(edges)
    out
  }

  /** PageRank over the undirected near-dup pair graph — graph-centrality
    * document importance (a hub re-posted everywhere outranks its
    * copies; the downstream keeper policy can prefer it). `rounds`
    * synchronous iterations of
    * `rank' = 0.15 + 0.85 · Σ_in rank/deg`.
    *
    * Scale shape: textbook distributed PageRank — the bidirectional
    * edge table materializes once, rank is a node-sized table, each
    * round is one edge⋈rank join plus a partial-aggregated groupBy on
    * the destination (2 shuffles/round), and the per-round parquet cut
    * keeps the plan linear in rounds (the [[graft.ops.Bpe]] /
    * [[connectedComponents]] loop discipline). Nothing collects.
    * Returns (id, deg, rank) for every node of the pair graph.
    *
    * Determinism: the per-edge contribution is rounded to 8 dp and
    * lifted to a FIXED-POINT long (× 1e8) before the aggregate, so the
    * per-node sum is integer arithmetic — exactly associative, immune
    * to Spark's nondeterministic partial-agg ordering AND bit-equal to
    * any other engine summing the same contributions in any order. An
    * iterated float sum was the one place the repo's defensive-round
    * convention could still flip an ulp across engines and compound it
    * round-over-round; integer summation closes that without giving up
    * the map-side combine (the collect_list/sort-agg alternative
    * would). The oracle's unrolled CTEs apply the identical lift. */
  def pageRank(pairs: DataFrame, rounds: Int = 3): DataFrame = {
    val edges = Materialize.index(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .distinct(), "pr-edges")
    val deg = Materialize.index(
      edges.groupBy("src").agg(count(lit(1)).as("deg")), "pr-deg")
    var rank = deg.select(col("src").as("id"), lit(1.0).as("rank"))
    for (r <- 1 to rounds) {
      val next = edges
        .join(rank.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst"),
          // 8-dp contribution as fixed-point long: round(x,8)*1e8 is
          // within an ulp of an integer, so the 0-dp round + cast is
          // exact and the downstream sum is order-independent.
          round(round(col("rank") / col("deg"), 8) * lit(1e8), 0)
            .cast("long").as("cfx"))
        .groupBy("dst")
        .agg(round(lit(0.15) + lit(0.85) * (sum("cfx").cast("double") / lit(1e8)), 8)
          .as("rank"))
        .select(col("dst").as("id"), col("rank"))
      rank = Materialize.index(next, s"pr-round$r")
    }
    rank.join(deg.withColumnRenamed("src", "id"), "id")
      .select(col("id"), col("deg").cast("long").as("deg"),
        round(col("rank"), 4).as("rank"))
  }

  /** Triangle enumeration over an undirected pair graph — the classic
    * degree-ordered orientation (Latapy's compact-forward; Suri &
    * Vassilvitskii's MR partition pattern, WWW'11): every edge is
    * oriented from its (deg, id)-smaller endpoint, wedges form by
    * self-joining the oriented adjacency on the source, and a wedge
    * (u; v, w) closes iff the oriented edge v→w exists. Each triangle
    * is emitted exactly once, anchored at its order-minimal vertex.
    *
    * Scale shape: orientation caps out-degree at O(√m), so the wedge
    * join generates O(m^{3/2}) candidates TOTAL — the celebrity node
    * that makes the naive neighbor self-join Σ deg² ≈ deg(hub)²
    * contributes only its forward edges here. The oriented edge list
    * materializes once and feeds both wedge sides and the closure
    * semi-join; degrees ride along the edges so the wedge ordering
    * needs no extra join. Returns one (a, b, c) row per triangle,
    * ids ascending within the row. */
  def triangles(pairs: DataFrame): DataFrame = {
    // the bidirectional edge list materializes once: deg and base both
    // consume it, and the pair SOURCE may be an expensive lineage (an
    // unmaterialized candidate join would otherwise recompute per branch)
    val und = Materialize.index(
      pairs.select(col("id_a").as("x"), col("id_b").as("y"))
        .unionAll(pairs.select(col("id_b"), col("id_a")))
        .distinct(), "tri-und")
    val deg = und.groupBy("x").agg(count(lit(1)).as("deg"))
    val base = und.filter(col("x") < col("y"))
      .join(deg.withColumnRenamed("deg", "dx"), "x")
      .join(deg.select(col("x").as("y"), col("deg").as("dy")), "y")
    val fwd = base
      .filter(col("dx") < col("dy") || (col("dx") === col("dy") && col("x") < col("y")))
      .select(col("x").as("src"), col("y").as("dst"), col("dy").as("ddst"))
    val rev = base
      .filter(col("dx") > col("dy") || (col("dx") === col("dy") && col("x") > col("y")))
      .select(col("y").as("src"), col("x").as("dst"), col("dx").as("ddst"))
    val oriented = Materialize.index(fwd.unionAll(rev), "tri-oriented")
    val wedges = oriented.select(col("src"), col("dst").as("v"), col("ddst").as("dv"))
      .join(oriented.select(col("src"), col("dst").as("w"), col("ddst").as("dw")), "src")
      .filter(col("dv") < col("dw") || (col("dv") === col("dw") && col("v") < col("w")))
    wedges
      .join(oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
      .select(sort_array(array(col("src"), col("v"), col("w"))).as("t"))
      .select(col("t")(0).as("a"), col("t")(1).as("b"), col("t")(2).as("c"))
  }

  /** Local clustering coefficient per node: 2·tri(v) / (deg(v)·(deg(v)−1))
    * for deg ≥ 2 — how close each node's neighborhood is to a clique.
    * On a near-dup graph, high coefficient = a coherent mutual-similarity
    * group; low = a hub stitching unrelated docs (an LSH false-positive
    * smell). Composes [[triangles]] (each emitted triangle increments
    * its three corners via a bounded ×3 explode) with the degree table;
    * the division is exact integer → one deterministic round. Returns
    * (doc_id, deg, tri_cnt, coeff). */
  def clusteringCoefficient(pairs: DataFrame): DataFrame = {
    // cut the (possibly expensive) pair lineage once; both the degree
    // table and the triangle kernel read the parquet copy
    val p = Materialize.index(pairs.select("id_a", "id_b"), "cc-pairs")
    val und = p.select(col("id_a").as("x"), col("id_b").as("y"))
      .unionAll(p.select(col("id_b"), col("id_a")))
      .distinct()
    val deg = und.groupBy("x").agg(count(lit(1)).as("deg"))
    val triCnt = triangles(p)
      .select(explode(array(col("a"), col("b"), col("c"))).as("x"))
      .groupBy("x").agg(count(lit(1)).as("tri_cnt"))
    deg.filter(col("deg") >= 2)
      .join(triCnt, Seq("x"), "left")
      .select(col("x").as("doc_id"), col("deg").cast("long").as("deg"),
        coalesce(col("tri_cnt"), lit(0L)).cast("long").as("tri_cnt"),
        round(lit(2.0) * coalesce(col("tri_cnt"), lit(0L)) /
          (col("deg") * (col("deg") - lit(1))), 4).as("coeff"))
  }

  /** k-core of the undirected pair graph — the maximal subgraph in which
    * every node keeps degree ≥ `k` — by iterative peeling (Batagelj &
    * Zaveršnik's algorithm, distributed form): each round drops nodes
    * below the degree bar and restricts the edge list to survivors,
    * until nothing peels. On a near-dup graph this is the standard
    * hygiene cut: LSH false-positive tendrils and pendant chains fall
    * out, genuinely mutually-similar groups survive.
    *
    * Loop discipline as [[connectedComponents]]: the per-round edge
    * list cuts to parquet ([[Materialize.index]]), each round is two
    * bounded shuffles (degree partial-agg + survivor semi-joins),
    * convergence reads the materialized count (parquet metadata, no
    * recompute), nothing collects. Peeling is MONOTONE — once converged,
    * further rounds are no-ops — which is exactly the property that
    * lets the oracle replay it as a fixed generous unroll. Returns
    * (doc_id, core_deg) for every surviving node. */
  def kCore(pairs: DataFrame, k: Int, maxRounds: Int = 20): DataFrame = {
    var edges = Materialize.index(
      pairs.select(col("id_a").as("x"), col("id_b").as("y"))
        .unionAll(pairs.select(col("id_b"), col("id_a")))
        .distinct(), "kcore-edges0")
    var size = edges.count()
    var removed = 1L
    var round = 0
    while (removed > 0 && round < maxRounds) {
      round += 1
      val keep = edges.groupBy("x").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("x")
      val next = Materialize.index(
        edges.join(keep, "x")
          .join(keep.withColumnRenamed("x", "y"), "y")
          .select("x", "y"), s"kcore-edges$round")
      val nextSize = next.count()
      removed = size - nextSize
      size = nextSize
      edges = next
    }
    // same contract as connectedComponents: a partially-peeled edge list
    // is NOT a k-core — refuse rather than return wrong membership (a
    // long pendant chain peels one layer per round, so depth can exceed
    // any fixed bound on adversarial inputs)
    if (removed > 0)
      throw new IllegalStateException(
        s"k-core peeling did not converge in $maxRounds rounds " +
          "(pendant-chain depth exceeds the bound; raise maxRounds)")
    edges.groupBy("x").agg(count(lit(1)).cast("long").as("core_deg"))
      .select(col("x").as("doc_id"), col("core_deg"))
  }

  /** Cluster assignment for a dup-pair list: (`doc_id`, `cluster`,
    * `csize`) per clustered document, cluster = min doc id in the
    * component, csize = component size. The downstream cleanse keeps
    * `doc_id == cluster` rows and drops the rest. */
  def dupClusters(pairs: DataFrame): DataFrame =
    assignments(connectedComponents(pairs))

  /** [[dupClusters]] over the star-contraction rounds — same contract,
    * choose it when the pair graph's diameter is not known to be shallow. */
  def dupClustersStar(pairs: DataFrame): DataFrame =
    assignments(connectedComponentsStar(pairs))

  /** INCREMENTAL component maintenance: fold a delta edge batch into a
    * materialized (doc_id, cluster) assignment WITHOUT re-running the
    * closure over the full graph — the append-only-lake form of
    * [[dupClusters]], the [[graft.ops.Retrieval.mergeIndex]] contract
    * applied to the dedup graph.
    *
    * Min-label components compose: a delta edge can only MERGE existing
    * clusters (or attach new nodes), and the merged label is the min of
    * the member clusters' labels — which is exactly the old graph's
    * global min over the union. So: lift delta edges to CLUSTER-id
    * edges through the standing assignment (new nodes become singleton
    * clusters first), run the closure on that contracted graph — sized
    * by the DELTA, not the corpus — and relabel by one cluster-keyed
    * join. History is touched only as (id → cluster) lookups and the
    * final relabel join; document text, signatures, and the old pair
    * list never re-derive.
    *
    * Returns the updated (doc_id, cluster) for every node in
    * comp ∪ delta — row-identical to [[connectedComponents]] over the
    * union of all edges ever seen (property-pinned). */
  def mergeClusters(comp: DataFrame, deltaPairs: DataFrame): DataFrame = {
    val base = comp.select(col("doc_id"), col("cluster"))
    val deltaNodes = deltaPairs.select(col("id_a").as("doc_id"))
      .union(deltaPairs.select(col("id_b").as("doc_id")))
      .distinct()
    val newNodes = deltaNodes.join(base, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster"))
    val all = Materialize.index(base.unionByName(newNodes), "merge-comp")
    val clusterEdges = deltaPairs
      .join(all.select(col("doc_id").as("id_a"), col("cluster").as("ca")), "id_a")
      .join(all.select(col("doc_id").as("id_b"), col("cluster").as("cb")), "id_b")
      .filter(col("ca") =!= col("cb"))
      .select(least(col("ca"), col("cb")).as("id_a"),
        greatest(col("ca"), col("cb")).as("id_b"))
      .distinct()
    val superLabels = connectedComponents(clusterEdges)
      .select(col("node").as("cluster"), col("label"))
    all.join(superLabels, Seq("cluster"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("cluster")).as("cluster"))
  }

  private def assignments(labels: DataFrame): DataFrame = {
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("csize"))
    labels.join(sizes, "label")
      .select(col("node").as("doc_id"), col("label").as("cluster"), col("csize"))
  }

  /** Quality-aware keeper selection: within each near-dup cluster keep
    * the member from the BEST source (lowest priority rank), not the
    * lowest id — production dedup prefers the curated copy of a page
    * over the scraped one. Tie-break inside a rank is doc id, so the
    * choice is total-ordered and engine-reproducible.
    *
    * Scale shape: `members` is (docCol, clusterCol) plus whatever the
    * caller carries; `priorities` is a tiny (sourceCol, rank) dimension
    * that BROADCASTS; the argmin is one min-of-struct partial aggregate
    * on the cluster key joined back to the members — two bounded
    * shuffles on cluster, no windows over data-sized partitions.
    * Returns every member row + (keeper, is_keeper). */
  /** Keeper argmin as a hash-combinable aggregate: the doc id with the
    * LARGEST `key` (callers negate for min-rank semantics), ties to
    * the LOWEST doc id — [[graft.functions.ArgMaxLong]] with
    * preferLowValue, bit-identical to the min-of-struct forms. */
  private def argminDoc(docCol: String, key: org.apache.spark.sql.Column,
      nanSmallest: Boolean = false): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftshim.ColumnExpr
    ColumnExpr.column(graft.functions.ArgMaxLong(
      ColumnExpr.expr(col(docCol).cast("long")),
      ColumnExpr.expr(key),
      preferLowValue = true,
      nanSmallest = nanSmallest).toAggregateExpression())
  }

  def priorityKeepers(
      members: DataFrame,
      priorities: DataFrame,
      docCol: String = "doc_id",
      clusterCol: String = "cluster",
      sourceCol: String = "source",
      rankCol: String = "rank"): DataFrame = {
    val ranked = members.join(broadcast(priorities), Seq(sourceCol))
    // hash-combinable argmin (max of -rank, ties to the LOWEST doc id
    // — exactly min(struct(rank, doc))): a struct extremum plans as
    // SortAggregate and sorts the corpus-sized member stream; the
    // 17-byte [[graft.functions.ArgMaxLong]] buffer keeps the partial
    // aggregate map-side (rank is a small integer — exact as double)
    val keepers = ranked.groupBy(clusterCol)
      .agg(argminDoc(docCol, (-col(rankCol)).cast("double"),
        // negated key: a NaN rank must LOSE, as under min(struct(rank, doc))
        nanSmallest = true).as("keeper"))
    ranked.join(keepers, clusterCol)
      .withColumn("is_keeper", col(docCol) === col("keeper"))
  }

  /** Importance-aware keeper selection: within each near-dup cluster keep
    * the member with the HIGHEST per-document rank — e.g. [[pageRank]]
    * importance over the pair graph, so the most-referenced copy
    * survives dedup instead of an arbitrary lowest id. Tie-break inside
    * a rank is lowest doc id (total order, engine-reproducible).
    *
    * Scale shape: `ranks` is doc-keyed like `members`, so their join
    * co-shuffles on the doc id; the argmax is one min-of-struct partial
    * aggregate on the cluster key (rank negated so min ≡ max-rank with
    * min-id tiebreak) joined back to the members — two bounded shuffles,
    * no windows over data-sized partitions, nothing collects. */
  def rankKeepers(
      members: DataFrame,
      ranks: DataFrame,
      docCol: String = "doc_id",
      clusterCol: String = "cluster",
      rankCol: String = "rank"): DataFrame = {
    val ranked = members.join(ranks, Seq(docCol))
    // max rank, ties to the LOWEST doc id — exactly
    // min(struct(-rank, doc)), hash-combinable (see priorityKeepers)
    val keepers = ranked.groupBy(clusterCol)
      .agg(argminDoc(docCol, col(rankCol).cast("double")).as("keeper"))
    ranked.join(keepers, clusterCol)
      .withColumn("is_keeper", col(docCol) === col("keeper"))
      .select(col(docCol), col(clusterCol), col(rankCol), col("keeper"), col("is_keeper"))
  }

  /** Newman modularity of a node partition on an undirected pair graph:
    * per community c, Q_c = e_c/m − (d_c/2m)², where e_c = intra-community
    * edges, d_c = summed degree of c's members, m = |edges|; Q = Σ Q_c.
    * Measures whether the partition's groups are denser than a random
    * graph with the same degrees — the quality score for ANY community
    * assignment (labels, cluster closures, business taxonomies) on ANY
    * similarity graph, and near 0 for a partition orthogonal to the
    * graph's structure.
    *
    * Scale shape: two keyed joins attach each edge endpoint's community
    * (the partition table is node-keyed — broadcast if small, hash join
    * if not), then everything reduces through partial-aggregated
    * groupBys on the community key plus one 1-row m scalar broadcast.
    * No windows, nothing collects.
    *
    * `pairs` columns (id_a, id_b); `partition` columns (nodeCol,
    * communityCol). Nodes absent from the partition table drop out of
    * BOTH e_c and d_c (their edges still count in m). Returns one row
    * per community: (communityCol, intra_edges, degree_sum,
    * contribution) — Q = sum(contribution). */
  def modularity(
      pairs: DataFrame,
      partition: DataFrame,
      nodeCol: String,
      communityCol: String): DataFrame = {
    val m = pairs.agg(count(lit(1)).as("m"))
    val ca = partition.select(col(nodeCol).as("id_a"), col(communityCol).as("_ca"))
    val cb = partition.select(col(nodeCol).as("id_b"), col(communityCol).as("_cb"))
    val tagged = pairs.join(ca, "id_a").join(cb, "id_b")
    val intra = tagged.filter(col("_ca") === col("_cb"))
      .groupBy(col("_ca").as(communityCol))
      .agg(count(lit(1)).as("intra_edges"))
    val deg = tagged
      .select(col("_ca").as(communityCol))
      .unionByName(tagged.select(col("_cb").as(communityCol)))
      .groupBy(communityCol)
      .agg(count(lit(1)).as("degree_sum"))
    deg
      .join(intra, Seq(communityCol), "left")
      .withColumn("intra_edges", coalesce(col("intra_edges"), lit(0L)))
      .crossJoin(broadcast(m))
      .withColumn("contribution", round(
        col("intra_edges").cast("double") / col("m") -
          pow(col("degree_sum").cast("double") / (lit(2.0) * col("m")), 2.0), 6))
      .select(col(communityCol), col("intra_edges"), col("degree_sum"),
        col("contribution"))
  }
}
