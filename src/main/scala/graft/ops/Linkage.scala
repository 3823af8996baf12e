package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage (Fellegi–Sunter style, the
  * Newcombe blocking tradition): find records that DESCRIBE THE SAME
  * REAL-WORLD ENTITY despite differing field values — the catalog-dedup
  * cousin of the document near-dup family, operating on structured
  * attributes instead of text shingles.
  *
  * The classic three-stage shape, each stage a keyed DataFrame op:
  *
  *   1. BLOCKING — candidate pairs only within records sharing a cheap
  *      key. Multiple passes with DIFFERENT keys union'd (the standard
  *      recall defense: one dirty field must not hide a true match),
  *      deduped before scoring. Never an all-pairs product: candidate
  *      volume is Σ_blocks |block|², bounded by key granularity — the
  *      scale knob, and a hot block is AQE's skew-join case.
  *   2. SCORING — a deterministic weighted agreement score over field
  *      comparisons (equality, absolute-difference similarity). Pure
  *      projection on the pair stream.
  *   3. CLUSTERING — transitive closure of above-threshold matches via
  *      [[Cluster.connectedComponents]]; the entity id is the
  *      component's min record id.
  *
  * Demonstrated over the TPC-H `part` catalog: same-noun listings with
  * agreeing type/brand/adjective/size are "the same product". */
object Linkage {

  /** Scored candidate pairs (id_a < id_b, score ≥ threshold).
    *
    * Blocking passes: (name noun, size) and (name noun, brand) — two
    * different "cheap key" views of the record, union'd then deduped.
    * Score = 0.4·[type =] + 0.3·[brand =] + 0.2·[adjective =]
    *       + 0.1·(1 − |Δsize|/50), rounded to 4 dp (engine-exact: all
    * components are integer comparisons and one exact division). */
  def candidatePairs(
      parts: DataFrame,
      threshold: Double = 0.9): DataFrame = {
    val recs = Materialize.index(
      parts.select(
        col("p_partkey").as("id"),
        expr("split_part(p_name, ' ', 1)").as("adj"),
        expr("element_at(split(p_name, ' '), -1)").as("noun"),
        col("p_brand").as("brand"),
        col("p_type").as("ptype"),
        col("p_size").as("size"),
        col("p_retailprice").as("price")),
      "er-recs")
    def pass(keys: Seq[String]): DataFrame = {
      val a = recs.select(col("id").as("id_a") +:
        recs.columns.filterNot(_ == "id").map(c => col(c).as(s"${c}_a")): _*)
      val b = recs.select(col("id").as("id_b") +:
        recs.columns.filterNot(_ == "id").map(c => col(c).as(s"${c}_b")): _*)
      a.join(b, keys.map(k => col(s"${k}_a") === col(s"${k}_b"))
        .reduce(_ && _) && col("id_a") < col("id_b"))
    }
    val cand = pass(Seq("noun", "size"))
      .unionByName(pass(Seq("noun", "brand")))
      .distinct()
    cand
      .withColumn("score", round(
        when(col("ptype_a") === col("ptype_b"), 0.4).otherwise(0.0) +
          when(col("brand_a") === col("brand_b"), 0.3).otherwise(0.0) +
          when(col("adj_a") === col("adj_b"), 0.2).otherwise(0.0) +
          lit(0.1) * (lit(1.0) -
            abs(col("size_a") - col("size_b")).cast("double") / lit(50.0)), 4))
      .filter(col("score") >= threshold)
      .select("id_a", "id_b", "score")
  }

  /** The entity table: transitive closure of [[candidatePairs]] matches;
    * per entity (min member id) the member count and catalog-price
    * spread — the "duplicate listings" report a catalog audit reads.
    * Closure cost is per-round edge shuffles on the MATCH graph
    * (output-sized), never the record table. */
  def entities(parts: DataFrame, threshold: Double = 0.9): DataFrame = {
    val pairs = Materialize.index(
      candidatePairs(parts, threshold).select("id_a", "id_b"), "er-pairs")
    val comp = Cluster.connectedComponents(pairs)
    comp
      .join(parts.select(col("p_partkey").as("node"), col("p_retailprice")),
        "node")
      .groupBy(col("label").as("entity"))
      .agg(
        count(lit(1)).as("n_members"),
        round(max("p_retailprice") - min("p_retailprice"), 2).as("price_spread"))
  }
}
