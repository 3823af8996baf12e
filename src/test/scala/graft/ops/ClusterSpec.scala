package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Connected-components label propagation over dup-pair graphs. */
class ClusterSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark
  import scala.jdk.CollectionConverters._

  private def pairs(es: (Long, Long)*) = {
    val schema = StructType(Seq(
      StructField("id_a", LongType), StructField("id_b", LongType)))
    spark.createDataFrame(es.map { case (a, b) => Row(a, b) }.asJava, schema)
  }

  private def labelMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a chain collapses to its minimum id (transitivity across hops)") {
    // 1-2, 2-3, 3-4: one component though 1 and 4 never co-occur in a pair
    val l = labelMap(Cluster.connectedComponents(pairs((1L, 2L), (2L, 3L), (3L, 4L))))
    l shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L)
  }

  test("disjoint components keep distinct labels") {
    val l = labelMap(Cluster.connectedComponents(
      pairs((1L, 2L), (5L, 6L), (6L, 7L), (10L, 11L))))
    l(1L) shouldBe 1L; l(2L) shouldBe 1L
    l(5L) shouldBe 5L; l(6L) shouldBe 5L; l(7L) shouldBe 5L
    l(10L) shouldBe 10L; l(11L) shouldBe 10L
  }

  test("label flows against edge direction too (min on the high side)") {
    // min id appears as id_b — the undirected expansion must carry it back
    val l = labelMap(Cluster.connectedComponents(pairs((9L, 1L), (9L, 5L))))
    l shouldBe Map(1L -> 1L, 5L -> 1L, 9L -> 1L)
  }

  test("a long chain converges within the round bound") {
    val chain = (1L until 20L).map(i => (i, i + 1))
    val l = labelMap(Cluster.connectedComponents(pairs(chain: _*)))
    l.values.toSet shouldBe Set(1L)
    // and an over-deep graph fails loudly instead of returning partial labels
    val e = intercept[IllegalStateException] {
      Cluster.connectedComponents(pairs(chain: _*), maxRounds = 3)
    }
    e.getMessage should include("converge")
  }

  test("dupClusters reports cluster id and size per doc") {
    val out = Cluster.dupClusters(pairs((1L, 2L), (2L, 3L), (8L, 9L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    out shouldBe Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), (8L, 8L, 2L), (9L, 8L, 2L))
  }

  test("star rounds agree with label propagation on a mixed graph") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 7L), (7L, 8L),
      (20L, 21L), (21L, 22L), (22L, 20L), (30L, 31L))
    val viaProp = labelMap(Cluster.connectedComponents(pairs(es: _*)))
    val viaStar = labelMap(Cluster.connectedComponentsStar(pairs(es: _*)))
    viaStar shouldBe viaProp
  }

  test("star rounds collapse a chain far beyond the label-prop round bound") {
    // diameter 60: label propagation needs 60 rounds (its default bound
    // throws at 25); star rounds contract in O(log^2)
    val chain = (1L until 61L).map(i => (i, i + 1))
    val l = labelMap(Cluster.connectedComponentsStar(pairs(chain: _*), maxRounds = 15))
    l.keySet.size shouldBe 61
    l.values.toSet shouldBe Set(1L)
  }

  test("an already-star input converges at round 0 (signature seeded from the input)") {
    // a canonical star (child → center edges) is its own fixed point: the
    // first double-star round reproduces it verbatim, and the seeded
    // initial signature lets maxRounds = 1 suffice — the unseeded variant
    // needed a second (wasted) round to notice
    val l = labelMap(Cluster.connectedComponentsStar(
      pairs((2L, 1L), (3L, 1L)), maxRounds = 1))
    l shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
  }

  test("star rounds release every checkpoint too") {
    val before = spark.sparkContext.getPersistentRDDs.size
    Cluster.connectedComponentsStar(pairs((1L, 2L), (2L, 3L), (5L, 6L))).collect()
    spark.sparkContext.getPersistentRDDs.size shouldBe before
  }

  test("rankKeepers keeps the highest-ranked member, lowest id on ties") {
    // star component {1,2,3,4} where 2 is the hub (highest PageRank) plus
    // a 2-cycle {10,11} whose members tie — keeper must fall to 10
    val p = pairs((1L, 2L), (2L, 3L), (2L, 4L), (10L, 11L))
    val comp = Cluster.dupClusters(p).select("doc_id", "cluster")
    val ranks = Cluster.pageRank(p).select(
      org.apache.spark.sql.functions.col("id").as("doc_id"),
      org.apache.spark.sql.functions.col("rank"))
    val got = Cluster.rankKeepers(comp, ranks).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    Materialize.dropAll()
    got(1L)._1 shouldBe 2L // hub outranks the leaves
    got(2L) shouldBe ((2L, true))
    got(3L)._1 shouldBe 2L
    got(10L) shouldBe ((10L, true)) // tie broken to the lowest id
    got(11L) shouldBe ((10L, false))
  }

  test("triangles: each emitted once, none fabricated, pendant/disjoint edges ignored") {
    // K4 on {1,2,3,4} (exactly its 4 triangles) + pendant edge (1,5) +
    // a disjoint edge (6,7) — neither may fabricate or suppress any
    val p = pairs((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (6L, 7L))
    val got = Cluster.triangles(p).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    Materialize.dropAll()
    got.length shouldBe got.toSet.size // exactly-once, not once-per-orientation
    got.toSet shouldBe Set(
      (1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L))
  }

  test("clusteringCoefficient: clique corners 1.0, bridge 0, pendant excluded") {
    // triangle {1,2,3}; node 3 also bridges to 4 (3's neighborhood is no
    // longer a clique); 4-5 pendant: 5 has deg 1 → excluded entirely
    val p = pairs((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val got = Cluster.clusteringCoefficient(p).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    Materialize.dropAll()
    got(1L) shouldBe ((2L, 1L, 1.0))
    got(2L) shouldBe ((2L, 1L, 1.0))
    got(3L) shouldBe ((3L, 1L, 0.3333)) // 1 triangle of 3 possible pairs
    got(4L) shouldBe ((2L, 0L, 0.0)) // bridge: neighbors unconnected
    got.keySet should not contain 5L
  }

  test("kCore: pendant chain peels away layer by layer, the cycle survives") {
    // triangle {1,2,3} + chain 3-5-6-7 hanging off it + isolated edge (8,9):
    // 2-core must peel the chain COMPLETELY (7 first, then 6, then 5 —
    // multi-round convergence, not one pass) and drop the lone edge
    val p = pairs((1L, 2L), (2L, 3L), (1L, 3L), (3L, 5L), (5L, 6L), (6L, 7L),
      (8L, 9L))
    val got = Cluster.kCore(p, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Materialize.dropAll()
    got shouldBe Map(1L -> 2L, 2L -> 2L, 3L -> 2L)
  }

  test("the loop releases every checkpoint (no pinned blocks left behind)") {
    // each round eagerly localCheckpoints; an unreleased round would leave
    // its RDD in the context's persistent set forever — at corpus scale
    // that's rounds × |labels| of storage the next query can't evict
    val before = spark.sparkContext.getPersistentRDDs.size
    val chain = (1L until 12L).map(i => (i, i + 1)) // several rounds to converge
    Cluster.connectedComponents(pairs(chain: _*)).collect()
    spark.sparkContext.getPersistentRDDs.size shouldBe before
  }
}
