package graft.ops

import graft.SparkFixture
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property pins for the round-8 graph kernels against brute-force
  * definitions computed naively on the driver: on ANY random graph the
  * degree-oriented wedge join must enumerate EXACTLY the 3-cliques
  * (each once), k-core peeling must land on the canonical maximal
  * subgraph (order-independent by theory — the property checks it), and
  * the clustering coefficient must equal its closed form per node. */
object GraphProps extends Properties("Graph") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(20)

  private lazy val spark = SparkFixture.spark

  // random simple undirected graphs as normalized (a < b) distinct pairs,
  // dense enough (n ≤ 14, m ≤ 40) that triangles/cores actually occur
  private val genEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(3, 14)
    m <- Gen.choose(0, 40)
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1) if a != b
    } yield (math.min(a, b).toLong, math.max(a, b).toLong))
  } yield es.distinct

  private def pairsDf(es: List[(Long, Long)]) = {
    import spark.implicits._
    es.toDF("id_a", "id_b")
  }

  private def adj(es: List[(Long, Long)]): Map[Long, Set[Long]] =
    es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }

  property("triangles = all 3-cliques, each exactly once") =
    forAll(genEdges) { es =>
      val a = adj(es)
      val nodes = a.keys.toSeq.sorted
      val brute = (for {
        i <- nodes; j <- nodes if i < j && a(i)(j)
        k <- nodes if j < k && a(i)(k) && a(j)(k)
      } yield (i, j, k)).toSet
      val got = Cluster.triangles(pairsDf(es)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      Materialize.dropAll()
      got.length == brute.size && got.toSet == brute
    }

  property("kCore(2) is the canonical 2-core: min degree ≥ 2 and maximal") =
    forAll(genEdges) { es =>
      // brute fixpoint on the driver
      var keep = adj(es)
      var changed = true
      while (changed) {
        val bad = keep.collect { case (v, ns) if ns.count(keep.contains) < 2 => v }.toSet
        changed = bad.nonEmpty
        keep = keep -- bad
      }
      val brute = keep.map { case (v, ns) => v -> ns.count(keep.contains).toLong }
        .filter(_._2 > 0)
      val got = Cluster.kCore(pairsDf(es), k = 2).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      Materialize.dropAll()
      got == brute
    }

  property("clusteringCoefficient matches the closed form on every deg≥2 node") =
    forAll(genEdges) { es =>
      val a = adj(es)
      val brute = a.collect { case (v, ns) if ns.size >= 2 =>
        val tri = ns.toSeq.combinations(2).count { case Seq(x, y) => a(x)(y) }
        v -> ((ns.size.toLong, tri.toLong,
          math.rint(2.0 * tri / (ns.size * (ns.size - 1)) * 1e4) / 1e4))
      }
      val got = Cluster.clusteringCoefficient(pairsDf(es)).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      Materialize.dropAll()
      got == brute
    }

  property("mergeClusters(base, delta) ≡ full closure for ANY base/delta split") =
    forAll(genEdges, org.scalacheck.Gen.choose(0, 99)) { (es, seed) =>
      import org.apache.spark.sql.functions.col
      val (base, delta) = es.partition(e => (e._1 + e._2 + seed) % 3 != 0)
      val comp0 = Cluster.connectedComponents(pairsDf(base))
        .select(col("node").as("doc_id"), col("label").as("cluster"))
      val merged = Cluster.mergeClusters(comp0, pairsDf(delta))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val full = Cluster.connectedComponents(pairsDf(es))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      Materialize.dropAll()
      merged == full
    }
}
