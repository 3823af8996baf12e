package graft.frontend

import graft.SparkFixture
import graft.schema._
import graft.sources._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.io.{ByteArrayOutputStream, PrintStream}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpResponse.BodyHandlers

/** The FAIR-scheduling precondition is OWNED BY THE PRODUCT, not the
  * test fixture: every server boot checks the context's scheduler mode
  * and a FIFO deployment gets a loud named warning + an observable
  * metric (`spark.scheduler.mode` is static — the scheduler picked its
  * mode at context creation, so detection is all a boot can do).
  *
  * One SparkContext per JVM means a real FIFO context can't exist next
  * to the FAIR fixture; the FIFO case swaps the documented
  * [[ServingFairness.modeOf]] seam and restores it. */
class ServingFairnessSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkFixture.spark
  import scala.jdk.CollectionConverters._

  private val registry = SchemaRegistry(
    Org("orgf", Seq(Metric("mf", "fmetric", Seq(Field("v", FieldType.LONG))))))

  private lazy val sources: SourceSet = {
    val dir = SparkFixture.tempDir("fairness")
    val schema = StructType(Seq(
      StructField("companykey", StringType), StructField("metrictype", StringType),
      StructField("timestamp", LongType), StructField("v", LongType)))
    spark.createDataFrame(Seq(Row("orgf", "mf", 10L, 1L)).asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/0/parquet/orgf/mf")
    SourceSet(fs = Seq(FsSource("parquet", dir)))
  }

  private def withMode[A](mode: String)(f: => A): A = {
    val prev = ServingFairness.modeOf
    ServingFairness.modeOf = _ => mode
    try f finally ServingFairness.modeOf = prev
  }

  private def capturingErr[A](f: => A): (A, String) = {
    val buf = new ByteArrayOutputStream()
    val prev = System.err
    System.setErr(new PrintStream(buf, true))
    val a = try f finally System.setErr(prev)
    (a, buf.toString)
  }

  test("booting a server on a FIFO context warns loudly and bumps the metric") {
    val metrics = new ServingMetrics
    val ((), err) = capturingErr {
      withMode("FIFO") {
        val s = new GraftHttpServer(
          key => TenantSession.open(spark, registry, key, sources),
          engine = Some(spark), metrics = metrics)
        s.stop()
      }
    }
    metrics.counter("serving.scheduler_not_fair") shouldBe 1L
    err should include("WARN GraftHttpServer")
    err should include("spark.scheduler.mode=FIFO")
    err should include("FAIR")
    err should include("graft-fairscheduler.xml")
  }

  test("booting on the FAIR fixture context is silent (real conf, no seam)") {
    val metrics = new ServingMetrics
    val ((), err) = capturingErr {
      val s = new GraftHttpServer(
        key => TenantSession.open(spark, registry, key, sources),
        engine = Some(spark), metrics = metrics)
      s.stop()
    }
    metrics.counter("serving.scheduler_not_fair") shouldBe 0L
    err should not include "scheduler_not_fair"
    err should not include "WARN GraftHttpServer"
    // and the check itself agrees with the fixture conf
    ServingFairness.ensureFair(spark, "spec", metrics) shouldBe true
  }

  test("engine-less server checks at the FIRST tenant session, once") {
    val metrics = new ServingMetrics
    val client = HttpClient.newHttpClient()
    val (resp, err) = capturingErr {
      withMode("FIFO") {
        val s = new GraftHttpServer(
          key => TenantSession.open(spark, registry, key, sources),
          engine = None, metrics = metrics)
        try {
          def hit() = client.send(
            HttpRequest.newBuilder(
              URI.create(s"http://127.0.0.1:${s.boundPort}/v1/metadata/schemas"))
              .header("X-Api-Key", "orgf").GET().build(),
            BodyHandlers.ofString())
          val first = hit(); hit() // second request must NOT re-warn
          first
        } finally s.stop()
      }
    }
    resp.statusCode() shouldBe 200
    metrics.counter("serving.scheduler_not_fair") shouldBe 1L
    err should include("WARN GraftHttpServer")
  }

  test("avatica boot on a FIFO context warns with its own server name") {
    val metrics = new ServingMetrics
    val ((), err) = capturingErr {
      withMode("FIFO") {
        val s = new GraftAvaticaServer(
          key => TenantSession.open(spark, registry, key, sources),
          engine = Some(spark), metrics = metrics)
        s.stop()
      }
    }
    metrics.counter("serving.scheduler_not_fair") shouldBe 1L
    err should include("WARN GraftAvaticaServer")
  }
}
