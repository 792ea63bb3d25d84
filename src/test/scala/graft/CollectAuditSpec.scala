package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Source-level driver-funnel audit, the static sibling of
  * PlanAuditSpec's plan checks: a `.collect()` in an operator means
  * the data funnels through the driver and the operator is not
  * distributed. The ONLY legitimate collects are metadata-sized
  * broadcast preparation (a query set, a PQ codebook, k centroids —
  * all closed over by executor-side kernels afterwards). Those sites
  * are allowlisted per file WITH A COUNT so a new collect anywhere —
  * including in an allowlisted file — fails CI and forces the author
  * to justify it here.
  */
class CollectAuditSpec extends AnyFunSuite {

  private val Funnels = Seq(".collect()", ".collectAsList()", ".toLocalIterator")

  // file -> allowed occurrence count (all metadata-sized broadcast prep:
  // query set SimilarityQueries.scala:374, PQ codebook :547, IVFPQ
  // residual codebook (16 vectors, sim_topk_ivfpq), k-means centroids,
  // and dedup_semantic's 8 seed centroids (r18) — each tiny and closed
  // over by compiled kernels)
  private val Allow = Map(
    "src/main/scala/graft/ops/SimilarityQueries.scala" -> 5,
    // f15_provenance_roundtrip: the processing audit log IS the
    // metadata (one provenance JSON object per layer, like the
    // reference's commit_provenance) — collected to write that one
    // small driver-side file
    "src/main/scala/graft/ops/MetaQueries.scala" -> 1)

  test("no .collect()/toLocalIterator outside allowlisted metadata-sized sites") {
    val root = Paths.get("src/main/scala/graft")
    val hits = Files.walk(root).iterator.asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map { p =>
        val text = Files.readString(p)
        val n = Funnels.map { f =>
          var c = 0; var i = text.indexOf(f)
          while (i >= 0) { c += 1; i = text.indexOf(f, i + 1) }
          c
        }.sum
        p.toString -> n
      }
      .filter(_._2 > 0).toMap
    val bad = hits.filter { case (f, n) => Allow.getOrElse(f, 0) < n }
    assert(bad.isEmpty,
      s"unallowlisted driver funnels (collect/toLocalIterator): $bad — " +
        "either make the operator distributed or, if the collect is " +
        "genuinely metadata-sized broadcast prep, add it to Allow with " +
        "a justification comment")
  }
}
