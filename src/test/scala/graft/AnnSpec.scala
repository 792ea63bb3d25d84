package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.ops.SimilarityQueries

/** ANN quality gate: the LSH top-k path must recall a healthy fraction
  * of the exact brute-force top-k (image of the reference's promise
  * that approximate search is a faster view of the same neighborhood,
  * not a different answer). Recall here is deterministic — the
  * hyperplanes are fixed — so this is a regression test, not a flake.
  */
class AnnSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  private def topkSet(name: String): Map[Long, Set[Long]] =
    SimilarityQueries.queries(name).fn(spark, sfDir)
      .select("qid", "cid").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet
      }

  test("sim_topk_lsh recalls >= 60% of brute-force top-5 on average") {
    val exact = topkSet("sim_topk_bruteforce")
    val approx = topkSet("sim_topk_lsh")
    assert(exact.keySet == approx.keySet,
      "LSH path must produce results for every query id")
    val recalls = exact.map { case (q, ex) =>
      (approx(q) & ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@5 = $mean%.3f over ${recalls.size} queries")
    assert(mean >= 0.60, f"mean recall@5 $mean%.3f below 0.60")
  }

  test("sim_topk_ivf produces full result sets with nonzero recall") {
    val exact = topkSet("sim_topk_bruteforce")
    val ivf = topkSet("sim_topk_ivf")
    assert(exact.keySet == ivf.keySet,
      "IVF path must produce results for every query id")
    // near-random synthetic embeddings spread neighbors across cells,
    // so 2-of-10-cell probing bounds recall well below LSH's — gate on
    // structural sanity (full top-5 lists, some overlap overall)
    assert(ivf.values.forall(_.size == 5))
    val totalOverlap = exact.map { case (q, ex) => (ivf(q) & ex).size }.sum
    info(s"IVF total top-5 overlap with exact = $totalOverlap / ${5 * exact.size}")
    assert(totalOverlap > 0, "IVF found no exact neighbors at all")
  }

  test("sim_topk_pq recalls a meaningful share of brute-force top-5") {
    val exact = topkSet("sim_topk_bruteforce")
    val pq = topkSet("sim_topk_pq")
    assert(exact.keySet == pq.keySet,
      "PQ path must produce results for every query id")
    assert(pq.values.forall(_.size == 5))
    // 16-entry seed codebooks on near-random 64-d vectors are a coarse
    // quantizer; gate that the ADC ordering still concentrates real
    // neighbors far above chance (random 20-of-N candidates would put
    // ~0.2 of the exact top-5 in the re-rank pool at N=500)
    val recalls = exact.map { case (q, ex) => (pq(q) & ex).size.toDouble / ex.size }
    val mean = recalls.sum / recalls.size
    info(f"PQ mean recall@5 = $mean%.3f over ${recalls.size} queries")
    assert(mean >= 0.20, f"PQ mean recall@5 $mean%.3f below 0.20")
  }
}
