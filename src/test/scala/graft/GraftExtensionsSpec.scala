package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.core.{Morton, MurmurHash3_128, Vec3}
import graft.functions.ContainsGateRule

/** The production one-liner: a session built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` must carry
  * the full graft SQL surface (codegen'd Catalyst functions) AND the
  * P6 contains-gate optimizer rule — with zero imperative
  * register()/install() calls. Guards the config path the library
  * README advertises; the imperative path is covered by
  * MortonExprSpec/GateRuleSpec.
  */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    // extensions apply only at session CONSTRUCTION: drop whatever
    // session an earlier suite left as default so getOrCreate builds
    // a genuinely fresh one with the extension class
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("graft functions are callable from pure SQL via the extension") {
    val r = spark.sql(
      "SELECT graft_morton(1L, 2L, 3L, 4L, 4L, 4L) AS m, " +
        "graft_mmh3(1093L) AS h, " +
        "graft_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").head()
    assert(r.getLong(0) == Morton.encode(Vec3(1, 2, 3), Vec3(4, 4, 4)))
    assert(r.getLong(1) == MurmurHash3_128.hashUint64LE(1093L))
    assert(r.getLong(2) == 32L)
  }

  test("the contains-gate rule rides the same extension") {
    val injected = spark.sessionState.optimizer.batches
      .flatMap(_.rules).contains(ContainsGateRule)
    assert(injected, "ContainsGateRule missing from the optimizer " +
      "batches of an extension-built session")
  }
}
