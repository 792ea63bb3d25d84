package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The compiled shingle-hash UDF (TextQueries.shingleHashUdf) must be
  * bit-identical to the Catalyst expression chain it replaced —
  * split(" ") / transform(sequence) 3-gram / concat / md5 / substring /
  * conv(16,10) — because every minhash signature, LSH band key, and
  * decontamination shingle in the suite derives from these 48-bit
  * values. Differential-tested here over hostile word shapes (empty
  * words from double spaces, leading/trailing spaces, unicode,
  * sub-3-word docs, empty string) exactly like the st18 band-key fuzz.
  */
class ShingleHashSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  /** The ORIGINAL expression chain, kept verbatim as the reference. */
  private def oldChain(c: org.apache.spark.sql.DataFrame) =
    c.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 3), " +
          "i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))")).as("s"))
      .select(col("doc_id"),
        conv(substring(md5(col("s").cast("binary")), 1, 12), 16, 10)
          .cast("long").as("hv"))

  test("shingleHashUdf == legacy md5/conv expression chain, incl. edge shapes") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(20260817)
    val words = Vector("the", "cat", "", "sat", "on", "a", "mât", "日本",
      "x", "longer-token-with-dashes", "42")
    val texts = Seq(
      "", " ", "  ", "one", "one two", "one two three",
      " leading space", "trailing space ", "double  space here",
      "a b c d e f g h") ++
      (1 to 60).map { _ =>
        (0 until rnd.nextInt(12)).map(_ => words(rnd.nextInt(words.size)))
          .mkString(" ")
      }
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val expected = oldChain(df).as[(Long, Long)].collect().sorted.toSeq
    val got = graft.ops.TextQueries.shingleHashes(df)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
  }
}
