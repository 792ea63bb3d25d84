package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Watermark + late-data semantics (SURVEY §2.9): with a 10-minute
  * watermark and append mode, a window is emitted once the watermark
  * passes its end, and events arriving later than the watermark are
  * dropped rather than reopening the window.
  */
class StreamSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("graft-stream-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("st18 streaming near-dedup bucket state equals the batch " +
      "Catalyst band pipeline") {
    // Differential gate for the compiled signature UDF: the streaming
    // entry computes minhash bands in a hand-rolled MessageDigest loop
    // (map-side, per row), the batch lane through Catalyst md5/conv/
    // min expressions over exploded shingles. Any drift in shingling,
    // 48-bit truncation, permutation arithmetic, or band formatting
    // makes the two bucket tables diverge.
    val s = spark
    val sfDir = "/root/testdata/sf0.001"
    val streamed =
      SparkEntry.queries("st18_stream_near_dedup")(s, sfDir)
    val src = graft.ops.StreamQueries.stageNearDocs(s, sfDir)
    val tq = graft.ops.TextQueries
    val expected = tq.bandTable(s.read.parquet(src))
      .groupBy("bid", "band")
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_members"))
      .filter(col("n_members") >= 2 &&
        col("n_members") <= tq.MaxBucket)
    assert(streamed.count() > 0, "no collision buckets detected")
    assert(streamed.except(expected).isEmpty,
      "streamed buckets absent from the batch pipeline")
    assert(expected.except(streamed).isEmpty,
      "batch buckets absent from the streamed state")
  }

  test("bandKeysFn matches the batch pipeline on randomized texts " +
      "including empty words and double spaces") {
    // the corpus differential (above) only exercises well-formed
    // single-spaced text; this pins the compiled UDF to the Catalyst
    // expressions on the edges where split semantics could drift —
    // consecutive spaces (empty words), <3-word docs, empty text.
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(12021)
    def word(): String =
      (0 until (1 + rnd.nextInt(6)))
        .map(_ => ('a' + rnd.nextInt(10)).toChar).mkString
    val texts = (0 until 60).map { i =>
      (i.toLong, (0 until rnd.nextInt(12)).map(_ => word()).mkString(" "))
    } ++ Seq((100L, ""), (101L, "a b"), (102L, "x  y z w"))
    val df = texts.toDF("doc_id", "text")
    val expected = graft.ops.TextQueries.bandTable(df)
    val udfRows = texts.flatMap { case (id, t) =>
      graft.ops.StreamQueries.bandKeysFn(t).map(bk => (id, bk.bid, bk.band))
    }.toDF("doc_id", "bid", "band")
    assert(udfRows.count() === expected.count())
    assert(udfRows.except(expected).isEmpty,
      "UDF band keys absent from the Catalyst pipeline")
    assert(expected.except(udfRows).isEmpty,
      "Catalyst band keys absent from the UDF")
  }

  test("windowed agg with watermark drops late events in append mode") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, Long)] // (event-time seconds, value)
    val agg = mem.toDF.toDF("tsec", "v")
      .select(timestamp_seconds(col("tsec")).as("ets"), col("v"))
      .withWatermark("ets", "10 minutes")
      .groupBy(window(col("ets"), "1 hour"))
      .agg(sum(col("v")).as("sv"))
      .select(unix_timestamp(col("window.start")).as("wstart"), col("sv"))
    val q = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode("append").start()
    try {
      // batch 1: two events in hour-0, one in hour-1
      mem.addData((600L, 1L), (1200L, 2L), (4000L, 10L))
      q.processAllAvailable()
      // nothing emitted yet: watermark = 4000 - 600 = 3400 < 3600
      assert(s.table("wm_test").count() === 0)
      // batch 2: event at 2h commits the watermark past hour-0's end
      mem.addData((7600L, 100L))
      q.processAllAvailable()
      // hour-0 window emitted; a LATE event for hour-0 now arrives
      mem.addData((1800L, 1000L))
      q.processAllAvailable()
      mem.addData((12000L, 5L)) // push watermark past hour-1 too
      q.processAllAvailable()
      val rows = s.table("wm_test").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      // hour-0 sum is 3, NOT 1003 — the late event was dropped
      assert(rows(0L) === 3L)
      assert(rows(3600L) === 10L)
    } finally q.stop()
  }

  test("custom state via flatMapGroupsWithState: incremental distinct count") {
    // the SURVEY §2.9 north star: per-group state maintained across
    // micro-batches (incremental A1 — new-labels-only emission)
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, Long)] // (chunk_id, label)
    val novel = mem.toDS()
      .groupByKey(_._2 % 4) // label shard as the state key
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, Long)], state: GroupState[Set[Long]]) =>
          val seen = state.getOption.getOrElse(Set.empty[Long])
          val fresh = rows.map(_._2).toSet -- seen
          state.update(seen ++ fresh)
          fresh.iterator
      }
    val q = novel.toDF("label").writeStream.format("memory")
      .queryName("fmgws_test").outputMode("append").start()
    try {
      mem.addData((0L, 10L), (0L, 11L), (1L, 10L))
      q.processAllAvailable()
      assert(s.table("fmgws_test").collect().map(_.getLong(0)).sorted.toSeq
        === Seq(10L, 11L))
      // second batch: only the genuinely new label is emitted
      mem.addData((2L, 11L), (2L, 12L))
      q.processAllAvailable()
      assert(s.table("fmgws_test").collect().map(_.getLong(0)).sorted.toSeq
        === Seq(10L, 11L, 12L))
    } finally q.stop()
  }

  test("stream-stream interval join emits in-range pairs and evicts state past the watermark") {
    // the st7 shape: watermarks on BOTH sides let Spark derive state
    // watermarks from the range condition and EVICT rows that can no
    // longer match — the bounded-state property. (Late input may still
    // join against not-yet-cleaned state within a batch — cleanup is
    // lazy — so the guarantee tested is the state bound, not late-row
    // dropping.)
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val lmem = MemoryStream[(Long, Long)] // (user, event-time seconds)
    val rmem = MemoryStream[(Long, Long)]
    val left = lmem.toDF.toDF("u", "ltsec")
      .select(col("u"), timestamp_seconds(col("ltsec")).as("lts"))
      .withWatermark("lts", "0 seconds")
    val right = rmem.toDF.toDF("ru", "rtsec")
      .select(col("ru"), timestamp_seconds(col("rtsec")).as("rts"))
      .withWatermark("rts", "0 seconds")
    val joined = left.join(right,
      col("u") === col("ru") &&
        col("rts") >= col("lts") &&
        col("rts") <= col("lts") + expr("INTERVAL 10 MINUTES"))
      .select(col("u"), unix_timestamp(col("lts")).as("l"),
        unix_timestamp(col("rts")).as("r"))
    val q = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode("append").start()
    try {
      lmem.addData((1L, 1000L))
      rmem.addData((1L, 1300L), (1L, 1700L)) // 1700 is outside +10min
      q.processAllAvailable()
      val first = s.table("ssj_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(first === Set((1L, 1000L, 1300L)))
      // advance both watermarks far past the old rows, then run one
      // more batch so the join executes its state cleanup under the
      // committed watermark
      lmem.addData((9L, 100000L)); rmem.addData((9L, 100000L))
      q.processAllAvailable()
      lmem.addData((9L, 100060L)); rmem.addData((9L, 100060L))
      q.processAllAvailable()
      // 7 rows ingested total; without eviction the join state holds
      // all of them. The watermark-derived state bound must have
      // dropped the three pre-watermark rows (1000/1300/1700).
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 4, s"join state not evicted: $stateRows rows")
    } finally q.stop()
  }

  test("streaming dropDuplicates keeps one state row per key") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Long]
    val distinct = mem.toDF.toDF("label").dropDuplicates("label")
    val q = distinct.writeStream.format("memory").queryName("dd_test")
      .outputMode("append").start()
    try {
      mem.addData(1L, 2L, 2L, 3L)
      q.processAllAvailable()
      mem.addData(2L, 3L, 4L)
      q.processAllAvailable()
      val got = s.table("dd_test").collect().map(_.getLong(0)).sorted.toSeq
      assert(got === Seq(1L, 2L, 3L, 4L))
    } finally q.stop()
  }
}
