package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.core._
import graft.sources.PrecomputedIO

/** Streaming-source contract of the DSv2 `neuroglancer` format that
  * the oracle entry (st16) can't see: incremental offsets across a
  * RESTART (a second run with the same checkpoint processes only new
  * arrivals), admission-control pacing, and discovery-window pruning.
  */
class NgStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = Files.createTempDirectory("ng_stream_spec").toString
  private val layer = s"$dir/layer"
  private val ckpt = s"$dir/ckpt"

  private val meta = VolumeMeta(
    layerType = "segmentation", dataType = "uint32", numChannels = 1,
    scales = Seq(ScaleMeta(
      key = "1_1_1", encoding = "raw", resolution = Seq(1, 1, 1),
      chunkSize = Vec3(4, 4, 4), size = Vec3(16, 8, 4),
      voxelOffset = Vec3(0, 0, 0))))

  private def writeWave(keys: Seq[(Long, Long, Long)]): Unit = {
    val s = spark
    import s.implicits._
    val chunks = keys.map { case (gx, gy, gz) =>
      (gx, gy, gz, Codec.encodeRawFromLongs(Array.fill(64)(gx + 10 * gy), 4))
    }.toDF("gx", "gy", "gz", "payload")
    PrecomputedIO.writeChunks(chunks, layer, meta, 0)
  }

  private val sinkDir = s"$dir/sink"

  /** Run the stream to a parquet sink (memory sink refuses checkpoint
    * RECOVERY, which is exactly what the restart test exercises);
    * returns the sink's total row count so far.
    */
  private def drain(): Long = {
    val q = spark.readStream.format("neuroglancer")
      .option("path", layer)
      .option("max_chunks_per_trigger", "2")
      .load().select("gx", "gy", "gz") // payload pruned: no chunk IO
      .writeStream.format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(sinkDir).count()
  }

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    PrecomputedIO.writeInfo(layer, meta)
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  test("incremental offsets: restart processes only new arrivals") {
    writeWave(Seq((0L, 0L, 0L), (1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 0L)))
    assert(drain() == 4)
    // 2 chunks per trigger -> 2 committed batches (ignore .crc sidecars)
    val commits = Files.list(Paths.get(ckpt, "commits")).toArray
      .map(_.toString.split('/').last).count(!_.startsWith("."))
    assert(commits == 2)

    writeWave(Seq((0L, 1L, 0L), (1L, 1L, 0L), (2L, 1L, 0L)))
    // same checkpoint, restarted query: only the 3 new chunks emit
    assert(drain() == 7)
    val journal = Paths.get(ckpt, "sources", "0", "ng_chunk_log")
    assert(Files.readAllLines(journal).size() == 7)
  }

  test("a compression-suffix rewrite of a journaled chunk is not re-emitted") {
    // the journal keys on the suffix-stripped base name: chunk objects
    // are immutable-once-written, so 'name' later reappearing as
    // 'name.gz' is the same cell (r15 advisor) — rewrite wave-1's
    // first chunk gzipped and restart: zero new rows, zero new journal
    // lines
    val scaleDir = Paths.get(layer, "1_1_1")
    val gz = Files.list(scaleDir).toArray.map(_.toString)
      .map(Paths.get(_)).find(_.getFileName.toString.endsWith(".gz"))
      .get
    val plain = gz.resolveSibling(gz.getFileName.toString.stripSuffix(".gz"))
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(Files.readAllBytes(gz)))
    Files.write(plain, in.readAllBytes())
    Files.delete(gz)
    val before = Files.readAllLines(
      Paths.get(ckpt, "sources", "0", "ng_chunk_log")).size()
    assert(drain() == 7) // sink count unchanged from the restart test
    val after = Files.readAllLines(
      Paths.get(ckpt, "sources", "0", "ng_chunk_log")).size()
    assert(after == before, s"suffix rewrite re-journaled: $before -> $after")
  }

  test("non-file checkpoint scheme fails loudly instead of journaling locally") {
    val q = intercept[Exception] {
      val st = spark.readStream.format("neuroglancer")
        .option("path", layer)
        .load().select("gx")
        .writeStream.format("memory").queryName("ng_stream_badckpt")
        .option("checkpointLocation", "hdfs://nn:8020/tmp/ng_ck")
        .trigger(Trigger.AvailableNow())
        .start()
      st.awaitTermination()
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: causes(t.getCause)
    assert(causes(q).exists(m => m != null &&
      (m.contains("local file: path") || m.contains("hdfs"))),
      causes(q).mkString(" | "))
  }

  test("discovery window prunes the journal, not just the result") {
    val ckpt2 = s"$dir/ckpt2"
    val q = spark.readStream.format("neuroglancer")
      .option("path", layer)
      .option("gx_hi", "0")
      .load().select("gx", "gy", "gz")
      .writeStream.format("memory").queryName("ng_stream_win")
      .outputMode("append")
      .option("checkpointLocation", ckpt2)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table("ng_stream_win").count() == 2) // gx==0 waves 1+2
    val journal = Paths.get(ckpt2, "sources", "0", "ng_chunk_log")
    assert(Files.readAllLines(journal).size() == 2)
  }
}
