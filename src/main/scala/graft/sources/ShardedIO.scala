package graft.sources

import java.io.RandomAccessFile
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** Sharded precomputed layer I/O (S5/S6/S12/J3/A7).
  *
  * Image chunks are keyed by compressed morton code of their grid
  * coordinates (rx.py:75-84); morton -> (shard file, minishard) via
  * the sharding spec (sharding.py:154-162). Reads never load whole
  * shards: the fixed index is one bounded range read, each needed
  * minishard index is one range read, and chunk data reads are
  * coalesced into bundles (sharding.py:731-766) — the same access
  * pattern object-store byte-range GETs need at 100 TB.
  *
  * Write = S12 shard synthesis: `groupByKey(shard)` shuffles each
  * shard's chunks to one task, which assembles the file with
  * ShardCodec.synthesizeShard (sharding.py:868-983). One shuffle,
  * then embarrassingly parallel file assembly.
  */
object ShardedIO {

  /** Byte-range read validated against the file itself: index offsets
    * and sizes are UNTRUSTED file bytes, and allocating
    * `(e0 - s0).toInt` straight off a corrupt index is a decode bomb
    * (a 2^40 range truncates to a negative or multi-GB allocation
    * before readFully ever hits EOF) — the same hostile-input rail as
    * Brotli/Draco/Compresso's output ceilings.
    */
  private def rangedRead(raf: RandomAccessFile, s0: Long, e0: Long,
      what: String): Array[Byte] = {
    val flen = raf.length()
    require(s0 >= 0 && e0 >= s0 && e0 <= flen,
      s"corrupt shard index: $what range [$s0, $e0) outside the " +
        s"$flen-byte shard file")
    // for shard files over 2 GiB an in-bounds corrupt range can still
    // exceed a JVM array: (e0-s0).toInt would wrap negative and throw
    // a raw NegativeArraySizeException instead of this rail
    require(e0 - s0 <= Int.MaxValue,
      s"corrupt shard index: $what range [$s0, $e0) spans " +
        s"${e0 - s0} bytes, beyond the 2 GiB single-read ceiling")
    val buf = new Array[Byte]((e0 - s0).toInt)
    raf.seek(s0); raf.readFully(buf)
    buf
  }

  private def mortonUdf(grid: Vec3) =
    udf((gx: Long, gy: Long, gz: Long) =>
      Morton.encode(Vec3(gx, gy, gz), grid))

  /** Ranged read of a label set from ONE shard file — fixed index,
    * then only the needed minishard indexes, then data ranges
    * coalesced into bundled reads (sharding.py:731-766). Never loads
    * the whole shard: the executor-side access pattern that survives
    * multi-GB shards (byte-range GETs at 100 TB). Shared by the image
    * cutout and the annotation by-id lookup. Returns (label, payload)
    * for the labels present, gunzipped per the spec's data encoding.
    */
  def readLabelsRanged(shardPath: String, spec: ShardingSpec,
      labels: Seq[Long]): Seq[(Long, Array[Byte])] =
    readLabelsRangedWithOffsets(shardPath, spec, labels)
      .map(t => (t._1, t._3))

  /** Like readLabelsRanged but also returns each record's absolute
    * byte offset in the shard file — the `shard_offset` the sharded
    * multires-mesh reader needs to locate the fragment bytes laid
    * BEFORE the manifest (mesh/multilod.py:206-223,282-284
    * `return_byte_range=True`).
    */
  def readLabelsRangedWithOffsets(shardPath: String, spec: ShardingSpec,
      labels: Seq[Long]): Seq[(Long, Long, Array[Byte])] = {
    val want = labels.toSet
    // a probe may hash to a shard that was never written (e.g. a
    // spatial bbox over an empty cell): the reference treats a missing
    // shard as "label absent" (sharding.py:573-579 returns None), so
    // yield no rows rather than failing the task
    if (!Files.exists(Paths.get(shardPath))) return Seq.empty
    val raf = new RandomAccessFile(shardPath, "r")
    try {
      val idxLen = ShardCodec.indexLength(spec).toInt
      val fixedBytes = new Array[Byte](idxLen)
      raf.readFully(fixedBytes)
      val fixed = ShardCodec.decodeFixedIndex(fixedBytes, spec)
      // one index read per needed minishard
      val neededMsn = labels.map(l => spec.shardLocation(l)._2).distinct
      val entries = neededMsn.flatMap { msn =>
        val (s0, e0) = fixed(msn.toInt)
        if (e0 <= s0) Seq.empty
        else ShardCodec.decodeMinishardIndex(
          rangedRead(raf, s0, e0, "minishard index"), spec)
      }.filter(e => want.contains(e.label))
      // coalesce adjacent data ranges into bundled reads (S7/W3)
      val ranges = entries.map(e => (e.offset, e.offset + e.size))
      val bundles = ShardIndex.coalesceRanges(ranges)
      val data = bundles.map { case (s0, e0) =>
        (s0, rangedRead(raf, s0, e0, "data bundle"))
      }
      def slice(off: Long, len: Long): Array[Byte] = {
        val (bs, bbuf) = data.find { case (s0, b) =>
          off >= s0 && off + len <= s0 + b.length }.get
        java.util.Arrays.copyOfRange(bbuf, (off - bs).toInt,
          (off - bs + len).toInt)
      }
      entries.map { e =>
        val raw = slice(e.offset, e.size)
        (e.label, e.offset,
          if (spec.dataEncoding == "gzip") Codec.gunzip(raw) else raw)
      }
    } finally raf.close()
  }

  /** S12: write chunk rows (gx, gy, gz, payload) as shard files. */
  def writeSharded(chunks: DataFrame, layerDir: String, meta: VolumeMeta,
      mip: Int): Unit = {
    val scale = meta.scale(mip)
    val spec = scale.sharding.getOrElse(
      throw new IllegalArgumentException(s"scale ${scale.key} is not sharded"))
    val grid = scale.gridSize
    val dir = Paths.get(layerDir, scale.key)
    Files.createDirectories(dir)
    val dirStr = dir.toString
    val s = chunks.sparkSession
    import s.implicits._
    val withShard = chunks
      .withColumn("morton", mortonUdf(grid)(col("gx"), col("gy"), col("gz")))
      .withColumn("shard",
        udf((m: Long) => spec.shardLocation(m)._1).apply(col("morton")))
      .select(col("shard"), col("morton"), col("payload"))
      .as[(Long, Long, Array[Byte])]
    withShard.groupByKey(_._1)
      .mapGroups { (shard, it) =>
        val items = it.map(t => (t._2, t._3)).toSeq
        (shard, ShardCodec.synthesizeShard(spec, items))
      }
      .foreach { t: (Long, Array[Byte]) =>
        Files.write(Paths.get(dirStr, spec.shardFilename(t._1)), t._2)
        ()
      }
  }

  /** S6/J3/A7: the minishard-index DataFrame — one row per stored
    * label: (shard_file, minishard, label, offset, size). Only index
    * regions are read (fixed index + minishard index tail), never
    * chunk data.
    */
  def minishardIndexDF(spark: SparkSession, layerDir: String, mip: Int = 0)
      : DataFrame = {
    val meta = PrecomputedIO.readInfo(layerDir)
    val scale = meta.scale(mip)
    val spec = scale.sharding.get
    val dir = Paths.get(layerDir, scale.key)
    import scala.jdk.CollectionConverters._
    val shardFiles = Files.list(dir).iterator.asScala
      .filter(_.toString.endsWith(".shard")).map(_.toString).toSeq.sorted
    import spark.implicits._
    spark.createDataset(shardFiles).flatMap { path =>
      val raf = new RandomAccessFile(path, "r")
      try {
        val idxLen = ShardCodec.indexLength(spec).toInt
        val fixedBytes = new Array[Byte](idxLen)
        raf.readFully(fixedBytes)
        val fixed = ShardCodec.decodeFixedIndex(fixedBytes, spec)
        val name = Paths.get(path).getFileName.toString
        fixed.zipWithIndex.flatMap { case ((s0, e0), msn) =>
          if (e0 <= s0) Seq.empty
          else ShardCodec.decodeMinishardIndex(
              rangedRead(raf, s0, e0, "minishard index"), spec)
            .map(e => (name, msn.toLong, e.label, e.offset, e.size))
        }.toSeq
      } finally raf.close()
    }.toDF("shard_file", "minishard", "label", "offset", "size")
  }

  /** Chunk-level sharded read: enumerate the pruned grid
    * (planning-time, metadata-sized), group chunk requests by shard
    * file, then each task does index reads + coalesced byte-range
    * data reads for its shard and emits decoded-payload chunk rows
    * (same schema as PrecomputedIO.readChunks). Shared by the S5
    * cutout and the sharded->unsharded transfer path.
    */
  def readChunksSharded(spark: SparkSession, layerDir: String, bbox: Bbox,
      mip: Int = 0): DataFrame = {
    val meta = PrecomputedIO.readInfo(layerDir)
    val scale = meta.scale(mip)
    val spec = scale.sharding.get
    val grid = scale.gridSize
    val bounds = scale.bounds
    val cs = scale.chunkSize
    val dir = Paths.get(layerDir, scale.key).toString
    val pts = Geom.gridpoints(bbox, bounds, cs)
    import spark.implicits._
    val requests = spark.createDataset(pts.map { g =>
      val m = Morton.encode(g, grid)
      (spec.shardFilename(spec.shardLocation(m)._1), m, g.x, g.y, g.z)
    })
    val chunkRows = requests.groupByKey(_._1)
      .flatMapGroups { (shardFile, it) =>
        val wanted = it.map(t => (t._2, Vec3(t._3, t._4, t._5))).toSeq
        val byLabel = wanted.toMap
        readLabelsRanged(Paths.get(dir, shardFile).toString, spec,
          wanted.map(_._1))
          .iterator.map { case (label, payload) =>
            val g = byLabel(label)
            val cb = Geom.chunkBbox(g, bounds, cs)
            (g.x, g.y, g.z, cb.minpt.x, cb.minpt.y, cb.minpt.z,
              cb.maxpt.x, cb.maxpt.y, cb.maxpt.z, payload)
          }
      }
      .toDF("gx", "gy", "gz", "x0", "y0", "z0", "x1", "y1", "z1", "payload")
    chunkRows
  }

  /** S5 sharded cutout: chunk-level sharded read clipped and decoded
    * to voxel rows.
    */
  def cutoutVoxelsSharded(spark: SparkSession, layerDir: String, bbox: Bbox,
      mip: Int = 0): DataFrame = {
    val meta = PrecomputedIO.readInfo(layerDir)
    val scale = meta.scale(mip)
    PrecomputedIO.decodeToVoxels(
      readChunksSharded(spark, layerDir, bbox, mip), bbox, scale,
      meta.dtypeBytes)
  }
}
