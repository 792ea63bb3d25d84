package graft.ops

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.functions._
import graft.core.{AnnotationCodec, Bbox, Geom, Morton, ShardCodec, ShardingSpec, Vec3}
import graft.core.AnnotationCodec.{Annotation, AnnotationSpec, PropSpec}

/** Annotation layers over REAL binary chunk files (F18 + P8 extended
  * to AABB/ELLIPSOID predicates).
  *
  * Fixture: three annotation layers (POINT with a full property
  * schema, AXIS_ALIGNED_BOUNDING_BOX, ELLIPSOID) deterministically
  * derived from events/orders/customer, encoded to the little-endian
  * multi-annotation wire format (annotation/reader.py:151-181) and
  * written as spatial-tile files. Queries decode the real bytes; the
  * DuckDB oracle re-derives expected rows from the source tables —
  * independent of the writer — so green rows prove encode → file →
  * decode → filter end-to-end, including property dtype handling and
  * the 4-byte record padding.
  *
  * Scale shape: tile files scan as independent tasks; decode emits
  * annotation rows (annotations are already tabular — SURVEY §1.1);
  * crop predicates are plain filters Catalyst can push.
  */
object AnnotationQueries {
  import Derived.{table, idiv}

  val Root = "/tmp/graft_fixture/annotations"

  /** Cell-type dictionary for the enum-typed `kind` property
    * (annotation/metadata.py:355-372's example enum block).
    */
  val KindLabels: Seq[String] = Seq("axon", "dendrite", "astrocyte", "soma")

  val PointSpec: AnnotationSpec = AnnotationSpec("POINT", 3, Seq(
    PropSpec("score", "uint8"), PropSpec("weight", "uint16"),
    PropSpec("conf", "float32"), PropSpec("color", "rgb"),
    PropSpec("kind", "uint8", KindLabels.indices.map(_.toLong),
      KindLabels)))
  val AabbSpec: AnnotationSpec =
    AnnotationSpec("AXIS_ALIGNED_BOUNDING_BOX", 3, Seq.empty)
  val EllipsoidSpec: AnnotationSpec =
    AnnotationSpec("ELLIPSOID", 3, Seq(PropSpec("w", "float32")))
  // uint16 property -> 2-byte pad, exercising the pad-to-4 rule on a
  // variable-length record
  val PolylineSpec: AnnotationSpec =
    AnnotationSpec("POLYLINE", 3, Seq(PropSpec("w", "uint16")))

  /** POINT annotations from events (mirrored in PtsCte). */
  private def pointsDf(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events").filter(col("event_id") % 5 === 0).select(
      col("event_id").cast("long").as("aid"),
      (col("event_id") % 64).cast("long").as("ax"),
      (col("user_id") % 64).cast("long").as("ay"),
      (idiv(col("event_id"), 64) % 32).cast("long").as("az"),
      (col("event_id") % 256).cast("long").as("score"),
      ((col("event_id") * 7) % 60000).cast("long").as("weight"),
      (col("user_id") % 100).cast("long").as("conf"),
      (col("user_id") % 256).cast("long").as("r"),
      ((col("user_id") * 3) % 256).cast("long").as("g"),
      ((col("user_id") * 7) % 256).cast("long").as("b"),
      (col("event_id") % 4).cast("long").as("kind"))

  private val PtsCte =
    """pts AS (
      |  SELECT event_id AS aid, event_id % 64 AS ax, user_id % 64 AS ay,
      |         (event_id // 64) % 32 AS az, event_id % 256 AS score,
      |         (event_id * 7) % 60000 AS weight, user_id % 100 AS conf,
      |         user_id % 256 AS r, (user_id * 3) % 256 AS g,
      |         (user_id * 7) % 256 AS b, event_id % 4 AS kind
      |  FROM events WHERE event_id % 5 = 0)""".stripMargin

  /** AABB annotations from orders (mirrored in AabbCte). */
  private def aabbDf(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "orders").filter(col("o_orderkey") % 10 === 0).select(
      col("o_orderkey").cast("long").as("aid"),
      (col("o_orderkey") % 50).cast("long").as("ax"),
      (col("o_custkey") % 50).cast("long").as("ay"),
      (col("o_orderkey") % 25).cast("long").as("az"))
      .withColumn("bx", col("ax") + 1 + col("aid") % 8)
      .withColumn("by", col("ay") + 1 + (col("aid") * 3) % 8)
      .withColumn("bz", col("az") + 1 + col("aid") % 6)

  private val AabbCte =
    """ab AS (
      |  SELECT o_orderkey AS aid, o_orderkey % 50 AS ax, o_custkey % 50 AS ay,
      |         o_orderkey % 25 AS az,
      |         o_orderkey % 50 + 1 + o_orderkey % 8 AS bx,
      |         o_custkey % 50 + 1 + (o_orderkey * 3) % 8 AS by,
      |         o_orderkey % 25 + 1 + o_orderkey % 6 AS bz
      |  FROM orders WHERE o_orderkey % 10 = 0)""".stripMargin

  /** ELLIPSOID annotations (center + radii) from customer. */
  private def ellipsoidDf(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "customer").filter(col("c_custkey") % 4 === 0).select(
      col("c_custkey").cast("long").as("aid"),
      (col("c_custkey") % 60).cast("long").as("cx"),
      ((col("c_custkey") * 3) % 60).cast("long").as("cy"),
      (col("c_custkey") % 30).cast("long").as("cz"),
      (lit(1L) + col("c_custkey") % 5).cast("long").as("rx"),
      (lit(1L) + col("c_custkey") % 7).cast("long").as("ry"),
      (lit(1L) + col("c_custkey") % 3).cast("long").as("rz"),
      (col("c_custkey") % 50).cast("long").as("w"))

  private val ElCte =
    """el AS (
      |  SELECT c_custkey AS aid, c_custkey % 60 AS cx, (c_custkey * 3) % 60 AS cy,
      |         c_custkey % 30 AS cz, 1 + c_custkey % 5 AS rx,
      |         1 + c_custkey % 7 AS ry, 1 + c_custkey % 3 AS rz,
      |         c_custkey % 50 AS w
      |  FROM customer WHERE c_custkey % 4 = 0)""".stripMargin

  /** Encode grouped annotation rows and write one file per tile,
    * executor-side. `geomCols` then `propCols` are read in order.
    */
  private def writeLayer(df: DataFrame, layerDir: String, spec: AnnotationSpec,
      tile: org.apache.spark.sql.Column, geomCols: Seq[String],
      propCols: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(layerDir))
    val cols = Seq(col("aid")) ++ geomCols.map(col) ++ propCols.map(col)
    val grouped = df.withColumn("tile", tile)
      .groupBy("tile")
      .agg(sort_array(collect_list(struct(cols: _*))).as("anns"))
    grouped.foreachPartition { rows: Iterator[Row] =>
      rows.foreach { r =>
        val anns = r.getSeq[Row](1).map { a =>
          Annotation(a.getLong(0),
            geomCols.indices.map(i => a.getLong(1 + i).toFloat).toArray,
            propCols.indices.map(i =>
              a.getLong(1 + geomCols.length + i).toDouble).toArray)
        }
        Files.write(Paths.get(layerDir, r.getAs[String]("tile")),
          AnnotationCodec.encode(spec, anns))
      }
    }
  }

  /** Relationship link model (annotation/reader.py:308-354
    * get_by_relationship): every point annotation participates in two
    * relations, each with a deterministic segid so the DuckDB oracle
    * replays the link table from `events` directly.
    */
  val Relations: Seq[String] = Seq("presynaptic_to", "postsynaptic_to")
  private def relSegid(rel: Int, aid: Long): Long =
    if (rel == 0) (aid * 3) % 40 else (aid * 5 + 1) % 40

  /** Spatial-index partition constants (p8k): level 0 is ONE coarse
    * 64x64x32 cell keeping the top-[[SpatialLimit0]] annotations by
    * deterministic priority hash (the progressive-display sample);
    * the spill goes to level 1's 32x32x32 cells — each annotation
    * lives in exactly one level, per the precomputed annotation
    * spatial layout.
    */
  val SpatialLimit0 = 150L

  def ensure(s: SparkSession, sfDir: String): Unit = synchronized {
    val marker = Paths.get(Root, ".built_from")
    val markerVal = s"${Fixtures.srcStamp(sfDir)}|v4" // v4: spatial levels
    if (Files.exists(marker) && Files.readString(marker) == markerVal) return
    FixtureLog.rebuild(marker)
    val rootP = Paths.get(Root)
    if (Files.exists(rootP)) {
      import scala.jdk.CollectionConverters._
      Files.walk(rootP).iterator.asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
    Files.createDirectories(rootP)
    AnnotationCodec.writeInfo(s"$Root/points", PointSpec,
      spatial = Seq(
        AnnotationCodec.SpatialLevel("spatial0", Seq(1L, 1L, 1L),
          Seq(64L, 64L, 32L), SpatialLimit0),
        AnnotationCodec.SpatialLevel("spatial1", Seq(2L, 2L, 1L),
          Seq(32L, 32L, 32L), Long.MaxValue)))
    // two-level spatial partition: rank per (single) coarse cell by a
    // salted md5 priority — top-150 land in spatial0/0_0_0, the rest
    // in spatial1/<gx_gy_gz> fine cells (one level per annotation)
    locally {
      val prio = conv(substring(md5(concat(lit("sp:"),
        col("aid").cast("string")).cast("binary")), 1, 12), 16, 10)
        .cast("long")
      // rank WITHIN each coarse cell (grid 1x1x1 here, so one cell —
      // but the window stays cell-partitioned so the same build holds
      // at any grid_shape: per-cell state, never a global sort)
      val ranked = pointsDf(s, sfDir).withColumn("prio", prio)
        .withColumn("c0x", idiv(col("ax"), 64))
        .withColumn("c0y", idiv(col("ay"), 64))
        .withColumn("c0z", idiv(col("az"), 32))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("c0x", "c0y", "c0z")
            .orderBy(col("prio"), col("aid"))).cast("long"))
      writeLayer(ranked.filter(col("rk") <= SpatialLimit0),
        s"$Root/points/spatial0", PointSpec, lit("0_0_0"),
        Seq("ax", "ay", "az"),
        Seq("score", "weight", "conf", "r", "g", "b", "kind"))
      writeLayer(ranked.filter(col("rk") > SpatialLimit0),
        s"$Root/points/spatial1", PointSpec,
        concat_ws("_", idiv(col("ax"), 32), idiv(col("ay"), 32),
          idiv(col("az"), 32)),
        Seq("ax", "ay", "az"),
        Seq("score", "weight", "conf", "r", "g", "b", "kind"))
    }
    writeLayer(pointsDf(s, sfDir), s"$Root/points", PointSpec,
      concat_ws("_", idiv(col("ax"), 32), idiv(col("ay"), 32)),
      Seq("ax", "ay", "az"),
      Seq("score", "weight", "conf", "r", "g", "b", "kind"))
    writeLayer(aabbDf(s, sfDir), s"$Root/aabbs", AabbSpec,
      lit("0_0"), Seq("ax", "ay", "az", "bx", "by", "bz"), Seq.empty)
    writeLayer(ellipsoidDf(s, sfDir), s"$Root/ellipsoids", EllipsoidSpec,
      lit("0_0"), Seq("cx", "cy", "cz", "rx", "ry", "rz"), Seq("w"))
    // by-relationship files: per relation, one multi-annotation file
    // per related segid (reader.py:308-354 — the rel "key" dir holds
    // <segid> objects decoded with the multi format)
    Relations.zipWithIndex.foreach { case (rel, ri) =>
      writeLayer(
        pointsDf(s, sfDir).withColumn("segid",
          if (ri == 0) (col("aid") * 3) % 40 else (col("aid") * 5 + 1) % 40),
        s"$Root/rel_$rel", PointSpec, col("segid").cast("string"),
        Seq("ax", "ay", "az"),
        Seq("score", "weight", "conf", "r", "g", "b", "kind"))
    }
    // by-id files: single-annotation format incl. relationship
    // sections, one object per annotation id (reader.py:103-137). The
    // fixture materializes the aid % 35 == 0 subset — enough for the
    // point-lookup entry without 10k tiny files per sf.
    val byIdDir = Paths.get(s"$Root/by_id")
    Files.createDirectories(byIdDir)
    val byIdStr = byIdDir.toString
    pointsDf(s, sfDir).filter(col("aid") % 35 === 0)
      .foreachPartition { rows: Iterator[Row] =>
        rows.foreach { r =>
          val aid = r.getLong(0)
          val ann = Annotation(aid,
            Array(r.getLong(1).toFloat, r.getLong(2).toFloat,
              r.getLong(3).toFloat),
            (4 until 11).map(i => r.getLong(i).toDouble).toArray)
          val rels = Seq(Seq(relSegid(0, aid)), Seq(relSegid(1, aid)))
          Files.write(Paths.get(byIdStr, aid.toString),
            AnnotationCodec.encodeSingle(PointSpec, ann, rels))
        }
      }
    Files.writeString(marker, markerVal)
  }

  /** Deterministic polyline vertices for annotation `aid`: 2-5 points,
    * every coordinate an exact small integer (f32-exact), mirrored by
    * the p8h oracle CTE. Point k occupies geometry[3k, 3k+3) — the
    * num_points*rank flattening of annotation/metadata.py:436-447.
    */
  private def polyVertices(aid: Long): Array[Float] = {
    val npts = (2 + aid % 4).toInt
    val g = new Array[Float](npts * 3)
    (0 until npts).foreach { k =>
      g(3 * k) = ((aid * 7 + k * 11) % 64).toFloat
      g(3 * k + 1) = ((aid * 13 + k * 17) % 64).toFloat
      g(3 * k + 2) = ((aid * 3 + k * 5) % 32).toFloat
    }
    g
  }

  def ensurePolyline(s: SparkSession, sfDir: String): Unit = synchronized {
    ensure(s, sfDir)
    val marker = Paths.get(Root, ".built_polyline_from")
    val markerVal = s"${Fixtures.srcStamp(sfDir)}|v1"
    if (Files.exists(marker) && Files.readString(marker) == markerVal) return
    FixtureLog.rebuild(marker)
    val layerDir = s"$Root/polylines"
    val layerP = Paths.get(layerDir)
    if (Files.exists(layerP)) {
      import scala.jdk.CollectionConverters._
      Files.walk(layerP).iterator.asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
    Files.createDirectories(layerP)
    AnnotationCodec.writeInfo(layerDir, PolylineSpec)
    val spec = PolylineSpec
    table(s, sfDir, "customer").filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").cast("long").as("aid"))
      .withColumn("tile", (col("aid") % 4).cast("string"))
      .groupBy("tile")
      .agg(sort_array(collect_list(col("aid"))).as("aids"))
      .foreachPartition { rows: Iterator[Row] =>
        rows.foreach { r =>
          val anns = r.getSeq[Long](1).map(aid =>
            Annotation(aid, polyVertices(aid),
              Array((aid % 100).toDouble)))
          Files.write(Paths.get(layerDir, r.getString(0)),
            AnnotationCodec.encode(spec, anns))
        }
      }
    Files.writeString(marker, markerVal)
  }

  // ---- sharded id index twin (annotation/reader.py:183-205): a
  // points layer whose by_id index is a uint64-sharded container —
  // the same single-annotation binaries packed into shard files, the
  // layer info declaring by_id {key, sharding} so the read path can
  // route on is_id_index_sharded() like the reference ----

  val ShardedLayerDir = s"$Root/points_sharded"
  val annShardSpec: ShardingSpec = ShardingSpec(
    preshiftBits = 0, minishardBits = 2, shardBits = 1,
    hashName = "murmurhash3_x86_128",
    minishardIndexEncoding = "gzip", dataEncoding = "gzip")

  def ensureSharded(s: SparkSession, sfDir: String): Unit = synchronized {
    ensure(s, sfDir)
    val marker = Paths.get(Root, ".built_byid_sharded_from")
    val markerVal =
      s"${Fixtures.srcStamp(sfDir)}|v3|annsh-v3" // v3: +rel/spatial shards
    if (Files.exists(marker) && Files.readString(marker) == markerVal) return
    FixtureLog.rebuild(marker)
    val layerP = Paths.get(ShardedLayerDir)
    if (Files.exists(layerP)) {
      import scala.jdk.CollectionConverters._
      Files.walk(layerP).iterator.asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
    import s.implicits._
    import scala.jdk.CollectionConverters._
    val spec = annShardSpec
    AnnotationCodec.writeInfo(ShardedLayerDir, PointSpec,
      byId = Some(("by_id", Some(spec))),
      relationships = Seq(("presynaptic_to", "rel_presynaptic_to")),
      relSharding = Map("presynaptic_to" -> spec),
      spatial = Seq(AnnotationCodec.SpatialLevel("spatial1",
        Seq(2L, 2L, 1L), Seq(32L, 32L, 32L), Long.MaxValue,
        sharding = Some(spec))))
    // group label-keyed binaries by shard number; each task
    // synthesizes one full shard file (S12 shuffle shape). Runs once
    // for the by-id single-annotation objects and once for the
    // relationship index's multi-annotation lists (reader.py:321-339).
    def synthesize(srcDir: String, outKey: String): Unit = {
      val outDir = s"$ShardedLayerDir/$outKey"
      Files.createDirectories(Paths.get(outDir))
      val names = Files.list(Paths.get(srcDir)).iterator.asScala
        .map(_.getFileName.toString).filter(_.matches("\\d+")).toSeq.sorted
      names.toDS()
        .map { n =>
          (spec.shardLocation(n.toLong)._1, n.toLong,
            Files.readAllBytes(Paths.get(srcDir, n)))
        }
        .groupByKey(_._1)
        .mapGroups { (shard, it) =>
          val items = it.map(t => (t._2, t._3)).toSeq
          (shard, ShardCodec.synthesizeShard(spec, items))
        }
        .foreach { t: (Long, Array[Byte]) =>
          Files.write(Paths.get(outDir, spec.shardFilename(t._1)), t._2)
          ()
        }
    }
    synthesize(s"$Root/by_id", "by_id")
    synthesize(s"$Root/rel_presynaptic_to", "rel_presynaptic_to")
    // sharded spatial level: cell files keyed by the cell's
    // compressed morton code (annotation/reader.py:253-257)
    locally {
      val srcDir = s"$Root/points/spatial1"
      val outDir = s"$ShardedLayerDir/spatial1"
      Files.createDirectories(Paths.get(outDir))
      val grid = Vec3(2, 2, 1)
      val items = Files.list(Paths.get(srcDir)).iterator.asScala
        .map(_.getFileName.toString).toSeq.sorted
      items.toDS()
        .map { n =>
          val Array(gx, gy, gz) = n.split("_").map(_.toLong)
          (spec.shardLocation(Morton.encode(Vec3(gx, gy, gz), grid))._1,
            Morton.encode(Vec3(gx, gy, gz), grid),
            Files.readAllBytes(Paths.get(srcDir, n)))
        }
        .groupByKey(_._1)
        .mapGroups { (shard, it) =>
          val cells = it.map(t => (t._2, t._3)).toSeq
          (shard, ShardCodec.synthesizeShard(spec, cells))
        }
        .foreach { t: (Long, Array[Byte]) =>
          Files.write(Paths.get(outDir, spec.shardFilename(t._1)), t._2)
          ()
        }
    }
    Files.writeString(marker, markerVal)
  }

  /** Decode a layer directory into annotation rows: aid, geometry
    * floats (as long — fixture values are integers), property slots.
    */
  private def decodeLayer(s: SparkSession, layerDir: String,
      spec: AnnotationSpec, outCols: Seq[String]): DataFrame = {
    import s.implicits._
    // streamed listing + file-count-aware sizing (guide §6; ScanSizing
    // open-cost rule). listedNames spools the directory stream to a
    // names file instead of materializing every object name on the
    // driver — a by-id layer at 100 TB is itself big data (VERDICT r18
    // item 7); regular files only (skips spatial-level subdirs).
    val rows = graft.sources.ScanSizing
      .listedNames(s, Paths.get(layerDir), _ != "info", 0L)
      .flatMap { n =>
        AnnotationCodec.decode(spec,
          Files.readAllBytes(Paths.get(layerDir, n))).map { a =>
          (a.id, a.geometry.map(_.toLong).toSeq, a.props.map(_.toLong).toSeq)
        }
      }.toDF("aid", "geom", "props")
    val geomCols = (0 until spec.geometryFloats).map(i =>
      col("geom").getItem(i).as(outCols(i)))
    val propCols = (0 until spec.properties.map(_.slots).sum).map(i =>
      col("props").getItem(i).as(outCols(spec.geometryFloats + i)))
    rows.select(col("aid") +: (geomCols ++ propCols): _*)
  }

  /** The reference's OWN committed annotation layer (H01-derived,
    * test/test_precomputed_annotation, CC-BY per its README): POINT
    * annotations with one int32 enum property + one relationship.
    * Spec mirrors the layer's info; known answers come from the
    * reference's own test (test/test_annotations.py: 10043 points /
    * 7 label strings in spatial0, by_id geometry, 4-point axon
    * relationship). DuckDB oracle reads golden parquet from the
    * independent stdlib parse (tools/annotation_golden_gen.py).
    */
  val H01Dir = "/root/reference/test/test_precomputed_annotation"
  val H01Golden = "/root/repo/src/test/resources/golden"
  val H01Spec: AnnotationSpec =
    AnnotationSpec("POINT", 3, Seq(PropSpec("class_label", "int32")))
  val H01Enum: Map[Long, String] = Map(
    0L -> "axon", 1L -> "dendrite", 2L -> "astrocyte", 3L -> "soma",
    4L -> "cilium", 5L -> "AIS",
    1000L -> "myelinated axon", 1001L -> "myelinated axon",
    1002L -> "myelinated fragment", 1003L -> "myelinated fragment",
    1004L -> "myelinated fragment", 1005L -> "myelinated fragment")

  val queries: Map[String, Q] = Map(

    // P8/F18 golden parity: decode the committed spatial0 tile of the
    // reference's H01 annotation fixture — the reference's get_all
    // path (test_annotations.py:27-34: 10043 POINTs, 7 label strings)
    "p8p_annotation_golden_spatial" -> Q(
      (s, dir) => {
        import s.implicits._
        val data = graft.core.Codec.gunzip(
          Files.readAllBytes(Paths.get(H01Dir, "spatial0", "0_0_0.gz")))
        val enumB = s.sparkContext.broadcast(H01Enum)
        s.createDataset(Seq(0)).flatMap { _ =>
          AnnotationCodec.decode(H01Spec, data).iterator.map { a =>
            val lab = a.props(0).toLong
            (a.id, a.geometry(0).toDouble, a.geometry(1).toDouble,
              a.geometry(2).toDouble, lab, enumB.value(lab))
          }
        }.toDF("id", "x", "y", "z", "class_label", "class_name")
      },
      Some(s"""SELECT id, x, y, z, class_label, class_name
        |FROM read_parquet('$H01Golden/annotation_h01_spatial.parquet')""".stripMargin)),

    // P8 golden by-id lookup: the single-annotation encoding with the
    // trailing relationship section (test_annotations.py:19-21's known
    // geometry; relationship id decoded alongside)
    "p8q_annotation_golden_by_id" -> Q(
      (s, dir) => {
        import s.implicits._
        val data = graft.core.Codec.gunzip(
          Files.readAllBytes(Paths.get(H01Dir, "by_id", "3867588737.gz")))
        s.createDataset(Seq(0)).map { _ =>
          val (a, rels) = AnnotationCodec.decodeSingle(
            H01Spec, nRels = 1, id = 3867588737L, data)
          (a.id, a.geometry(0).toDouble, a.geometry(1).toDouble,
            a.geometry(2).toDouble, a.props(0).toLong,
            rels.head.length.toLong, rels.head.head)
        }.toDF("id", "x", "y", "z", "class_label", "n_rel", "skeleton_id")
      },
      Some("""SELECT CAST(3867588737 AS BIGINT) AS id,
        |  CAST(1937760 AS DOUBLE) AS x, CAST(1318752 AS DOUBLE) AS y,
        |  CAST(96921 AS DOUBLE) AS z, CAST(1 AS BIGINT) AS class_label,
        |  CAST(1 AS BIGINT) AS n_rel,
        |  CAST(4781447896 AS BIGINT) AS skeleton_id""".stripMargin)),

    // P8 golden relationship lookup: skeleton_id/243895108 — the
    // multi-annotation encoding under a relationship key
    // (test_annotations.py:23-26: 4 points, all 'axon')
    "p8r_annotation_golden_relationship" -> Q(
      (s, dir) => {
        import s.implicits._
        val data = graft.core.Codec.gunzip(
          Files.readAllBytes(Paths.get(H01Dir, "skeleton_id", "243895108.gz")))
        s.createDataset(Seq(0)).flatMap { _ =>
          AnnotationCodec.decode(H01Spec, data).iterator.map { a =>
            (a.id, a.geometry(0).toDouble, a.geometry(1).toDouble,
              a.geometry(2).toDouble, a.props(0).toLong)
          }
        }.toDF("id", "x", "y", "z", "class_label")
      },
      Some(s"""SELECT id, x, y, z, class_label
        |FROM read_parquet('$H01Golden/annotation_h01_rel.parquet')""".stripMargin)),

    // F18: annotation binary round-trip with a full property schema
    // (uint8 + uint16 + float32 + rgb, 4-byte record padding) — the
    // oracle derives the same rows from `events` directly
    "f18_annotation_decode" -> Q(
      (s, dir) => {
        ensure(s, dir)
        decodeLayer(s, s"$Root/points", PointSpec,
          Seq("ax", "ay", "az", "score", "weight", "conf", "r", "g", "b",
            "kind"))
      },
      Some(s"""WITH $PtsCte
        |SELECT aid, ax, ay, az, score, weight, conf, r, g, b, kind
        |FROM pts""".stripMargin)),

    // F18/P8 write roundtrip: engine-write -> engine-read on a FRESH
    // target every invocation — info JSON, spatial tiling, record
    // encode all exercised at query time (not from a cached fixture),
    // gating the annotation write path like the s18 format
    // roundtrips; the read side re-derives the spec from the written
    // info JSON rather than trusting the in-memory one
    "p8i_annotation_write_roundtrip" -> Q(
      (s, dir) => AnnotationQueries.synchronized {
        val target = s"$Root/rt_points"
        val tp = Paths.get(target)
        if (Files.exists(tp)) {
          import scala.jdk.CollectionConverters._
          Files.walk(tp).iterator.asScala.toSeq.reverse
            .foreach(p => Files.deleteIfExists(p))
        }
        AnnotationCodec.writeInfo(target, PointSpec)
        writeLayer(pointsDf(s, dir), target, PointSpec,
          concat_ws("_", idiv(col("ax"), 32), idiv(col("ay"), 32)),
          Seq("ax", "ay", "az"),
          Seq("score", "weight", "conf", "r", "g", "b", "kind"))
        decodeLayer(s, target, AnnotationCodec.readInfo(target),
          Seq("ax", "ay", "az", "score", "weight", "conf", "r", "g", "b",
            "kind"))
      },
      Some(s"""WITH $PtsCte
        |SELECT aid, ax, ay, az, score, weight, conf, r, g, b, kind
        |FROM pts""".stripMargin)),

    // P8/F18 enum property: the layer's info JSON carries the kind
    // dictionary (enum_values/enum_labels, annotation/metadata.py:
    // 355-409); the decode surfaces the numeric value and a broadcast
    // dictionary join attaches the label — the oracle rebuilds the
    // same dictionary inline
    "p8f_annotation_enum" -> Q(
      (s, dir) => {
        ensure(s, dir)
        import s.implicits._
        val spec = AnnotationCodec.readInfo(s"$Root/points")
        val kp = spec.properties.find(_.id == "kind").get
        val dict = kp.enumValues.zip(kp.enumLabels)
          .toDF("kind", "kind_label")
        decodeLayer(s, s"$Root/points", spec,
            Seq("ax", "ay", "az", "score", "weight", "conf", "r", "g",
              "b", "kind"))
          .join(broadcast(dict), Seq("kind"))
          .groupBy("kind_label")
          .agg(count(lit(1)).as("n"), sum(col("score")).as("sum_score"))
      },
      Some(s"""WITH $PtsCte,
        |dict(kind, kind_label) AS (VALUES (0, 'axon'), (1, 'dendrite'),
        |  (2, 'astrocyte'), (3, 'soma'))
        |SELECT kind_label, count(*) AS n,
        |  CAST(sum(score) AS BIGINT) AS sum_score
        |FROM pts JOIN dict USING (kind)
        |GROUP BY kind_label""".stripMargin)),

    // P8 (AABB variant): geometry-aware crop — keep the box if either
    // corner is inside the (inclusive) crop box, or the box straddles
    // it entirely on every axis (annotation/metadata.py:83-103)
    "p8b_annotation_crop_aabb" -> Q(
      (s, dir) => {
        ensure(s, dir)
        val d = decodeLayer(s, s"$Root/aabbs", AabbSpec,
          Seq("ax", "ay", "az", "bx", "by", "bz"))
        def inBox(x: String, y: String, z: String) =
          col(x).between(10, 40) && col(y).between(10, 40) &&
            col(z).between(5, 20)
        def straddles(lo: Seq[String], hi: Seq[String]) =
          col(lo(0)) <= 10 && col(lo(1)) <= 10 && col(lo(2)) <= 5 &&
            col(hi(0)) >= 40 && col(hi(1)) >= 40 && col(hi(2)) >= 20
        d.filter(inBox("ax", "ay", "az") || inBox("bx", "by", "bz") ||
          straddles(Seq("ax", "ay", "az"), Seq("bx", "by", "bz")) ||
          straddles(Seq("bx", "by", "bz"), Seq("ax", "ay", "az")))
      },
      Some(s"""WITH $AabbCte
        |SELECT aid, ax, ay, az, bx, by, bz FROM ab
        |WHERE (ax BETWEEN 10 AND 40 AND ay BETWEEN 10 AND 40
        |       AND az BETWEEN 5 AND 20)
        |   OR (bx BETWEEN 10 AND 40 AND by BETWEEN 10 AND 40
        |       AND bz BETWEEN 5 AND 20)
        |   OR (ax <= 10 AND ay <= 10 AND az <= 5
        |       AND bx >= 40 AND by >= 40 AND bz >= 20)
        |   OR (bx <= 10 AND by <= 10 AND bz <= 5
        |       AND ax >= 40 AND ay >= 40 AND az >= 20)""".stripMargin)),

    // P8 spatial-index LEVELS: the precomputed annotation layout's
    // progressive-display partition — level 0 holds each coarse
    // cell's top-`limit` annotations by deterministic priority, the
    // spill lives in level 1's finer cells; every annotation is in
    // exactly ONE level, so a viewer refines by unioning levels as it
    // zooms. The entry decodes BOTH level directories from the binary
    // layer and returns each annotation's (level, cell) assignment;
    // the oracle replays the per-cell rank partition from `events`.
    // At scale: the per-level write is one cell-partitioned rank +
    // grouped encode — window state bounded by cell population.
    "p8k_annotation_spatial_levels" -> Q(
      (s, dir) => {
        ensure(s, dir)
        import s.implicits._
        import scala.jdk.CollectionConverters._
        // level keys come from the layer's info JSON, like a real
        // client (coarsest first -> level index = declaration order)
        val lvls = AnnotationCodec.readSpatial(s"$Root/points")
          .zipWithIndex.flatMap { case (lvl, i) =>
            val d = Paths.get(s"$Root/points/${lvl.key}")
            Files.list(d).iterator.asScala
              .map(p => (i.toLong, lvl.key, p.getFileName.toString)).toSeq
          }
        lvls.toDS().repartition(4)
          .flatMap { lc =>
            val (lvl, key, cell) = lc
            AnnotationCodec.decode(PointSpec, Files.readAllBytes(
              Paths.get(s"$Root/points/$key", cell))).map { a =>
              (a.id, lvl, cell, a.geometry(0).toLong,
                a.geometry(1).toLong, a.geometry(2).toLong)
            }
          }.toDF("aid", "level", "cell", "ax", "ay", "az")
      },
      Some(s"""WITH $PtsCte,
        |p AS (SELECT aid, ax, ay, az,
        |        ('0x' || substr(md5('sp:' || CAST(aid AS VARCHAR)), 1, 12))
        |          ::BIGINT AS prio
        |      FROM pts),
        |r AS (SELECT aid, ax, ay, az, row_number() OVER (
        |        PARTITION BY ax // 64, ay // 64, az // 32
        |        ORDER BY prio, aid) AS rk FROM p)
        |SELECT aid,
        |  CAST(CASE WHEN rk <= ${SpatialLimit0} THEN 0 ELSE 1 END AS BIGINT)
        |    AS level,
        |  CASE WHEN rk <= ${SpatialLimit0} THEN '0_0_0'
        |       ELSE (ax // 32) || '_' || (ay // 32) || '_' || (az // 32)
        |  END AS cell,
        |  ax, ay, az
        |FROM r""".stripMargin)),

    // P8 progressive SAMPLING read (annotation/reader.py:225-235
    // get_by_bbox(mip): "for annotations, mips are coarsest to
    // finest" — a viewer's preview queries the COARSEST level, whose
    // cells hold only the top-`limit` annotations elected by the
    // deterministic priority rank at build time, and crops the decoded
    // result to the original bbox, :296-307). The entry replays that
    // read: enumerate the level-0 cells intersecting the bbox from the
    // layer's own info (grid/chunk metadata, metadata-sized), decode
    // just those cell objects, crop inclusively. The oracle re-elects
    // the per-cell cap from `events` (rk <= limit) and applies the
    // same bbox — so the gate asserts BOTH the cap and the election,
    // not just row counts. At scale: a preview touches |bbox ∩ grid|
    // cell objects of ≤ limit annotations each, never the full layer.
    "p8n_annotation_spatial_sample" -> Q(
      (s, dir) => {
        ensure(s, dir)
        import s.implicits._
        val lvl0 = AnnotationCodec.readSpatial(s"$Root/points").head
        val cs = Vec3(lvl0.chunkSize(0), lvl0.chunkSize(1), lvl0.chunkSize(2))
        val bounds = Bbox(Vec3(0, 0, 0),
          Vec3(cs.x * lvl0.gridShape(0), cs.y * lvl0.gridShape(1),
            cs.z * lvl0.gridShape(2)))
        val bbox = Bbox(Vec3(8, 8, 4), Vec3(49, 49, 25)) // incl. 8..48/4..24
        val cells = Geom.gridpoints(bbox, bounds, cs)
          .map(g => s"${g.x}_${g.y}_${g.z}")
        val key = lvl0.key
        cells.toDS()
          .flatMap { cell =>
            // an unpopulated cell has no object — absent reads as
            // empty, like the reference's cache.download of a missing
            // key (same semantics as the missing-shard rule)
            val p = Paths.get(s"$Root/points/$key", cell)
            if (!Files.exists(p)) Seq.empty
            else AnnotationCodec.decode(PointSpec, Files.readAllBytes(p))
              .map { a =>
                (a.id, a.geometry(0).toLong, a.geometry(1).toLong,
                  a.geometry(2).toLong)
              }
          }.toDF("aid", "ax", "ay", "az")
          .filter(col("ax").between(8, 48) && col("ay").between(8, 48) &&
            col("az").between(4, 24))
      },
      Some(s"""WITH $PtsCte,
        |p AS (SELECT aid, ax, ay, az,
        |        ('0x' || substr(md5('sp:' || CAST(aid AS VARCHAR)), 1, 12))
        |          ::BIGINT AS prio
        |      FROM pts),
        |r AS (SELECT aid, ax, ay, az, row_number() OVER (
        |        PARTITION BY ax // 64, ay // 64, az // 32
        |        ORDER BY prio, aid) AS rk FROM p)
        |SELECT aid, ax, ay, az FROM r
        |WHERE rk <= ${SpatialLimit0}
        |  AND ax BETWEEN 8 AND 48 AND ay BETWEEN 8 AND 48
        |  AND az BETWEEN 4 AND 24""".stripMargin)),

    // P8 (ELLIPSOID variant): center-in-box crop
    // (annotation/metadata.py:104-109)
    "p8c_annotation_crop_ellipsoid" -> Q(
      (s, dir) => {
        ensure(s, dir)
        decodeLayer(s, s"$Root/ellipsoids", EllipsoidSpec,
          Seq("cx", "cy", "cz", "rx", "ry", "rz", "w"))
          .filter(col("cx").between(10, 50) && col("cy").between(10, 50) &&
            col("cz").between(5, 25))
      },
      Some(s"""WITH $ElCte
        |SELECT aid, cx, cy, cz, rx, ry, rz, w FROM el
        |WHERE cx BETWEEN 10 AND 50 AND cy BETWEEN 10 AND 50
        |  AND cz BETWEEN 5 AND 25""".stripMargin)),

    // P8 by-relationship: segid -> annotations, the most relational
    // feature of the annotation subsystem (reader.py:308-354
    // get_by_relationship). Each requested segid resolves to one
    // relationship object holding its related annotations in the
    // multi format — lookups fan out as tasks, the many-to-many link
    // table materializes as (segid, aid) rows the oracle rebuilds
    // from `events`.
    "p8d_annotation_by_relation" -> Q(
      (s, dir) => {
        ensure(s, dir)
        import s.implicits._
        val relDir = s"$Root/rel_presynaptic_to"
        val spec = PointSpec
        // streamed listing (no O(objects) driver Seq) + open-cost sizing
        graft.sources.ScanSizing
          .listedNames(s, Paths.get(relDir), _.toLong < 8, 0L)
          .flatMap { n =>
            val segid = n.toLong
            AnnotationCodec.decode(spec,
              Files.readAllBytes(Paths.get(relDir, n))).map { a =>
              (segid, a.id, a.geometry(0).toLong, a.geometry(1).toLong,
                a.geometry(2).toLong)
            }
          }.toDF("segid", "aid", "ax", "ay", "az")
      },
      Some(s"""WITH $PtsCte
        |SELECT (aid * 3) % 40 AS segid, aid, ax, ay, az FROM pts
        |WHERE (aid * 3) % 40 < 8""".stripMargin)),

    // P8 by-id point lookup: decode single-annotation objects
    // (geometry + properties + per-relation id sections,
    // reader.py:103-137) — the id comes from the object name, the
    // relationship columns surface the link targets
    "p8e_annotation_by_id" -> Q(
      (s, dir) => {
        ensure(s, dir)
        import s.implicits._
        val byIdDir = s"$Root/by_id"
        val spec = PointSpec
        // streamed listing (no O(objects) driver Seq) + file-count-aware
        // sizing: was names/8 = 357 launch-dominated tasks of 8 tiny
        // files each at bench scale
        graft.sources.ScanSizing
          .listedNames(s, Paths.get(byIdDir), _ => true, 0L)
          .map { n =>
            val aid = n.toLong
            val (a, rels) = AnnotationCodec.decodeSingle(spec, 2, aid,
              Files.readAllBytes(Paths.get(byIdDir, n)))
            (aid, a.geometry(0).toLong, a.geometry(1).toLong,
              a.geometry(2).toLong, a.props(0).toLong,
              rels(0).head, rels(1).head)
          }.toDF("aid", "ax", "ay", "az", "score", "presyn", "postsyn")
      },
      Some(s"""WITH $PtsCte
        |SELECT aid, ax, ay, az, score, (aid * 3) % 40 AS presyn,
        |  (aid * 5 + 1) % 40 AS postsyn
        |FROM pts WHERE aid % 35 = 0""".stripMargin)),

    // P8 SHARDED by-id lookup (annotation/reader.py:183-205): the
    // layer info declares by_id.sharding, so ids resolve through the
    // uint64-sharded container — shard number from the spec, byte
    // range from the minishard index, single-annotation decode.
    // Requested ids are grouped by shard so each shard file is read
    // once per task (the ShardReader batching shape, not a per-id
    // full-file read).
    "p8g_annotation_by_id_sharded" -> Q(
      (s, dir) => {
        ensureSharded(s, dir)
        import s.implicits._
        import scala.jdk.CollectionConverters._
        // route on the layer's declared id index, like the reference
        val (key, shOpt) = AnnotationCodec.readByIdIndex(ShardedLayerDir).get
        val spec = shOpt.getOrElse(
          throw new IllegalStateException("fixture id index not sharded"))
        val annSpec = PointSpec
        val shardDir = s"$ShardedLayerDir/$key"
        // the id set under test: the same by-id subset p8e reads —
        // streamed listing, no repartition (groupByKey re-keys anyway)
        graft.sources.ScanSizing
          .listedNames(s, Paths.get(s"$Root/by_id"), _ => true, 0L,
            repartitionBySize = false)
          .map(_.toLong)
          .groupByKey(aid => spec.shardLocation(aid)._1)
          .flatMapGroups { (shardNo, it) =>
            // index + coalesced byte-range reads (sharding.py:731-766
            // shape) — NEVER the whole shard file; at real annotation
            // scale shards are multi-GB and only the requested ids'
            // ranges should move
            val path =
              Paths.get(shardDir, spec.shardFilename(shardNo)).toString
            graft.sources.ShardedIO.readLabelsRanged(path, spec, it.toSeq)
              .iterator.map { case (aid, bin) =>
                val (a, rels) = AnnotationCodec.decodeSingle(annSpec, 2, aid, bin)
                (aid, a.geometry(0).toLong, a.geometry(1).toLong,
                  a.geometry(2).toLong, a.props(0).toLong,
                  rels(0).head, rels(1).head)
              }
          }.toDF("aid", "ax", "ay", "az", "score", "presyn", "postsyn")
      },
      Some(s"""WITH $PtsCte
        |SELECT aid, ax, ay, az, score, (aid * 3) % 40 AS presyn,
        |  (aid * 5 + 1) % 40 AS postsyn
        |FROM pts WHERE aid % 35 = 0""".stripMargin)),

    // P8 SHARDED relationship lookup (annotation/reader.py:319-339
    // get_by_relationship when rel["sharding"] is declared): the
    // relation's label→annotation-list index lives in the uint64
    // shard container, so each requested segid resolves through shard
    // number → minishard index → byte range → multi-annotation
    // decode. Requested segids group by shard (one task per shard,
    // index + coalesced ranged reads — never the whole file), and the
    // route — key AND spec — comes from the layer info's relationship
    // declaration, not hardcoded.
    "p8l_annotation_by_relation_sharded" -> Q(
      (s, dir) => {
        ensureSharded(s, dir)
        import s.implicits._
        val (key, shOpt) = AnnotationCodec
          .readRelationshipIndex(ShardedLayerDir, "presynaptic_to").get
        val spec = shOpt.getOrElse(
          throw new IllegalStateException("relation index not sharded"))
        val annSpec = PointSpec
        val shardDir = s"$ShardedLayerDir/$key"
        val segids = (0L until 8L)
        s.createDataset(segids.toSeq)
          .groupByKey(segid => spec.shardLocation(segid)._1)
          .flatMapGroups { (shardNo, it) =>
            val path =
              Paths.get(shardDir, spec.shardFilename(shardNo)).toString
            graft.sources.ShardedIO.readLabelsRanged(path, spec, it.toSeq)
              .iterator.flatMap { case (segid, bin) =>
                AnnotationCodec.decode(annSpec, bin).map { a =>
                  (segid, a.id, a.geometry(0).toLong,
                    a.geometry(1).toLong, a.geometry(2).toLong)
                }
              }
          }.toDF("segid", "aid", "ax", "ay", "az")
      },
      Some(s"""WITH $PtsCte
        |SELECT (aid * 3) % 40 AS segid, aid, ax, ay, az FROM pts
        |WHERE (aid * 3) % 40 < 8""".stripMargin)),

    // P8 SHARDED spatial query (annotation/reader.py:230-306: when
    // spatial[mip]["sharding"] is declared, the bbox's overlapping
    // grid cells become compressed morton codes resolved through the
    // shard container, decoded multi-annotation binaries are cropped
    // to the ORIGINAL bbox). The bbox here overlaps 2 of the 4 level-1
    // cells, so planning-time cell pruning is visible in the read set;
    // cells group by shard with index + ranged reads like every other
    // shard path. Level key, grid, chunk size, and spec all come from
    // the layer info's spatial declaration.
    "p8m_annotation_spatial_sharded" -> Q(
      (s, dir) => {
        ensureSharded(s, dir)
        import s.implicits._
        val lvl = AnnotationCodec.readSpatial(ShardedLayerDir)
          .find(_.key == "spatial1").get
        val spec = lvl.sharding.getOrElse(
          throw new IllegalStateException("spatial level not sharded"))
        val grid = Vec3(lvl.gridShape(0), lvl.gridShape(1), lvl.gridShape(2))
        val cs = Vec3(lvl.chunkSize(0), lvl.chunkSize(1), lvl.chunkSize(2))
        val annSpec = PointSpec
        val shardDir = s"$ShardedLayerDir/${lvl.key}"
        // query bbox: x [0,30), y [10,60), z [0,32) -> cells gx=0 only
        val (bx0, bx1, by0, by1, bz0, bz1) = (0L, 30L, 10L, 60L, 0L, 32L)
        val cells = for {
          gx <- (bx0 / cs.x) to ((bx1 - 1) / cs.x)
          gy <- (by0 / cs.y) to ((by1 - 1) / cs.y)
          gz <- (bz0 / cs.z) to ((bz1 - 1) / cs.z)
          if gx < grid.x && gy < grid.y && gz < grid.z
        } yield Morton.encode(Vec3(gx, gy, gz), grid)
        s.createDataset(cells.toSeq)
          .groupByKey(code => spec.shardLocation(code)._1)
          .flatMapGroups { (shardNo, it) =>
            val path =
              Paths.get(shardDir, spec.shardFilename(shardNo)).toString
            graft.sources.ShardedIO.readLabelsRanged(path, spec, it.toSeq)
              .iterator.flatMap { case (_, bin) =>
                AnnotationCodec.decode(annSpec, bin).map { a =>
                  (a.id, a.geometry(0).toLong, a.geometry(1).toLong,
                    a.geometry(2).toLong)
                }
              }
          }
          // crop to the original (non-cell-aligned) bbox, reader.py:306
          .filter(t => t._2 >= bx0 && t._2 < bx1 && t._3 >= by0 &&
            t._3 < by1 && t._4 >= bz0 && t._4 < bz1)
          .toDF("aid", "ax", "ay", "az")
      },
      Some(s"""WITH $PtsCte,
        |p AS (SELECT aid, ax, ay, az,
        |        ('0x' || substr(md5('sp:' || CAST(aid AS VARCHAR)), 1, 12))
        |          ::BIGINT AS prio
        |      FROM pts),
        |r AS (SELECT aid, ax, ay, az, row_number() OVER (
        |        PARTITION BY ax // 64, ay // 64, az // 32
        |        ORDER BY prio, aid) AS rk FROM p)
        |SELECT aid, ax, ay, az FROM r
        |WHERE rk > ${SpatialLimit0}
        |  AND ax < 30 AND ay >= 10 AND ay < 60""".stripMargin)),

    // P8 multi-relationship + rgba round-trip (annotation/metadata.py:
    // 27-39 relationship declarations, rgba in _PROPERTY_DTYPES): a
    // FRESH by-id layer per invocation whose info declares TWO
    // relationships and a uint16+rgba property block (unpadded 6 ->
    // pad-to-4 adds 2), written with encodeSingle and read back
    // routing every decode decision through the written info JSON —
    // the relationship section count comes from readRelationships,
    // not a hardcoded 2.
    "p8j_annotation_rel_rgba" -> Q(
      (s, dir) => AnnotationQueries.synchronized {
        import s.implicits._
        import scala.jdk.CollectionConverters._
        val target = s"$Root/rt_rel_rgba"
        val tp = Paths.get(target)
        if (Files.exists(tp)) {
          Files.walk(tp).iterator.asScala.toSeq.reverse
            .foreach(p => Files.deleteIfExists(p))
        }
        val spec = AnnotationSpec("POINT", 3, Seq(
          PropSpec("weight", "uint16"), PropSpec("color", "rgba")))
        AnnotationCodec.writeInfo(target, spec,
          byId = Some(("by_id", None)),
          relationships = Relations.map(r => (r, s"rel_$r")))
        val byIdDir = Paths.get(target, "by_id")
        Files.createDirectories(byIdDir)
        val byIdStr = byIdDir.toString
        table(s, dir, "events").filter(col("event_id") % 20 === 0)
          .select(col("event_id").cast("long").as("aid"),
            (col("event_id") % 64).cast("long").as("ax"),
            (col("user_id") % 64).cast("long").as("ay"),
            (idiv(col("event_id"), 64) % 32).cast("long").as("az"),
            ((col("event_id") * 7) % 60000).cast("long").as("weight"),
            (col("user_id") % 256).cast("long").as("r"),
            ((col("user_id") * 3) % 256).cast("long").as("g"),
            ((col("user_id") * 7) % 256).cast("long").as("b"),
            ((col("user_id") * 11) % 256).cast("long").as("a"))
          .foreachPartition { rows: Iterator[Row] =>
            rows.foreach { row =>
              val aid = row.getLong(0)
              val ann = Annotation(aid,
                (1 to 3).map(i => row.getLong(i).toFloat).toArray,
                (4 to 8).map(i => row.getLong(i).toDouble).toArray)
              val rels = Seq(Seq(relSegid(0, aid)), Seq(relSegid(1, aid)))
              Files.write(Paths.get(byIdStr, aid.toString),
                AnnotationCodec.encodeSingle(spec, ann, rels))
            }
          }
        // read side: spec + relationship count re-derived from the
        // written info, one decode per by-id object
        val rspec = AnnotationCodec.readInfo(target)
        val nRels = AnnotationCodec.readRelationships(target).size
        // streamed listing (no O(objects) driver Seq) + open-cost sizing
        graft.sources.ScanSizing
          .listedNames(s, byIdDir, _ => true, 0L)
          .map { nm =>
            val aid = nm.toLong
            val (a, rels) = AnnotationCodec.decodeSingle(rspec, nRels, aid,
              Files.readAllBytes(Paths.get(byIdStr, aid.toString)))
            (aid, a.geometry(0).toLong, a.geometry(1).toLong,
              a.geometry(2).toLong, a.props(0).toLong, a.props(1).toLong,
              a.props(2).toLong, a.props(3).toLong, a.props(4).toLong,
              rels(0).head, rels(1).head)
          }
          .toDF("aid", "ax", "ay", "az", "weight", "r", "g", "b", "a",
            "presyn", "postsyn")
      },
      Some("""SELECT event_id AS aid, event_id % 64 AS ax,
        |  user_id % 64 AS ay, (event_id // 64) % 32 AS az,
        |  (event_id * 7) % 60000 AS weight, user_id % 256 AS r,
        |  (user_id * 3) % 256 AS g, (user_id * 7) % 256 AS b,
        |  (user_id * 11) % 256 AS a,
        |  (event_id * 3) % 40 AS presyn, (event_id * 5 + 1) % 40 AS postsyn
        |FROM events WHERE event_id % 20 = 0""".stripMargin)),

    // P8 (POLYLINE variant): variable-length records — u32 vertex
    // count + num_points*ndim f32 per annotation (annotation/
    // metadata.py:436-447). Crop keeps a polyline when ANY vertex
    // falls in the (inclusive) box — the LINE endpoint rule extended
    // per vertex; the reference's _crop_mask raises TypeError for
    // POLYLINE (metadata.py:110-111), so the crop here is this
    // engine's extension, decode is reference parity. Output is the
    // vertex table of kept polylines.
    "p8h_annotation_polyline" -> Q(
      (s, dir) => {
        ensurePolyline(s, dir)
        import s.implicits._
        import scala.jdk.CollectionConverters._
        val layerDir = s"$Root/polylines"
        // route through the layer info (annotation_type POLYLINE)
        val spec = AnnotationCodec.readInfo(layerDir)
        // streamed listing (no O(objects) driver Seq) + open-cost sizing
        val v = graft.sources.ScanSizing
          .listedNames(s, Paths.get(layerDir), _ != "info", 0L)
          .flatMap { n =>
            AnnotationCodec.decode(spec,
              Files.readAllBytes(Paths.get(layerDir, n))).flatMap { a =>
              val npts = a.geometry.length / 3
              (0 until npts).map(k => (a.id, npts.toLong, k.toLong,
                a.geometry(3 * k).toLong, a.geometry(3 * k + 1).toLong,
                a.geometry(3 * k + 2).toLong, a.props(0).toLong))
            }
          }.toDF("aid", "npts", "vi", "vx", "vy", "vz", "w")
        val kept = v.filter(col("vx").between(8, 56) &&
            col("vy").between(8, 56) && col("vz").between(4, 28))
          .select("aid").distinct()
        v.join(kept, Seq("aid"))
          .select("aid", "npts", "vi", "vx", "vy", "vz", "w")
      },
      Some("""WITH pl AS (SELECT c_custkey AS aid, 2 + c_custkey % 4 AS npts
        |         FROM customer WHERE c_custkey % 3 = 0),
        |v AS (SELECT aid, npts, unnest(range(npts)) AS vi FROM pl),
        |vv AS (SELECT aid, npts, vi,
        |         (aid * 7 + vi * 11) % 64 AS vx,
        |         (aid * 13 + vi * 17) % 64 AS vy,
        |         (aid * 3 + vi * 5) % 32 AS vz,
        |         aid % 100 AS w
        |       FROM v),
        |keep AS (SELECT DISTINCT aid FROM vv
        |         WHERE vx BETWEEN 8 AND 56 AND vy BETWEEN 8 AND 56
        |           AND vz BETWEEN 4 AND 28)
        |SELECT aid, npts, vi, vx, vy, vz, w FROM vv JOIN keep USING (aid)"""
        .stripMargin)),

    // P8o: grid-bucketed k-nearest-neighbor lookup over the POINT
    // layer — the spatial-join shape behind "annotations near this
    // point" (the nearest-annotation probe a viewer issues). Contract:
    // RADIUS-BOUNDED kNN — candidates come from the query cell's
    // 3x3x3 neighborhood (cell = 8 voxels, so every neighbor within
    // 8 voxels is guaranteed found), ranked by exact squared distance,
    // k=3. The bounded form is the one that scales: point->cell is a
    // narrow projection (corpus never shuffles for the probe), the
    // 27-cell query expansion broadcasts, and the per-query top-k
    // window rewrites to WindowGroupLimit. Unbounded exact kNN is an
    // expanding-ring loop of this same round.
    "p8o_annotation_knn" -> Q(
      (s, dir) => {
        val sess = s
        import sess.implicits._
        val qpts = Seq((1L, 10L, 10L, 10L), (2L, 32L, 16L, 8L),
          (3L, 55L, 60L, 30L), (4L, 5L, 50L, 20L))
          .toDF("qid", "qx", "qy", "qz")
        val qcells = qpts
          .withColumn("ox", explode(expr("sequence(-1L, 1L)")))
          .withColumn("oy", explode(expr("sequence(-1L, 1L)")))
          .withColumn("oz", explode(expr("sequence(-1L, 1L)")))
          .select(col("qid"), col("qx"), col("qy"), col("qz"),
            expr("qx div 8 + ox").as("cx"),
            expr("qy div 8 + oy").as("cy"),
            expr("qz div 8 + oz").as("cz"))
        val pts = pointsDf(s, dir).select(col("aid"), col("ax"),
            col("ay"), col("az"))
          .withColumn("cx", expr("ax div 8"))
          .withColumn("cy", expr("ay div 8"))
          .withColumn("cz", expr("az div 8"))
        pts.join(broadcast(qcells), Seq("cx", "cy", "cz"))
          .withColumn("d2", expr(
            "(ax - qx) * (ax - qx) + (ay - qy) * (ay - qy) + " +
              "(az - qz) * (az - qz)"))
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("qid")
              .orderBy(col("d2").asc, col("aid").asc)).cast("long"))
          .filter(col("rank") <= 3)
          .select("qid", "rank", "aid", "d2")
      },
      Some(s"""WITH $PtsCte,
        |q AS (SELECT * FROM (VALUES (1, 10, 10, 10), (2, 32, 16, 8),
        |       (3, 55, 60, 30), (4, 5, 50, 20)) AS q(qid, qx, qy, qz)),
        |cand AS (SELECT q.qid, p.aid,
        |    (p.ax - q.qx) * (p.ax - q.qx)
        |      + (p.ay - q.qy) * (p.ay - q.qy)
        |      + (p.az - q.qz) * (p.az - q.qz) AS d2
        |  FROM q JOIN pts p
        |    ON abs(p.ax // 8 - q.qx // 8) <= 1
        |   AND abs(p.ay // 8 - q.qy // 8) <= 1
        |   AND abs(p.az // 8 - q.qz // 8) <= 1),
        |r AS (SELECT qid, aid, d2, row_number() OVER (PARTITION BY qid
        |        ORDER BY d2, aid) AS rank FROM cand)
        |SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
        |  aid, CAST(d2 AS BIGINT) AS d2
        |FROM r WHERE rank <= 3""".stripMargin)),
  )
}
