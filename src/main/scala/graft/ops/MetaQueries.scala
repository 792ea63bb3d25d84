package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import graft.core._
import graft.sources.PrecomputedIO

/** Metadata / projection / scalar-function operators (F6, F8, F19,
  * F20, P1-P5, O4, A11) — the scale math, slicing, ROI, and utility
  * surface of the reference frontend.
  *
  * Scale shape: everything here is either metadata-sized (mip tables,
  * ROIs — driver-computed via the pure core library, then
  * parallelized) or a narrow map over a fact table (stride filters,
  * normalize, batching) with at most one aggregate.
  */
object MetaQueries {
  import Derived.{table, boxes, BoxesCte, idiv}

  /** Test volume for the scale math: offset NOT divisible by the mip
    * factors, so voxel_offset flooring is exercised
    * (metadata.py:786-792 comment block).
    */
  private val ScaleVol = VolumeMeta(
    layerType = "segmentation", dataType = "uint32", numChannels = 1,
    scales = Seq(ScaleMeta(
      key = "4_4_40", encoding = "raw", resolution = Seq(4, 4, 40),
      chunkSize = Vec3(16, 16, 8), size = Vec3(60, 60, 28),
      voxelOffset = Vec3(3, 5, 2))))

  /** Shifted boxes: every 7th box pushed past the volume so the
    * no-overlap branch of autocrop/oob has real rows.
    */
  private def shiftedBoxes(s: SparkSession, dir: String): DataFrame = {
    val sh = when(col("id") % 7 === 0, lit(60L)).otherwise(lit(0L))
    boxes(s, dir).select(col("id"),
      (col("x0") + sh).as("x0"), (col("y0") + sh).as("y0"),
      (col("z0") + sh).as("z0"), (col("x1") + sh).as("x1"),
      (col("y1") + sh).as("y1"), (col("z1") + sh).as("z1"))
  }

  private val ShiftedBoxesCte = BoxesCte +
    """,
      |sboxes AS (
      |  SELECT id, x0 + sh AS x0, y0 + sh AS y0, z0 + sh AS z0,
      |         x1 + sh AS x1, y1 + sh AS y1, z1 + sh AS z1
      |  FROM (SELECT *, CASE WHEN id % 7 = 0 THEN 60 ELSE 0 END AS sh
      |        FROM boxes))""".stripMargin

  val queries: Map[String, Q] = Map(

    // F6: unit conversion vx -> physical nm via the scale resolution
    // (lib.py:372-413 Vec unit algebra; resolution from the info)
    "f6_unit_conversion" -> Q(
      (s, dir) => {
        val res = ScaleVol.scale(0).resolution.map(_.toLong)
        boxes(s, dir).select(col("id"),
          (col("x0") * res(0)).as("nx0"), (col("y0") * res(1)).as("ny0"),
          (col("z0") * res(2)).as("nz0"), (col("x1") * res(0)).as("nx1"),
          (col("y1") * res(1)).as("ny1"), (col("z1") * res(2)).as("nz1"))
      },
      Some(s"""WITH $BoxesCte
        |SELECT id, x0 * 4 AS nx0, y0 * 4 AS ny0, z0 * 40 AS nz0,
        |       x1 * 4 AS nx1, y1 * 4 AS ny1, z1 * 40 AS nz1
        |FROM boxes""".stripMargin)),

    // F8: add_scale mip pyramid math (metadata.py:743-838): size
    // ceils, voxel_offset floors, resolution scales, key re-renders;
    // chunk size via find_closest_divisor (lib.py:170-204)
    "f8_downscale" -> Q(
      (s, dir) => {
        import s.implicits._
        (1 to 4).map { m =>
          val f = Vec3(1L << m, 1L << m, 1L << math.max(m - 2, 0))
          val sc = ScaleVol.addScale(f)
          (m.toLong, sc.key, sc.resolution(0).toLong, sc.resolution(1).toLong,
            sc.resolution(2).toLong, sc.chunkSize.x, sc.chunkSize.y,
            sc.chunkSize.z, sc.voxelOffset.x, sc.voxelOffset.y,
            sc.voxelOffset.z, sc.size.x, sc.size.y, sc.size.z)
        }.toDF("mip", "key", "rx", "ry", "rz", "csx", "csy", "csz",
          "ox", "oy", "oz", "sx", "sy", "sz")
      },
      Some("""WITH m AS (SELECT unnest(range(1, 5)) AS mip),
        |f AS (SELECT mip, 1 << mip AS fx, 1 << mip AS fy,
        |        1 << greatest(mip - 2, 0) AS fz FROM m)
        |SELECT mip,
        |  (4 * fx) || '_' || (4 * fy) || '_' || (40 * fz) AS key,
        |  4 * fx AS rx, 4 * fy AS ry, 40 * fz AS rz,
        |  16 AS csx, 16 AS csy, 8 AS csz,
        |  3 // fx AS ox, 5 // fy AS oy, 2 // fz AS oz,
        |  (60 + fx - 1) // fx AS sx, (60 + fy - 1) // fy AS sy,
        |  (28 + fz - 1) // fz AS sz
        |FROM f""".stripMargin)),

    // F8: find_closest_divisor with the reference's first-encountered
    // tie-break (strict < over the i, n/i enumeration — lib.py:186-198)
    "f8_closest_divisor" -> Q(
      (s, dir) => {
        val divUdf = udf((n: Long, ct: Long) =>
          Geom.findClosestDivisor(Vec3(n, n, n), Vec3(ct, ct, ct)).x)
        table(s, dir, "part").select(
          (lit(1L) + col("p_partkey") % 96).as("n"),
          (lit(1L) + col("p_partkey") % 17).as("ct")).distinct()
          .withColumn("closest", divUdf(col("n"), col("ct")))
      },
      Some("""WITH src AS (SELECT DISTINCT 1 + p_partkey % 96 AS n,
        |         1 + p_partkey % 17 AS ct FROM part),
        |d AS (SELECT n, ct, unnest(range(1, n + 1)) AS dv FROM src),
        |dd AS (SELECT n, ct, dv FROM d WHERE n % dv = 0),
        |rk AS (SELECT n, ct, dv, row_number() OVER (
        |         PARTITION BY n, ct
        |         ORDER BY abs(dv - ct), least(dv, n // dv),
        |                  CASE WHEN dv * dv <= n THEN 0 ELSE 1 END) AS r
        |       FROM dd)
        |SELECT n, ct, dv AS closest FROM rk WHERE r = 1""".stripMargin)),

    // P1: slice reification (lib.py:618-699 reify_slices with
    // autocrop): None binds to the bounds, out-of-range clamps, step
    // passes through
    "p1_slice_reify" -> Q(
      (s, dir) => {
        val reifyUdf = udf((start: java.lang.Long, stop: java.lang.Long,
            step: java.lang.Long) => {
          val r = Geom.reifySlice(Option(start).map(_.toLong),
            Option(stop).map(_.toLong), Option(step).map(_.toLong), 0L, 64L)
          (r._1, r._2, r._3)
        })
        table(s, dir, "orders").select(col("o_orderkey").as("id"),
          when(col("o_orderkey") % 5 === 0, lit(null))
            .otherwise(col("o_orderkey") % 80 - 8).cast("long").as("sstart"),
          when(col("o_custkey") % 5 === 0, lit(null))
            .otherwise(col("o_custkey") % 90 - 5).cast("long").as("sstop"),
          (lit(1L) + col("o_orderkey") % 3).as("sstep"))
          .withColumn("r", reifyUdf(col("sstart"), col("sstop"), col("sstep")))
          .select(col("id"), col("r._1").as("rstart"),
            col("r._2").as("rstop"), col("r._3").as("rstep"))
      },
      Some("""WITH src AS (
        |  SELECT o_orderkey AS id,
        |    CASE WHEN o_orderkey % 5 = 0 THEN NULL
        |         ELSE o_orderkey % 80 - 8 END AS sstart,
        |    CASE WHEN o_custkey % 5 = 0 THEN NULL
        |         ELSE o_custkey % 90 - 5 END AS sstop,
        |    1 + o_orderkey % 3 AS sstep
        |  FROM orders)
        |SELECT id,
        |  CASE WHEN sstart IS NULL THEN 0
        |       ELSE greatest(0, least(sstart, 64)) END AS rstart,
        |  CASE WHEN sstop IS NULL THEN 64
        |       ELSE greatest(0, least(sstop, 64)) END AS rstop,
        |  sstep AS rstep
        |FROM src""".stripMargin)),

    // P3: autocrop — reference-exact intersection with the volume
    // bounds; disjoint requests collapse to the zero box
    // (lib.py:447-470, datasource/__init__.py:73-79)
    "p3_autocrop" -> Q(
      (s, dir) => {
        val vol = Bbox(Vec3(0, 0, 0), Vec3(64, 64, 32))
        val cropUdf = udf((x0: Long, y0: Long, z0: Long, x1: Long, y1: Long,
            z1: Long) => {
          val b = Bbox.intersectionZero(
            Bbox(Vec3(x0, y0, z0), Vec3(x1, y1, z1)), vol)
          (b.minpt.x, b.minpt.y, b.minpt.z, b.maxpt.x, b.maxpt.y, b.maxpt.z)
        })
        shiftedBoxes(s, dir)
          .withColumn("c", cropUdf(col("x0"), col("y0"), col("z0"),
            col("x1"), col("y1"), col("z1")))
          .select(col("id"), col("c._1").as("cx0"), col("c._2").as("cy0"),
            col("c._3").as("cz0"), col("c._4").as("cx1"),
            col("c._5").as("cy1"), col("c._6").as("cz1"))
      },
      Some(s"""WITH $ShiftedBoxesCte,
        |o AS (SELECT *, (x0 < 64 AND x1 > 0 AND y0 < 64 AND y1 > 0
        |                 AND z0 < 32 AND z1 > 0) AS ov FROM sboxes)
        |SELECT id,
        |  CASE WHEN ov THEN greatest(x0, 0) ELSE 0 END AS cx0,
        |  CASE WHEN ov THEN greatest(y0, 0) ELSE 0 END AS cy0,
        |  CASE WHEN ov THEN greatest(z0, 0) ELSE 0 END AS cz0,
        |  CASE WHEN ov THEN least(x1, 64) ELSE 0 END AS cx1,
        |  CASE WHEN ov THEN least(y1, 64) ELSE 0 END AS cy1,
        |  CASE WHEN ov THEN least(z1, 32) ELSE 0 END AS cz1
        |FROM o""".stripMargin)),

    // P4: bounded / out-of-bounds check (image/__init__.py:82-100,
    // lib.py:497-502): containment is inclusive of the upper face
    "p4_oob" -> Q(
      (s, dir) => {
        val vol = Bbox(Vec3(0, 0, 0), Vec3(64, 64, 32))
        shiftedBoxes(s, dir).select(col("id"),
          (col("x0") >= vol.minpt.x && col("y0") >= vol.minpt.y &&
            col("z0") >= vol.minpt.z && col("x1") <= vol.maxpt.x &&
            col("y1") <= vol.maxpt.y && col("z1") <= vol.maxpt.z)
            .as("in_bounds"))
      },
      Some(s"""WITH $ShiftedBoxesCte
        |SELECT id, (x0 >= 0 AND y0 >= 0 AND z0 >= 0 AND x1 <= 64
        |            AND y1 <= 64 AND z1 <= 32) AS in_bounds
        |FROM sboxes""".stripMargin)),

    // P5: ROI overlap predicate — the ROIs come from the REAL parsed
    // info of the fixture layer (F15), overlap is inclusive-boundary
    // (metadata.py:702-722 overlaps_roi, lib.py:889-895)
    "p5_roi_overlap" -> Q(
      (s, dir) => {
        RealLayerQueries.ensure(s, dir)
        val rois = PrecomputedIO.readInfo(RealLayerQueries.LayerDir)
          .sortedRois.get
        val overlap = rois.map { r =>
          col("x1") >= r.minpt.x && lit(r.maxpt.x) >= col("x0") &&
            col("y1") >= r.minpt.y && lit(r.maxpt.y) >= col("y0") &&
            col("z1") >= r.minpt.z && lit(r.maxpt.z) >= col("z0")
        }.reduce(_ || _)
        boxes(s, dir).select(col("id"), overlap.as("in_roi"))
      },
      Some(s"""WITH $BoxesCte,
        |rois(rx0, ry0, rz0, rx1, ry1, rz1) AS (VALUES
        |  (30, 4, 16, 58, 30, 26), (2, 2, 2, 20, 24, 12),
        |  (10, 36, 8, 40, 58, 20))
        |SELECT id, EXISTS (SELECT 1 FROM rois
        |  WHERE x1 >= rx0 AND rx1 >= x0 AND y1 >= ry0 AND ry1 >= y0
        |    AND z1 >= rz0 AND rz1 >= z0) AS in_roi
        |FROM boxes""".stripMargin)),

    // P5 short-circuit: a cutout entirely outside the declared ROIs
    // returns a background buffer with zero chunk IO (rx.py:281-285;
    // the fixture's ROIs all end by z=26, the request sits at z=27)
    "p5b_roi_shortcircuit" -> Q(
      (s, dir) => {
        RealLayerQueries.ensure(s, dir)
        PrecomputedIO.cutoutVoxels(s, RealLayerQueries.LayerDir,
          Bbox(Vec3(0, 0, 27), Vec3(60, 60, 28)))
      },
      Some(s"""SELECT x, y, z, CAST(0 AS BIGINT) AS label
        |FROM read_parquet('${RealLayerQueries.VoxelsDir}/*.parquet')
        |WHERE z = 27""".stripMargin)),

    // P2: strided cutout projection (frontends/precomputed.py:582-588
    // final [::sx,::sy,::sz] view) over the real layer
    "p2_stride_cutout" -> Q(
      (s, dir) => {
        RealLayerQueries.ensure(s, dir)
        PrecomputedIO.cutoutVoxels(s, RealLayerQueries.LayerDir,
          Bbox(Vec3(4, 6, 2), Vec3(52, 46, 24)))
          .filter((col("x") - 4) % 2 === 0 && (col("y") - 6) % 3 === 0 &&
            (col("z") - 2) % 2 === 0)
      },
      Some(s"""SELECT x, y, z, label
        |FROM read_parquet('${RealLayerQueries.VoxelsDir}/*.parquet')
        |WHERE x BETWEEN 4 AND 51 AND y BETWEEN 6 AND 45
        |  AND z BETWEEN 2 AND 23
        |  AND (x - 4) % 2 = 0 AND (y - 6) % 3 = 0
        |  AND (z - 2) % 2 = 0""".stripMargin)),

    // O4: ROI list z-sorted at parse time (metadata.py:191-201)
    "o4_roi_sort" -> Q(
      (s, dir) => {
        RealLayerQueries.ensure(s, dir)
        import s.implicits._
        PrecomputedIO.readInfo(RealLayerQueries.LayerDir)
          .sortedRois.get.zipWithIndex.map { case (b, i) =>
            (i.toLong, b.minpt.x, b.minpt.y, b.minpt.z,
              b.maxpt.x, b.maxpt.y, b.maxpt.z)
          }.toDF("rank", "rx0", "ry0", "rz0", "rx1", "ry1", "rz1")
      },
      Some("""SELECT * FROM (VALUES
        |  (0, 2, 2, 2, 20, 24, 12),
        |  (1, 10, 36, 8, 40, 58, 20),
        |  (2, 30, 4, 16, 58, 30, 26))
        |  AS t(rank, rx0, ry0, rz0, rx1, ry1, rz1)""".stripMargin)),

    // F15 provenance ROUNDTRIP (test_cloudvolume.py:1036
    // test_provenance; provenance.py DataLayerProvenance): a
    // processing audit log derived from orders is committed as the
    // layer's provenance JSON and read back through the json5-tolerant
    // parser — write + parse oracle-gated end-to-end (the reference
    // appends {'method': ..., 'by': ...} entries and round-trips them
    // through commit_provenance/refresh_provenance). Metadata-sized:
    // one small JSON object, like the reference's one-per-layer file.
    "f15_provenance_roundtrip" -> Q(
      (s, dir) => MetaQueries.synchronized {
        import s.implicits._
        val methods = Seq("downsample", "remap", "transfer", "mesh")
        val entries = table(s, dir, "orders")
          .filter(col("o_orderkey") % 500 === 3)
          .select(col("o_orderkey").cast("long").as("k"),
            (col("o_custkey") % 10).cast("long").as("w"))
          .orderBy("k")
          .as[(Long, Long)].collect() // audit log: metadata-sized
          .map { case (k, w) =>
            s"""{"method":"${methods((k % 4).toInt)}","by":"worker-$w","task":$k}"""
          }
        val target = java.nio.file.Paths.get(
          "/tmp/graft_fixture/provenance_rt.json")
        java.nio.file.Files.createDirectories(target.getParent)
        java.nio.file.Files.writeString(target, Provenance.toJson(Provenance(
          description = "graft synthesized layer",
          sources = Seq("file:///tmp/graft_fixture/layer"),
          processing = entries.toSeq,
          owners = Seq("graft@example.org"))))
        val back = Provenance.fromJson(
          java.nio.file.Files.readString(target))
        back.processing.zipWithIndex.map { case (e, i) =>
          val m = """"method":"([a-z]+)"""".r.findFirstMatchIn(e).get.group(1)
          val b = """"by":"([-a-z0-9]+)"""".r.findFirstMatchIn(e).get.group(1)
          val t = """"task":(\d+)""".r.findFirstMatchIn(e).get.group(1).toLong
          (i.toLong, m, b, t)
        }.toSeq.toDS().toDF("seq", "method", "actor", "task")
      },
      Some("""WITH p AS (
        |  SELECT o_orderkey AS k, o_custkey % 10 AS w FROM orders
        |  WHERE o_orderkey % 500 = 3),
        |r AS (SELECT k, w, CAST(row_number() OVER (ORDER BY k) - 1 AS BIGINT) AS seq FROM p)
        |SELECT seq,
        |  CASE k % 4 WHEN 0 THEN 'downsample' WHEN 1 THEN 'remap'
        |             WHEN 2 THEN 'transfer' ELSE 'mesh' END AS method,
        |  'worker-' || w AS actor, k AS task
        |FROM r""".stripMargin)),

    // A11: cache stats — files + (uncompressed) bytes PER MIP of the
    // real two-scale layer (cacheservice.py:98-130 num_files/num_bytes)
    "a11_cache_stats" -> Q(
      (s, dir) => {
        RealLayerQueries.ensure(s, dir)
        def one(mip: Int) =
          PrecomputedIO.readChunks(s, RealLayerQueries.LayerDir, mip)
            .agg(count(lit(1)).as("num_files"),
              sum(length(col("payload")).cast("long")).as("num_bytes"))
            .select(lit(mip.toLong).as("mip"), col("num_files"),
              col("num_bytes"))
        one(0).unionAll(one(1))
      },
      Some(s"""WITH v AS (
        |  SELECT * FROM read_parquet('${RealLayerQueries.VoxelsDir}/*.parquet')),
        |m0 AS (SELECT CAST(0 AS BIGINT) AS mip,
        |  count(DISTINCT (x // 16, y // 16, z // 8)) AS num_files,
        |  count(*) * 4 AS num_bytes FROM v),
        |m1 AS (SELECT CAST(1 AS BIGINT) AS mip,
        |  count(DISTINCT ((x // 2) // 16, (y // 2) // 16, (z // 2) // 8))
        |    AS num_files,
        |  count(*) * 4 AS num_bytes FROM v
        |  WHERE x % 2 = 0 AND y % 2 = 0 AND z % 2 = 0)
        |SELECT * FROM m0 UNION ALL SELECT * FROM m1""".stripMargin)),

    // F19: save_images-style global min-max normalization to u8
    // (lib.py:1015-1117), integer-exact in both engines
    "f19_normalize" -> Q(
      (s, dir) => {
        val v = Derived.voxels(s, dir)
        val stats = v.agg(min(col("label")).as("mn"), max(col("label")).as("mx"))
        v.crossJoin(broadcast(stats))
          .select(col("x"), col("y"), col("z"),
            floor((col("label") - col("mn")) * 255 / (col("mx") - col("mn")))
              .cast("long").as("norm"))
      },
      Some(s"""WITH ${Derived.VoxelsCte},
        |stats AS (SELECT min(label) AS mn, max(label) AS mx FROM voxels)
        |SELECT x, y, z,
        |  (label - mn) * 255 // (mx - mn) AS norm
        |FROM voxels, stats""".stripMargin)),

    // F19: save_images slice EXPORT (lib.py:1071-1115) — the
    // per-slice-normalize variant, whose integer-exact math the oracle
    // replays; one written PNG per z level, pixel (col=x, row=y) per
    // the reference's rot90+flipud z convention, checksummed by the
    // sum of written u8 values. SaveImagesSpec round-trips the actual
    // files through the png decoder.
    "f19b_save_images" -> Q(
      (s, dir) => {
        RealLayerQueries.ensure(s, dir)
        val vox = s.read.parquet(RealLayerQueries.VoxelsDir)
          .select(col("x"), col("y"), col("z"), col("label").as("value"))
        SaveImages.saveImages(s, vox,
          s"${RealLayerQueries.Root}/saved_images",
          Vec3(RealLayerQueries.SX, RealLayerQueries.SY,
            RealLayerQueries.SZ),
          axis = "z", globalNorm = false)
      },
      Some(s"""WITH v AS (SELECT *
        |  FROM read_parquet('${RealLayerQueries.VoxelsDir}/*.parquet')),
        |st AS (SELECT z, min(label) AS mn, max(label) AS mx
        |       FROM v GROUP BY z)
        |SELECT v.z AS level, CAST(0 AS BIGINT) AS c,
        |  lpad(CAST(v.z AS VARCHAR), 5, '0') || '.png' AS filename,
        |  CAST(${RealLayerQueries.SX} AS BIGINT) AS width,
        |  CAST(${RealLayerQueries.SY} AS BIGINT) AS height,
        |  CAST(sum(CASE WHEN st.mx = st.mn THEN 0
        |    ELSE (v.label - st.mn) * 255 // (st.mx - st.mn) END)
        |    AS BIGINT) AS pxsum
        |FROM v JOIN st USING (z)
        |GROUP BY v.z""".stripMargin)),

    // F19: save_images INTEGER passthrough — the reference normalizes
    // only floating dtypes (lib.py:1064,:1087 np.issubdtype gates);
    // integer volumes rasterize unchanged. value = label % 256 models
    // a uint8 source; the oracle sums the raw values per slice.
    "f19c_save_images_u8" -> Q(
      (s, dir) => {
        RealLayerQueries.ensure(s, dir)
        val vox = s.read.parquet(RealLayerQueries.VoxelsDir)
          .select(col("x"), col("y"), col("z"),
            (col("label") % 256).as("value"))
        SaveImages.saveImages(s, vox,
          s"${RealLayerQueries.Root}/saved_images_u8",
          Vec3(RealLayerQueries.SX, RealLayerQueries.SY,
            RealLayerQueries.SZ),
          axis = "z", normalize = false)
      },
      Some(s"""WITH v AS (SELECT *
        |  FROM read_parquet('${RealLayerQueries.VoxelsDir}/*.parquet'))
        |SELECT v.z AS level, CAST(0 AS BIGINT) AS c,
        |  lpad(CAST(v.z AS VARCHAR), 5, '0') || '.png' AS filename,
        |  CAST(${RealLayerQueries.SX} AS BIGINT) AS width,
        |  CAST(${RealLayerQueries.SY} AS BIGINT) AS height,
        |  CAST(sum(v.label % 256) AS BIGINT) AS pxsum
        |FROM v GROUP BY v.z""".stripMargin)),

    // W6 (pipeline extension): gaps-and-islands sessionization of the
    // events stream — a new session starts after a >30-minute gap per
    // user; the same window shape as S7's range bundling, applied to
    // the training-data log-processing case
    "w6_sessionize" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val src = table(s, dir, "events")
        val e = src.select(col("event_id"), col("user_id"),
          Derived.tsMicros(src.schema).as("ts"))
        val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
        e.withColumn("prev_ts", lag(col("ts"), 1).over(wOrd))
          .withColumn("new_sess",
            when(col("prev_ts").isNull ||
              col("ts") - col("prev_ts") > 1800L * 1000000L, 1L)
              .otherwise(0L))
          .withColumn("session_idx", sum(col("new_sess")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, 0)))
          .select(col("event_id"), col("user_id"), col("session_idx"))
      },
      Some("""WITH e AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tus FROM events),
        |g AS (SELECT event_id, user_id, tus,
        |        lag(tus) OVER w AS prev_ts
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |n AS (SELECT event_id, user_id, tus,
        |        CASE WHEN prev_ts IS NULL
        |                  OR tus - prev_ts > 1800000000 THEN 1
        |             ELSE 0 END AS new_sess
        |      FROM g)
        |SELECT event_id, user_id,
        |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_idx
        |FROM n""".stripMargin)),

    // W10 (pipeline extension): first-order Markov transition matrix
    // over the event stream — the per-user behavioral model behind
    // next-event prediction and anomaly scoring. The lag window runs
    // PARTITIONED by user_id (never a global window), the transition
    // count is one keyed aggregate over (prev, next) pairs — a
    // state-space-sized table, not an event-sized one — and the
    // per-source normalization joins a broadcast total. Probabilities
    // kept in integer ppm so the oracle replays exactly.
    "w10_markov_transitions" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val src = table(s, dir, "events")
        val e = src.select(col("event_id"), col("user_id"),
          col("event_type"), Derived.tsMicros(src.schema).as("ts"))
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val pairs = e
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type").as("next_type"))
          .agg(count(lit(1)).as("n"))
        val tot = pairs.groupBy("prev_type").agg(sum("n").as("tot"))
        pairs.join(broadcast(tot), Seq("prev_type"))
          .withColumn("p_ppm", expr("n * 1000000 div tot"))
          .select("prev_type", "next_type", "n", "p_ppm")
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
        |          epoch_ns(ts) // 1000 AS tus FROM events),
        |g AS (SELECT user_id, event_type,
        |        lag(event_type) OVER (PARTITION BY user_id
        |          ORDER BY tus, event_id) AS prev_type
        |      FROM e),
        |p AS (SELECT prev_type, event_type AS next_type,
        |        CAST(count(*) AS BIGINT) AS n
        |      FROM g WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot
        |      FROM p GROUP BY 1)
        |SELECT p.prev_type, p.next_type, p.n,
        |  p.n * 1000000 // t.tot AS p_ppm
        |FROM p JOIN t USING (prev_type)""".stripMargin)),

    // W12 (pipeline extension): SEMI-STRUCTURED column handling — the
    // events table's `props` column is a JSON string; extract a typed
    // field (get_json_object, codegen'd) and aggregate it per event
    // type. The log-processing reality at 100 TB: JSON stays a string
    // in the lake, extraction is a narrow map feeding a partial-agg'd
    // keyed aggregate — no UDF, no schema migration. Integer stats so
    // the oracle (json_extract_string in DuckDB) replays exactly.
    "w12_props_json_agg" -> Q(
      (s, dir) => {
        table(s, dir, "events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("k").as("k_sum"),
            min("k").as("k_min"), max("k").as("k_max"))
      },
      Some("""WITH e AS (SELECT event_type,
        |          CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |        FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(k) AS BIGINT) AS k_sum,
        |  CAST(min(k) AS BIGINT) AS k_min,
        |  CAST(max(k) AS BIGINT) AS k_max
        |FROM e GROUP BY 1""".stripMargin)),

    // W15 (pipeline extension): the VARIANT version of w12 — Spark 4's
    // open-schema path for semi-structured columns: parse_json()
    // shreds the string ONCE into the binary variant encoding, and
    // every later variant_get() walks that encoding instead of
    // re-parsing text (w12's get_json_object re-parses per path — at
    // two extractions the variant scan already halves the parse work,
    // and a real lakehouse props column carries dozens). Extractions
    // stay codegen'd scalar expressions; the aggregate is the same
    // partial-agg'd groupBy. The derived flag (k div 10) stands in
    // for the second extraction path.
    "w15_variant_extract" -> Q(
      (s, dir) => {
        val v = table(s, dir, "events")
          .select(col("event_type"), parse_json(col("props")).as("pv"))
          .select(col("event_type"),
            variant_get(col("pv"), "$.k", "long").as("k"))
          .select(col("event_type"), col("k"),
            expr("k div 10").as("kdiv"))
        v.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("k").as("k_sum"),
            sum("kdiv").as("kdiv_sum"),
            sum(when(col("k") >= 50, 1L).otherwise(0L)).as("n_big"))
      },
      Some("""WITH e AS (SELECT event_type,
        |          CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |        FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(k) AS BIGINT) AS k_sum,
        |  CAST(sum(k // 10) AS BIGINT) AS kdiv_sum,
        |  CAST(sum(CASE WHEN k >= 50 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_big
        |FROM e GROUP BY 1""".stripMargin)),

    // W7 (pipeline extension): ordered funnel analysis — the product-
    // analytics pass over the event log (view -> click -> purchase,
    // each step's timestamp strictly after the previous step's). Two
    // co-partitioned joins on user_id (each step table is a per-user
    // min agg — partial-agg'd map-side), no windows, no global state;
    // at 100 TB every step is one keyed shuffle of (user, ts) pairs.
    "w7_funnel" -> Q(
      (s, dir) => {
        val src = table(s, dir, "events")
        val e = src.select(col("user_id"), col("event_type"),
          Derived.tsMicros(src.schema).as("tus"))
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("tus").as("t_view"))
        val c = e.filter(col("event_type") === "click")
          .join(v, "user_id").filter(col("tus") > col("t_view"))
          .groupBy("user_id").agg(min("tus").as("t_click"))
        val p = e.filter(col("event_type") === "purchase")
          .join(c, "user_id").filter(col("tus") > col("t_click"))
          .groupBy("user_id").agg(min("tus").as("t_purchase"))
        v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
          .select(col("user_id"), col("t_view"),
            coalesce(col("t_click"), lit(-1L)).as("t_click"),
            coalesce(col("t_purchase"), lit(-1L)).as("t_purchase"),
            (lit(1L) + col("t_click").isNotNull.cast("long") +
              col("t_purchase").isNotNull.cast("long"))
              .as("steps_completed"))
      },
      Some("""WITH e AS (SELECT user_id, event_type,
        |          epoch_ns(ts) // 1000 AS tus FROM events),
        |v AS (SELECT user_id, CAST(min(tus) AS BIGINT) AS t_view
        |      FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, CAST(min(e.tus) AS BIGINT) AS t_click
        |      FROM e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.tus > v.t_view
        |      GROUP BY 1),
        |p AS (SELECT e.user_id, CAST(min(e.tus) AS BIGINT) AS t_purchase
        |      FROM e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.tus > c.t_click
        |      GROUP BY 1)
        |SELECT v.user_id, v.t_view,
        |  coalesce(c.t_click, -1) AS t_click,
        |  coalesce(p.t_purchase, -1) AS t_purchase,
        |  CAST(1 + (CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END)
        |    + (CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS steps_completed
        |FROM v LEFT JOIN c USING (user_id)
        |LEFT JOIN p USING (user_id)""".stripMargin)),

    // W14 (pipeline extension): AS-OF JOIN — every purchase event
    // matched to the user's latest signup at-or-before its timestamp
    // (the event-to-dimension-history pattern behind slowly-changing
    // attributes, feature stores, and point-in-time-correct training
    // joins). The scalable formulation: tag both sides, ONE shuffle
    // keyed by user, a per-user running max of the build-side
    // timestamp (build rows sort before probes on ties, so "at or
    // before" includes equal timestamps), then a co-keyed join back
    // for the build row's payload — never a per-probe range scan, and
    // the window is bounded by one user's history, never global.
    // Purchases with no prior signup surface as -1 (the LEFT branch).
    "w14_asof_join" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val src = table(s, dir, "events")
        val e = src.select(col("event_id"), col("user_id"),
          col("event_type"), Derived.tsMicros(src.schema).as("tus"))
        val st = e.filter(col("event_type") === "signup")
          .groupBy("user_id", "tus").agg(max("event_id").as("state_id"))
        val pr = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("tus"))
        val tagged = st.select(col("user_id"), col("tus"),
            lit(1).as("is_b"), lit(-1L).as("purchase_id"))
          .unionAll(pr.select(col("user_id"), col("tus"),
            lit(0).as("is_b"), col("purchase_id")))
        val w = Window.partitionBy("user_id")
          .orderBy(col("tus").asc, col("is_b").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tagged
          .withColumn("asof_tus",
            max(when(col("is_b") === 1, col("tus"))).over(w))
          .filter(col("is_b") === 0)
          .select(col("purchase_id"), col("user_id"), col("asof_tus"))
          .join(st.withColumnRenamed("tus", "asof_tus"),
            Seq("user_id", "asof_tus"), "left")
          .select(col("purchase_id"), col("user_id"),
            coalesce(col("asof_tus"), lit(-1L)).as("state_tus"),
            coalesce(col("state_id"), lit(-1L)).as("state_id"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
        |          epoch_ns(ts) // 1000 AS tus FROM events),
        |st AS (SELECT user_id, tus, CAST(max(event_id) AS BIGINT)
        |         AS state_id
        |       FROM e WHERE event_type = 'signup' GROUP BY 1, 2),
        |pr AS (SELECT event_id AS purchase_id, user_id, tus FROM e
        |       WHERE event_type = 'purchase'),
        |u AS (SELECT user_id, tus, 1 AS is_b,
        |        CAST(-1 AS BIGINT) AS purchase_id FROM st
        |      UNION ALL
        |      SELECT user_id, tus, 0 AS is_b, purchase_id FROM pr),
        |w AS (SELECT *, max(CASE WHEN is_b = 1 THEN tus END) OVER (
        |        PARTITION BY user_id ORDER BY tus ASC, is_b DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        AS asof_tus FROM u),
        |p AS (SELECT purchase_id, user_id, asof_tus FROM w
        |      WHERE is_b = 0)
        |SELECT p.purchase_id, p.user_id,
        |  CAST(coalesce(p.asof_tus, -1) AS BIGINT) AS state_tus,
        |  CAST(coalesce(st.state_id, -1) AS BIGINT) AS state_id
        |FROM p LEFT JOIN st
        |  ON st.user_id = p.user_id AND st.tus = p.asof_tus""".stripMargin)),

    // W8 (pipeline extension): retention cohorts — users grouped by
    // first-activity day, counted on each later activity-day offset
    // (the (cohort x day-N) retention matrix every analytics engine
    // ships). Integral day buckets from epoch micros; one per-user
    // min agg + one distinct (user, day) set + one keyed join — all
    // partial-agg'd, the matrix itself is (days x days)-sized, tiny
    // at any corpus scale.
    "w8_retention" -> Q(
      (s, dir) => {
        val src = table(s, dir, "events")
        val e = src.select(col("user_id"),
          Derived.tsMicros(src.schema).as("tus"))
          .select(col("user_id"),
            expr("tus div 86400000000").as("day"))
        val cohort = e.groupBy("user_id").agg(min("day").as("cohort_day"))
        val active = e.distinct()
        active.join(cohort, "user_id")
          .groupBy(col("cohort_day"),
            (col("day") - col("cohort_day")).as("day_offset"))
          .agg(countDistinct("user_id").as("n_users"))
      },
      Some("""WITH e AS (SELECT user_id,
        |          (epoch_ns(ts) // 1000) // 86400000000 AS day
        |        FROM events),
        |cohort AS (SELECT user_id, CAST(min(day) AS BIGINT)
        |             AS cohort_day FROM e GROUP BY 1),
        |active AS (SELECT DISTINCT user_id, day FROM e)
        |SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM active a JOIN cohort c USING (user_id)
        |GROUP BY 1, 2""".stripMargin)),

    // W9 (pipeline extension): z-score outlier detection per
    // (event_type, day) — the monitoring/data-validation pass — with
    // the z² > 2.89 test done in EXACT integers: (n·v − S)² · 100 >
    // 289 · (nQ − S²) avoids every division, so both engines agree
    // bit-for-bit with no float ever materialized. Values are whole
    // units (not cents): with v <= 512 the worst term 289·n·Q stays
    // under 2^63 through n ~ 1.3e5 rows per (type, day) group — two
    // decades past the sf1 replica, which OVERFLOWED the cents
    // version (the scale-slope protocol caught it); past that the
    // algebra moves to the centered two-pass form. One partial-agg
    // groupBy builds the (n, S, Q) moment table (days × types rows —
    // tiny), broadcast back across the events; at 100 TB the moment
    // pass and the flag pass are two scans, zero wide shuffles.
    "w9_anomaly_zscore" -> Q(
      (s, dir) => {
        val src = table(s, dir, "events")
        val e = src.select(col("event_id"), col("event_type"),
          Derived.tsMicros(src.schema).as("tus"),
          round(col("value")).cast("long").as("vc"))
          .select(col("event_id"), col("event_type"),
            expr("tus div 86400000000").as("day"), col("vc"))
        val g = e.groupBy("event_type", "day")
          .agg(count(lit(1)).as("n"), sum("vc").as("s"),
            sum(expr("vc * vc")).as("q"))
        e.join(broadcast(g), Seq("event_type", "day"))
          .filter(expr("(vc * n - s) * (vc * n - s) * 100" +
            " > 289 * (n * q - s * s)"))
          .select(col("event_id"), col("event_type"), col("day"),
            col("vc"), col("n"),
            expr("(vc * n - s) * (vc * n - s) * 100").as("dev2_scaled"),
            expr("289 * (n * q - s * s)").as("threshold"))
      },
      Some("""WITH e AS (SELECT event_id, event_type,
        |          (epoch_ns(ts) // 1000) // 86400000000 AS day,
        |          CAST(round(value) AS BIGINT) AS vc FROM events),
        |g AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(vc) AS BIGINT) AS s,
        |        CAST(sum(vc * vc) AS BIGINT) AS q
        |      FROM e GROUP BY 1, 2)
        |SELECT e.event_id, e.event_type, e.day, e.vc, g.n,
        |  (e.vc * g.n - g.s) * (e.vc * g.n - g.s) * 100 AS dev2_scaled,
        |  289 * (g.n * g.q - g.s * g.s) AS threshold
        |FROM e JOIN g USING (event_type, day)
        |WHERE (e.vc * g.n - g.s) * (e.vc * g.n - g.s) * 100
        |  > 289 * (g.n * g.q - g.s * g.s)""".stripMargin)),

    // Skew-safe exact count-distinct (pipeline extension): events has
    // 5 hot event_type keys over the whole stream — the shape where a
    // naive per-key distinct funnels every row into 5 reducers and
    // melts at 100 TB. The two-stage form dedups on the compound
    // (event_type, user_id) key first — its cardinality spreads the
    // shuffle evenly and the partial agg drains map-side — then counts
    // the tiny distinct set per key. Same decomposition Spark's own
    // COUNT(DISTINCT) planning (Expand + two-phase agg) performs;
    // pinned here as the explicit salt-free skew pattern with oracle.
    "agg_skew_distinct" -> Q(
      (s, dir) => {
        table(s, dir, "events")
          .select(col("event_type"), col("user_id"))
          .groupBy("event_type", "user_id")
          .agg(count(lit(1)).as("n_events"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_users"),
            sum("n_events").as("n_rows"))
      },
      Some("""SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM events GROUP BY 1""".stripMargin)),

    // F20: misc utils — sip fixed-size batching (id div n), scatter
    // round-robin (id mod n), duplicates detection (lib.py:50-118,206-232)
    "f20_batching" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        table(s, dir, "orders").select(col("o_orderkey").as("id"),
          idiv(col("o_orderkey"), 100).as("batch"),
          (col("o_orderkey") % 8).as("worker"),
          col("o_custkey"))
          .withColumn("is_dup",
            count(lit(1)).over(Window.partitionBy("o_custkey")) > 1)
          .select("id", "batch", "worker", "is_dup")
      },
      Some("""SELECT o_orderkey AS id, o_orderkey // 100 AS batch,
        |  o_orderkey % 8 AS worker,
        |  count(*) OVER (PARTITION BY o_custkey) > 1 AS is_dup
        |FROM orders""".stripMargin)),

    // Robust anomaly detection by median/MAD (the heavy-tail-safe
    // complement to w9's z-score): per event_type, exact lower median
    // and median-absolute-deviation, flagging values > 5×MAD out.
    // The exact distributed median does NOT sort raw rows — it
    // aggregates a VALUE HISTOGRAM per (type, value) first (one keyed
    // shuffle, partial-agg friendly), then runs the cumulative-count
    // window over histogram rows only (distinct values per type, not
    // events), electing the value whose cumulative count first covers
    // position (n+1) div 2. Same machinery again on |x − med| for the
    // MAD. At 100 TB the window input is bounded by value cardinality
    // — the corpus itself never passes through a sort.
    "w13_anomaly_mad" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = table(s, dir, "events").select(col("event_type"),
          round(col("value")).cast("long").as("vc"))
        val wCum = Window.partitionBy("event_type").orderBy("vc")
        val wAll = Window.partitionBy("event_type")
        val med = e.groupBy("event_type", "vc")
          .agg(count(lit(1)).as("c"))
          .withColumn("cum", sum("c").over(wCum))
          .withColumn("n", sum("c").over(wAll))
          .filter(expr("cum - c < (n + 1) div 2 AND (n + 1) div 2 <= cum"))
          .select(col("event_type"), col("vc").as("med"), col("n"))
        val dev = e.join(broadcast(med), Seq("event_type"))
          .select(col("event_type"), col("vc"),
            abs(col("vc") - col("med")).as("ad"), col("med"), col("n"))
        val wCumA = Window.partitionBy("event_type").orderBy("ad")
        val mad = dev.groupBy("event_type", "ad")
          .agg(count(lit(1)).as("c"), max("n").as("n"))
          .withColumn("cum", sum("c").over(wCumA))
          .filter(expr("cum - c < (n + 1) div 2 AND (n + 1) div 2 <= cum"))
          .select(col("event_type"), col("ad").as("mad"))
        dev.join(broadcast(mad), Seq("event_type"))
          .groupBy("event_type")
          .agg(max("n").as("n"), max("med").as("med"),
            max("mad").as("mad"),
            sum(expr("IF(ad > 5 * mad, 1L, 0L)")).as("n_outliers"))
      },
      Some("""WITH e AS (SELECT event_type,
        |          CAST(round(value) AS BIGINT) AS vc FROM events),
        |h AS (SELECT event_type, vc, CAST(count(*) AS BIGINT) AS c
        |      FROM e GROUP BY 1, 2),
        |cum AS (SELECT event_type, vc, c,
        |          sum(c) OVER (PARTITION BY event_type ORDER BY vc)
        |            AS cum,
        |          sum(c) OVER (PARTITION BY event_type) AS n
        |        FROM h),
        |med AS (SELECT event_type, vc AS med, CAST(n AS BIGINT) AS n
        |        FROM cum
        |        WHERE cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum),
        |dev AS (SELECT e.event_type, e.vc, abs(e.vc - m.med) AS ad,
        |          m.med, m.n
        |        FROM e JOIN med m USING (event_type)),
        |ha AS (SELECT event_type, ad, CAST(count(*) AS BIGINT) AS c,
        |         max(n) AS n
        |       FROM dev GROUP BY 1, 2),
        |cuma AS (SELECT event_type, ad, c, n,
        |           sum(c) OVER (PARTITION BY event_type ORDER BY ad)
        |             AS cum
        |         FROM ha),
        |mad AS (SELECT event_type, ad AS mad FROM cuma
        |        WHERE cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum)
        |SELECT d.event_type, CAST(max(d.n) AS BIGINT) AS n,
        |  CAST(max(d.med) AS BIGINT) AS med,
        |  CAST(max(m.mad) AS BIGINT) AS mad,
        |  CAST(sum(CASE WHEN d.ad > 5 * m.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY 1""".stripMargin)),
  )
}
