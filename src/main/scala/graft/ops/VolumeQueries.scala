package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One registry entry: the Spark pipeline and (when SQL-expressible)
  * the equivalent DuckDB oracle over the same testdata parquet tables.
  */
final case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

/** SURVEY.md §2 operator inventory re-expressed over the driver's
  * testdata tables (see Derived). Each query is the *relational shape*
  * of the cited cloud-volume operation; the geometry/bit-math runs
  * through graft.core via UDFs so the oracle checks the library, not
  * just Spark built-ins.
  */
object VolumeQueries {
  import Derived._

  val queries: Map[String, Q] = Map(

    // S2: chunk-name/grid enumeration covering request bboxes
    // (image/common.py:137-174)
    "s2_chunk_grid" -> Q(
      (s, dir) => {
        val b = boxes(s, dir)
        b.withColumn("g",
            explode(gridpointsUdf(col("x0"), col("y0"), col("z0"),
              col("x1"), col("y1"), col("z1"))))
          .select(col("id"), col("g._1").as("gx"), col("g._2").as("gy"),
            col("g._3").as("gz"))
          .withColumn("chunk_name", chunkNameUdf(col("gx"), col("gy"), col("gz")))
      },
      Some(s"""WITH $BoxesCte,
        |cx AS (SELECT id, unnest(range(x0 // 16, (least(x1, 64) + 15) // 16)) AS gx,
        |              y0, y1, z0, z1 FROM boxes),
        |cxy AS (SELECT id, gx, unnest(range(y0 // 16, (least(y1, 64) + 15) // 16)) AS gy,
        |              z0, z1 FROM cx),
        |g AS (SELECT id, gx, gy, unnest(range(z0 // 8, (least(z1, 32) + 7) // 8)) AS gz FROM cxy)
        |SELECT id, gx, gy, gz,
        |       printf('%d-%d_%d-%d_%d-%d', gx*16, (gx+1)*16, gy*16, (gy+1)*16,
        |              gz*8, (gz+1)*8) AS chunk_name
        |FROM g""".stripMargin)),

    // S3: bbox expand/shrink to chunk grid (lib.py:794-862)
    "s3_bbox_align" -> Q(
      (s, dir) => {
        val b = boxes(s, dir)
        b.withColumn("e", expandUdf(col("x0"), col("y0"), col("z0"),
            col("x1"), col("y1"), col("z1")))
          .withColumn("sh", shrinkUdf(col("x0"), col("y0"), col("z0"),
            col("x1"), col("y1"), col("z1")))
          .select(col("id"),
            col("e._1").as("ex0"), col("e._2").as("ey0"), col("e._3").as("ez0"),
            col("e._4").as("ex1"), col("e._5").as("ey1"), col("e._6").as("ez1"),
            col("sh._1").as("sx0"), col("sh._2").as("sy0"), col("sh._3").as("sz0"),
            col("sh._4").as("sx1"), col("sh._5").as("sy1"), col("sh._6").as("sz1"))
      },
      Some(s"""WITH $BoxesCte
        |SELECT id,
        |  (x0 // 16) * 16 AS ex0, (y0 // 16) * 16 AS ey0, (z0 // 8) * 8 AS ez0,
        |  ((x1 + 15) // 16) * 16 AS ex1, ((y1 + 15) // 16) * 16 AS ey1,
        |  ((z1 + 7) // 8) * 8 AS ez1,
        |  ((x0 + 15) // 16) * 16 AS sx0, ((y0 + 15) // 16) * 16 AS sy0,
        |  ((z0 + 7) // 8) * 8 AS sz0,
        |  greatest(((x0 + 15) // 16) * 16, (x1 // 16) * 16) AS sx1,
        |  greatest(((y0 + 15) // 16) * 16, (y1 // 16) * 16) AS sy1,
        |  greatest(((z0 + 7) // 8) * 8, (z1 // 8) * 8) AS sz1
        |FROM boxes""".stripMargin)),

    // S7/W3: byte-range coalescing via gaps-and-islands
    // (sharding.py:731-766)
    "s7_range_coalesce" -> Q(
      (s, dir) => {
        val r = table(s, dir, "lineitem").select(
          (col("l_suppkey") % 8).cast("long").as("path"),
          ((col("l_orderkey") * 37 % 2000) * 50).cast("long").as("rstart"),
          ((col("l_orderkey") * 37 % 2000) * 50 + 10 + col("l_partkey") % 90)
            .cast("long").as("rend"))
        val byStart = Window.partitionBy("path").orderBy("rstart", "rend")
        val prevMax = max(col("rend")).over(
          byStart.rowsBetween(Window.unboundedPreceding, -1))
        val gapped = r.withColumn("is_gap",
          when(prevMax.isNull || col("rstart") > prevMax, 1L).otherwise(0L))
        val island = sum(col("is_gap")).over(
          byStart.rowsBetween(Window.unboundedPreceding, 0))
        gapped.withColumn("island", island)
          .groupBy("path", "island")
          .agg(min("rstart").as("i_start"), max("rend").as("i_end"),
            count(lit(1)).as("n_ranges"))
      },
      Some("""WITH ranges AS (
        |  SELECT l_suppkey % 8 AS path,
        |         (l_orderkey * 37 % 2000) * 50 AS rstart,
        |         (l_orderkey * 37 % 2000) * 50 + 10 + l_partkey % 90 AS rend
        |  FROM lineitem),
        |gapped AS (
        |  SELECT *, CASE WHEN max(rend) OVER (PARTITION BY path ORDER BY rstart, rend
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |              OR rstart > max(rend) OVER (PARTITION BY path ORDER BY rstart, rend
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |            THEN 1 ELSE 0 END AS is_gap
        |  FROM ranges),
        |isl AS (
        |  SELECT *, CAST(sum(is_gap) OVER (PARTITION BY path ORDER BY rstart, rend
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
        |  FROM gapped)
        |SELECT path, island, min(rstart) AS i_start, max(rend) AS i_end,
        |       count(*) AS n_ranges
        |FROM isl GROUP BY path, island""".stripMargin)),

    // A8/S13: exists probe — expected grid minus stored chunks
    // (image/__init__.py:484-513)
    "a8_exists" -> Q(
      (s, dir) => {
        val stored = voxelChunks(s, dir).filter(col("label") < 2)
          .select("gx", "gy", "gz").distinct()
        val grid = s.range(GridX * GridY * GridZ).select(
          (col("id") % GridX).as("gx"),
          (idiv(col("id"), GridX) % GridY).as("gy"),
          idiv(col("id"), GridX * GridY).as("gz"))
        grid.join(stored, Seq("gx", "gy", "gz"), "left_anti")
          .withColumn("chunk_name", chunkNameUdf(col("gx"), col("gy"), col("gz")))
      },
      Some(s"""WITH $VoxelChunksCte,
        |stored AS (SELECT DISTINCT gx, gy, gz FROM vchunks WHERE label < 2),
        |ax AS (SELECT unnest(range(0, 4)) AS gx),
        |axy AS (SELECT gx, unnest(range(0, 4)) AS gy FROM ax),
        |grid AS (SELECT gx, gy, unnest(range(0, 4)) AS gz FROM axy)
        |SELECT g.gx, g.gy, g.gz,
        |       printf('%d-%d_%d-%d_%d-%d', g.gx*16, (g.gx+1)*16, g.gy*16,
        |              (g.gy+1)*16, g.gz*8, (g.gz+1)*8) AS chunk_name
        |FROM grid g LEFT JOIN stored s
        |  ON g.gx = s.gx AND g.gy = s.gy AND g.gz = s.gz
        |WHERE s.gx IS NULL""".stripMargin)),

    // A9/S14: black-chunk test (tx.py:445-450)
    "a9_black_chunks" -> Q(
      (s, dir) => voxelChunks(s, dir)
        .groupBy("gx", "gy", "gz")
        .agg(bool_or(col("label") =!= 0).as("has_data"),
          count(lit(1)).as("n_vox")),
      Some(s"""WITH $VoxelChunksCte
        |SELECT gx, gy, gz, bool_or(label <> 0) AS has_data, count(*) AS n_vox
        |FROM vchunks GROUP BY gx, gy, gz""".stripMargin)),

    // A1: distinct labels within a bbox (the marquee `unique`,
    // frontends/precomputed.py:590-628)
    "a1_unique" -> Q(
      (s, dir) => voxels(s, dir)
        .filter(col("x").between(8, 39) && col("y").between(16, 47) &&
          col("z").between(4, 19))
        .select("label").distinct(),
      Some(s"""WITH $VoxelsCte
        |SELECT DISTINCT label FROM voxels
        |WHERE x BETWEEN 8 AND 39 AND y BETWEEN 16 AND 47 AND z BETWEEN 4 AND 19""".stripMargin)),

    // A2/W4: renumber — dense relabeling of the distinct set
    // (rx.py:326-351). Scale-safe: a range-partitioned distributed
    // sort + zipWithIndex instead of a global window (which would
    // funnel every label through one task).
    "a2_renumber" -> Q(
      (s, dir) => {
        import s.implicits._
        val u = voxels(s, dir)
          .filter(col("x").between(8, 39) && col("y").between(16, 47) &&
            col("z").between(4, 19))
          .select("label").distinct()
        u.as[Long].rdd.sortBy(identity)
          .zipWithIndex.map { case (l, i) => (l, i + 1L) }
          .toDF("label", "renumbered")
      },
      Some(s"""WITH $VoxelsCte,
        |u AS (SELECT DISTINCT label FROM voxels
        |      WHERE x BETWEEN 8 AND 39 AND y BETWEEN 16 AND 47 AND z BETWEEN 4 AND 19)
        |SELECT label, CAST(dense_rank() OVER (ORDER BY label) AS BIGINT) AS renumbered
        |FROM u""".stripMargin)),

    // A4: per-label enclosing bbox via min/max union
    // (spatial_index.py:697-761, lib.py:701-707)
    "a4_bbox_union" -> Q(
      (s, dir) => voxels(s, dir).groupBy("label")
        .agg(min("x").as("x0"), min("y").as("y0"), min("z").as("z0"),
          (max("x") + 1).as("x1"), (max("y") + 1).as("y1"),
          (max("z") + 1).as("z1")),
      Some(s"""WITH $VoxelsCte
        |SELECT label, min(x) AS x0, min(y) AS y0, min(z) AS z0,
        |       max(x) + 1 AS x1, max(y) + 1 AS y1, max(z) + 1 AS z1
        |FROM voxels GROUP BY label""".stripMargin)),

    // A3/J1: spatial-index query — labels intersecting a bbox through
    // the (label, file) index join (spatial_index.py:725-731,837-923)
    "a3_spatial_query" -> Q(
      (s, dir) => {
        val fileLookup = voxelChunks(s, dir)
          .select(col("label"),
            (col("gx") + col("gy") * GridX + col("gz") * (GridX * GridY)).as("fid"))
          .distinct()
        val indexFiles = s.range(GridX * GridY * GridZ).select(
            col("id").as("fid"), (col("id") % GridX).as("gx"),
            (idiv(col("id"), GridX) % GridY).as("gy"),
            idiv(col("id"), GridX * GridY).as("gz"))
          .filter(col("gx") < 2 && col("gy") < 2 && col("gz") < 2)
        fileLookup.join(broadcast(indexFiles), Seq("fid"))
          .select("label").distinct()
      },
      Some(s"""WITH $VoxelChunksCte,
        |file_lookup AS (SELECT DISTINCT label, gx + 4*gy + 16*gz AS fid FROM vchunks),
        |index_files AS (SELECT unnest(range(0, 64)) AS fid),
        |idx AS (SELECT fid, fid % 4 AS gx, (fid // 4) % 4 AS gy, fid // 16 AS gz
        |        FROM index_files)
        |SELECT DISTINCT fl.label
        |FROM file_lookup fl JOIN idx ON fl.fid = idx.fid
        |WHERE idx.gx < 2 AND idx.gy < 2 AND idx.gz < 2""".stripMargin)),

    // A5/J2: file locations per label (spatial_index.py:763-835)
    "a5_file_locations" -> Q(
      (s, dir) => voxelChunks(s, dir)
        .select(col("label"),
          (col("gx") + col("gy") * GridX + col("gz") * (GridX * GridY)).as("fid"))
        .distinct()
        .groupBy("label")
        .agg(count(lit(1)).as("n_files"), min("fid").as("min_fid"),
          max("fid").as("max_fid"),
          concat_ws(",", transform(sort_array(collect_list(col("fid"))),
            _.cast("string"))).as("files")),
      Some(s"""WITH $VoxelChunksCte,
        |fl AS (SELECT DISTINCT label, gx + 4*gy + 16*gz AS fid FROM vchunks)
        |SELECT label, count(*) AS n_files, min(fid) AS min_fid,
        |       max(fid) AS max_fid,
        |       string_agg(CAST(fid AS VARCHAR), ',' ORDER BY fid) AS files
        |FROM fl GROUP BY label""".stripMargin)),

    // J4: remap labels through an {old -> new} map, preserving missing
    // (chunks.remap:395-421)
    "j4_remap" -> Q(
      (s, dir) => {
        val mapping = table(s, dir, "part")
          .select((col("p_partkey") % 1000).cast("long").as("old"),
            (col("p_partkey") % 97).cast("long").as("cand"))
          .filter(col("old") < 500)
          .groupBy("old").agg(min("cand").as("new"))
        voxels(s, dir)
          .join(broadcast(mapping), col("label") === col("old"), "left")
          .select(coalesce(col("new"), col("label")).as("new_label"))
          .groupBy("new_label").agg(count(lit(1)).as("n"))
      },
      Some(s"""WITH $VoxelsCte,
        |mapping AS (
        |  SELECT p_partkey % 1000 AS old, min(p_partkey % 97) AS new
        |  FROM part WHERE p_partkey % 1000 < 500 GROUP BY p_partkey % 1000)
        |SELECT coalesce(m.new, v.label) AS new_label, count(*) AS n
        |FROM voxels v LEFT JOIN mapping m ON v.label = m.old
        |GROUP BY coalesce(m.new, v.label)""".stripMargin)),

    // O2/A7: (label, size) descending top-k (sharding.py:814-820)
    "o2_top_labels" -> Q(
      (s, dir) => voxels(s, dir).groupBy("label")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("label"))
        .limit(20),
      Some(s"""WITH $VoxelsCte
        |SELECT label, count(*) AS n FROM voxels GROUP BY label
        |ORDER BY n DESC, label LIMIT 20""".stripMargin)),

    // A1d: KMV/theta-sketch SET OPERATIONS — the sketch family's
    // answer to what HLL cannot do: estimate |A∩B| between two label
    // sets without materializing either. A = labels in the lower half
    // volume (z < 16), B = labels in the upper half. Each set keeps
    // its k=64 SMALLEST 48-bit hashes (one TakeOrderedAndProject per
    // side — k rows cross the wire at any scale); theta = min of the
    // two k-th values; intersection samples = common labels with
    // hash STRICTLY below theta; every estimate is (k-1 or n)·2^48
    // div threshold in exact int64. The oracle replays hash, rank,
    // and estimator arithmetic bit-for-bit.
    "a1d_kmv_intersection" -> Q(
      (s, dir) => {
        val dom = 1L << 48
        def sk(df: DataFrame) = df.select(col("label")).distinct()
          .select(col("label"),
            conv(substring(md5(concat(lit("kmv:"),
              col("label").cast("string")).cast("binary")), 1, 12), 16, 10)
              .cast("long").as("h"))
          .orderBy(col("h").asc).limit(64)
        val v = voxels(s, dir)
        val sa = sk(v.filter(col("z") < 16)).localCheckpoint()
        val sb = sk(v.filter(col("z") >= 16)).localCheckpoint()
        val ta = sa.agg(max("h").as("theta_a"), count(lit(1)).as("n_a"))
        val tb = sb.agg(max("h").as("theta_b"), count(lit(1)).as("n_b"))
        val inter = sa.join(sb.select("label"), Seq("label"))
          .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
          .filter(col("h") < least(col("theta_a"), col("theta_b")))
          .agg(count(lit(1)).as("n_inter_samples"))
        // a sketch that never filled (n < k) holds EVERY distinct value,
        // so the exact count is the estimate; 63*dom/theta only applies
        // to a full sketch where theta is the k-th order statistic
        broadcast(ta).crossJoin(broadcast(tb)).crossJoin(broadcast(inter))
          .select(lit(64L).as("k"), col("n_a"), col("n_b"),
            least(col("theta_a"), col("theta_b")).as("theta"),
            expr(s"IF(n_a < 64, n_a, 63 * ${dom}L div theta_a)").as("est_a"),
            expr(s"IF(n_b < 64, n_b, 63 * ${dom}L div theta_b)").as("est_b"),
            col("n_inter_samples"),
            expr(s"n_inter_samples * ${dom}L div " +
              "least(theta_a, theta_b)").as("est_inter"))
      },
      Some(s"""WITH $VoxelsCte,
        |la AS (SELECT DISTINCT label FROM voxels WHERE z < 16),
        |lb AS (SELECT DISTINCT label FROM voxels WHERE z >= 16),
        |ha AS (SELECT label, ('0x' || substr(md5('kmv:' || label), 1, 12))
        |         ::BIGINT AS h FROM la),
        |hb AS (SELECT label, ('0x' || substr(md5('kmv:' || label), 1, 12))
        |         ::BIGINT AS h FROM lb),
        |sa AS (SELECT label, h FROM ha ORDER BY h LIMIT 64),
        |sb AS (SELECT label, h FROM hb ORDER BY h LIMIT 64),
        |ta AS (SELECT max(h) AS theta_a, CAST(count(*) AS BIGINT) AS n_a
        |       FROM sa),
        |tb AS (SELECT max(h) AS theta_b, CAST(count(*) AS BIGINT) AS n_b
        |       FROM sb),
        |i AS (SELECT CAST(count(*) AS BIGINT) AS n_inter_samples
        |      FROM sa JOIN sb USING (label) CROSS JOIN ta CROSS JOIN tb
        |      WHERE sa.h < least(theta_a, theta_b))
        |SELECT CAST(64 AS BIGINT) AS k, n_a, n_b,
        |  least(theta_a, theta_b) AS theta,
        |  CAST(CASE WHEN n_a < 64 THEN n_a
        |       ELSE 63 * 281474976710656 // theta_a END AS BIGINT) AS est_a,
        |  CAST(CASE WHEN n_b < 64 THEN n_b
        |       ELSE 63 * 281474976710656 // theta_b END AS BIGINT) AS est_b,
        |  i.n_inter_samples,
        |  i.n_inter_samples * 281474976710656
        |    // least(theta_a, theta_b) AS est_inter
        |FROM ta CROSS JOIN tb CROSS JOIN i""".stripMargin)),

    // A1d as a NATIVE AGGREGATE: graft_kmv (functions/KmvSketchAgg, a
    // Catalyst TypedImperativeAggregate) builds the same 64-minimum-
    // values sketch in ONE pass over the RAW voxel stream — no
    // distinct() shuffle, no TakeOrdered: each task keeps a bounded
    // tree of the k smallest distinct hashes and only that ≤64-long
    // state merges across partitions. At 100 TB this ships kilobytes
    // where a1d's sort+limit shuffles the deduped hash column. The
    // oracle replays the sketch as smallest-64-distinct, proving the
    // in-tree dedup and trim agree with the declarative formulation.
    "a1e_kmv_agg" -> Q(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        voxels(s, dir)
          .select(conv(substring(md5(concat(lit("kmv:"),
            col("label").cast("string")).cast("binary")), 1, 12), 16, 10)
            .cast("long").as("h"))
          .agg(expr("graft_kmv(h, 64)").as("ks"))
          .select(posexplode(col("ks")).as(Seq("i", "h")))
          .select((col("i") + 1).cast("long").as("rank"), col("h"))
      },
      Some(s"""WITH $VoxelsCte,
        |hv AS (SELECT DISTINCT ('0x' || substr(md5('kmv:' || label), 1, 12))
        |         ::BIGINT AS h FROM voxels),
        |sk AS (SELECT h FROM hv ORDER BY h LIMIT 64)
        |SELECT CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS rank, h
        |FROM sk""".stripMargin)),

    // A1 at sketch scale: HyperLogLog cardinality estimate (Flajolet
    // 2007) vs the exact distinct count. m=256 registers over a
    // 48-bit md5 hash: bucket = h % 256, rho = leading-zeros(h div
    // 256 as a 40-bit word) + 1 = 41 - bitlength, register =
    // max(rho). Both engines replay the sketch bit-for-bit (md5 +
    // integer bit math), and the harmonic-mean estimate is EXACT
    // double arithmetic — every 2^-rho term is dyadic and the 256-
    // term sum needs < 52 mantissa bits, so addition order cannot
    // matter. Scale shape: the register table is 256 rows at ANY
    // corpus size — the distributed groupBy(bucket).max(rho) IS the
    // whole sketch; production code would apply linear counting
    // below 2.5m (the raw estimate is emitted here, with the zero-
    // register count alongside).
    "a1b_unique_hll" -> Q(
      (s, dir) => {
        val reg = voxels(s, dir).select(col("label")).distinct()
          .select(conv(substring(md5(concat(lit("hll:"),
              col("label").cast("string")).cast("binary")), 1, 12), 16, 10)
              .cast("long").as("hv"))
          .select((col("hv") % 256L).as("bucket"),
            expr("hv div 256").as("w"))
          .groupBy("bucket")
          .agg(max(expr(
            "CASE WHEN w = 0 THEN 41L ELSE 41L - length(bin(w)) END"))
            .as("rho"))
        val full = s.range(0, 256).toDF("bucket")
          .join(reg, Seq("bucket"), "left")
          .select(col("bucket"), coalesce(col("rho"), lit(0L)).as("rho"))
        val est = full.agg(
          sum(pow(lit(2.0), -col("rho"))).as("s"),
          sum(when(col("rho") === 0, 1L).otherwise(0L)).as("zeros"))
        val exact = voxels(s, dir).agg(
          countDistinct("label").as("exact_distinct"))
        est.crossJoin(exact)
          .select(lit(256L).as("m"), col("zeros"),
            floor(lit(47072.71267120224) / col("s"))
              .cast("long").as("raw_est"),
            col("exact_distinct"),
            expr("(CAST(floor(47072.71267120224 / s) AS BIGINT)" +
              " - exact_distinct) * 100 div exact_distinct")
              .as("err_pct"),
            expr("CASE WHEN CAST(floor(47072.71267120224 / s) AS BIGINT)" +
              " <= 640 AND zeros > 0 THEN 'linear_counting'" +
              " ELSE 'raw' END").as("branch"))
      },
      Some(s"""WITH $VoxelsCte,
        |d AS (SELECT DISTINCT label FROM voxels),
        |h AS (SELECT ('0x' || substr(md5('hll:' || label), 1, 12))::BIGINT
        |        AS hv FROM d),
        |b AS (SELECT hv % 256 AS bucket, hv // 256 AS w FROM h),
        |reg AS (SELECT bucket, CAST(max(CASE WHEN w = 0 THEN 41
        |          ELSE 41 - len(bin(w)) END) AS BIGINT) AS rho
        |        FROM b GROUP BY 1),
        |allb AS (SELECT CAST(i AS BIGINT) AS bucket
        |         FROM (SELECT unnest(range(0, 256)) AS i)),
        |fullr AS (SELECT allb.bucket, coalesce(reg.rho, 0) AS rho
        |          FROM allb LEFT JOIN reg USING (bucket)),
        |est AS (SELECT CAST(sum(power(2.0, -rho)) AS DOUBLE) AS s,
        |          CAST(count(*) FILTER (rho = 0) AS BIGINT) AS zeros
        |        FROM fullr),
        |ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM d)
        |SELECT CAST(256 AS BIGINT) AS m, est.zeros,
        |  CAST(floor(47072.71267120224 / est.s) AS BIGINT) AS raw_est,
        |  ex.exact_distinct,
        |  (CAST(floor(47072.71267120224 / est.s) AS BIGINT)
        |    - ex.exact_distinct) * 100 // ex.exact_distinct AS err_pct,
        |  CASE WHEN CAST(floor(47072.71267120224 / est.s) AS BIGINT)
        |      <= 640 AND est.zeros > 0 THEN 'linear_counting'
        |    ELSE 'raw' END AS branch
        |FROM est CROSS JOIN ex""".stripMargin)),

    // HLL MERGEABILITY — the property that makes sketches the right
    // distributed answer: registers computed independently per data
    // shard (here 4 shards by l_orderkey % 4, labels OVERLAP across
    // shards) merge by per-bucket max into EXACTLY the registers a
    // single global pass produces — so a 1000-executor cluster unions
    // cardinalities by shipping 256 bytes per executor, never
    // re-reading data. The entry emits per-shard estimates alongside
    // the merged one; the merged raw_est provably equals
    // a1b_unique_hll's (same hash, max is associative).
    "a1c_unique_hll_merge" -> Q(
      (s, dir) => {
        val base = table(s, dir, "lineitem").select(
          (col("l_orderkey") % 4).cast("long").as("shard"),
          (col("l_partkey") % 1000).cast("long").as("label"))
        val reg = base.distinct()
          .select(col("shard"), conv(substring(md5(concat(lit("hll:"),
              col("label").cast("string")).cast("binary")), 1, 12), 16, 10)
              .cast("long").as("hv"))
          .select(col("shard"), (col("hv") % 256L).as("bucket"),
            expr("hv div 256").as("w"))
          .groupBy("shard", "bucket")
          .agg(max(expr(
            "CASE WHEN w = 0 THEN 41L ELSE 41L - length(bin(w)) END"))
            .as("rho"))
          // <= 4 x 256 register rows feeding merged + per-shard + the
          // register-fill join: checkpoint, or the lineitem scan +
          // distinct re-derives up to 6x
          .localCheckpoint()
        val merged = reg.groupBy("bucket").agg(max("rho").as("rho"))
          .withColumn("scope", lit("merged"))
        val perShard = reg.select(
          concat(lit("shard_"), col("shard").cast("string")).as("scope"),
          col("bucket"), col("rho"))
        val scopes = perShard.unionAll(
          merged.select("scope", "bucket", "rho"))
        // fill empty registers per scope, then the dyadic-exact sum
        val allScopes = scopes.select("scope").distinct()
        val full = allScopes.crossJoin(broadcast(
            s.range(0, 256).toDF("bucket")))
          .join(scopes, Seq("scope", "bucket"), "left")
          .select(col("scope"), coalesce(col("rho"), lit(0L)).as("rho"))
        val est = full.groupBy("scope")
          .agg(sum(pow(lit(2.0), -col("rho"))).as("s"))
          .select(col("scope"),
            floor(lit(47072.71267120224) / col("s")).cast("long")
              .as("raw_est"))
        val exact = base.select(
            concat(lit("shard_"), col("shard").cast("string")).as("scope"),
            col("label"))
          .unionAll(base.select(lit("merged").as("scope"), col("label")))
          .groupBy("scope")
          .agg(countDistinct("label").as("exact_distinct"))
        est.join(exact, "scope")
      },
      Some("""WITH base AS (SELECT l_orderkey % 4 AS shard,
        |          l_partkey % 1000 AS label FROM lineitem),
        |d AS (SELECT DISTINCT shard, label FROM base),
        |h AS (SELECT shard,
        |        ('0x' || substr(md5('hll:' || label), 1, 12))::BIGINT
        |          AS hv FROM d),
        |b AS (SELECT shard, hv % 256 AS bucket, hv // 256 AS w FROM h),
        |reg AS (SELECT shard, bucket, CAST(max(CASE WHEN w = 0 THEN 41
        |          ELSE 41 - len(bin(w)) END) AS BIGINT) AS rho
        |        FROM b GROUP BY 1, 2),
        |scopes AS (SELECT 'shard_' || shard AS scope, bucket, rho
        |             FROM reg
        |           UNION ALL
        |           SELECT 'merged' AS scope, bucket,
        |             CAST(max(rho) AS BIGINT) AS rho
        |           FROM reg GROUP BY 2),
        |sc AS (SELECT DISTINCT scope FROM scopes),
        |allb AS (SELECT sc.scope, CAST(i AS BIGINT) AS bucket
        |         FROM sc, (SELECT unnest(range(0, 256)) AS i)),
        |fullr AS (SELECT allb.scope, allb.bucket,
        |            coalesce(scopes.rho, 0) AS rho
        |          FROM allb LEFT JOIN scopes USING (scope, bucket)),
        |est AS (SELECT scope,
        |          CAST(floor(47072.71267120224
        |            / sum(power(2.0, -rho))) AS BIGINT) AS raw_est
        |        FROM fullr GROUP BY 1),
        |ex AS (SELECT scope, CAST(count(DISTINCT label) AS BIGINT)
        |         AS exact_distinct
        |       FROM (SELECT 'shard_' || shard AS scope, label FROM base
        |             UNION ALL
        |             SELECT 'merged' AS scope, label FROM base)
        |       GROUP BY 1)
        |SELECT est.scope, est.raw_est, ex.exact_distinct
        |FROM est JOIN ex USING (scope)""".stripMargin)),

    // O2 at sketch scale: count-min-sketch heavy hitters (Cormode
    // 2005 — the streaming/sublinear-memory shape of top-k when the
    // label universe doesn't fit an exact hash agg). Depth 4 x width
    // 256, row hashes from md5("r:label") so both engines replay the
    // sketch bit-for-bit; estimate = min over rows of the hashed
    // cell, always >= the exact count (collisions only ADD). Scale
    // shape: the corpus collapses to per-label counts once (one
    // partial agg — at true stream scale the counts pass IS the
    // sketch update), the sketch is 1024 cells regardless of corpus
    // size and broadcasts back for the estimate join; top-10 via
    // TakeOrderedAndProject, never a global window.
    "o2b_top_labels_cms" -> Q(
      (s, dir) => {
        val counts = voxels(s, dir).groupBy("label")
          .agg(count(lit(1)).as("n"))
        val hashed = counts.select(col("label"), col("n"),
            explode(expr("sequence(0, 3)")).as("r"))
          .withColumn("c",
            conv(substring(md5(concat(col("r").cast("string"), lit(":"),
              col("label").cast("string")).cast("binary")), 1, 12), 16, 10)
              .cast("long") % 256L)
        val cells = hashed.groupBy("r", "c").agg(sum("n").as("cell"))
        hashed.join(broadcast(cells), Seq("r", "c"))
          .groupBy("label")
          .agg(max("n").as("exact_n"), min("cell").as("est_n"))
          .orderBy(col("est_n").desc, col("label").asc)
          .limit(10)
      },
      Some(s"""WITH $VoxelsCte,
        |counts AS (SELECT label, CAST(count(*) AS BIGINT) AS n
        |           FROM voxels GROUP BY 1),
        |hashed AS (SELECT label, n, r,
        |    ('0x' || substr(md5(r || ':' || label), 1, 12))::BIGINT % 256
        |      AS c
        |  FROM counts, (SELECT unnest(range(0, 4)) AS r)),
        |cells AS (SELECT r, c, CAST(sum(n) AS BIGINT) AS cell
        |          FROM hashed GROUP BY 1, 2),
        |est AS (SELECT h.label, CAST(max(h.n) AS BIGINT) AS exact_n,
        |          CAST(min(cells.cell) AS BIGINT) AS est_n
        |        FROM hashed h JOIN cells USING (r, c) GROUP BY 1)
        |SELECT label, exact_n, est_n FROM est
        |ORDER BY est_n DESC, label ASC LIMIT 10""".stripMargin)),

    // Label-contact adjacency (the contact-site/region-graph pass a
    // segmentation pipeline runs after agglomeration — igneous-style,
    // beyond the reference's own surface): resolve each occupied
    // voxel to one label (min on position ties), emit its +x/+y/+z
    // half-neighborhood, and count 6-connected face contacts between
    // DIFFERENT labels as canonical (la < lb) pairs; top-20. Scale
    // shape: ONE equi-join on the position key (the shifted side is a
    // narrow 3x explode — half the 6-neighborhood, so each face is
    // counted once), co-partitioned by the join hash; contact counts
    // partial-agg before the final top-k, and nothing is ever
    // all-pairs in label space.
    "a4c_label_adjacency" -> Q(
      (s, dir) => {
        val dv = voxels(s, dir).groupBy("x", "y", "z")
          .agg(min("label").as("label"))
        val shifted = dv.select(col("label").as("la"),
            explode(expr("array(struct(x + 1L AS x, y, z)," +
              " struct(x, y + 1L AS y, z), struct(x, y, z + 1L AS z))"))
              .as("p"))
          .select(col("la"), col("p.x").as("x"), col("p.y").as("y"),
            col("p.z").as("z"))
        shifted.join(dv, Seq("x", "y", "z"))
          .filter(col("la") =!= col("label"))
          .select(least(col("la"), col("label")).as("la"),
            greatest(col("la"), col("label")).as("lb"))
          .groupBy("la", "lb").agg(count(lit(1)).as("contacts"))
          .orderBy(col("contacts").desc, col("la").asc, col("lb").asc)
          .limit(20)
      },
      Some(s"""WITH $VoxelsCte,
        |dv AS (SELECT x, y, z, CAST(min(label) AS BIGINT) AS label
        |       FROM voxels GROUP BY 1, 2, 3),
        |sh AS (SELECT label AS la, x + dx AS x, y + dy AS y, z + dz AS z
        |       FROM dv, (VALUES (1, 0, 0), (0, 1, 0), (0, 0, 1))
        |         AS o(dx, dy, dz)),
        |pairs AS (SELECT least(sh.la, dv.label) AS la,
        |            greatest(sh.la, dv.label) AS lb
        |          FROM sh JOIN dv USING (x, y, z)
        |          WHERE sh.la <> dv.label)
        |SELECT la, lb, CAST(count(*) AS BIGINT) AS contacts
        |FROM pairs GROUP BY 1, 2
        |ORDER BY contacts DESC, la ASC, lb ASC LIMIT 20""".stripMargin)),

    // A4d (pipeline extension of A4/a4c): per-label exposed SURFACE
    // AREA under 6-connectivity — for every voxel, each of its 6 faces
    // counts when the neighbor is absent (background) or carries a
    // different label. The morphology statistic behind contact-area /
    // surface-to-volume analyses (the same neighborhood algebra as
    // a4c's contact graph, extended to the background boundary via a
    // LEFT join). Distributed shape: one dedupe aggregate, a narrow
    // 6-way face fan-out (explode, no shuffle), one co-partitioned
    // coordinate join, one keyed count — top-20 via
    // TakeOrderedAndProject, never a global sort.
    "a4d_label_surface" -> Q(
      (s, dir) => {
        val dv = voxels(s, dir).groupBy("x", "y", "z")
          .agg(min("label").as("label"))
        val faces = dv.select(col("label").as("la"),
            explode(expr(
              "array(struct(x + 1L AS x, y AS y, z AS z)," +
                " struct(x - 1L AS x, y AS y, z AS z)," +
                " struct(x AS x, y + 1L AS y, z AS z)," +
                " struct(x AS x, y - 1L AS y, z AS z)," +
                " struct(x AS x, y AS y, z + 1L AS z)," +
                " struct(x AS x, y AS y, z - 1L AS z))")).as("p"))
          .select(col("la"), col("p.x").as("x"), col("p.y").as("y"),
            col("p.z").as("z"))
        faces.join(dv, Seq("x", "y", "z"), "left")
          .filter(col("label").isNull || col("la") =!= col("label"))
          .groupBy(col("la").as("label"))
          .agg(count(lit(1)).as("surface_faces"))
          .orderBy(col("surface_faces").desc, col("label").asc)
          .limit(20)
      },
      Some(s"""WITH $VoxelsCte,
        |dv AS (SELECT x, y, z, CAST(min(label) AS BIGINT) AS label
        |       FROM voxels GROUP BY 1, 2, 3),
        |sh AS (SELECT label AS la, x + dx AS x, y + dy AS y, z + dz AS z
        |       FROM dv, (VALUES (1, 0, 0), (-1, 0, 0), (0, 1, 0),
        |         (0, -1, 0), (0, 0, 1), (0, 0, -1)) AS o(dx, dy, dz)),
        |f AS (SELECT sh.la FROM sh LEFT JOIN dv USING (x, y, z)
        |      WHERE dv.label IS NULL OR sh.la <> dv.label)
        |SELECT la AS label, CAST(count(*) AS BIGINT) AS surface_faces
        |FROM f GROUP BY 1
        |ORDER BY surface_faces DESC, label ASC LIMIT 20""".stripMargin)),

    // A4e (pipeline extension of A4b): per-label SECOND moments — the
    // raw integer sums (n, Σx.., Σx².., Σxy..) behind centroid,
    // covariance, and principal-axis shape analysis of a segment
    // (elongation/flatness QC over segmentation output). One wide
    // partial-aggregable groupBy: every executor contributes one
    // 10-long row per resident label, so at 100 TB the shuffle is
    // label-cardinality-sized, not voxel-sized. Sums stay exact in
    // int64 (coords < 64 -> Σx² < n·4096, needs n < 2^50).
    "a4e_label_moments" -> Q(
      (s, dir) => {
        voxels(s, dir).groupBy("label").agg(
          count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"), sum("z").as("sz"),
          sum(expr("x * x")).as("sxx"), sum(expr("y * y")).as("syy"),
          sum(expr("z * z")).as("szz"), sum(expr("x * y")).as("sxy"),
          sum(expr("x * z")).as("sxz"), sum(expr("y * z")).as("syz"))
      },
      Some(s"""WITH $VoxelsCte
        |SELECT label, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |  CAST(sum(z) AS BIGINT) AS sz,
        |  CAST(sum(x * x) AS BIGINT) AS sxx,
        |  CAST(sum(y * y) AS BIGINT) AS syy,
        |  CAST(sum(z * z) AS BIGINT) AS szz,
        |  CAST(sum(x * y) AS BIGINT) AS sxy,
        |  CAST(sum(x * z) AS BIGINT) AS sxz,
        |  CAST(sum(y * z) AS BIGINT) AS syz
        |FROM voxels GROUP BY 1""".stripMargin)),

    // T1: core/shell chunk partition of an expanded request
    // (rx.py:915-929)
    "t1_core_shell" -> Q(
      (s, dir) => {
        val (qx0, qy0, qz0, qx1, qy1, qz1) = (10L, 6L, 3L, 58L, 62L, 29L)
        s.range(GridX * GridY * GridZ).select(
            (col("id") % GridX).as("gx"),
            (idiv(col("id"), GridX) % GridY).as("gy"),
            idiv(col("id"), GridX * GridY).as("gz"))
          .filter(col("gx") * CsX < qx1 && (col("gx") + 1) * CsX > qx0 &&
            col("gy") * CsY < qy1 && (col("gy") + 1) * CsY > qy0 &&
            col("gz") * CsZ < qz1 && (col("gz") + 1) * CsZ > qz0)
          .withColumn("is_core",
            col("gx") * CsX >= qx0 && (col("gx") + 1) * CsX <= qx1 &&
              col("gy") * CsY >= qy0 && (col("gy") + 1) * CsY <= qy1 &&
              col("gz") * CsZ >= qz0 && (col("gz") + 1) * CsZ <= qz1)
      },
      Some("""WITH ax AS (SELECT unnest(range(0, 4)) AS gx),
        |axy AS (SELECT gx, unnest(range(0, 4)) AS gy FROM ax),
        |grid AS (SELECT gx, gy, unnest(range(0, 4)) AS gz FROM axy)
        |SELECT gx, gy, gz,
        |       (gx*16 >= 10 AND (gx+1)*16 <= 58 AND gy*16 >= 6 AND (gy+1)*16 <= 62
        |        AND gz*8 >= 3 AND (gz+1)*8 <= 29) AS is_core
        |FROM grid
        |WHERE gx*16 < 58 AND (gx+1)*16 > 10 AND gy*16 < 62 AND (gy+1)*16 > 6
        |  AND gz*8 < 29 AND (gz+1)*8 > 3""".stripMargin)),

    // F1: compressed morton code, regular + irregular grids
    // (datasource/precomputed/common.py:55-86) — computed by the
    // native Catalyst expression (graft.functions.MortonCodeExpr,
    // codegen'd; SURVEY §2.10), not a UDF
    "f1_morton" -> Q(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val g444 = s.range(64).select(lit("g444").as("tag"),
          (col("id") % 4).as("gx"), (idiv(col("id"), 4) % 4).as("gy"),
          idiv(col("id"), 16).as("gz"), lit(4L).as("nx"), lit(4L).as("ny"),
          lit(4L).as("nz"))
        val g842 = s.range(64).select(lit("g842").as("tag"),
          (col("id") % 8).as("gx"), (idiv(col("id"), 8) % 4).as("gy"),
          idiv(col("id"), 32).as("gz"), lit(8L).as("nx"), lit(4L).as("ny"),
          lit(2L).as("nz"))
        g444.unionAll(g842)
          .withColumn("code", expr("graft_morton(gx, gy, gz, nx, ny, nz)"))
          .drop("nx", "ny", "nz")
      },
      Some("""WITH ids AS (SELECT unnest(range(0, 64)) AS i),
        |g444 AS (SELECT 'g444' AS tag, i % 4 AS gx, (i // 4) % 4 AS gy, i // 16 AS gz
        |         FROM ids),
        |g842 AS (SELECT 'g842' AS tag, i % 8 AS gx, (i // 8) % 4 AS gy, i // 32 AS gz
        |         FROM ids),
        |m444 AS (SELECT tag, gx, gy, gz,
        |    (gx & 1) + ((gy & 1) << 1) + ((gz & 1) << 2)
        |    + (((gx >> 1) & 1) << 3) + (((gy >> 1) & 1) << 4)
        |    + (((gz >> 1) & 1) << 5) AS code FROM g444),
        |m842 AS (SELECT tag, gx, gy, gz,
        |    (gx & 1) + ((gy & 1) << 1) + ((gz & 1) << 2)
        |    + (((gx >> 1) & 1) << 3) + (((gy >> 1) & 1) << 4)
        |    + (((gx >> 2) & 1) << 5) AS code FROM g842)
        |SELECT * FROM m444 UNION ALL SELECT * FROM m842""".stripMargin)),

    // F3/S6: shard location with identity hash (sharding.py:154-162)
    "f3_shard_location" -> Q(
      (s, dir) => {
        // shard/minishard via the native codegen'd expressions
        // (graft.functions, §2.10); only the hex filename render stays
        // a built-in format_string
        graft.functions.GraftFunctions.register(s)
        voxels(s, dir).select("label").distinct()
          .withColumn("shard_no", expr("graft_shard_of(label, 2, 3, 3, 0)"))
          .withColumn("minishard_no", expr("graft_minishard_of(label, 2, 3, 0)"))
          .withColumn("shard_file",
            concat(format_string("%x", col("shard_no")), lit(".shard")))
      },
      Some(s"""WITH $VoxelsCte,
        |u AS (SELECT DISTINCT label FROM voxels)
        |SELECT label, ((label >> 2) >> 3) & 7 AS shard_no,
        |       (label >> 2) & 7 AS minishard_no,
        |       printf('%x', ((label >> 2) >> 3) & 7) || '.shard' AS shard_file
        |FROM u""".stripMargin)),

    // F3/S6 planner: compute_shard_params_for_hashed
    // (sharding.py:985-1058; known answers test_sharding.py:474-519) —
    // the (shard_bits, minishard_bits) recommendation used when
    // CREATING sharded skeleton/mesh layers, sized against the 8 KiB
    // shard-index / 32 KiB minishard-index budgets. The oracle replays
    // the same float64 arithmetic (ceil-log2 branches + the
    // 0.55-utilization shard-bit giveback) relationally.
    "f3b_shard_params" -> Q(
      (s, dir) => {
        val paramsUdf = udf((n: Long) => {
          val (sb, msb, psb) = graft.core.ShardParams.forHashed(n)
          (sb.toLong, msb.toLong, psb.toLong)
        })
        table(s, dir, "customer")
          .select((col("c_custkey") * 1371 + 59).cast("long").as("n"))
          .withColumn("p", paramsUdf(col("n")))
          .select(col("n"), col("p._1").as("shard_bits"),
            col("p._2").as("minishard_bits"),
            col("p._3").as("preshift_bits"))
      },
      Some("""WITH c AS (SELECT c_custkey * 1371 + 59 AS n FROM customer),
        |p AS (SELECT n, 8192 / 16.0 AS nms, 32768 / 24.0 AS lpm,
        |        (8192 / 16.0) * (32768 / 24.0) AS lps FROM c),
        |b AS (SELECT *, CASE WHEN n >= lps THEN ceil(log2(nms))
        |        WHEN n >= lpm THEN ceil(log2(n / lpm))
        |        ELSE 0 END AS msb0 FROM p),
        |s AS (SELECT *, CASE WHEN n >= lps
        |        THEN ceil(log2(n / (lpm * pow(2, msb0))))
        |        ELSE 0 END AS sb0 FROM b),
        |u AS (SELECT *, CASE WHEN n / (lps * pow(2, sb0)) <= 0.55
        |        THEN sb0 - 1 ELSE sb0 END AS sb1 FROM s)
        |SELECT n, CAST(greatest(sb1, 0) AS BIGINT) AS shard_bits,
        |       CAST(greatest(msb0, 0) AS BIGINT) AS minishard_bits,
        |       CAST(0 AS BIGINT) AS preshift_bits
        |FROM u""".stripMargin)),

    // F3/J3 with labels STRADDLING 2^63 (r16 verdict item 5): shard
    // location + minishard assignment over uint64 labels through the
    // codegen'd expressions (identity hash so DuckDB can replay the
    // unsigned shifts via HUGEINT), with each (shard, minishard)
    // bucket's UNSIGNED min/max recovered through the native
    // label-set aggregate — the sharded format orders labels unsigned
    // (sharding.py:32-34), so signed min/max would misplace the high
    // half. No global window, one keyed shuffle.
    "f3c_shard_u64" -> Q(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        voxels(s, dir).select(
            when(col("label") % 2 === 1,
              col("label").bitwiseOR(lit(Long.MinValue)))
              .otherwise(col("label")).as("h")).distinct()
          .withColumn("shard_no", expr("graft_shard_of(h, 2, 3, 3, 0)"))
          .withColumn("minishard_no", expr("graft_minishard_of(h, 2, 3, 0)"))
          .groupBy("shard_no", "minishard_no")
          .agg(expr("graft_label_set(h)").as("set"))
          .select(col("shard_no"), col("minishard_no"),
            size(col("set")).cast("long").as("n"),
            element_at(col("set"), 1).as("lo"),
            element_at(col("set"), -1).as("hi"))
      },
      Some(s"""WITH $VoxelsCte,
        |u AS (SELECT DISTINCT CAST(CASE WHEN label % 2 = 1
        |        THEN label - 9223372036854775808 ELSE label END AS BIGINT)
        |        AS h FROM voxels),
        |uu AS (SELECT h, CASE WHEN h < 0
        |        THEN h::HUGEINT + 18446744073709551616
        |        ELSE h::HUGEINT END AS uv FROM u),
        |m AS (SELECT h, uv,
        |        CAST(((uv // 4) // 8) % 8 AS BIGINT) AS shard_no,
        |        CAST((uv // 4) % 8 AS BIGINT) AS minishard_no FROM uu)
        |SELECT shard_no, minishard_no, CAST(count(*) AS BIGINT) AS n,
        |       CAST(arg_min(h, uv) AS BIGINT) AS lo,
        |       CAST(arg_max(h, uv) AS BIGINT) AS hi
        |FROM m GROUP BY shard_no, minishard_no""".stripMargin)),

    // F2: murmurhash3_x86_128 oracle gate. DuckDB cannot compute mmh3,
    // so the expected rows are frozen literals generated by an
    // INDEPENDENT Python implementation of the public algorithm
    // (tools/mmh3_oracle_gen.py), anchored on the reference test
    // suite's canonical vector (test/test_sharding.py:34-51: label
    // 1822975381, preshift 6, minishard_bits 11, shard_bits 7 ->
    // shard 0x42, minishard 18). The query runs the codegen'd
    // Mmh3Expr/ShardOfExpr/MinishardOfExpr over the same 16 labels —
    // any drift in the Scala hash breaks the hash compare.
    "f2_mmh3" -> Q(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        import s.implicits._
        val labels = Seq(1822975381L) ++
          (1 to 15).map(k => (k.toLong * 2654435761L) % (1L << 40))
        labels.toDF("label")
          .withColumn("h64", expr("graft_mmh3(shiftright(label, 6))"))
          .withColumn("shard_no", expr("graft_shard_of(label, 6, 11, 7, 1)"))
          .withColumn("minishard_no",
            expr("graft_minishard_of(label, 6, 11, 1)"))
      },
      Some("""SELECT CAST(label AS BIGINT) AS label,
        |  CAST(h64 AS BIGINT) AS h64,
        |  CAST(shard_no AS BIGINT) AS shard_no,
        |  CAST(minishard_no AS BIGINT) AS minishard_no
        |FROM (VALUES
        |  (1822975381, -4259007022990487534, 66, 18),
        |  (2654435761, 876113512742483077, 110, 1157),
        |  (5308871522, 2143341538927208379, 12, 1979),
        |  (7963307283, 4829210960416049470, 49, 318),
        |  (10617743044, 2329788662503944570, 118, 378),
        |  (13272178805, 6341717567598863306, 52, 970),
        |  (15926614566, -6094427227736674904, 45, 1448),
        |  (18581050327, 209801528113095547, 124, 891),
        |  (21235486088, -4595544889933388199, 20, 1625),
        |  (23889921849, 7913144378604040787, 86, 595),
        |  (26544357610, -6312527861609434513, 110, 623),
        |  (29198793371, -3187769471431990614, 68, 682),
        |  (31853229132, -7227390161749360486, 88, 154),
        |  (34507664893, -8421081705162542409, 94, 695),
        |  (37162100654, 353919196179376300, 85, 172),
        |  (39816536415, -6943156381887888139, 64, 1269)
        |) AS t(label, h64, shard_no, minishard_no)""".stripMargin)),

    // W2: minishard-index delta encoding (sharding.py:902-932)
    "w2_minishard_delta" -> Q(
      (s, dir) => {
        val u = voxels(s, dir).select("label").distinct()
          .withColumn("minishard_no", col("label") % 8)
          .withColumn("shard_no", idiv(col("label"), 8) % 4)
        val w = Window.partitionBy("shard_no", "minishard_no").orderBy("label")
        u.withColumn("delta",
          col("label") - coalesce(lag(col("label"), 1).over(w), lit(0L)))
      },
      Some(s"""WITH $VoxelsCte,
        |u AS (SELECT DISTINCT label FROM voxels),
        |m AS (SELECT label, label % 8 AS minishard_no, (label // 8) % 4 AS shard_no
        |      FROM u)
        |SELECT label, minishard_no, shard_no,
        |       label - coalesce(lag(label, 1) OVER (
        |         PARTITION BY shard_no, minishard_no ORDER BY label), 0) AS delta
        |FROM m""".stripMargin)),

    // W2/S12 write lane with labels STRADDLING 2^63 (r17 verdict item
    // 4): j1c/f3c proved u64 through the QUERY lanes; this proves the
    // SYNTHESIS lane, where unsigned order actually bites — a signed
    // sort would interleave 2^63±k labels and emit negative deltas
    // (sharding.py:902-932 sorts a numpy uint64 array ascending).
    // Each shard group synthesizes a REAL shard file on the executor
    // (identity hash so DuckDB can replay the bit fields), then
    // re-reads it through the same ShardCodec reader: `rank` is the
    // position in the minishard index AS READ BACK, and `payload_str`
    // round-trips through getData + the gzip data encoding. The oracle
    // recomputes rank with an unsigned HUGEINT sort — a signed-order
    // synthesis hash-mismatches immediately.
    "w2b_shard_synth_u64" -> Q(
      (s, dir) => {
        import s.implicits._
        val spec = graft.core.ShardingSpec(
          preshiftBits = 0, minishardBits = 2, shardBits = 2,
          hashName = "identity", minishardIndexEncoding = "gzip",
          dataEncoding = "gzip")
        val labels = voxels(s, dir).select("label").distinct()
          .select(when(col("label") % 2 === 1,
              col("label") + lit(Long.MinValue))
            .otherwise(col("label")).as("label"))
        labels.as[Long]
          .groupByKey(l => spec.shardLocation(l)._1)
          .flatMapGroups { (shardNo, it) =>
            val pairs = it.map(l =>
              l -> java.lang.Long.toUnsignedString(l)
                .getBytes(java.nio.charset.StandardCharsets.UTF_8)).toSeq
            val shard = graft.core.ShardCodec.synthesizeShard(spec, pairs)
            var lastMsn = -1L
            var rank = 0L
            graft.core.ShardCodec.allEntries(shard, spec).map {
              case (msn, ent) =>
                rank = if (msn == lastMsn) rank + 1 else 1L
                lastMsn = msn
                val payload = graft.core.ShardCodec
                  .getData(shard, spec, ent.label)
                  .getOrElse(sys.error(s"label ${ent.label} vanished"))
                (ent.label, shardNo, msn, rank,
                  new String(payload, java.nio.charset.StandardCharsets.UTF_8))
            }
          }
          .toDF("label", "shard_no", "minishard_no", "rank", "payload_str")
      },
      Some(s"""WITH $VoxelsCte,
        |u AS (SELECT DISTINCT label FROM voxels),
        |lab AS (SELECT CAST(CASE WHEN label % 2 = 1
        |          THEN label - 9223372036854775808 ELSE label END AS BIGINT)
        |          AS label
        |        FROM u),
        |uns AS (SELECT label,
        |          label::HUGEINT + CASE WHEN label < 0
        |            THEN 18446744073709551616 ELSE 0 END AS ul
        |        FROM lab)
        |SELECT label,
        |  CAST(ul % 4 AS BIGINT) AS minishard_no,
        |  CAST((ul // 4) % 4 AS BIGINT) AS shard_no,
        |  CAST(row_number() OVER (
        |    PARTITION BY (ul // 4) % 4, ul % 4 ORDER BY ul) AS BIGINT) AS rank,
        |  CAST(ul AS VARCHAR) AS payload_str
        |FROM uns""".stripMargin)),

    // F5: filename <-> bbox codec round trip (lib.py:520-601)
    "f5_filename_codec" -> Q(
      (s, dir) => {
        val named = boxes(s, dir).withColumn("chunk_name",
          concat_ws("_",
            concat_ws("-", col("x0"), col("x1")),
            concat_ws("-", col("y0"), col("y1")),
            concat_ws("-", col("z0"), col("z1"))))
        named.withColumn("p", parseFilenameUdf(col("chunk_name")))
          .select(col("id"), col("chunk_name"),
            col("p._1").as("px0"), col("p._2").as("py0"), col("p._3").as("pz0"),
            col("p._4").as("px1"), col("p._5").as("py1"), col("p._6").as("pz1"))
      },
      Some(s"""WITH $BoxesCte
        |SELECT id,
        |  printf('%d-%d_%d-%d_%d-%d', x0, x1, y0, y1, z0, z1) AS chunk_name,
        |  x0 AS px0, y0 AS py0, z0 AS pz0, x1 AS px1, y1 AS py1, z1 AS pz1
        |FROM boxes""".stripMargin)),

    // F7: bbox_to_mip iterative floor/ceil over 3 levels
    // (metadata.py:675-700)
    "f7_mip_bbox" -> Q(
      (s, dir) => boxes(s, dir)
        .withColumn("m", mipUdf(col("x0"), col("y0"), col("z0"),
          col("x1"), col("y1"), col("z1")))
        .select(col("id"),
          col("m._1").as("mx0"), col("m._2").as("my0"), col("m._3").as("mz0"),
          col("m._4").as("mx1"), col("m._5").as("my1"), col("m._6").as("mz1")),
      Some(s"""WITH $BoxesCte
        |SELECT id,
        |  ((x0 // 2) // 2) // 2 AS mx0, ((y0 // 2) // 2) // 2 AS my0,
        |  (z0 // 2) AS mz0,
        |  ((((x1 + 1) // 2 + 1) // 2) + 1) // 2 AS mx1,
        |  ((((y1 + 1) // 2 + 1) // 2) + 1) // 2 AS my1,
        |  (z1 + 1) // 2 AS mz1
        |FROM boxes""".stripMargin)),

    // F9: graphene label bit codec (datasource/graphene/metadata.py:183-250)
    "f9_graphene_labels" -> Q(
      (s, dir) => {
        val src = table(s, dir, "customer")
          .filter(col("c_custkey") % 10 < 3)
          .select(col("c_custkey"),
            (lit(1) + col("c_custkey") % 4).cast("int").as("layer"),
            (col("c_custkey") % 600).cast("long").as("cx"),
            ((col("c_nationkey") * 31) % 800).cast("long").as("cy"),
            ((col("c_custkey") * 7) % 900).cast("long").as("cz"),
            col("c_custkey").cast("long").as("segid"))
        src.withColumn("glabel", grapheneEncodeUdf(col("layer"), col("cx"),
            col("cy"), col("cz"), col("segid")))
          .withColumn("d", grapheneDecodeUdf(col("glabel")))
          .select(col("c_custkey"), col("glabel"),
            col("d._1").cast("long").as("dlayer"), col("d._2").as("dx"),
            col("d._3").as("dy"), col("d._4").as("dz"), col("d._5").as("dsegid"))
      },
      Some("""WITH src AS (
        |  SELECT c_custkey, 1 + c_custkey % 4 AS layer, c_custkey % 600 AS cx,
        |         (c_nationkey * 31) % 800 AS cy, (c_custkey * 7) % 900 AS cz,
        |         c_custkey AS segid
        |  FROM customer WHERE c_custkey % 10 < 3)
        |SELECT c_custkey,
        |  layer * 72057594037927936 + cx * 70368744177664 + cy * 68719476736
        |    + cz * 67108864 + segid AS glabel,
        |  layer AS dlayer, cx AS dx, cy AS dy, cz AS dz, segid AS dsegid
        |FROM src""".stripMargin)),

    // J5: graphene root resolution — iterative parent-edge join to
    // fixpoint (frontends/graphene.py:721-784)
    "j5_graphene_roots" -> Q(
      (s, dir) => {
        val leaves = table(s, dir, "supplier")
          .select(col("s_suppkey").cast("long").as("leaf"))
        val e1 = leaves.select(col("leaf").as("child"),
          (lit(100000L) + idiv(col("leaf"), 10)).as("parent"))
        val e2 = e1.select(col("parent").as("child")).distinct()
          .select(col("child"),
            (lit(200000L) + idiv(col("child") - 100000L, 10)).as("parent"))
        val edges = e1.unionAll(e2).cache()
        // Iterate child->parent to fixpoint over the UNSETTLED frontier
        // only: rows whose node has no parent edge are settled and
        // leave the loop; the remainder re-joins next pass. The shared
        // Frontier loop materializes each pass once (localCheckpoint),
        // so plan size stays O(1) in depth instead of O(depth).
        val start = leaves.select(col("leaf"), col("leaf").as("node"))
        val (settled, frontier) = Frontier.iterate(start, maxRounds = 10,
          probeEmpty = true)(
          (f, _) => f.join(edges, col("node") === col("child"), "left")
            .select(col("leaf"), col("node"), col("parent")))(
          (_, stepped, _) => (
            Seq(stepped.filter(col("parent").isNull)
              .select(col("leaf"), col("node").as("root"))),
            stepped.filter(col("parent").isNotNull)
              .select(col("leaf"), col("parent").as("node"))))
        // depth cap safety: anything still unsettled resolves to itself.
        // The result's lineage is rooted at the per-pass checkpoints,
        // not at `edges` — release the loop-local cache now instead of
        // leaking one copy per invocation.
        edges.unpersist(blocking = false)
        Frontier.unionAll(settled,
            frontier.select(col("leaf"), col("node").as("root")))
          .select(col("leaf"), col("root"))
      },
      Some("""SELECT s_suppkey AS leaf,
        |       200000 + (s_suppkey // 100) AS root
        |FROM supplier""".stripMargin)),

    // P8: annotation bbox crop with geometry-aware predicates
    // (annotation/metadata.py:62-111)
    "p8_annotation_crop" -> Q(
      (s, dir) => {
        val pts = table(s, dir, "events").filter(col("event_id") % 20 === 0)
          .select(lit("point").as("atype"), col("event_id").as("aid"),
            (col("event_id") % 64).cast("long").as("ax"),
            (col("user_id") % 64).cast("long").as("ay"),
            (idiv(col("event_id"), 64) % 32).as("az"))
          .filter(col("ax").between(8, 47) && col("ay").between(8, 47) &&
            col("az").between(4, 27))
        val lines = table(s, dir, "orders").filter(col("o_orderkey") % 50 === 0)
          .select(lit("line").as("atype"), col("o_orderkey").as("aid"),
            (col("o_orderkey") % 64).cast("long").as("ax"),
            (col("o_custkey") % 64).cast("long").as("ay"),
            (col("o_orderkey") % 32).cast("long").as("az"),
            ((col("o_orderkey") * 3) % 64).cast("long").as("bx"),
            ((col("o_custkey") * 5) % 64).cast("long").as("by"),
            (col("o_custkey") % 32).cast("long").as("bz"))
          .filter(
            (col("ax").between(8, 47) && col("ay").between(8, 47) &&
              col("az").between(4, 27)) ||
            (col("bx").between(8, 47) && col("by").between(8, 47) &&
              col("bz").between(4, 27)))
          .select("atype", "aid", "ax", "ay", "az")
        pts.unionAll(lines)
      },
      Some("""WITH pts AS (
        |  SELECT 'point' AS atype, event_id AS aid, event_id % 64 AS ax,
        |         user_id % 64 AS ay, (event_id // 64) % 32 AS az
        |  FROM events WHERE event_id % 20 = 0),
        |cpts AS (SELECT * FROM pts
        |  WHERE ax BETWEEN 8 AND 47 AND ay BETWEEN 8 AND 47 AND az BETWEEN 4 AND 27),
        |lns AS (
        |  SELECT 'line' AS atype, o_orderkey AS aid, o_orderkey % 64 AS ax,
        |         o_custkey % 64 AS ay, o_orderkey % 32 AS az,
        |         (o_orderkey * 3) % 64 AS bx, (o_custkey * 5) % 64 AS by,
        |         o_custkey % 32 AS bz
        |  FROM orders WHERE o_orderkey % 50 = 0),
        |clns AS (SELECT atype, aid, ax, ay, az FROM lns
        |  WHERE (ax BETWEEN 8 AND 47 AND ay BETWEEN 8 AND 47 AND az BETWEEN 4 AND 27)
        |     OR (bx BETWEEN 8 AND 47 AND by BETWEEN 8 AND 47 AND bz BETWEEN 4 AND 27))
        |SELECT * FROM cpts UNION ALL SELECT * FROM clns""".stripMargin)),

    // W1: centered moving average (lib.py:1120-1137)
    "w1_moving_avg" -> Q(
      (s, dir) => {
        val e = table(s, dir, "events").select(col("event_id"), col("user_id"),
          col("ts"), round(col("value") * 100).cast("long").as("vc"))
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-3, 3)
        e.select(col("event_id"),
          round(sum(col("vc")).over(w) / lit(100.0) / count(lit(1)).over(w), 6)
            .as("mavg"))
      },
      Some("""WITH e AS (
        |  SELECT event_id, user_id, ts, CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events)
        |SELECT event_id,
        |  round(CAST(sum(vc) OVER w AS DOUBLE) / 100.0 / count(*) OVER w, 6) AS mavg
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)""".stripMargin)),

    // W11: TIME-RANGE window frame — the other window-frame semantic
    // (w1 is ROWS-based): a trailing 30-minute per-user sum/count,
    // RANGE BETWEEN interval PRECEDING AND CURRENT ROW, peers at the
    // same timestamp included by value not position. The rolling-
    // exposure / rate-limit shape on an event log. Partitioned by
    // user (never global); cents-integer sums; the frame bound is an
    // epoch-micros literal identical in both engines.
    "w11_rolling_range_window" -> Q(
      (s, dir) => {
        val src = table(s, dir, "events")
        val e = src.select(col("event_id"), col("user_id"),
          Derived.tsMicros(src.schema).as("tus"),
          round(col("value") * 100).cast("long").as("vc"))
        val w = Window.partitionBy("user_id").orderBy(col("tus"))
          .rangeBetween(-1800000000L, 0)
        e.select(col("event_id"), col("user_id"),
          sum(col("vc")).over(w).as("trail_sum_c"),
          count(lit(1)).over(w).as("trail_n"))
      },
      Some("""WITH e AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tus,
        |         CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events)
        |SELECT event_id, user_id,
        |  CAST(sum(vc) OVER w AS BIGINT) AS trail_sum_c,
        |  CAST(count(*) OVER w AS BIGINT) AS trail_n
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY tus
        |             RANGE BETWEEN 1800000000 PRECEDING
        |               AND CURRENT ROW)""".stripMargin)),

    // Q1-style pricing summary — headline scan+agg for the bench
    // TPC-H Q3 shape (shipping priority): segment-filtered customer
    // broadcast into orders ⋈ lineitem co-partitioned on the order
    // key; revenue in exact integer ten-thousandths (price_c × (100 −
    // disc_pct)); top-10 via TakeOrderedAndProject. The join order is
    // the one Catalyst should pick at 100 TB: dimension broadcast,
    // fact-fact shuffle on the shared key, partial aggs before the
    // final top-k. Date columns normalized to epoch micros so every
    // testdata drop (ns-long vs us-timestamp) compares identically.
    "q3_shipping_priority" -> Q(
      (s, dir) => {
        val cutoff = 896659200000000L // 1998-06-01 UTC, epoch micros
        def tsc(df: DataFrame, c: String) =
          df.schema(c).dataType match {
            case org.apache.spark.sql.types.LongType => expr(s"$c div 1000")
            case _ => unix_micros(col(c).cast("timestamp"))
          }
        val cust = table(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val ord = table(s, dir, "orders")
        val orders = ord
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderpriority"), tsc(ord, "o_orderdate").as("odate_us"))
          .filter(col("odate_us") < cutoff)
        val li = table(s, dir, "lineitem")
        val items = li.select(col("l_orderkey"),
            tsc(li, "l_shipdate").as("sdate_us"),
            (round(col("l_extendedprice") * 100).cast("long") *
              (lit(100L) - round(col("l_discount") * 100).cast("long")))
              .as("rev"))
          .filter(col("sdate_us") > cutoff)
        items.join(orders, items("l_orderkey") === orders("o_orderkey"))
          .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
          .groupBy("l_orderkey", "odate_us", "o_orderpriority")
          .agg(sum("rev").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10)
      },
      Some("""SELECT l.l_orderkey,
        |  CAST(epoch_ns(o.o_orderdate) // 1000 AS BIGINT) AS odate_us,
        |  o.o_orderpriority,
        |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
        |    AS BIGINT) AS revenue
        |FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND epoch_ns(o.o_orderdate) // 1000 < 896659200000000
        |  AND epoch_ns(l.l_shipdate) // 1000 > 896659200000000
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin)),

    // TPC-H Q5 shape (local-supplier volume): the 6-way join —
    // region→nation→customer broadcast chain into orders ⋈ lineitem ⋈
    // supplier with the c_nationkey = s_nationkey "local" constraint;
    // revenue per nation. The dimension chain stays broadcast at any
    // scale (regions/nations/customers are small next to facts); the
    // only wide shuffles are the fact keys. Exact integer revenue as
    // in Q3.
    // TPC-H Q7 volume shipping: bidirectional two-nation trade flow,
    // revenue in integer cents grouped by (supplier nation, customer
    // nation, ship year). Scale shape: both nation dims broadcast; the
    // fact table joins orders on the order key (the only big-big join,
    // co-shuffled) after supplier/customer nation filters have pruned
    // it; year derives from the shipdate in UTC on both engines.
    "q7_volume_shipping" -> Q(
      (s, dir) => {
        def tsc(df: DataFrame, c: String) =
          df.schema(c).dataType match {
            case org.apache.spark.sql.types.LongType => expr(s"$c div 1000")
            case _ => unix_micros(col(c).cast("timestamp"))
          }
        val natPair = Seq("NATION_19", "NATION_20")
        val nat = table(s, dir, "nation")
          .filter(col("n_name").isin(natPair: _*))
          .select(col("n_nationkey").cast("long").as("natkey"), col("n_name"))
        val supp = table(s, dir, "supplier")
          .join(broadcast(nat), col("s_nationkey").cast("long") === col("natkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val cust = table(s, dir, "customer")
          .join(broadcast(nat), col("c_nationkey").cast("long") === col("natkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        val li0 = table(s, dir, "lineitem")
        val li = li0.select(col("l_orderkey"), col("l_suppkey"),
            tsc(li0, "l_shipdate").as("ship_us"),
            (round(col("l_extendedprice") * 100).cast("long") *
              (lit(100L) - round(col("l_discount") * 100).cast("long")))
              .as("rev"))
          .filter(col("ship_us") >= 820454400000000L && // 1996-01-01
            col("ship_us") < 883612800000000L)          // 1998-01-01
        val ord = table(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        li.join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
          .join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .select(col("supp_nation"), col("cust_nation"),
            year(timestamp_micros(col("ship_us"))).cast("long").as("l_year"),
            col("rev"))
          .groupBy("supp_nation", "cust_nation", "l_year")
          .agg(sum("rev").as("revenue"), count(lit(1)).as("n_items"))
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(make_timestamp(epoch_ns(l.l_shipdate) // 1000)) AS BIGINT)
        |    AS l_year,
        |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
        |    AS BIGINT) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        |JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        |WHERE n1.n_name IN ('NATION_19', 'NATION_20')
        |  AND n2.n_name IN ('NATION_19', 'NATION_20')
        |  AND n1.n_name <> n2.n_name
        |  AND epoch_ns(l.l_shipdate) // 1000 >= 820454400000000
        |  AND epoch_ns(l.l_shipdate) // 1000 < 883612800000000
        |GROUP BY 1, 2, 3""".stripMargin)),

    "q5_local_supplier" -> Q(
      (s, dir) => {
        def tsc(df: DataFrame, c: String) =
          df.schema(c).dataType match {
            case org.apache.spark.sql.types.LongType => expr(s"$c div 1000")
            case _ => unix_micros(col(c).cast("timestamp"))
          }
        val nations = table(s, dir, "nation")
          .join(broadcast(table(s, dir, "region")
              .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").cast("long").as("nationkey"),
            col("n_name"))
        val cust = table(s, dir, "customer")
          .join(broadcast(nations),
            col("c_nationkey").cast("long") === col("nationkey"))
          .select(col("c_custkey"), col("nationkey"), col("n_name"))
        val ord = table(s, dir, "orders")
        val orders = ord.select(col("o_orderkey"), col("o_custkey"),
            tsc(ord, "o_orderdate").as("odate_us"))
          .filter(col("odate_us") >= 820454400000000L && // 1996-01-01
            col("odate_us") < 852076800000000L) // 1997-01-01
        val supp = table(s, dir, "supplier")
          .select(col("s_suppkey"),
            col("s_nationkey").cast("long").as("s_nat"))
        val li = table(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_suppkey"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev"))
        li.join(orders, li("l_orderkey") === orders("o_orderkey"))
          .join(broadcast(cust),
            orders("o_custkey") === cust("c_custkey"))
          .join(broadcast(supp),
            li("l_suppkey") === supp("s_suppkey") &&
              cust("nationkey") === supp("s_nat"))
          .groupBy("n_name")
          .agg(sum("rev").as("revenue"), count(lit(1)).as("n_items"))
      },
      Some("""SELECT n.n_name,
        |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
        |    AS BIGINT) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  AND s.s_nationkey = c.c_nationkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |JOIN region r ON r.r_regionkey = n.n_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND epoch_ns(o.o_orderdate) // 1000 >= 820454400000000
        |  AND epoch_ns(o.o_orderdate) // 1000 < 852076800000000
        |GROUP BY 1""".stripMargin)),

    // TPC-H Q18 shape (large-volume customers): the HAVING-gated
    // aggregate pushed INTO a join — the fact table collapses to
    // per-order quantity sums FIRST (partial-agg'd map-side), the
    // HAVING filter shrinks it to the rare heavy orders, and only
    // then do orders/customer join (both sides now small, AQE
    // broadcasts). The anti-pattern this shape kills at 100 TB is
    // joining the raw fact table before aggregating.
    "q18_large_orders" -> Q(
      (s, dir) => {
        val heavy = table(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(sum(round(col("l_quantity") * 100).cast("long"))
            .as("total_qty_c"))
          .filter(col("total_qty_c") > 15000L)
        heavy
          .join(table(s, dir, "orders")
            .select("o_orderkey", "o_custkey"),
            heavy("l_orderkey") === col("o_orderkey"))
          .join(table(s, dir, "customer").select("c_custkey"),
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("c_custkey"),
            col("total_qty_c"))
      },
      Some("""WITH heavy AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
        |      AS BIGINT) AS total_qty_c
        |  FROM lineitem GROUP BY 1 HAVING total_qty_c > 15000)
        |SELECT o.o_orderkey, c.c_custkey, h.total_qty_c
        |FROM heavy h
        |JOIN orders o ON o.o_orderkey = h.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey""".stripMargin)),

    "q1_pricing" -> Q(
      (s, dir) => table(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_c"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_c"),
          count(lit(1)).as("n")),
      Some("""SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),
  )
}
