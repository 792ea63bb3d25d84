package graft.ops

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Codec, Draco, MeshCodec}

/** Golden-fixture parity over the reference's OWN committed draco mesh
  * layer, /root/reference/test/test_cv/mesh_mip_2_draco_sv16 (21
  * edgebreaker-encoded fragments + manifest). The DuckDB oracle reads
  * golden parquet produced by tools/draco_oracle_gen.py, the independent
  * pure-python decoder whose end-to-end anchor is the reference's own
  * test assertion (test_graphene.py:490-501: chunk-boundary dedup of the
  * fused mesh leaves exactly 3 connected components).
  *
  * 100 TB shape notes: fragment files are enumerated at planning time
  * (metadata-sized listing, the same shape as the shard/manifest paths);
  * each task decodes whole fragments (embarrassingly parallel — at
  * production scale one core decodes ~50 MB/s of draco, so a billion
  * fragments spread across executors with zero shuffle). The stitch
  * entry's dedup is keyed by quantized grid position (co-partitioned
  * groupBy, never all-pairs) and the component search reuses the
  * ConnectedComponents pointer-jumping helper whose shuffle carries the
  * cross-partition stitch graph only.
  */
object DracoQueries {

  val FragDir = "/root/reference/test/test_cv/mesh_mip_2_draco_sv16"
  val Err40Dir = "/root/reference/test/test_cv/mesh_mip_2_err_40_sv16"
  val Golden = "/root/repo/src/test/resources/golden"
  // the root both committed manifests describe (test_graphene.py
  // TEST_SEG_ID — its mesh.get fetches this manifest, then fragments)
  val RootManifest = "648518346349515986:0"

  /** Fragment names listed by a committed `<segid>:0` manifest
    * (mesh/unsharded.py:66-85 — JSON {"fragments": [paths]}); one
    * metadata-sized driver read, exactly the reference's manifest GET.
    */
  private def manifestFragments(path: String): Seq[String] = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(Paths.get(path)))
    val it = node.get("fragments").elements()
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) buf += it.next().asText()
    buf.sorted.toSeq
  }

  // reference dedup constants for this layer (test_graphene.py fixture
  // info): graph chunk_size [512,512,128] * resolution [8,8,40] nm,
  // uniform_draco_grid_size 21, chunks_start_at_voxel_offset=false
  private val ChunkNm = Array(4096.0, 4096.0, 5120.0)
  private val GridNm = 21.0

  /** Fragment files as (idx, segid, path), listed at planning time. */
  private def fragFiles(s: SparkSession): DataFrame = {
    import s.implicits._
    val st = Files.list(Paths.get(FragDir))
    val rows =
      try {
        val it = st.iterator()
        val buf = scala.collection.mutable.ArrayBuffer[String]()
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString.count(_ == ':') == 2) buf += p.toString
        }
        buf.sorted.toVector
      } finally st.close()
    s.createDataset(rows.zipWithIndex.map { case (p, i) =>
      (i, Paths.get(p).getFileName.toString.split(":")(0).toLong, p)
    }).toDF("idx", "segid", "path")
      .repartition(8) // one decode task per fragment at fixture size
  }

  /** Decoded vertices (idx, segid, vid, x, y, z). Coordinates are exact
    * multiples of the uniform draco grid, so doubles compare exactly. */
  private def vertices(s: SparkSession): DataFrame = {
    import s.implicits._
    fragFiles(s).as[(Int, Long, String)].flatMap { case (idx, segid, p) =>
      val m = Draco.decode(Files.readAllBytes(Paths.get(p)))
      (0 until m.numVertices).iterator.map { i =>
        (idx, segid, i, m.positions(i * 3), m.positions(i * 3 + 1), m.positions(i * 3 + 2))
      }
    }.toDF("idx", "segid", "vid", "x", "y", "z")
  }

  private def faces(s: SparkSession): DataFrame = {
    import s.implicits._
    fragFiles(s).as[(Int, Long, String)].flatMap { case (idx, segid, p) =>
      val m = Draco.decode(Files.readAllBytes(Paths.get(p)))
      (0 until m.faces.length / 3).iterator.map { f =>
        (idx, segid, f, m.faces(f * 3), m.faces(f * 3 + 1), m.faces(f * 3 + 2))
      }
    }.toDF("idx", "segid", "fid", "v0", "v1", "v2")
  }

  val queries: Map[String, Q] = Map(

    // F16 draco mesh decode: full dequantized vertex parity on every
    // committed fragment (mesh.py:315-330 from_draco; DracoPy replaced
    // by the spec-derived core/Draco.scala). Pure fan-out, no shuffle.
    "f16c_mesh_draco" -> Q(
      (s, dir) => vertices(s).select(col("segid"), col("vid").cast("long").as("vid"),
        col("x"), col("y"), col("z")),
      Some(s"""SELECT segid, vid, x, y, z
        |FROM read_parquet('$Golden/draco_vertices.parquet')""".stripMargin)),

    // F16 draco connectivity parity: edgebreaker-reconstructed faces
    // with the decoder's canonical vertex indexing.
    "f16d_mesh_draco_faces" -> Q(
      (s, dir) => faces(s).select(col("segid"), col("fid").cast("long").as("fid"),
        col("v0").cast("long").as("v0"), col("v1").cast("long").as("v1"),
        col("v2").cast("long").as("v2")),
      Some(s"""SELECT segid, fid, v0, v1, v2
        |FROM read_parquet('$Golden/draco_faces.parquet')""".stripMargin)),

    // A6 manifest-driven fragment resolution (mesh/unsharded.py:66-85:
    // mesh.get fetches `<segid>:0`, a JSON fragment list, THEN the
    // fragments): the committed root manifest's 21 entries are parsed,
    // resolved to their files, and decoded — per-fragment counts must
    // match the independent decoder's golden tables keyed by the
    // segids the ORACLE extracts from the same manifest JSON. Proves
    // the manifest hop of the reference's read path on its own
    // committed bytes (the directory-listing entries above bypass it).
    "a6d_mesh_manifest_golden" -> Q(
      (s, dir) => {
        import s.implicits._
        val names = manifestFragments(s"$FragDir/$RootManifest")
          .map(_.split("/").last) // layer-relative path -> file name
        s.createDataset(names).repartition(8).map { name =>
          val m = Draco.decode(Files.readAllBytes(Paths.get(FragDir, name)))
          (name.split(":")(0).toLong, m.numVertices.toLong,
            (m.faces.length / 3).toLong)
        }.toDF("segid", "n_verts", "n_faces")
      },
      Some(s"""WITH m AS (SELECT unnest(fragments) AS frag
        |         FROM read_json_auto('$FragDir/$RootManifest')),
        |seg AS (SELECT CAST(string_split(string_split(frag, '/')[2],
        |          ':')[1] AS BIGINT) AS segid FROM m),
        |v AS (SELECT segid, CAST(count(*) AS BIGINT) AS n_verts
        |      FROM read_parquet('$Golden/draco_vertices.parquet')
        |      GROUP BY 1),
        |f AS (SELECT segid, CAST(count(*) AS BIGINT) AS n_faces
        |      FROM read_parquet('$Golden/draco_faces.parquet')
        |      GROUP BY 1)
        |SELECT seg.segid, v.n_verts, f.n_faces
        |FROM seg JOIN v USING (segid) JOIN f USING (segid)""".stripMargin)),

    // F16 precomputed-binary decode of the OTHER committed mesh layer
    // (mesh_mip_2_err_40_sv16: the graphene ROOT meshes, ~44 MB of real
    // bytes that previously flowed through no oracle): manifest ->
    // gunzip -> MeshCodec.decode per fragment, with ORDER-INDEPENDENT
    // integer checksums (sum of raw float32 bit patterns, sum of face
    // indices) against tools/mesh_err40_golden_gen.py's independent
    // struct parse of the same bytes.
    "f16e_mesh_precomputed_golden" -> Q(
      (s, dir) => {
        import s.implicits._
        val names = manifestFragments(s"$Err40Dir/$RootManifest")
        s.createDataset(names).repartition(8).map { name =>
          val m = MeshCodec.decode(Codec.gunzip(
            Files.readAllBytes(Paths.get(Err40Dir, name + ".gz"))))
          var vb = 0L; var i = 0
          while (i < m.vertices.length) {
            vb += java.lang.Float.floatToRawIntBits(m.vertices(i)) & 0xffffffffL
            i += 1
          }
          var fs = 0L; i = 0
          while (i < m.faces.length) { fs += m.faces(i); i += 1 }
          (name, m.vertices.length.toLong / 3, m.faces.length.toLong / 3,
            vb, fs)
        }.toDF("frag", "n_verts", "n_faces", "vbits_sum", "fidx_sum")
      },
      Some(s"""SELECT frag, n_verts, n_faces, vbits_sum, fidx_sum
        |FROM read_parquet('$Golden/mesh_err40.parquet')""".stripMargin)),

    // A6 graphene draco stitch: the reference's mesh.get path for a
    // level-2 id — fuse all fragments, deduplicate vertices that occur
    // exactly twice within grid/2 of a chunk border
    // (mesh.py:379-419 deduplicate_chunk_boundaries/is_draco_chunk_aligned),
    // then component sizes of the face-edge graph. Must produce exactly
    // the 3 components the reference's test asserts
    // (test_graphene.py:490-501). Distributed shape: dup detection is a
    // grid-key groupBy (co-partitioned), edges join the (segid,vid)->node
    // map (AQE broadcasts at this size; hash join keyed by segid,vid at
    // scale), components via pointer-jumping CC.
    "a6c_mesh_draco_stitch" -> Q(
      (s, dir) => {
        val v = vertices(s)
          .withColumn("gx", round(col("x") / GridNm).cast("long"))
          .withColumn("gy", round(col("y") / GridNm).cast("long"))
          .withColumn("gz", round(col("z") / GridNm).cast("long"))
          .withColumn("gkey",
            shiftleft(col("gx"), 42).bitwiseOR(shiftleft(col("gy"), 21)).bitwiseOR(col("gz")))
          .withColumn("aligned",
            (col("x") % ChunkNm(0) < GridNm / 2) || (lit(ChunkNm(0)) - col("x") % ChunkNm(0) <= GridNm / 2) ||
            (col("y") % ChunkNm(1) < GridNm / 2) || (lit(ChunkNm(1)) - col("y") % ChunkNm(1) <= GridNm / 2) ||
            (col("z") % ChunkNm(2) < GridNm / 2) || (lit(ChunkNm(2)) - col("z") % ChunkNm(2) <= GridNm / 2))
        val dupCnt = v.groupBy("gkey").agg(count(lit(1)).as("cnt"))
        // node id: merged pairs collapse to the (non-negative) grid key;
        // all others get a unique NEGATIVE id from (fragment idx, vid) —
        // the two ranges are structurally disjoint with no bound assumed
        // on fragment count or per-fragment vertex count (vid < 2^32 by
        // the draco format's u32 indices)
        val nodes = v.join(dupCnt, "gkey")
          .withColumn("node",
            when(col("cnt") === 2 && col("aligned"), col("gkey"))
              .otherwise(-(col("idx") * 4294967296L + col("vid") + 1L)))
        // the decode + dup-count subtree feeds the edge join (twice), the
        // CC node list, and the final aggregation — checkpoint it once so
        // the fragments decode once, not once per consumer
        val nodeMap = nodes.select("idx", "vid", "node", "gkey").localCheckpoint()
        val e0 = faces(s)
          .select(col("idx"), explode(array(
            array(col("v0"), col("v1")), array(col("v1"), col("v2")),
            array(col("v2"), col("v0")))).as("e"))
          .select(col("idx"), col("e")(0).as("va"), col("e")(1).as("vb"))
        val withA = e0.join(nodeMap.select(col("idx"), col("vid").as("va"), col("node").as("na")),
          Seq("idx", "va"))
        val withB = withA.join(nodeMap.select(col("idx"), col("vid").as("vb"), col("node").as("nb")),
          Seq("idx", "vb"))
        val edges = withB.select(col("na").as("vid"), col("nb").as("nvid"))
          .union(withB.select(col("nb").as("vid"), col("na").as("nvid")))
        val comps = ConnectedComponents.propagateMin(s,
          edges, nodeMap.select(col("node").as("vid")).distinct())
        // component key = min vertex grid key; size = distinct merged nodes
        nodeMap.select(col("node").as("vid"), col("gkey")).distinct()
          .join(comps, "vid")
          .groupBy(col("comp"))
          .agg(min(col("gkey")).as("comp_key"),
            count(lit(1)).as("n_nodes"))
          .select("comp_key", "n_nodes")
      },
      Some(s"""SELECT comp_key, n_nodes
        |FROM read_parquet('$Golden/draco_components.parquet')""".stripMargin))
  )
}
