package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Bbox, Vec3}
import graft.ops._

class EngineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("chunk round trip: cutout over full volume matches voxel source") {
    import spark.implicits._
    val vox = Derived.voxels(spark, sf)
    val chunks = ChunkEngine.fromVoxels(vox)
    val back = ChunkEngine.cutoutVoxels(chunks,
      Bbox(Vec3(0, 0, 0), Vec3(64, 64, 32)))
    assert(back.count() === 64L * 64 * 32)
    // every non-background readback voxel matches max(label) at that coord
    val resolved = vox.groupBy("x", "y", "z")
      .agg(org.apache.spark.sql.functions.max("label").as("explabel"))
    val joined = back.filter($"label" =!= 0)
      .join(resolved, Seq("x", "y", "z"), "left")
    assert(joined.filter($"label" =!= $"explabel").count() === 0)
  }

  test("all registered queries run and return rows (non-vacuous)") {
    // queries legitimately empty at sf0.001 (tiny fixture): p9's crop
    // keeps no complete face below ~5 vertices per fragment
    val mayBeEmpty = Set("p9_mesh_crop")
    SparkEntry.allQueries.foreach { case (name, q) =>
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty, name)
      val n = df.count()
      if (!mayBeEmpty.contains(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("fromVoxels keeps uint64 labels above 2^63 (unsigned max vs background)") {
    import spark.implicits._
    val big = java.lang.Long.parseUnsignedLong("9223372036854775813") // 2^63+5
    val vox = Seq((1L, 2L, 3L, big, 0L), (1L, 2L, 3L, 7L, 0L))
      .toDF("x", "y", "z", "label", "v")
    val labels = ChunkEngine.uniqueLabels(ChunkEngine.fromVoxels(vox))
      .collect().map(_.getLong(0)).toSet
    // the >= 2^63 label survives assembly AND wins the collision
    // (unsigned max); signed compare would have dropped it for 7
    assert(labels.contains(big))
    assert(!labels.contains(7L))
  }

  test("remap preserves missing and maps present") {
    val chunks = ChunkEngine.fromVoxels(Derived.voxels(spark, sf))
    val remapped = ChunkEngine.remapPayloads(chunks,
      Map(1L -> 5001L), preserveMissing = true)
    val labels = ChunkEngine.uniqueLabels(remapped)
      .collect().map(_.getLong(0)).toSet
    assert(!labels.contains(1L))
  }
}
