package graft

import org.apache.spark.sql.SparkSession

/** Temporary perf harness — times single SparkEntry queries in isolation. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .appName("scratch").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (flags, names) = args.toSeq.partition(_.startsWith("--"))
    // --warmall: reproduce the bench loop's JVM state (every query run
    // once) before timing, to separate query cost from JVM-state creep
    if (flags.contains("--warmall")) {
      graft.ops.Fixtures.ensureAll(spark, sfDir)
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
      System.gc()
    }
    // warmup
    SparkEntry.queries("q1_pricing")(spark, sfDir).count()
    for (n <- names; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[scratch] $n rep$rep rows=$c time=$dt%.3f s")
    }
    spark.stop()
  }
}
