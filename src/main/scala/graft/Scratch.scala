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
    // --findmut: run every query once and report which ones touch any
    // fixture marker file (mtime change / delete / create) — finds the
    // entry that invalidates a sibling's fixture between bench passes
    if (flags.contains("--findmut")) {
      import java.nio.file.{Files, Paths}
      import scala.jdk.CollectionConverters._
      graft.ops.Fixtures.ensureAll(spark, sfDir)
      def snap(): Map[String, Long] = {
        val roots = Seq("/tmp/graft_fixture", "/tmp/graft_stream")
          .map(Paths.get(_)).filter(Files.exists(_))
        roots.flatMap { r =>
          Files.walk(r).iterator.asScala
            .filter(p => p.getFileName.toString.startsWith(".built") ||
              p.getFileName.toString.startsWith(".docs") ||
              p.getFileName.toString == "info")
            .map(p => p.toString ->
              Files.getLastModifiedTime(p).toMillis)
            .toSeq
        }.toMap
      }
      var prev = snap()
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
        val cur = snap()
        val changed = (prev.keySet ++ cur.keySet).filter(k =>
          prev.get(k) != cur.get(k))
        if (changed.nonEmpty)
          println(s"[findmut] $name -> ${changed.toSeq.sorted.mkString(", ")}")
        prev = cur
      }
      spark.stop(); return
    }
    // --udfseq: print the RUNTIME class a Seq[Float] UDF argument
    // deserializes to (List = O(n) indexing = quadratic per-row loops)
    if (flags.contains("--udfseq")) {
      import org.apache.spark.sql.functions.udf
      val probe = udf((vs: Seq[Float]) => vs.getClass.getName)
      import spark.implicits._
      val r = Seq(Seq(1f, 2f, 3f)).toDF("vs")
        .select(probe($"vs")).head().getString(0)
      println(s"[udfseq] Seq[Float] arrives as: $r")
      val probeA = udf((vs: Array[Float]) => vs.getClass.getName + ":" + vs(2))
      val ra = Seq(Seq(1f, 2f, 3f)).toDF("vs")
        .select(probeA($"vs")).head().getString(0)
      println(s"[udfseq] Array[Float] arrives as: $ra")
      val probeR = udf((vs: Array[Float], n: Int) => {
        var s = 0.0f; var i = 0
        while (i < n) { s += vs(i % vs.length); i += 1 }; s
      })
      val t0 = System.nanoTime()
      Seq(Seq.fill(15000)(1f)).toDF("vs")
        .select(probeR($"vs", org.apache.spark.sql.functions.lit(45000000)))
        .head()
      println(f"[udfseq] 45M array-indexed accesses: ${(System.nanoTime()-t0)/1e9}%.2f s")
      spark.stop(); return
    }
    // --jobfloor: calibrate per-job overhead of two probe shapes —
    // trivial shuffle vs broadcast-join+agg (the structural primitive
    // of the iterative-join entries) — to pick Bench's in-run floor
    if (flags.contains("--jobfloor")) {
      import spark.implicits._
      @volatile var jobs = 0
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs += 1
        })
      val base = spark.range(0, 200, 1, 32)
        .selectExpr("id as u", "id % 7 + 1 as deg").localCheckpoint()
      val dim = spark.range(0, 200, 1, 4)
        .selectExpr("id as u", "id * 3 as pr").localCheckpoint()
      def bjAgg(): Long = base.join(dim, Seq("u"))
        .selectExpr("u % 50 as g", "pr / deg as w")
        .groupBy("g").agg(org.apache.spark.sql.functions.sum("w")).count()
      def trivial(): Long = spark.range(0, 32, 1, 32).repartition(32).count()
      for ((nm, fn) <- Seq[(String, () => Long)](
          ("trivial_shuffle", () => trivial()),
          ("bcast_join_agg", () => bjAgg()))) {
        (1 to 4).foreach(_ => fn()) // warm
        // drain the async listener bus so the warm loop's late
        // JobStart events don't leak into rep1's count (Bench's
        // measureJobFloor drains likewise); reps 2-3 were already
        // protected by the post-rep sleep
        org.apache.spark.graftbridge.BusDrain.drain(spark.sparkContext)
        for (rep <- 1 to 3) {
          jobs = 0
          val t0 = System.nanoTime()
          (1 to 6).foreach(_ => fn())
          // stop the clock BEFORE the listener-bus drain sleep (the
          // sibling --floor block does the same); timing the sleep
          // inflated the floor ~0.2/jobs s per rep
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(200)
          println(f"[jobfloor] $nm rep$rep wall=$dt%.3f s jobs=$jobs " +
            f"per_job=${dt / math.max(1, jobs)}%.4f s")
        }
      }
      spark.stop(); return
    }
    // --ngprobe: localize the per-task fixed cost of DSv2-scan stages
    // (bench task_ms ~ 24x job_ms on fixture-layer entries): time a
    // bare metadata scan, a payload scan, the decode-UDF explode, and
    // a trivial 32-task shuffle, each with per-stage run/cpu ms
    if (flags.contains("--ngprobe")) {
      import org.apache.spark.sql.functions._
      graft.ops.RealLayerQueries.ensure(spark, sfDir)
      val recs =
        scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long, Long)]
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
            recs.synchronized {
              recs += ((st.stageInfo.stageId, st.stageInfo.numTasks,
                st.stageInfo.taskMetrics.executorRunTime,
                st.stageInfo.taskMetrics.executorCpuTime / 1000000L))
            }
        })
      val dir = graft.ops.RealLayerQueries.LayerDir
      def probe(nm: String)(act: => Unit): Unit = {
        act // warm
        (1 to 3).foreach { rep =>
          recs.synchronized(recs.clear())
          val t0 = System.nanoTime()
          act
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(200)
          recs.synchronized(recs.foreach { case (id, nt, run, cpu) =>
            println(f"[ngprobe] $nm rep$rep wall=$dt%.3f stage=$id " +
              f"tasks=$nt run_ms=$run cpu_ms=$cpu")
          })
        }
      }
      probe("meta_only") {
        graft.sources.PrecomputedIO.readChunks(spark, dir)
          .select("gx").count()
      }
      probe("payload_len") {
        graft.sources.PrecomputedIO.readChunks(spark, dir)
          .agg(sum(length(col("payload")))).head()
      }
      probe("decode_explode") {
        graft.sources.PrecomputedIO.cutoutVoxels(spark, dir,
          graft.core.Bbox(graft.core.Vec3(0, 0, 0),
            graft.core.Vec3(60, 60, 28))).count()
      }
      probe("range32") {
        spark.range(0, 64, 1, 32).repartition(32).count()
      }
      spark.stop(); return
    }

    // --pngmicro: decoder A/B off the Spark path — the mm fixture
    // shapes and a chunk-sized gray png, ImageIO (reader reused, the
    // old per-partition pattern) vs core.PngDecode, same images.
    if (flags.contains("--pngmicro")) {
      def mkGray(w: Int, h: Int, seed: Long): Array[Byte] = {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val r = img.getRaster
        for (y <- 0 until h; x <- 0 until w)
          r.setSample(x, y, 0, ((seed * 31 + x * 7 + y * 13) % 256).toInt)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        bos.toByteArray
      }
      val tiny = (0 until 500).map(i =>
        mkGray((8 + i % 25), (6 + i % 17), i.toLong)).toArray
      val chunk = Array(mkGray(64, 1764, 7L)) // ~a 64x63x28 png chunk
      def viaImageIO(pngs: Array[Array[Byte]], reps: Int): Long = {
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("png").next()
        var acc = 0L
        val t0 = System.nanoTime()
        for (_ <- 1 to reps; p <- pngs) {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(p))
          reader.setInput(iis, true, true)
          val img = try reader.read(0) finally iis.close()
          acc += img.getRaster.getSample(0, 0, 0)
        }
        println(s"  (sink $acc)")
        (System.nanoTime() - t0) / 1000000L
      }
      def viaPngDecode(pngs: Array[Array[Byte]], reps: Int): Long = {
        var acc = 0L
        val t0 = System.nanoTime()
        for (_ <- 1 to reps; p <- pngs)
          acc += graft.core.PngDecode.gray8(p).get._3(0)
        println(s"  (sink $acc)")
        (System.nanoTime() - t0) / 1000000L
      }
      for (rep <- 1 to 3) {
        println(s"[pngmicro] rep$rep tiny500 imageio=${viaImageIO(tiny, 4)} ms " +
          s"pngdecode=${viaPngDecode(tiny, 4)} ms")
        println(s"[pngmicro] rep$rep chunk64x1764 imageio=${viaImageIO(chunk, 50)} ms " +
          s"pngdecode=${viaPngDecode(chunk, 50)} ms")
      }
      spark.stop(); return
    }

    // --stprobe: run st entries under a StreamingQueryListener and dump
    // every micro-batch's durationMs breakdown (triggerExecution,
    // queryPlanning, walCommit, addBatch, commitOffsets, ...) plus the
    // batch count — localizes the streaming lane's per-entry fixed cost
    // (replan vs WAL vs state-store vs no-data finalize batch).
    if (flags.contains("--stprobe")) {
      graft.ops.Fixtures.ensureAll(spark, sfDir)
      val lines = scala.collection.mutable.ArrayBuffer.empty[String]
      spark.streams.addListener(
        new org.apache.spark.sql.streaming.StreamingQueryListener {
          import org.apache.spark.sql.streaming.StreamingQueryListener._
          override def onQueryStarted(e: QueryStartedEvent): Unit = ()
          override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
          override def onQueryProgress(e: QueryProgressEvent): Unit =
            lines.synchronized {
              val p = e.progress
              lines += f"[stbatch] ${p.name} batch=${p.batchId} " +
                f"rows=${p.numInputRows} durationMs=${p.durationMs}"
            }
        })
      for (n <- names) {
        SparkEntry.queries(n)(spark, sfDir).count() // warm
        for (rep <- 1 to 3) {
          lines.synchronized(lines.clear())
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300) // streaming listener bus is async
          println(f"[stprobe] $n rep$rep wall=$dt%.3f s")
          lines.synchronized(lines.foreach(println))
        }
      }
      spark.stop(); return
    }

    // --floor: attribute an entry's wall time to Spark job count x
    // per-job overhead (r14 brief item 7: the stream-stream join and
    // the frontier descents are multi-job fixed-cost floors at bench
    // scale — measure it so future rounds stop re-investigating)
    if (flags.contains("--floor")) {
      graft.ops.Fixtures.ensureAll(spark, sfDir)
      val stageDetail = flags.contains("--stages")
      @volatile var jobs = 0
      @volatile var stages = 0
      @volatile var taskMs = 0L
      val stageRecs =
        scala.collection.mutable.ArrayBuffer.empty[(Int, String, Int, Long, Long)]
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs += 1
          override def onStageCompleted(
              st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            stages += 1
            taskMs += st.stageInfo.taskMetrics.executorRunTime
            if (stageDetail) stageRecs.synchronized {
              stageRecs += ((st.stageInfo.stageId,
                st.stageInfo.name.takeWhile(_ != '('.toChar).take(40),
                st.stageInfo.numTasks,
                st.stageInfo.taskMetrics.executorRunTime,
                st.stageInfo.taskMetrics.executorCpuTime / 1000000L))
            }
          }
        })
      for (n <- names) {
        SparkEntry.queries(n)(spark, sfDir).count() // warm
        for (rep <- 1 to 3) {
          jobs = 0; stages = 0; taskMs = 0L
          stageRecs.synchronized(stageRecs.clear())
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(200) // let the async listener bus drain
          println(f"[floor] $n rep$rep wall=$dt%.3f s jobs=$jobs " +
            f"stages=$stages task_time=${taskMs / 1e3}%.2f s " +
            f"per_job_overhead=${(dt - taskMs / 1e3 / 32) / math.max(jobs, 1)}%.4f s")
          // per-stage run vs CPU: run >> cpu means tasks were BLOCKED
          // (lock / IO / CPU oversubscription), run ~= cpu means real
          // compute — the split that localizes a task_ms anomaly
          if (stageDetail) stageRecs.synchronized {
            stageRecs.foreach { case (id, nm, nt, runMs, cpuMs) =>
              println(f"[floor-stage] $n rep$rep stage=$id tasks=$nt " +
                f"run_ms=$runMs cpu_ms=$cpuMs $nm")
            }
          }
        }
      }
      spark.stop(); return
    }
    // --rrfarms: time rag_hybrid_rrf's two retrieval arms in isolation
    // (r14 brief item 5: "profile which arm dominates")
    if (flags.contains("--rrfarms")) {
      SparkEntry.queries("rag_hybrid_rrf")(spark, sfDir).count() // warm + memos
      val arms = Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
          org.apache.spark.sql.DataFrame)](
        "dense" -> graft.ops.SimilarityQueries.rrfDenseArm,
        "lexical" -> graft.ops.SimilarityQueries.rrfLexicalArm)
      for ((an, fn) <- arms; rep <- 1 to 3) {
        val t0 = System.nanoTime()
        val c = fn(spark, sfDir).count()
        println(f"[scratch] rrf_$an rep$rep rows=$c " +
          f"time=${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      spark.stop(); return
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
