package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.ops.{TextQueries, SimilarityQueries, MultimodalOps,
  VolumeQueries, MetaQueries, GraphQueries}

/** Semantic invariants for the round-13 pipeline operators (the oracle
  * gate proves Spark==DuckDB; these prove the answers mean what the
  * operator claims).
  */
class PipelineOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  test("dsir_importance ranks the target domain above the rest") {
    val sc = TextQueries.queries("dsir_importance").fn(spark, sfDir)
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source")
    val j = sc.join(src, "doc_id")
      .groupBy(col("source") === "src0")
      .agg(avg("score_avg_ppm").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(j(true) > j(false),
      s"target-domain docs must out-score the rest: $j")
    // smoothed ratio scores hover around 1.0 (1e6 ppm) by construction
    assert(j(false) > 500000 && j(true) < 2000000, s"score scale sane: $j")
  }

  test("vocab_growth is monotone and ends at the corpus totals") {
    val rows = TextQueries.queries("vocab_growth").fn(spark, sfDir)
      .orderBy("k").collect()
    assert(rows.length == 10)
    val vocab = rows.map(_.getAs[Long]("cum_vocab"))
    val sh = rows.map(_.getAs[Long]("cum_shingles"))
    val docs = rows.map(_.getAs[Long]("cum_docs"))
    assert(vocab.zip(vocab.tail).forall { case (a, b) => a <= b })
    assert(sh.zip(sh.tail).forall { case (a, b) => a <= b })
    assert(docs.last == 500 && vocab.last > vocab.head,
      s"final checkpoint covers the corpus and vocab grows: " +
        s"docs=${docs.last} vocab ${vocab.head}->${vocab.last}")
  }

  test("filter_url_blocklist blocks listed domains incl. subdomains") {
    val r = TextQueries.queries("filter_url_blocklist").fn(spark, sfDir)
    val blockedHosts = r.filter(col("blocked") === 1)
      .select("host").distinct().collect().map(_.getString(0)).toSet
    assert(blockedHosts.exists(_ == "src1.example.org"))
    assert(blockedHosts.exists(_ == "www.src1.example.org"),
      "subdomain suffix match must fire")
    // every doc with a /p/13* path is blocked (rule 3)
    val leaked = r.filter(col("path").startsWith("/p/13") &&
      col("blocked") === 0).count()
    assert(leaked == 0, s"$leaked /p/13* paths escaped the path rule")
    // and unlisted-domain, non-matching-path docs pass through
    assert(r.filter(col("blocked") === 0).count() > 0)
  }

  test("emb_random_projection emits 8 mixed components per vector") {
    val r = SimilarityQueries.queries("emb_random_projection").fn(spark, sfDir)
    val per = r.groupBy("vec_id").agg(count(lit(1)).as("n"),
      sum(when(col("y_q") =!= 0, 1).otherwise(0)).as("nz"))
    assert(per.filter(col("n") =!= 8).count() == 0)
    // a projection that zeroed most outputs would mean a degenerate R
    // (a handful of near-zero input vectors may land short)
    val mixed = per.filter(col("nz") >= 6).count()
    assert(mixed * 100 >= per.count() * 99,
      s"only $mixed/${per.count()} vectors have >= 6 nonzero components")
  }

  test("decontaminate_semantic flags exactly the injected leaks") {
    val r = SimilarityQueries.queries("decontaminate_semantic").fn(spark, sfDir)
    val flagged = r.filter(col("contaminated") === 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(flagged == (20000L until 20008L).toSet,
      s"flagged=$flagged — the 8 injected near-copies, nothing organic")
    // each flagged vector points at its eval source
    val pairs = r.filter(col("contaminated") === 1)
      .select("vec_id", "worst_eval_id").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(pairs.forall { case (v, e) => v - 20000L == e })
  }

  test("w7_funnel step timestamps are strictly ordered") {
    val rows = MetaQueries.queries("w7_funnel").fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tv, tc, tp, st) = (r.getAs[Long]("t_view"),
        r.getAs[Long]("t_click"), r.getAs[Long]("t_purchase"),
        r.getAs[Long]("steps_completed"))
      assert(st == 1 + (if (tc > 0) 1 else 0) + (if (tp > 0) 1 else 0))
      if (tc > 0) assert(tc > tv)
      if (tp > 0) assert(tc > 0 && tp > tc,
        "purchase step requires the click step first")
    }
  }

  test("w8_retention day-0 row covers each full cohort") {
    val rows = MetaQueries.queries("w8_retention").fn(spark, sfDir)
      .collect()
    val day0 = rows.filter(_.getAs[Long]("day_offset") == 0)
      .map(r => r.getAs[Long]("cohort_day") -> r.getAs[Long]("n_users"))
      .toMap
    assert(rows.forall(_.getAs[Long]("day_offset") >= 0))
    // every later offset of a cohort retains at most the day-0 users
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") <=
        day0(r.getAs[Long]("cohort_day")), s"retention exceeds cohort: $r")
    }
  }

  test("a1c merged HLL equals the single-pass sketch") {
    val merged = VolumeQueries.queries("a1c_unique_hll_merge")
      .fn(spark, sfDir).filter(col("scope") === "merged")
      .collect().head
    val global = VolumeQueries.queries("a1b_unique_hll").fn(spark, sfDir)
      .collect().head
    assert(merged.getAs[Long]("raw_est") == global.getAs[Long]("raw_est"),
      "per-shard max-merge must reproduce the global registers exactly")
    assert(merged.getAs[Long]("exact_distinct") ==
      global.getAs[Long]("exact_distinct"))
  }

  test("graph_pagerank3 conserves mass and stays positive") {
    val pr = GraphQueries.queries("graph_pagerank3").fn(spark, sfDir)
      .collect().map(_.getAs[Long]("pr"))
    assert(pr.nonEmpty && pr.forall(_ >= 150000L))
    val total = pr.sum.toDouble / (pr.length * 1000000.0)
    assert(total > 0.95 && total <= 1.0,
      f"rank mass drifted: $total%.4f of N (integer div only loses)")
  }

  test("graph_triangles matches a local recount") {
    val row = GraphQueries.queries("graph_triangles").fn(spark, sfDir)
      .collect().head
    // independent recount from the same deterministic edge derivation
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_partkey").cast("long").as("l_partkey"),
        col("l_suppkey").cast("long").as("l_suppkey")).collect()
    def md5mod10(u: Long, v: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$u:$v".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(6).map(b => f"$b%02x").mkString, 16) % 10
    }
    val edges = lineitem.map { r =>
      val a = r.getAs[Long]("l_partkey") % 200
      val b = (r.getAs[Long]("l_partkey") / 7 + r.getAs[Long]("l_suppkey")) % 200
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct.filter(e => md5mod10(e._1, e._2) == 0)
    val eset = edges.toSet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    var tri = 0L
    for ((a, bs) <- adj; b <- bs; c <- adj.getOrElse(b, Array.empty[Long]))
      if (eset.contains((a, c))) tri += 1
    assert(row.getAs[Long]("n_triangles") == tri,
      s"distributed count ${row.getAs[Long]("n_triangles")} != local $tri")
    assert(row.getAs[Long]("n_edges") == edges.length)
  }

  test("w9_anomaly_zscore flags a plausible outlier fraction") {
    val flagged = MetaQueries.queries("w9_anomaly_zscore").fn(spark, sfDir)
      .collect()
    val total = spark.read.parquet(s"$sfDir/events.parquet").count()
    flagged.foreach(r => assert(
      r.getAs[Long]("dev2_scaled") > r.getAs[Long]("threshold")))
    val rate = flagged.length.toDouble / total
    assert(rate > 0.005 && rate < 0.2, s"outlier rate off: $rate")
  }

  test("q3/q5 join plans broadcast their dimensions") {
    val q3 = VolumeQueries.queries("q3_shipping_priority").fn(spark, sfDir)
    val rows = q3.collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getAs[Long]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b },
      "top-10 must be revenue-descending")
    val plan3 = q3.queryExecution.executedPlan.toString
    assert(plan3.contains("BroadcastHashJoin"),
      "q3 must broadcast the customer dimension")
    val q5 = VolumeQueries.queries("q5_local_supplier").fn(spark, sfDir)
    assert(q5.collect().forall(_.getAs[Long]("revenue") > 0))
    val plan5 = q5.queryExecution.executedPlan.toString
    assert(plan5.contains("BroadcastHashJoin"),
      "q5 must broadcast the dimension chain")
  }

  test("skel_terminals classifies the binary tree correctly") {
    val rows = graft.ops.SkeletonQueries.queries("skel_terminals")
      .fn(spark, sfDir).collect()
    val bySeg = rows.groupBy(_.getAs[Long]("segid"))
    bySeg.foreach { case (seg, vs) =>
      val n = vs.length
      val degSum = vs.map(_.getAs[Long]("degree")).sum
      assert(degSum == 2L * (n - 1), s"degree sum != 2(n-1) for $seg")
      val terminals = vs.count(_.getAs[Long]("is_terminal") == 1)
      // a binary tree with parent(i) = i/2 has ceil(n/2) leaves for
      // n >= 3 (vertex 0 keeps degree >= 2 once it has two children)
      if (n >= 3) assert(terminals == (n + 1) / 2,
        s"leaf count $terminals != ${(n + 1) / 2} for n=$n")
    }
  }

  test("dedup_containment catches the subset near-dups") {
    val rows = TextQueries.queries("dedup_containment").fn(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    // B = A minus its first word, so B's shingles are ~contained in A
    val contained = rows.count(_.getAs[Long]("contained") == 1)
    assert(contained * 10 >= rows.length * 8,
      s"only $contained/${rows.length} pairs flagged contained")
    rows.foreach { r =>
      assert(r.getAs[Long]("c_ba_pct") >= r.getAs[Long]("c_ab_pct"),
        s"the shrunken doc must be the more-contained side: $r")
    }
  }

  test("quality_ensemble matrix partitions the corpus") {
    val rows = TextQueries.queries("quality_ensemble").fn(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 500)
    rows.foreach { r =>
      val (g, c, l) = (r.getAs[Long]("gopher_keep"),
        r.getAs[Long]("clf_keep"), r.getAs[Long]("lm_keep"))
      assert(Set(0L, 1L)(g) && Set(0L, 1L)(c) && Set(-1L, 0L, 1L)(l))
      assert(r.getAs[Long]("keep_all") ==
        (if (g == 1 && c == 1 && l == 1) 1L else 0L))
    }
  }

  test("mm_video_keyframes elects one frame per scene") {
    val keys = MultimodalOps.queries("mm_video_keyframes").fn(spark, sfDir)
      .collect()
    val cuts = MultimodalOps.queries("mm_scene_cut").fn(spark, sfDir)
      .count()
    val videos = keys.map(_.getAs[Long]("video_id")).distinct.length
    assert(keys.length == cuts + videos,
      s"scenes (${keys.length}) must equal cuts ($cuts) + videos ($videos)")
  }

  test("mm_audio_vad segments are well-formed islands") {
    val segs = MultimodalOps.queries("mm_audio_vad").fn(spark, sfDir)
      .collect()
    assert(segs.nonEmpty)
    segs.foreach { r =>
      val (s, e, n) = (r.getAs[Long]("start_f"), r.getAs[Long]("end_f"),
        r.getAs[Long]("n_frames"))
      assert(n == e - s + 1 && n >= 2, s"malformed island $r")
      assert(r.getAs[Long]("seg_energy") >= n * 4500000000L,
        "every member frame cleared the activity threshold")
    }
  }

  test("a1b_unique_hll estimates within the HLL error envelope") {
    val r = VolumeQueries.queries("a1b_unique_hll").fn(spark, sfDir)
      .collect().head
    val (raw, exact, zeros) = (r.getAs[Long]("raw_est"),
      r.getAs[Long]("exact_distinct"), r.getAs[Long]("zeros"))
    // the entry emits the exact-integer sketch outputs; the estimator
    // branch (raw vs linear counting below 2.5m) is replayed here so
    // the float ln stays OUT of the oracle-gated columns
    val est =
      if (r.getAs[String]("branch") == "linear_counting")
        math.floor(256.0 * math.log(256.0 / zeros)).toLong
      else raw
    // 1.04/sqrt(256) = 6.5% std error; allow 4 sigma
    assert(math.abs(est - exact).toDouble / exact < 0.26,
      s"HLL estimate $est (branch ${r.getAs[String]("branch")}) " +
        s"too far from exact $exact")
  }

  test("emb_matryoshka_topk agrees with bruteforce at full dim") {
    val full = SimilarityQueries.queries("sim_topk_bruteforce")
      .fn(spark, sfDir).filter(col("rank") === 1)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("cid"))
      .toMap
    val mrl = SimilarityQueries.queries("emb_matryoshka_topk")
      .fn(spark, sfDir).collect()
    assert(mrl.length == 10)
    mrl.foreach { r =>
      assert(r.getAs[Long]("top_cid_64") == full(r.getAs[Long]("qid")),
        "64-dim rank-1 must equal the bruteforce rank-1")
      val ov = r.getAs[Long]("n_overlap")
      assert(ov >= 0 && ov <= 5)
    }
    // this corpus is near-random, so a 16-dim prefix retains little of
    // the full-dim neighborhood (unlike MRL-trained embeddings) — the
    // entry MEASURES that; just require the measurement is non-degenerate
    val mean = mrl.map(_.getAs[Long]("n_overlap")).sum / 10.0
    assert(mean >= 0.2 && mean < 5.0,
      s"overlap measurement degenerate: mean=$mean")
  }

  test("docs_export_jsonl round-trips real shard files") {
    val r = TextQueries.queries("docs_export_jsonl").fn(spark, sfDir)
      .collect()
    assert(r.length == 8 && r.map(_.getAs[Long]("n_docs")).sum == 500)
    // the export writes a per-invocation dir (task-commit protocol);
    // locate this session's newest export root
    val root = new java.io.File("/tmp/graft_fixture").listFiles()
      .filter(_.getName.startsWith("jsonl_export_"))
      .maxBy(_.lastModified())
    val f = root.listFiles().filter(_.getName.endsWith(".jsonl"))
    assert(f.length == 8, "8 shard files on disk")
    val line = scala.io.Source.fromFile(f.head).getLines().next()
    assert(line.matches("""\{"id":\d+,"text":".*"\}"""),
      s"line not JSONL-shaped: $line")
  }

  test("quality_ccnet_bucket tiers are ordered terciles") {
    val r = TextQueries.queries("quality_ccnet_bucket").fn(spark, sfDir)
      .collect()
    val by = r.groupBy(_.getAs[String]("bucket"))
      .view.mapValues(_.map(_.getAs[Long]("lm_avg_ppm"))).toMap
    assert(Set("head", "middle", "tail").subsetOf(by.keySet))
    assert(by("head").min >= by("middle").max ||
      by("head").min >= by("middle").min, "head above middle")
    assert(by("middle").min >= by("tail").max ||
      by("middle").min >= by("tail").min, "middle above tail")
    // terciles: no bucket should hold less than ~20% or more than ~50%
    val n = r.length.toDouble
    by.values.foreach(v =>
      assert(v.length > n * 0.2 && v.length < n * 0.5, s"skewed tiers: ${
        by.view.mapValues(_.length).toMap}"))
  }

  test("sample_dsir keeps target-leaning docs preferentially") {
    val scores = TextQueries.queries("dsir_importance").fn(spark, sfDir)
      .select("doc_id", "score_avg_ppm").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kept = TextQueries.queries("sample_dsir").fn(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty && kept.size < scores.size)
    val keptMean = kept.toSeq.map(scores).sum.toDouble / kept.size
    val allMean = scores.values.sum.toDouble / scores.size
    assert(keptMean > allMean,
      f"resample must shift toward the target: kept=$keptMean%.0f all=$allMean%.0f")
  }

  test("o2b count-min sketch never underestimates and finds the true top") {
    val r = VolumeQueries.queries("o2b_top_labels_cms").fn(spark, sfDir)
      .collect()
    assert(r.length == 10)
    r.foreach { row =>
      assert(row.getAs[Long]("est_n") >= row.getAs[Long]("exact_n"),
        s"CMS must overestimate, got $row")
    }
    // CMS guarantee: est - exact <= e*N/width with prob 1-e^-depth;
    // check the deterministic fixture honors a loose 3N/256 bound
    // (the corpus here is near-uniform, so top-k ranking quality is
    // limited by design — the bound is the sketch's actual contract)
    val n = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    r.foreach { row =>
      val err = row.getAs[Long]("est_n") - row.getAs[Long]("exact_n")
      assert(err <= 3 * n / 256,
        s"CMS error $err exceeds 3N/256=${3 * n / 256}: $row")
    }
  }

  test("a4c_label_adjacency emits canonical distinct-label pairs") {
    val r = VolumeQueries.queries("a4c_label_adjacency").fn(spark, sfDir)
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (la, lb) = (row.getAs[Long]("la"), row.getAs[Long]("lb"))
      assert(la < lb, s"pair must be canonical: $row")
      assert(row.getAs[Long]("contacts") >= 1)
    }
  }

  test("mm_hist_equalize output stays in the 8-bit range") {
    val r = MultimodalOps.queries("mm_hist_equalize").fn(spark, sfDir)
      .collect()
    assert(r.length == 500)
    r.foreach { row =>
      val (n, eq) = (row.getAs[Long]("n_px"), row.getAs[Long]("eq_sum"))
      assert(eq >= 0 && eq <= n * 255, s"equalized sum out of range: $row")
      assert(row.getAs[Long]("cdf_min") >= 1 &&
        row.getAs[Long]("cdf_min") <= n)
    }
    // equalization must actually move the distribution for most images
    // (identity would keep the raw pixel sum; just check non-triviality)
    assert(r.map(_.getAs[Long]("eq_sum")).distinct.length > 100)
  }

  test("mm_scene_cut rows genuinely exceed the 20-level delta") {
    val cuts = MultimodalOps.queries("mm_scene_cut").fn(spark, sfDir)
      .collect()
    assert(cuts.nonEmpty)
    cuts.foreach { r =>
      val d = math.abs(
        r.getAs[Long]("lum_sum") * r.getAs[Long]("prev_n") -
          r.getAs[Long]("prev_sum") * r.getAs[Long]("n_px"))
      assert(d >= 20L * r.getAs[Long]("n_px") * r.getAs[Long]("prev_n"))
      assert(r.getAs[Long]("frame_idx") > 0, "first frame can't be a cut")
    }
  }

  test("dedup_minhash_verify: jaccard exact, planted near-dups confirmed") {
    val r = TextQueries.queries("dedup_minhash_verify").fn(spark, sfDir)
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (i, u, j) = (row.getAs[Long]("inter_n"),
        row.getAs[Long]("union_n"), row.getAs[Long]("jaccard_ppm"))
      assert(i >= 0 && i <= u && j >= 0 && j <= 1000000,
        s"jaccard out of range: $row")
      assert(row.getAs[Long]("is_dup") == (if (j >= 500000) 1L else 0L))
    }
    // planted pairs (d, d+10000) share all shingles except those
    // touching the dropped first word -> high exact jaccard
    val planted = r.filter(row => row.getAs[Long]("b") ==
      row.getAs[Long]("a") + 10000)
    assert(planted.nonEmpty, "LSH must recover some planted near-dups")
    assert(planted.forall(_.getAs[Long]("is_dup") == 1L),
      "planted near-dups must verify above the 0.5 jaccard threshold")
  }

  test("rag_bm25_topk: 3 queries, monotone scores, source doc retrieved") {
    val r = TextQueries.queries("rag_bm25_topk").fn(spark, sfDir)
      .collect()
    val byQ = r.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == Set(7L, 42L, 128L))
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to sorted.length).toSeq)
      val scores = sorted.map(_.getAs[Long]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"scores must be non-increasing by rank for query $q")
    }
    // lexical guarantee: every retrieved doc contains >= 1 query term
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(row => row.getAs[Long]("doc_id") -> row.getAs[String]("text"))
      .toMap
    r.foreach { row =>
      val qTerms = texts(row.getAs[Long]("query_id"))
        .split(" ").take(4).toSet
      val hitTerms = texts(row.getAs[Long]("doc_id")).split(" ").toSet
      assert(qTerms.intersect(hitTerms).nonEmpty,
        s"retrieved doc must share a term with its query: $row")
    }
  }

  test("w10_markov_transitions: rows are a stochastic matrix in ppm") {
    val r = MetaQueries.queries("w10_markov_transitions").fn(spark, sfDir)
      .collect()
    assert(r.nonEmpty)
    val byPrev = r.groupBy(_.getAs[String]("prev_type"))
    byPrev.foreach { case (p, rows) =>
      val sum = rows.map(_.getAs[Long]("p_ppm")).sum
      // floor division loses < 1 ppm per row
      assert(sum <= 1000000 && sum > 1000000 - rows.length,
        s"row $p of the transition matrix must sum to ~1e6 ppm: $sum")
    }
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val nEvents = events.count()
    val nUsers = events.select("user_id").distinct().count()
    assert(r.map(_.getAs[Long]("n")).sum == nEvents - nUsers,
      "every event except each user's first is a transition")
  }

  test("mm_image_tiles: full 4x4 patch grid with formula-exact stats") {
    val r = MultimodalOps.queries("mm_image_tiles").fn(spark, sfDir)
      .collect()
    val byDoc = r.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (id, rows) =>
      val (w, h) = (8 + id % 25, 6 + id % 17)
      assert(rows.length == (w / 4) * (h / 4),
        s"doc $id must yield a full (w/4)x(h/4) patch grid")
      rows.foreach { t =>
        assert(t.getAs[Long]("tile_min") <= t.getAs[Long]("tile_max"))
        assert(t.getAs[Long]("tile_sum") >= 16 * t.getAs[Long]("tile_min")
          && t.getAs[Long]("tile_sum") <= 16 * t.getAs[Long]("tile_max"))
      }
    }
    // formula replay for one patch: pixel = (id*31 + 7x + 13y) % 256
    val one = r.find(t => t.getAs[Long]("doc_id") == 5L &&
      t.getAs[Long]("tile_x") == 1L && t.getAs[Long]("tile_y") == 0L).get
    val expect = (for { y <- 0 until 4; x <- 4 until 8 }
      yield (5L * 31 + 7L * x + 13L * y) % 256).sum
    assert(one.getAs[Long]("tile_sum") == expect)
  }

  test("a4d_label_surface bounds: faces within [1, 6*volume]") {
    val r = VolumeQueries.queries("a4d_label_surface").fn(spark, sfDir)
      .collect()
    assert(r.length == 20)
    val vol = graft.ops.Derived.voxels(spark, sfDir)
      .groupBy("x", "y", "z").agg(min("label").as("label"))
      .groupBy("label").count().collect()
      .map(row => row.getAs[Long]("label") -> row.getAs[Long]("count"))
      .toMap
    r.foreach { row =>
      val (l, f) = (row.getAs[Long]("label"),
        row.getAs[Long]("surface_faces"))
      assert(f >= 1 && f <= 6 * vol(l),
        s"label $l surface $f out of bounds for volume ${vol(l)}")
    }
    val faces = r.map(_.getAs[Long]("surface_faces"))
    assert(faces.zip(faces.tail).forall { case (a, b) => a >= b },
      "top-20 must be ordered by surface desc")
  }

  test("p8o_annotation_knn equals brute force within the cell bound") {
    val r = graft.ops.AnnotationQueries.queries("p8o_annotation_knn")
      .fn(spark, sfDir).collect()
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_id") % 5 === 0)
      .select(col("event_id"), col("user_id")).collect()
      .map(row => (row.getAs[Long]("event_id"),
        row.getAs[Long]("event_id") % 64,
        row.getAs[Long]("user_id") % 64,
        (row.getAs[Long]("event_id") / 64) % 32))
    val queries = Seq((1L, 10L, 10L, 10L), (2L, 32L, 16L, 8L),
      (3L, 55L, 60L, 30L), (4L, 5L, 50L, 20L))
    queries.foreach { case (qid, qx, qy, qz) =>
      val brute = events.filter { case (_, ax, ay, az) =>
        math.abs(ax / 8 - qx / 8) <= 1 && math.abs(ay / 8 - qy / 8) <= 1 &&
          math.abs(az / 8 - qz / 8) <= 1
      }.map { case (aid, ax, ay, az) =>
        ((ax - qx) * (ax - qx) + (ay - qy) * (ay - qy) +
          (az - qz) * (az - qz), aid)
      }.sorted.take(3)
      val got = r.filter(_.getAs[Long]("qid") == qid)
        .sortBy(_.getAs[Long]("rank"))
        .map(row => (row.getAs[Long]("d2"), row.getAs[Long]("aid")))
      assert(got.toSeq == brute.toSeq,
        s"query $qid: grid kNN must equal brute force in-neighborhood")
    }
  }

  test("a3c_spatial_range_join equals the brute-force overlap join") {
    val r = graft.ops.SpatialIndexQueries.queries("a3c_spatial_range_join")
      .fn(spark, sfDir).collect()
      .map(row => row.getAs[Long]("aid") ->
        (row.getAs[Long]("n_overlaps"), row.getAs[Long]("vol_sum"))).toMap
    val boxes = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderkey") % 10 === 0)
      .select("o_orderkey", "o_custkey").collect().map { row =>
        val k = row.getAs[Long]("o_orderkey")
        val c = row.getAs[Long]("o_custkey")
        (k, k % 50 + 64, c % 50 + 64, k % 25 + 64,
          k % 50 + 64 + 1 + k % 8, c % 50 + 64 + 1 + (k * 3) % 8,
          k % 25 + 64 + 1 + k % 6)
      }
    val els = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_custkey") % 4 === 0)
      .select("c_custkey").collect().map { row =>
        val c = row.getAs[Long]("c_custkey")
        (c % 60 + 64 - (c % 5 + 1), (c * 3) % 60 + 64 - (c % 7 + 1),
          c % 30 + 64 - (c % 3 + 1), c % 60 + 64 + (c % 5 + 1) + 1,
          (c * 3) % 60 + 64 + (c % 7 + 1) + 1,
          c % 30 + 64 + (c % 3 + 1) + 1)
      }
    assert(r.size == boxes.length, "every box gets an output row")
    boxes.foreach { case (aid, x0, y0, z0, x1, y1, z1) =>
      val hits = els.filter { case (ex0, ey0, ez0, ex1, ey1, ez1) =>
        x0 < ex1 && ex0 < x1 && y0 < ey1 && ey0 < y1 &&
          z0 < ez1 && ez0 < z1
      }
      val vol = hits.map { case (ex0, ey0, ez0, ex1, ey1, ez1) =>
        (math.min(x1, ex1) - math.max(x0, ex0)) *
          (math.min(y1, ey1) - math.max(y0, ey0)) *
          (math.min(z1, ez1) - math.max(z0, ez0))
      }.sum
      assert(r(aid) == (hits.length.toLong, vol),
        s"box $aid: grid range join must equal brute force")
    }
  }

  test("a4e_label_moments sums satisfy the moment inequalities") {
    val r = VolumeQueries.queries("a4e_label_moments").fn(spark, sfDir)
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val n = row.getAs[Long]("n")
      val (sx, sxx) = (row.getAs[Long]("sx"), row.getAs[Long]("sxx"))
      val (sy, syy) = (row.getAs[Long]("sy"), row.getAs[Long]("syy"))
      val sxy = row.getAs[Long]("sxy")
      // per-axis variance is non-negative: n*Σx² >= (Σx)²
      assert(n * sxx >= sx * sx && n * syy >= sy * sy,
        s"moment inequality violated: $row")
      // covariance Cauchy-Schwarz: (nΣxy - ΣxΣy)² <= (nΣx²-Σx²)(nΣy²-Σy²)
      val cxy = n * sxy - sx * sy
      assert(cxy.toDouble * cxy <=
        (n * sxx - sx * sx).toDouble * (n * syy - sy * sy) + 1e-6,
        s"covariance bound violated: $row")
    }
  }

  test("mm_audio_zcr replays the synthesis formula exactly") {
    val r = MultimodalOps.queries("mm_audio_zcr").fn(spark, sfDir)
      .collect()
    assert(r.length == 500)
    r.take(25).foreach { row =>
      val id = row.getAs[Long]("doc_id")
      val n = (256 + id % 256).toInt
      val s = Array.tabulate(n)(i => ((id * 7 + i * 31) % 4096 - 2048) * 8)
      val zc = (1 until n).count(i => s(i - 1) * s(i) < 0).toLong
      assert(row.getAs[Long]("n_samples") == n.toLong)
      assert(row.getAs[Long]("zero_crossings") == zc,
        s"doc $id zcr mismatch")
      assert(row.getAs[Long]("peak") == s.map(math.abs).max)
    }
  }

  test("graph_kcore3 equals a local 3-round peel recount") {
    val r = GraphQueries.queries("graph_kcore3").fn(spark, sfDir)
      .collect().map(row => row.getAs[Long]("node") ->
        row.getAs[Long]("deg")).toMap
    // local recount from the same derived edge list
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_partkey", "l_suppkey").collect()
    def md5mod(u: Long, v: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$u:$v".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(6).map(b => f"$b%02x").mkString, 16) % 10
    }
    var es = li.map { row =>
      val a = row.getAs[Long]("l_partkey") % 200
      val b = (row.getAs[Long]("l_partkey") / 7 +
        row.getAs[Long]("l_suppkey")) % 200
      (math.min(a, b), math.max(a, b))
    }.filter { case (u, v) => u != v }.distinct
      .filter { case (u, v) => md5mod(u, v) == 0 }.toSet
    for (_ <- 1 to 3) {
      val deg = es.toSeq.flatMap { case (u, v) => Seq(u, v) }
        .groupBy(identity).map { case (k, vs) => k -> vs.size }
      val keep = deg.filter(_._2 >= 3).keySet
      es = es.filter { case (u, v) => keep(u) && keep(v) }
    }
    val local = es.toSeq.flatMap { case (u, v) => Seq(u, v) }
      .groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    assert(r == local, "3-round peel must match the local recount")
  }

  test("st11_stream_quantiles picks minimal buckets in order") {
    val r = graft.ops.StreamQueries.queries("st11_stream_quantiles")
      .fn(spark, sfDir).collect()
      .map(row => row.getAs[Long]("q") ->
        (row.getAs[Long]("bucket"), row.getAs[Long]("cum_n"),
          row.getAs[Long]("total_n"))).toMap
    assert(r.keySet == Set(50L, 90L, 99L))
    val total = r(50L)._3
    assert(r.values.forall(_._3 == total))
    // each pick reaches its share, and quantiles are monotone
    r.foreach { case (q, (_, cum, tot)) => assert(cum * 100 >= q * tot) }
    assert(r(50L)._1 <= r(90L)._1 && r(90L)._1 <= r(99L)._1)
    // minimality: the histogram bucket below the p50 pick is short of 50%
    val hist = spark.read.parquet(s"$sfDir/events.parquet")
      .select(expr("greatest(0L, least(cast(round(value * 100) as " +
        "bigint) div 32, 63L))").as("bucket"))
      .groupBy("bucket").count().collect()
      .map(row => row.getAs[Long]("bucket") -> row.getAs[Long]("count"))
      .toMap
    val below50 = hist.filter(_._1 < r(50L)._1).values.sum
    assert(below50 * 100 < 50 * total, "p50 pick must be minimal")
  }

  test("sample_weighted_topk favors heavy docs and keys are minimal") {
    val r = TextQueries.queries("sample_weighted_topk").fn(spark, sfDir)
      .collect()
    assert(r.length == 20)
    val keys = r.map(_.getAs[Long]("key"))
    assert(keys.zip(keys.tail).forall { case (a, b) => a <= b },
      "sample rows must arrive in ascending key order")
    val corpusAvg = spark.read.parquet(s"$sfDir/documents.parquet")
      .agg(avg("n_chars")).collect()(0).getDouble(0)
    val sampleAvg = r.map(_.getAs[Long]("n_chars")).sum.toDouble / 20
    assert(sampleAvg > corpusAvg,
      s"weighted sample must lean heavy: $sampleAvg vs corpus $corpusAvg")
  }

  test("report_dup_rate counts exactly the planted duplicates") {
    val r = TextQueries.queries("report_dup_rate").fn(spark, sfDir)
      .collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "source").collect()
      .map(row => (row.getAs[Long]("doc_id"), row.getAs[String]("text"),
        row.getAs[String]("source")))
    val corpus = docs ++ docs.filter(_._1 % 3 == 0)
      .map { case (id, t, s0) => (id + 10000, t, s0) }
    val byText = corpus.groupBy(_._2).view.mapValues(_.length).toMap
    val expected = corpus.groupBy(_._3).map { case (src, rows) =>
      src -> (rows.length.toLong,
        rows.count(row => byText(row._2) > 1).toLong)
    }
    r.foreach { row =>
      val src = row.getAs[String]("source")
      val (n, nd) = expected(src)
      assert(row.getAs[Long]("n_docs") == n &&
        row.getAs[Long]("n_dup") == nd,
        s"source $src: expected ($n, $nd), got $row")
      assert(row.getAs[Long]("dup_ppm") == nd * 1000000 / n)
    }
    assert(r.length == expected.size)
  }

  test("a1d_kmv_intersection estimates land in the KMV error envelope") {
    val r = VolumeQueries.queries("a1d_kmv_intersection").fn(spark, sfDir)
      .collect()(0)
    val v = graft.ops.Derived.voxels(spark, sfDir)
    val a = v.filter(col("z") < 16).select("label").distinct()
      .collect().map(_.getLong(0)).toSet
    val b = v.filter(col("z") >= 16).select("label").distinct()
      .collect().map(_.getLong(0)).toSet
    val inter = (a & b).size
    // k=64 -> relative sigma ~ 1/sqrt(k-2) ~ 13%; allow 4 sigma
    def within(est: Long, truth: Int, tol: Double) =
      math.abs(est - truth) <= tol * truth
    assert(within(r.getAs[Long]("est_a"), a.size, 0.5),
      s"est_a ${r.getAs[Long]("est_a")} vs ${a.size}")
    assert(within(r.getAs[Long]("est_b"), b.size, 0.5),
      s"est_b ${r.getAs[Long]("est_b")} vs ${b.size}")
    assert(within(r.getAs[Long]("est_inter"), inter, 0.6),
      s"est_inter ${r.getAs[Long]("est_inter")} vs $inter")
    assert(r.getAs[Long]("n_inter_samples") <= 64)
  }

  test("report_lsh_recall is consistent with the candidate pair graph") {
    val r = TextQueries.queries("report_lsh_recall").fn(spark, sfDir)
      .collect()(0)
    val (nT, nR, recall) = (r.getAs[Long]("n_truth"),
      r.getAs[Long]("n_recovered"), r.getAs[Long]("recall_ppm"))
    assert(nT > 0 && nR <= nT && recall == nR * 1000000 / nT)
    assert(nR > 0, "LSH must recover at least one planted near-dup")
    // cross-check against the candidate graph itself
    val planted = TextQueries.queries("dedup_minhash_lsh").fn(spark, sfDir)
      .filter(col("b") === col("a") + 10000 && col("a") % 2 === 0)
      .count()
    assert(nR <= planted,
      "recovered planted pairs must be a subset of candidate planted pairs")
  }

  test("w12_props_json_agg recovers the typed field from JSON strings") {
    val r = MetaQueries.queries("w12_props_json_agg").fn(spark, sfDir)
      .collect()
    val e = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(r.map(_.getAs[Long]("n")).sum == e,
      "every event row must be aggregated exactly once")
    r.foreach { row =>
      val (n, s0, mn, mx) = (row.getAs[Long]("n"),
        row.getAs[Long]("k_sum"), row.getAs[Long]("k_min"),
        row.getAs[Long]("k_max"))
      assert(mn <= mx && s0 >= n * mn && s0 <= n * mx,
        s"json field stats inconsistent: $row")
    }
  }

  test("graph_link_pred scores non-edges only, jaccard within bounds") {
    val r = GraphQueries.queries("graph_link_pred").fn(spark, sfDir)
      .collect()
    assert(r.length == 20)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_partkey", "l_suppkey").collect()
    def md5mod(u: Long, v: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$u:$v".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(6).map(b => f"$b%02x").mkString, 16) % 10
    }
    val es = li.map { row =>
      val a = row.getAs[Long]("l_partkey") % 200
      val b = (row.getAs[Long]("l_partkey") / 7 +
        row.getAs[Long]("l_suppkey")) % 200
      (math.min(a, b), math.max(a, b))
    }.filter { case (u, v) => u != v }.distinct
      .filter { case (u, v) => md5mod(u, v) == 0 }.toSet
    val nbrs = es.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    r.foreach { row =>
      val (a, c) = (row.getAs[Long]("a"), row.getAs[Long]("c"))
      assert(!es((a, c)), s"($a,$c) is an existing edge")
      val common = (nbrs(a) & nbrs(c)).size.toLong
      assert(row.getAs[Long]("common") == common,
        s"common-neighbor recount mismatch for ($a,$c)")
      val j = row.getAs[Long]("jacc_ppm")
      assert(j > 0 && j <= 1000000)
    }
  }

  test("dedup_keep_best elects the untrimmed original per cluster") {
    val keeps = TextQueries.queries("dedup_keep_best").fn(spark, sfDir)
      .collect()
    assert(keeps.map(_.getAs[Long]("cluster")).distinct.length ==
      keeps.length, "one keeper per cluster")
    // wherever a planted pair (d, d+10000) landed in a cluster, the
    // keeper cannot be a trimmed +10000 copy whose original is present
    val kept = keeps.map(_.getAs[Long]("keep_id")).toSet
    // the trimmed copy is strictly shorter, so if any +10000 doc was
    // elected, its original must NOT be in the same cluster
    val clusterOf = TextQueries.queries("dedup_cluster").fn(spark, sfDir)
      .collect().map(row => row.getAs[Long]("doc_id") ->
        row.getAs[Long]("cluster")).toMap
    kept.filter(_ >= 10000).foreach { k =>
      val orig = k - 10000
      assert(!clusterOf.contains(orig) ||
        clusterOf(orig) != clusterOf(k),
        s"trimmed copy $k elected over its present original")
    }
  }

  test("text_cooccurrence_pmi top pairs recount locally") {
    val r = TextQueries.queries("text_cooccurrence_pmi").fn(spark, sfDir)
      .collect()
    assert(r.length == 20)
    assert(r.forall(_.getAs[Long]("n_ab") >= 5))
    val pmis = r.map(_.getAs[Long]("pmi_micro"))
    assert(pmis.zip(pmis.tail).forall { case (x, y) => x >= y })
    // local recount of the pair count for the top entry
    val top = r(0)
    val (wa, wb) = (top.getAs[String]("wa"), top.getAs[String]("wb"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val ord = math.Ordering.String
    val n = docs.map { t =>
      val w = t.split(" ")
      (0 until w.length).map { i =>
        (1 to 2).count { d =>
          i + d < w.length &&
            ord.min(w(i), w(i + d)) == wa &&
            ord.max(w(i), w(i + d)) == wb
        }
      }.sum
    }.sum
    assert(top.getAs[Long]("n_ab") == n.toLong,
      s"local recount of ($wa,$wb) must match: got $n")
  }

  test("q18_large_orders rows all exceed the HAVING threshold") {
    val r = VolumeQueries.queries("q18_large_orders").fn(spark, sfDir)
      .collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Long]("total_qty_c") > 15000L))
    val expected = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_orderkey")
      .agg(sum(round(col("l_quantity") * 100).cast("long")).as("t"))
      .filter(col("t") > 15000L).count()
    assert(r.length.toLong == expected,
      "every heavy order must appear exactly once")
  }

  test("st12 sliding windows cover each event exactly twice") {
    val r = graft.ops.StreamQueries.queries("st12_stream_sliding_window")
      .fn(spark, sfDir).collect()
    val nEvents = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(r.map(_.getAs[Long]("n")).sum == 2 * nEvents,
      "1-hour windows on a 30-minute slide hold every event twice")
    // window starts align to the 30-minute slide grid
    assert(r.forall(_.getAs[Long]("wstart_us") % 1800000000L == 0))
  }

  test("graph_copurchase top pair recounts exactly") {
    val r = GraphQueries.queries("graph_copurchase").fn(spark, sfDir)
      .collect()
    assert(r.length == 20)
    r.foreach(row => assert(row.getAs[Long]("pa") <
      row.getAs[Long]("pb")))
    val ns = r.map(_.getAs[Long]("n_orders"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    val top = r(0)
    val recount = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .filter(col("p").isin(top.getAs[Long]("pa"),
        top.getAs[Long]("pb")))
      .distinct()
      .groupBy("ok").count().filter(col("count") === 2).count()
    assert(top.getAs[Long]("n_orders") == recount,
      "top co-purchase pair must recount")
  }

  test("report_langid_confusion covers the corpus and rows sum to 1e6") {
    val r = TextQueries.queries("report_langid_confusion").fn(spark, sfDir)
      .collect()
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(r.map(_.getAs[Long]("n")).sum == nDocs,
      "confusion matrix must cover every document exactly once")
    r.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val share = rows.map(_.getAs[Long]("share_ppm")).sum
      assert(share <= 1000000 && share > 1000000 - rows.length,
        s"true-lang row $lang must sum to ~1e6 ppm: $share")
    }
  }

  test("rag_hybrid_rrf fuses both lists and rrf decomposes into ranks") {
    val r = SimilarityQueries.queries("rag_hybrid_rrf").fn(spark, sfDir)
      .collect()
    val qids = r.map(_.getAs[Long]("qid")).distinct.sorted
    assert(qids.sameElements(Array(7L, 42L, 128L).sorted))
    r.foreach { row =>
      val rd = row.getAs[Long]("rank_dense")
      val rb = row.getAs[Long]("rank_bm25")
      assert(rd >= 0 && rd <= 20 && rb >= 0 && rb <= 20)
      assert(rd > 0 || rb > 0, "fused rows must come from some list")
      val expect = (if (rd > 0) 1000000L / (60 + rd) else 0L) +
        (if (rb > 0) 1000000L / (60 + rb) else 0L)
      assert(row.getAs[Long]("rrf_ppm") == expect,
        s"rrf must decompose: $row")
    }
    // per-query output is a ranked top-10 (fewer only if lists are thin)
    r.groupBy(_.getAs[Long]("qid")).foreach { case (q, rows) =>
      val ranks = rows.map(_.getAs[Long]("rank")).sorted
      assert(ranks.sameElements(1L to ranks.length),
        s"qid $q ranks must be 1..k")
      assert(ranks.length <= 10)
    }
    // fusion must draw from BOTH retrievers (the synthetic embeddings
    // are not text-correlated, so list overlap isn't guaranteed — but
    // each list's own top entries must survive into the fused top-10:
    // rank 1 of either list scores 16393 ppm, above rank >= 2 of the
    // other, so both sources are always represented)
    assert(r.exists(_.getAs[Long]("rank_dense") > 0),
      "dense list must contribute fused rows")
    assert(r.exists(_.getAs[Long]("rank_bm25") > 0),
      "bm25 list must contribute fused rows")
  }

  test("graph_lpa labels are mode-stable and sizes recount") {
    val r = GraphQueries.queries("graph_lpa").fn(spark, sfDir).collect()
    val labels = r.map(x => x.getAs[Long]("node") ->
      x.getAs[Long]("label")).toMap
    // every label is a node id (labels only propagate, never invent)
    r.foreach(x => assert(labels.contains(x.getAs[Long]("label"))))
    // csize recounts the label multiset
    val sizes = r.groupBy(_.getAs[Long]("label")).map { case (l, xs) =>
      l -> xs.length.toLong }
    r.foreach(x => assert(x.getAs[Long]("csize") ==
      sizes(x.getAs[Long]("label"))))
    // round-3 labels replay the synchronous mode election locally
    val e = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_partkey % 200 as a",
        "(l_partkey div 7 + l_suppkey) % 200 as b")
      .filter(col("a") =!= col("b"))
      .selectExpr("least(a, b) as u", "greatest(a, b) as v").distinct()
      .filter(conv(substring(md5(concat(col("u").cast("string"),
        lit(":"), col("v").cast("string")).cast("binary")), 1, 12),
        16, 10).cast("long") % 10 === 0)
      .collect().map(x => (x.getAs[Long]("u"), x.getAs[Long]("v")))
    val nbr = (e ++ e.map(_.swap)).groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._2) }
    var lab = nbr.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lab = nbr.map { case (n, ns) =>
        val cnt = ns.groupBy(lab).map { case (l, xs) =>
          l -> xs.size }
        val best = cnt.maxBy { case (l, c) => (c, -l) }
        n -> best._1
      }
    }
    assert(labels == lab, "distributed LPA must equal the local replay")
  }

  test("pack_bins_greedy equals a local greedy replay and respects capacity") {
    val r = TextQueries.queries("pack_bins_greedy").fn(spark, sfDir).collect()
      .map(row => (row.getAs[String]("lang"), row.getAs[Long]("shard"),
        row.getAs[Long]("doc_id"), row.getAs[Long]("n_tokens"),
        row.getAs[Long]("bin_seq"), row.getAs[Long]("bin_fill")))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("lang", "cast(doc_id as long) as doc_id",
        "cast(size(split(text, ' ')) as long) as n")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    // local replay of the greedy fold
    val expected = docs.groupBy(d => (d._1, d._2 / 500)).toSeq.flatMap {
      case ((lang, shard), ds) =>
        var bs = 0L; var fill = 0L
        ds.sortBy(_._2).toSeq.map { case (_, id, n) =>
          if (fill > 0 && fill + n > 256) { bs += 1; fill = 0 }
          fill += n
          (lang, shard, id, n, bs, fill)
        }
    }.toSet
    assert(r.toSet == expected, "distributed packing must equal the local fold")
    assert(r.length == docs.length, "every document packs exactly once")
    // capacity law: a bin exceeds 256 only when it holds a single
    // oversize document (bin_fill > 256 implies fill == that doc's n)
    r.filter(_._6 > 256).foreach { case (_, _, id, n, _, fill) =>
      assert(fill == n, s"oversize bin not singleton at doc $id")
    }
  }

  test("w13_anomaly_mad medians replay against a local sort") {
    val r = MetaQueries.queries("w13_anomaly_mad").fn(spark, sfDir)
      .collect()
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_type", "cast(round(value) as long) as vc")
      .collect().map(x => (x.getAs[String]("event_type"),
        x.getAs[Long]("vc")))
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s(((s.length + 1) / 2) - 1)
    }
    val byType = ev.groupBy(_._1).map { case (t, xs) =>
      t -> xs.map(_._2).toSeq }
    r.foreach { row =>
      val t = row.getAs[String]("event_type")
      val vs = byType(t)
      val med = lowerMedian(vs)
      val mad = lowerMedian(vs.map(v => math.abs(v - med)))
      assert(row.getAs[Long]("n") == vs.length)
      assert(row.getAs[Long]("med") == med, s"median for $t")
      assert(row.getAs[Long]("mad") == mad, s"mad for $t")
      assert(row.getAs[Long]("n_outliers") ==
        vs.count(v => math.abs(v - med) > 5 * mad), s"outliers for $t")
    }
    assert(r.length == byType.size)
  }

  test("BPE double-space layout merges back-to-back pairs simultaneously") {
    // The reason for the layout: with single-space separators the
    // replace scan consumes the shared delimiter and misses every
    // second back-to-back occurrence. ` a  b ` -> ` ab ` must hit both.
    val got = spark.sql(
      "SELECT replace('  x  a  b  a  b  y  ', ' a  b ', ' ab ') AS s")
      .head().getString(0)
    assert(got == "  x  ab  ab  y  ", s"simultaneous merge broken: '$got'")
    // and the greedy-leftmost law on a self-overlapping run: a a a -> (aa) a
    val tri = spark.sql(
      "SELECT replace('  a  a  a  ', ' a  a ', ' aa ') AS s")
      .head().getString(0)
    assert(tri == "  aa  a  ", s"leftmost-greedy broken: '$tri'")
  }

  test("bpe_train_merges: best-pair count is non-increasing; merged " +
    "symbols surface in bpe_encode_vocab") {
    val merges = TextQueries.queries("bpe_train_merges").fn(spark, sfDir)
      .orderBy("rank").collect()
    assert(merges.length == 4)
    val counts = merges.map(_.getAs[Long]("pair_n"))
    // merging can only create pairs bounded by the merged pair's count,
    // so the elected maximum never increases round over round
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"argmax counts must be non-increasing: ${counts.mkString(",")}")
    val mergedSyms = merges.map(_.getAs[String]("pair").replace(" ", ""))
    val vocab = TextQueries.queries("bpe_encode_vocab").fn(spark, sfDir)
      .collect().map(_.getAs[String]("token")).toSet
    // every learned merge that survives later merges should be a real
    // token; at minimum the LAST merge's symbol is intact
    assert(vocab.contains(mergedSyms.last),
      s"last merged symbol ${mergedSyms.last} missing from vocab $vocab")
    mergedSyms.foreach(m => assert(m.length >= 2))
  }

  test("w14_asof_join replays against a local point-in-time scan") {
    val r = MetaQueries.queries("w14_asof_join").fn(spark, sfDir).collect()
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val e = ev.select(col("event_id"), col("user_id"), col("event_type"),
        graft.ops.Derived.tsMicros(ev.schema).as("tus")).collect()
      .map(x => (x.getAs[Long]("event_id"), x.getAs[Long]("user_id"),
        x.getAs[String]("event_type"), x.getAs[Long]("tus")))
    val signups = e.filter(_._3 == "signup")
    val purchases = e.filter(_._3 == "purchase")
    assert(r.length == purchases.length, "one row per purchase")
    val byId = r.map(row => row.getAs[Long]("purchase_id") -> row).toMap
    purchases.foreach { case (pid, uid, _, tus) =>
      val row = byId(pid)
      val prior = signups.filter(s => s._2 == uid && s._4 <= tus)
      if (prior.isEmpty) {
        assert(row.getAs[Long]("state_tus") == -1L, s"purchase $pid")
        assert(row.getAs[Long]("state_id") == -1L, s"purchase $pid")
      } else {
        val bestTs = prior.map(_._4).max
        val bestId = prior.filter(_._4 == bestTs).map(_._1).max
        assert(row.getAs[Long]("state_tus") == bestTs,
          s"purchase $pid: latest prior signup ts")
        assert(row.getAs[Long]("state_id") == bestId,
          s"purchase $pid: max event_id on ties")
      }
    }
  }

  test("text_boilerplate keeps exactly the >=6-word lines and " +
    "reassembles byte counts") {
    val r = TextQueries.queries("text_boilerplate").fn(spark, sfDir)
      .collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("text")).toMap
    assert(r.length == docs.size)
    r.foreach { row =>
      val id = row.getAs[Long]("doc_id")
      val tail = if (id % 5 == 0) "disclaimer this page is provided as is"
        else "copyright footer terms"
      val lines = Seq("nav home about contact", docs(id),
        "related articles sidebar", tail)
      val kept = lines.filter(_.split(" ").length >= 6)
      assert(row.getAs[Long]("n_lines") == 4)
      assert(row.getAs[Long]("n_kept") == kept.length, s"doc $id")
      assert(row.getAs[Long]("clean_chars") ==
        kept.mkString("\n").length, s"doc $id clean_chars")
    }
  }

  test("pipeline_corpus_to_pack: stage laws the oracle hash can't localize") {
    val out = TextQueries.queries("pipeline_corpus_to_pack")
      .fn(spark, sfDir).collect()
    assert(out.nonEmpty)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = r.getAs[Long]("n_tokens")
      val fill = r.getAs[Long]("bin_fill")
      // capacity law: a bin's fill never exceeds 256 unless a single
      // oversized doc IS the bin (the greedy packer never splits)
      assert(fill <= 256 || fill == n, s"doc $id fill $fill n $n")
      // gate law: survivors carry >= 50 tokens (the gopher word floor)
      assert(n >= 50, s"doc $id tokens $n below the gate")
      // decontamination law: no eval-deck doc (base id % 97 == 0)
      assert(id % 10000 % 97 != 0, s"eval doc $id leaked through")
      // exact-dedup law: no +20000 byte-identical dupe survives (its
      // original is gated identically and always wins the min-id keep)
      assert(id < 20000 || !docs.contains(id - 20000),
        s"exact dupe $id survived next to its original")
    }
    // every (lang, shard) group's bin sequence starts at 0 and is
    // contiguous — the fold never skips a bin
    out.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("shard")))
      .foreach { case (key, rows) =>
        val bins = rows.map(_.getAs[Long]("bin_seq")).distinct.sorted.toSeq
        assert(bins == (0L until bins.length: Seq[Long]),
          s"$key bins $bins")
      }
  }
}
