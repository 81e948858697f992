package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.build.IndexBuilder
import graft.corpus.TranscriptGen
import graft.model.Turn
import graft.store.ParquetTableIO

/** Benchmark main. Emits ONE JSON line:
  *   {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  *
  * Part 1 — scaling evidence (BASELINE.md): the identical index build over
  * the identical pre-written transcript table at N and 4N local cores;
  * efficiency = (throughput@4N / throughput@N) / 4. The N=2 vs 4N=8 pair is
  * the headline: this sandbox is a microVM that throttles >8-16 active
  * threads with hypervisor steal + 80% kernel time on the I/O path (vmstat
  * evidence in BASELINE.md), so local[32] measures the VM, not the engine;
  * the local[32] run is still reported. The input is read from parquet
  * (64-way split), matching the real ingest path — generation is untimed.
  *
  * Part 2 — per-query wall times of every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, forced through a noop sink (count() would let
  * Catalyst prune the computation being measured).
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", math.max(cores, 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Recursively delete a directory tree (best-effort; used for the per-rep
    * temp warehouses — leaking them once filled the disk and killed a run).
    */
  private def deleteRecursively(path: String): Unit = {
    import java.nio.file.{Files, Paths, Path}
    import java.util.Comparator
    val root = Paths.get(path)
    if (Files.exists(root)) {
      val stream = Files.walk(root)
      try stream.sorted(Comparator.reverseOrder[Path]()).forEach { p =>
        try Files.deleteIfExists(p) catch { case _: java.io.IOException => () }
      } finally stream.close()
    }
  }

  /** Fail fast if the disk can't hold a run: a rep's warehouse is ~1 GB at
    * the default 250k convs and a mid-parquet-write ENOSPC leaves a corrupt
    * artifact (rc 1, unparseable). Better a one-line abort up front.
    */
  private def requireFreeDisk(minGiB: Long): Unit = {
    val freeGiB = new java.io.File("/tmp").getUsableSpace / (1024L * 1024 * 1024)
    if (freeGiB < minGiB) {
      System.err.println(
        s"[bench] ABORT: only $freeGiB GiB free on /tmp (need >= $minGiB). " +
          "Clean stale /tmp/bench_wh_* or /tmp/graft_bench_turns_* and retry.")
      sys.exit(2)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val convs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "250000").toLong
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    requireFreeDisk(10)
    // a crashed earlier run may have left warehouses behind — reclaim ONLY
    // stale ones (age-gated so a concurrently running bench's live warehouse
    // is never deleted), and null-guard the listing (listFiles returns null
    // on an I/O error)
    val staleCutoffMs = System.currentTimeMillis() - 2L * 3600 * 1000
    def tmpFiles: Seq[java.io.File] =
      Option(new java.io.File("/tmp").listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
    tmpFiles.foreach { f =>
      if (f.getName.startsWith("bench_wh_") && f.lastModified < staleCutoffMs)
        deleteRecursively(f.getPath)
    }

    // ---- untimed: materialize the transcript source table --------------
    val src = s"/tmp/graft_bench_turns_gen${TranscriptGen.Version}_$convs"
    // stale corpora from older generator versions / other sizes are dead
    // weight (the cache key embeds both) — reclaim them before generating
    // (same age gate: a concurrent bench at another size keeps its corpus)
    tmpFiles.foreach { f =>
      if (f.getName.startsWith("graft_bench_turns_") && f.getPath != src &&
        f.lastModified < staleCutoffMs)
        deleteRecursively(f.getPath)
    }
    locally {
      val spark = session(cpus)
      if (!new java.io.File(src + "/_SUCCESS").exists()) {
        TranscriptGen.generate(spark, convs)
          .repartitionByRange(64, col("conv_id"), col("turn_idx"))
          .write.mode("overwrite").parquet(src)
      }
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }

    // ---- part 1: build-throughput scaling ------------------------------
    var turnsCount = 0L
    val contentHashes = scala.collection.mutable.Map.empty[Int, Long]
    def buildAt(cores: Int, recordStages: Boolean): Double = {
      val spark = session(cores)
      import spark.implicits._
      val wh = java.nio.file.Files.createTempDirectory(s"bench_wh_$cores").toString
      try {
        val io = new ParquetTableIO(spark, wh)
        val turns = spark.read.parquet(src).as[Turn]
        if (turnsCount == 0L) turnsCount = turns.count()
        val t0 = System.nanoTime()
        val metrics = new IndexBuilder(spark, io).build(turns)
        val sec = (System.nanoTime() - t0) / 1e9
        if (recordStages) metrics.foreach { m =>
          results(s"stage_${m.stage}_sec") = m.wallMs / 1000.0
          if (m.wallMs > 0) results(s"stage_${m.stage}_rows_per_sec") = m.rows * 1000.0 / m.wallMs
        }
        // order-independent content hash of the postings table — the
        // determinism half of the scaling criterion: every parallelism level
        // must produce the identical index (untimed)
        if (!contentHashes.contains(cores)) {
          import org.apache.spark.sql.functions.{bit_xor, xxhash64}
          contentHashes(cores) = io.read("postings")
            .select(xxhash64(col("term"), col("docId"), col("tf"),
              col("doc_len"), col("positions_vb")).as("h"))
            .agg(bit_xor(col("h"))).as[Long].head()
        }
        sec
      } finally {
        spark.stop()
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
        deleteRecursively(wh)
      }
    }
    // co-tenant noise on this host swings identical runs 2-16x; min-of-reps
    // is the least-interference sample (reps interleaved across levels so a
    // noisy phase doesn't bias one level)
    // 3 reps: co-tenant noise swings identical runs 2-16x (BASELINE.md); a
    // third interleaved rep materially raises the odds that the min-of-reps
    // pair the artifact records catches a quiet phase at both levels
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val skipScaling = sys.env.get("SPARK_GRAFT_BENCH_MODE").contains("queries")
    val lo = 2
    val hi = 8
    val levels = if (cpus > hi) Seq(lo, hi, cpus) else Seq(lo, hi)
    val times = scala.collection.mutable.Map.empty[Int, Double]
    if (!skipScaling) for (r <- 1 to reps; cores <- levels) {
      val s = buildAt(cores, recordStages = cores == hi && r == 1)
      // per-rep values go into the artifact too (VERDICT r2 item 6): the
      // co-tenant noise spread must be readable from the JSON, not prose
      results(s"index_build_local${cores}_rep${r}_sec") = s
      times(cores) = math.min(times.getOrElse(cores, Double.MaxValue), s)
    }
    if (skipScaling) { times(lo) = 1; times(hi) = 1; turnsCount = 1 }
    val sLo = times(lo)
    val sHi = times(hi)
    val sMax = times.getOrElse(cpus, sHi)
    results("build_turns_total") = turnsCount.toDouble
    results(s"index_build_local${lo}_sec") = sLo
    results(s"index_build_local${hi}_sec") = sHi
    results(s"index_build_local${cpus}_sec") = sMax
    results(s"build_turns_per_sec_local$lo") = turnsCount / sLo
    results(s"build_turns_per_sec_local$hi") = turnsCount / sHi
    results(s"build_turns_per_sec_local$cpus") = turnsCount / sMax
    results("scaling_efficiency") = ((turnsCount / sHi) / (turnsCount / sLo)) / (hi.toDouble / lo)
    results(s"scaling_efficiency_${hi}_$cpus") =
      if (cpus > hi) ((turnsCount / sMax) / (turnsCount / sHi)) / (cpus.toDouble / hi) else 1.0
    results("index_identical_across_parallelism") =
      if (contentHashes.values.toSet.size == 1) 1.0 else 0.0

    // ---- part 2: operator suite on the driver tables -------------------
    val spark = session(cpus)
    // warm the one-time artifacts (transcript index, persisted ANN indexes)
    // so q16/q19-q22/q27 measure query latency, not a one-off build
    try SparkEntry.warm(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[bench] warm failed: ${e.getMessage}") }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        results(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          results(name) = -1.0
      }
    }
    val total = results.collect { case (k, v) if k.startsWith("q") && v > 0 => v }.sum
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
