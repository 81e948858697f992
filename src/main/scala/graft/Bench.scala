package graft

import org.apache.spark.sql.SparkSession
import graft.build.IndexBuilder
import graft.corpus.TranscriptGen
import graft.store.ParquetTableIO

/** Benchmark main. Emits ONE JSON line:
  *   {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  *
  * Two parts:
  *  1. Scaling evidence (BASELINE.md): the same index build over the same
  *     deterministic transcript corpus at local[8] and local[32];
  *     efficiency = (throughput@32 / throughput@8) / 4. This substitutes
  *     for the north rule's N vs 4N executor clusters in a sandbox with no
  *     real cluster; the build is plain spark-submit-able code.
  *  2. Per-query wall times of every SparkEntry query on SPARK_GRAFT_SF_DIR,
  *     forced through a noop sink (count() would let Catalyst prune the
  *     very computation being measured).
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val convs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "40000").toLong
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    // ---- part 1: build-throughput scaling, local[8] vs local[32] -------
    var turnsCount = 0L
    def buildAt(cores: Int): Double = {
      val spark = session(cores)
      val wh = java.nio.file.Files.createTempDirectory(s"bench_wh_$cores").toString
      val io = new ParquetTableIO(spark, wh)
      val turns = TranscriptGen.generate(spark, convs)
      if (turnsCount == 0L) turnsCount = turns.count()
      val t0 = System.nanoTime()
      new IndexBuilder(spark, io).build(turns, assumeSorted = true)
      val sec = (System.nanoTime() - t0) / 1e9
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      sec
    }
    val lo = math.max(2, cpus / 4)
    val s8 = buildAt(lo)
    val s32 = buildAt(cpus)
    val tp8 = turnsCount / s8
    val tp32 = turnsCount / s32
    results(s"index_build_local${lo}_sec") = s8
    results(s"index_build_local${cpus}_sec") = s32
    results("build_turns_total") = turnsCount.toDouble
    results(s"build_turns_per_sec_local$cpus") = tp32
    results("scaling_efficiency") = (tp32 / tp8) / (cpus.toDouble / lo)

    // ---- part 2: operator suite on the driver tables -------------------
    val spark = session(cpus)
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
