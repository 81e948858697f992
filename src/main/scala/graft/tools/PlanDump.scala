package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dump `.explain("formatted")` for every SparkEntry query (or the subset
  * named in args) to an output directory — the plan evidence for the
  * optimization rounds (plans/r06/<query>_{before,after}.txt). Untimed,
  * measurement-neutral: Bench.scala is untouched.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [queryPrefix ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r06")
    val suffix = if (args.length > 1) args(1) else "before"
    val only = args.drop(2).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    try SparkEntry.warm(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[plandump] warm failed: ${e.getMessage}") }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.exists(name.startsWith)) {
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val w = new java.io.PrintWriter(s"$outDir/${name}_$suffix.txt")
          try w.write(plan) finally w.close()
          println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
        } catch {
          case e: Throwable => System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
