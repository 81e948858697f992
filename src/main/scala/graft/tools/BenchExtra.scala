package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Extra, iteration-speed benchmark runner (guide §1.4): times a SUBSET of
  * the SparkEntry queries through the same noop sink as Bench, with
  * optional repetitions (min-of-reps against co-tenant noise). Bench.scala
  * itself is frozen for measurement — this main exists so optimization
  * work can isolate one query without paying the full suite + scaling run.
  *
  * Usage: runMain graft.tools.BenchExtra [reps] [queryPrefix ...]
  * Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as Bench).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse(1)
    val only = (if (args.headOption.exists(a => scala.util.Try(a.toInt).isSuccess))
      args.drop(1) else args).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-benchextra")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.warm(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[benchextra] warm failed: ${e.getMessage}") }
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for (r <- 1 to reps) {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        if (only.isEmpty || only.exists(name.startsWith)) {
          spark.sparkContext.setJobDescription(s"$name rep$r")
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            val sec = (System.nanoTime() - t0) / 1e9
            results(name) = math.min(results.getOrElse(name, Double.MaxValue), sec)
            println(f"[benchextra] rep$r $name%-28s $sec%8.3f s")
          } catch {
            case e: Throwable =>
              System.err.println(s"[benchextra] $name FAILED: ${e.getMessage}")
              results(name) = -1.0
          }
        }
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    println(s"""{"metric":"benchextra_min","queries":$qs,"sf":"$sfDir","reps":$reps}""")
    spark.stop()
  }
}
