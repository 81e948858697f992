package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement for BASELINE.md: N single-term queries down the
  * WAND path (one-or-more Spark jobs EACH) vs ONE `searchManyTerms` plan
  * over the same warm index — the per-query scheduling-overhead
  * amortization a bulk filtering pipeline buys. Both paths return
  * identical (docId, score) sets (EngineSpec pins bit-identity); this
  * tool only times them.
  *
  * Args: [sfDir=/root/testdata/sf0.1] [nTerms=64] [reps=2]
  * Prints one JSON line; min-of-reps on both sides (same noise rule as
  * graft.Bench).
  */
object BulkCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toInt else 64
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-bulkcheck")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val engine = graft.SparkEntry.transcriptEngine(spark, sfDir)
    engine.stats // warm

    // the n most frequent index keys, derived with the engine's own
    // pipeline (raw bare-term lookup hits stem keys)
    val terms = graft.SparkEntry.corpus(spark, sfDir)
      .flatMap(t => graft.text.TextPipeline.tokenize(t.text))
      .map(graft.text.TextPipeline.term)
      .filter(_.nonEmpty)
      .toDF("t").groupBy("t").count()
      .orderBy(desc("count"), asc("t")).limit(n)
      .select("t").as[String].collect().toSeq

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    var single = Double.MaxValue
    var bulk = Double.MaxValue
    for (_ <- 1 to reps) {
      single = math.min(single, time {
        terms.foreach(t => engine.termTopKWand(t, 0.0, 100))
      })
      bulk = math.min(bulk, time {
        engine.searchManyTerms(terms, k = 100)
          .write.format("noop").mode("overwrite").save()
      })
    }
    println(f"""{"n_terms":$n,"single_wand_sec":$single%.3f,"bulk_sec":$bulk%.3f,"speedup":${single / bulk}%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
