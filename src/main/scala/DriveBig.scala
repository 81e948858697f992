/** Reproduces the BASELINE.md 10M-turn scale datapoint: generates a
  * 2.25M-conversation corpus (~10.1M turns, 2.1 GB parquet), runs the full
  * sharded build at local[32], then times warm queries.
  * `sbt "runMain DriveBig"` (needs ~10 GB under /tmp). */
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.build.IndexBuilder
import graft.corpus.TranscriptGen
import graft.model.Turn
import graft.store.ParquetTableIO

object DriveBig {
  def main(args: Array[String]): Unit = {
    val convs = 2250000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val src = "/tmp/big_turns"
    if (!new java.io.File(src + "/_SUCCESS").exists()) {
      TranscriptGen.generate(spark, convs)
        .repartitionByRange(64, col("conv_id"), col("turn_idx"))
        .write.mode("overwrite").parquet(src)
      println("source written")
    }
    val turns = spark.read.parquet(src).as[Turn]
    val n = turns.count()
    val wh = "/tmp/big_wh"
    val t0 = System.nanoTime()
    val m = new IndexBuilder(spark, new ParquetTableIO(spark, wh), rawShards = 4).build(turns)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"BIG: turns=$n wall=$sec%.1f s tp=${n / sec}%.0f turns/s")
    println(m.map(x => f"${x.stage}=${x.wallMs / 1000.0}%.1f(${x.rows}r)").mkString(" "))
    // query latency at 10M turns
    val io = new ParquetTableIO(spark, wh)
    val engine = new graft.api.SparkSearchEngine(spark, io)
    for (q <- Seq("whale", "\"blue whale\"", "(\"blue whale\" OR \"query engine\") NOT \"red fish\"", "\"blue whale\" whale engine"); rep <- 1 to 2) {
      val t1 = System.nanoTime()
      val top = engine.topKAuto(q, 0.0, 100)
      println(f"QUERY [$q] rep$rep ${(System.nanoTime() - t1) / 1e9}%.2f s top=${top.headOption}")
    }
    // bulk multi-query amortization at 10M turns: 64 head terms, one plan
    val terms = spark.read.parquet(s"$wh/term_stats")
      .orderBy(org.apache.spark.sql.functions.desc("df"), col("term").asc)
      .limit(64).select("term").as[String].collect().toSeq
    for (rep <- 1 to 2) {
      val t2 = System.nanoTime()
      terms.foreach(t => engine.termTopKWand(t, 0.0, 100))
      val singleSec = (System.nanoTime() - t2) / 1e9
      val t3 = System.nanoTime()
      engine.searchManyTerms(terms, k = 100).write.format("noop").mode("overwrite").save()
      val bulkSec = (System.nanoTime() - t3) / 1e9
      println(f"BULK64 rep$rep single=$singleSec%.1f s bulk=$bulkSec%.1f s speedup=${singleSec / bulkSec}%.1f x")
    }
    val sizes = new java.io.File(wh).listFiles.map(d => d.getName + "=" +
      (Option(d.listFiles).map(_.map(_.length).sum).getOrElse(0L) / 1048576) + "MB")
    println("SIZES: " + sizes.mkString(" "))
    spark.stop()
  }
}
