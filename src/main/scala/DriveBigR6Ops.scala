/** Round-6 scale datapoints: the kernel-ported text operators over the
  * 10M-turn corpus, SAME methodology as DriveBigR5Ops (same 2.25M-conv
  * generator, same (doc_id, text) materialization rule — dense rank under
  * (conv_id, turn_idx) — same parquet sink), so the per-node throughput is
  * directly comparable with the round-5 numbers (repetition 633 s,
  * contamination 860 s, substringDup 773 s). Unlike R5Ops this does NOT
  * need the 10M index build: the ops only consume (doc_id, text).
  *
  * `sbt "runMain DriveBigR6Ops [norep] [nocontam] [nosub] [nolang]"`
  */
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Turn
import graft.ops.{Dedup, TextOps}

object DriveBigR6Ops {
  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val src = "/tmp/big_turns"
    if (!new java.io.File(src + "/_SUCCESS").exists()) {
      timed("generate 10M turns")(
        graft.corpus.TranscriptGen.generate(spark, 2250000L)
          .repartitionByRange(64, col("conv_id"), col("turn_idx"))
          .write.mode("overwrite").parquet(src))
    }

    // (doc_id, text): dense rank under (conv_id, turn_idx) — the same id
    // rule the index build uses (range-sort + zipWithIndex), computed
    // directly so counts match the round-5 drive doc for doc
    val docsPath = "/tmp/big_docs_r6"
    if (!new java.io.File(docsPath + "/_SUCCESS").exists())
      timed("materialize (doc_id, text) table") {
        val sorted = spark.read.parquet(src).as[Turn]
          .repartitionByRange(64, col("conv_id"), col("turn_idx"))
          .sortWithinPartitions("conv_id", "turn_idx")
        val ids = spark.createDataset(
          sorted.rdd.zipWithIndex().map { case (t, id) => (id, t.text) })
        ids.toDF("doc_id", "text")
          .repartitionByRange(64, $"doc_id")
          .write.mode("overwrite").parquet(docsPath)
      }
    val docs = spark.read.parquet(docsPath)
    val nDocs = docs.count()
    println(s"[corpus] $nDocs docs")

    if (!args.contains("norep")) {
      val out = "/tmp/big_rep_r6"
      timed("repetitionFilter (full corpus)")(
        TextOps.repetitionFilter(docs).write.mode("overwrite").parquet(out))
      val flagged = spark.read.parquet(out).filter($"verdict" === "repetitive").count()
      println(s"[repetition] flagged $flagged of $nDocs")
    }

    if (!args.contains("nolang")) {
      val out = "/tmp/big_lang_r6"
      timed("langId (full corpus)")(
        TextOps.langId(docs).write.mode("overwrite").parquet(out))
    }

    if (!args.contains("nocontam")) {
      val bench = docs.filter($"doc_id" % 10000 === 7)
      val corpus = docs.filter($"doc_id" % 10000 =!= 7)
      println(s"[contamination] bench docs: ${bench.count()}")
      val hits = timed("contamination n=8 (corpus vs ~1k bench)")(
        TextOps.contamination(corpus, bench, n = 8).count())
      println(s"[contamination] flagged $hits docs")
    }

    if (!args.contains("nosub")) {
      val out = "/tmp/big_sub_r6"
      timed("substringDup (full corpus, 10-token windows)")(
        Dedup.substringDup(docs).write.mode("overwrite").parquet(out))
      val sub = spark.read.parquet(out)
      val full = sub.filter($"dup_frac" === 1.0).count()
      val partial = sub.filter($"dup_frac" > 0.0 && $"dup_frac" < 1.0).count()
      println(s"[substringDup] full-dup docs: $full, partial: $partial")
    }

    // opt-in: the full hygiene pipeline in one plan, r5 methodology
    if (args.contains("hyg")) {
      val bench = docs.filter($"doc_id" % 10000 === 7)
      val corpus = docs.filter($"doc_id" % 10000 =!= 7)
      val kept = timed("hygieneCorpus (one plan)")(
        graft.ops.Pipeline.hygieneCorpusManaged(spark, corpus, bench, ngramN = 8) { out =>
          out.write.mode("overwrite").parquet("/tmp/big_hyg_r6")
          spark.read.parquet("/tmp/big_hyg_r6").count()
        })
      println(s"[hygiene] keepers: $kept of $nDocs")
    }

    spark.stop()
  }
}
