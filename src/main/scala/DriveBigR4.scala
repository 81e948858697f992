/** Round-4 scale datapoints over the 10M-turn corpus/warehouse that
  * `DriveBig` materializes (reuses `/tmp/big_wh` via resume, so this can
  * run standalone):
  *
  *  A. warm phrase/boolean/mixed latency WITH vs WITHOUT the head-stem
  *     Bloom prefilter (every stem here has df ≈ 3–5.5M, the adversarial
  *     extreme — exactly where the prefilter's shuffle cut shows);
  *  B. the dedup family at 10M docs (VERDICT r3 stretch 8): exact dedup →
  *     MinHash signature-index build + batch-vs-corpus probe (the q38
  *     shape) → simhash fingerprints → banded near-dup pairs →
  *     connected-component clusters → keepers — per-stage wall times.
  *
  * `sbt "runMain DriveBigR4 [maxBucket]"` (default maxBucket 1000 for the
  * pair searches: this corpus is near-dup-saturated by construction, so
  * uncapped buckets would go quadratic in a way real corpora don't).
  */
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftParams
import graft.build.{IndexBuilder, Tables}
import graft.model.Turn
import graft.ops.Dedup
import graft.store.ParquetTableIO

object DriveBigR4 {
  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val maxBucket = args.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(1000)
    val skipPhrase = args.contains("nophrase") // part A already measured
    val skipDedup = args.contains("nodedup")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val src = "/tmp/big_turns"
    if (!new java.io.File(src + "/_SUCCESS").exists()) {
      graft.corpus.TranscriptGen.generate(spark, 2250000L)
        .repartitionByRange(64, col("conv_id"), col("turn_idx"))
        .write.mode("overwrite").parquet(src)
    }
    val turns = spark.read.parquet(src).as[Turn]
    val wh = "/tmp/big_wh"
    val io = new ParquetTableIO(spark, wh)
    if (!io.exists(Tables.Blocks))
      timed("build")(new IndexBuilder(spark, io, rawShards = 4).build(turns, resume = true))

    // ---- A. phrase-path latency: prefilter off / auto-gated / forced ----
    // Every stem in this corpus is a head term (uniform ~110-form vocab,
    // df(head) ≈ 0.4·Σdf), so the selectivity gate keeps the Bloom filter
    // OFF here (the measured forced numbers are WHY); `auto` should match
    // `off` to noise, `forced` shows the trade the gate avoids.
    val off = new graft.api.SparkSearchEngine(spark, io,
      GraftParams(phrasePrefilterMinDf = Long.MaxValue))
    val auto = new graft.api.SparkSearchEngine(spark, io) // default gates
    val forced = new graft.api.SparkSearchEngine(spark, io,
      GraftParams(phrasePrefilterMaxRatio = 1.0))
    val phraseQs = Seq(
      "\"blue whale\"",
      "(\"blue whale\" OR \"query engine\") NOT \"red fish\"",
      "\"blue whale\" whale engine",
      // the canonical prefilter WIN: rare head (log-uniform tail term,
      // df ≈ hundreds) against a head-term tail stem (df ≈ 4M) — the
      // gate opens (df(head)/Σdf ≈ 1e-4) and the shuffle collapses
      "\"tok40000 whale\"")
    for (q <- phraseQs; rep <- 1 to 2; if !skipPhrase) {
      def time(e: graft.api.SparkSearchEngine) = {
        val t0 = System.nanoTime()
        val r = e.topKAuto(q, 0.0, 100)
        ((System.nanoTime() - t0) / 1e9, r)
      }
      val (tOff, a) = time(off)
      val (tAuto, b) = time(auto)
      val (tForced, c) = time(forced)
      require(a == b && b == c, s"prefilter changed results for '$q'")
      println(f"PHRASE [$q] rep$rep off=$tOff%.1f s auto=$tAuto%.1f s forced=$tForced%.1f s (bit-identical)")
    }

    // ---- B. dedup family at 10M docs ------------------------------------
    if (skipDedup) { spark.stop(); return }
    // docs = (doc_id, text) via the dictionary (dense ids)
    val docs = io.read(Tables.DocDict).select($"docId".as("doc_id"), $"conv_id", $"turn_idx")
      .join(turns.toDF(), Seq("conv_id", "turn_idx"))
      .select($"doc_id", $"text")
    val nDocs = timed("docs materialize")(docs.count())
    println(s"DOCS n=$nDocs")

    val exact = timed("exact dedup (md5 groupBy)")(
      { val e = Dedup.exact(docs).cache(); e.count(); e })
    val nDistinct = exact.count()
    println(s"EXACT distinct=$nDistinct dup_groups=${exact.filter($"n_copies" > 1).count()}")

    // survivors of exact dedup — the realistic near-dup input
    val surv = docs.join(exact.select($"keep_doc_id".as("doc_id")), Seq("doc_id")).cache()
    val nSurv = surv.count()
    println(s"SURV n=$nSurv")

    // MinHash signature index: the q38 index-once/probe-daily shape
    if (!args.contains("nominhash")) {
      val idx = "/tmp/big_mh_idx"
      val corpusPart = surv.filter($"doc_id" % 10 =!= 0)
      val batchPart = surv.filter($"doc_id" % 10 === 0)
      timed("minhash index build (90% of survivors)")(
        Dedup.buildMinHashIndex(spark, corpusPart, idx))
      val batchPairs = timed("minhash batch-vs-corpus probe (10%)")(
        Dedup.minHashDedupBatch(spark, idx, batchPart, threshold = 0.5,
          maxBucket = maxBucket).count())
      println(s"MINHASH batch pairs=$batchPairs")
    }

    // simhash fingerprints (linear) + banded pairs (capped) + CC + keepers
    val hashes = timed("simhash fingerprints")(
      { val h = Dedup.simHash(spark, surv).cache(); h.count(); h })
    // blocks=8 (40-bit Manku keys): the documented parameterization for
    // large n — 16-bit keys (blocks=4) at 10M docs put ~150 docs in EVERY
    // bucket (in-bucket pair work went quadratic: ~3·10^9 candidates)
    val pairs = timed("simhash near-dup pairs (banded, capped)")(
      { val p = Dedup.simHashNearDupBits(spark, hashes, blocks = 8,
          maxBucket = maxBucket).cache()
        p.count(); p })
    val nPairs = pairs.count()
    println(s"SIMHASH pairs=$nPairs")
    val clusters = timed("dedup clusters (connected components)")(
      { val c = Dedup.dedupClusters(spark, pairs.select($"doc_a", $"doc_b"),
          surv.select($"doc_id"))
        c.cache(); c.count(); c })
    val keepers = timed("apply keepers")(
      Dedup.applyKeepers(spark, surv, clusters).count())
    println(s"CLUSTERS keepers=$keepers of $nSurv")
    spark.stop()
  }
}
