package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Dedup

/** Structured-Streaming near-dup GATE — the streaming composition of the
  * persisted MinHash index (q38): every micro-batch of documents is
  * deduplicated against the whole indexed corpus (and within itself)
  * WITHOUT re-signing the corpus, survivors flow to the sink, and the
  * survivors' signatures are appended so every later batch dedups
  * against them too. This is the shape a continuous training-data
  * ingest runs: the corpus-side cost of each batch is a Bloom-prefiltered
  * banding-row join, never a corpus scan.
  *
  * Contract: doc_ids must be unique and monotone across batches (later
  * batches carry larger ids — the same disjointness the ANN appends
  * require); the kept document of a near-dup pair is the LOWER id, so an
  * arriving duplicate can never evict an already-ingested document.
  *
  * Idempotency: a ledger marker under `indexPath/stream_ledger` commits
  * each batch AFTER its append, so a replayed batch (foreachBatch is
  * at-least-once) recomputes the same survivors without re-appending. A
  * crash between append and marker can leave duplicate signature rows;
  * they only produce duplicate pair rows, which the distinct loser set
  * absorbs — survivors stay exact.
  */
object StreamingDedup {

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def ledgerPath(indexPath: String, batchId: Long) =
    new org.apache.hadoop.fs.Path(s"$indexPath/stream_ledger/batch-$batchId")

  /** Dedup ONE batch against the index (and itself) and grow the index
    * with the survivors' signatures; idempotent per batchId. Exposed so
    * tests (and batch pipelines) can drive it without a streaming query.
    *
    * @return the surviving documents of `batch` (same schema)
    */
  def dedupBatch(
      spark: SparkSession,
      indexPath: String,
      batch: DataFrame,
      batchId: Long,
      threshold: Double = 0.5,
      maxBucket: Int = 100000): DataFrame = {
    import spark.implicits._
    val replay = fs(spark, indexPath).exists(ledgerPath(indexPath, batchId))
    val pairs = Dedup.minHashDedupBatch(spark, indexPath, batch, threshold, maxBucket)
    // keep the lower id of every near-dup pair; on a replay the batch's
    // own appended signatures are already in the index, so a doc meets
    // its own copy — the self-pair filter keeps the recompute exact
    val losers = pairs
      .filter($"doc_a" =!= $"doc_b")
      .select(greatest($"doc_a", $"doc_b").as("doc_id"))
      .distinct()
    val survivors = batch.join(losers, Seq("doc_id"), "left_anti")
    if (!replay) {
      Dedup.appendMinHashSigs(spark, survivors, indexPath)
      val f = fs(spark, indexPath)
      f.mkdirs(ledgerPath(indexPath, batchId).getParent)
      f.create(ledgerPath(indexPath, batchId), true).close()
    }
    survivors
  }

  /** Streaming entry point: `docsStream` rows are (doc_id, text, ...);
    * `sink(survivors, batchId)` receives each batch's deduplicated
    * documents (exactly-once per the ledger above). */
  def start(
      docsStream: DataFrame,
      indexPath: String,
      checkpoint: String,
      threshold: Double = 0.5,
      maxBucket: Int = 100000,
      trigger: Trigger = Trigger.ProcessingTime(1000))(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          sink(dedupBatch(batch.sparkSession, indexPath, batch, batchId,
            threshold, maxBucket), batchId)
      }
      .start()
}
