package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.api.SparkSearchEngine
import graft.build.{IndexBuilder, Tables}
import graft.corpus.TranscriptGen
import graft.store.ParquetTableIO

/** Document deletion (IndexBuilder.deleteDocs): tombstones + exact df
  * deltas + stats recompute, applied by every query path, physically
  * purged by compact(). The contract: a tombstoned index answers every
  * query exactly like a from-scratch build on the surviving corpus
  * (scores bit-identical — same stats aggregate, same df, same IEEE
  * order), before AND after compaction, and purged docIds are never
  * reused by later incremental appends.
  */
class DeleteSpec extends AnyFunSuite {
  import EngineSpecFixture.spark

  private val Convs = 40L
  private val allTurns = TranscriptGen.generateLocal(Convs)
  private val queries = Seq(
    "whale",
    "\"blue whale\"",
    "(\"blue whale\" OR \"query engine\") NOT \"red fish\"",
    "\"blue whale\" whale engine")

  /** top-k keyed by (conv_id, turn_idx) — docIds relabel between the
    * tombstoned and rebuilt warehouses. k exceeds the corpus, so there is
    * no cutoff and score equality is exact (no rounding). */
  private def keyed(engine: SparkSearchEngine, io: ParquetTableIO, q: String) = {
    import spark.implicits._
    val dict = io.read(Tables.DocDict)
      .as[(Long, String, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    engine.topKAuto(q, 0.0, 1000).map { case (d, s) => (dict(d), s) }.toSet
  }

  private def freshWh() = new ParquetTableIO(spark,
    java.nio.file.Files.createTempDirectory("del_wh_").toString)

  /** A built warehouse over the full corpus + the docIds tombstoned from
    * it (every docId ≡ 3 mod 7, like q44) + the surviving turns. */
  private def tombstoned(): (ParquetTableIO, IndexBuilder, Seq[graft.model.Turn], Seq[Long]) = {
    import spark.implicits._
    val io = freshWh()
    val b = new IndexBuilder(spark, io, blockSize = 8)
    b.build(spark.createDataset(allTurns))
    val dict = io.read(Tables.DocDict).as[(Long, String, Int, Int)].collect()
    val delIds = dict.map(_._1).filter(_ % 7 == 3).toSeq
    val delKeys = dict.filter(r => r._1 % 7 == 3).map(r => (r._2, r._3)).toSet
    val survivors = allTurns.filterNot(t => delKeys((t.conv_id, t.turn_idx)))
    b.deleteDocs(delIds, batchId = 0L)
    (io, b, survivors, delIds)
  }

  test("tombstoned index ≡ from-scratch build on the survivors, all query paths") {
    import spark.implicits._
    val (ioDel, _, survivors, delIds) = tombstoned()
    assert(delIds.nonEmpty && survivors.size == allTurns.size - delIds.size)
    val eDel = new SparkSearchEngine(spark, ioDel)

    val ioRef = freshWh()
    new IndexBuilder(spark, ioRef, blockSize = 8).build(spark.createDataset(survivors))
    val eRef = new SparkSearchEngine(spark, ioRef)

    // corpus stats recomputed EXACTLY (integer doc_len sums are exact in
    // IEEE double, so the avg is order-free)
    assert(eDel.stats == eRef.stats)

    queries.foreach { q =>
      assert(keyed(eDel, ioDel, q) == keyed(eRef, ioRef, q), s"query $q")
    }
    // the WAND kernel path (block df minus delta + exact skip set) stays
    // bit-identical to the exhaustive path ON the tombstoned engine
    assert(eDel.termTopKWand("whale", 0.0, 50) ==
      eDel.topK(eDel.scores("whale"), 0.0, 50))
    // the dense one-shuffle evaluator applies the tombstones too
    assert(eDel.topKDense(queries(2), 0.0, 1000) == eDel.topKAuto(queries(2), 0.0, 1000))
    // bulk path: per-query ≡ single-query on the tombstoned engine
    val bulk = eDel.searchManyAuto(queries)
      .select(col("query"), col("docId"), col("score"))
      .as[(String, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    queries.foreach { q =>
      assert(bulk(q) == eDel.topKAuto(q, 0.0, 100).toSet, s"bulk $q")
    }
  }

  test("deleteDocs is batch-idempotent; unknown/already-deleted ids are ignored") {
    import spark.implicits._
    val (io, b, survivors, delIds) = tombstoned()
    // replay of a committed batch: no-op
    assert(b.deleteDocs(delIds, batchId = 0L).isEmpty)
    // superset batch (already-deleted + never-indexed ids): nothing new
    val m1 = b.deleteDocs(delIds ++ Seq(999999L, 888888L), batchId = 1L)
    assert(m1.head.rows == 0)
    val (n, _) = io.read(Tables.Stats).as[(Long, Double)].head()
    assert(n == survivors.size)
    assert(io.read(Tables.Deletes).count() == delIds.size)
  }

  test("compact purges tombstones physically without changing any result") {
    import spark.implicits._
    val (io, b, survivors, delIds) = tombstoned()
    val before = queries.map(q => q -> keyed(new SparkSearchEngine(spark, io), io, q)).toMap

    b.compact()
    assert(!io.exists(Tables.Deletes) && !io.exists(Tables.DeletedTermDf))
    assert(io.read(Tables.DocDict).count() == survivors.size)
    assert(io.read(Tables.Postings).filter(col("docId").isin(delIds: _*)).count() == 0)
    // blocks rebuilt from the purged postings: no tombstoned doc survives
    val eC = new SparkSearchEngine(spark, io) // re-open: replace() swapped files
    queries.foreach { q =>
      assert(keyed(eC, io, q) == before(q), s"query $q after compact")
    }
    assert(eC.termTopKWand("whale", 0.0, 50) == eC.topK(eC.scores("whale"), 0.0, 50))
  }

  test("purged docIds are never reused by a later incremental append") {
    import spark.implicits._
    val (io, b, _, _) = tombstoned()
    val maxId = io.read(Tables.DocDict).agg(org.apache.spark.sql.functions.max(col("docId")))
      .as[Long].head()
    // tombstone the tail ids too, so the post-purge dict max drops
    b.deleteDocs(Seq(maxId, maxId - 1), batchId = 5L)
    b.compact()
    val maxAfter = io.read(Tables.DocDict).agg(org.apache.spark.sql.functions.max(col("docId")))
      .as[Long].head()
    assert(maxAfter < maxId)
    val extra = allTurns.take(2).map(t => t.copy(conv_id = "conv-fresh" + t.conv_id))
    b.buildIncremental(spark.createDataset(extra.toIndexedSeq), batchId = 100L)
    val newIds = io.read(Tables.DocDict)
      .filter(col("conv_id").startsWith("conv-fresh")).select(col("docId"))
      .as[Long].collect().sorted
    assert(newIds.head == maxId + 1, s"watermark must floor nextId past the purged range: $newIds")
  }

  test("tombstone cap: block-index queries refuse past maxDeletedIdsInMemory") {
    val (io, _, _, delIds) = tombstoned()
    assert(delIds.size > 2)
    val capped = new SparkSearchEngine(spark, io,
      GraftParams(maxDeletedIdsInMemory = 2))
    intercept[IllegalStateException] { capped.termTopKWand("whale", 0.0, 10) }
    // the exhaustive path does not need the driver-side skip set
    assert(capped.topK(capped.scores("whale"), 0.0, 10).nonEmpty)
  }

  test("fresh full build clears stale tombstones and watermark") {
    import spark.implicits._
    val (io, b, _, _) = tombstoned()
    b.compact() // leaves a next_doc_id watermark
    assert(io.readMarker(Tables.NextDocId).nonEmpty)
    b.build(spark.createDataset(allTurns)) // resume = false: new corpus life
    assert(!io.exists(Tables.Deletes) && io.readMarker(Tables.NextDocId).isEmpty)
    val e = new SparkSearchEngine(spark, io)
    assert(e.stats.total_docs == allTurns.size)
  }
}
