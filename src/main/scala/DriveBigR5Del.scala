/** Round-5 scale datapoint: document deletion at 10M turns.
  *
  * Reuses the DriveBig source (/tmp/big_turns, ~10.1M turns), builds a
  * FormatVersion-6 warehouse at /tmp/big_wh6 (resumable — reruns skip the
  * build), then measures the full tombstone lifecycle at scale:
  *   1. deleteDocs of 1% of the corpus (docId % 100 == 7, ~101k ids) —
  *      dominated by the one column-pruned postings pass for df deltas;
  *   2. warm query latency THROUGH the tombstones (anti-join + WAND skip
  *      set + df deltas) vs the pre-delete warm numbers on the same
  *      engine session;
  *   3. compact() — the physical purge + re-sort + block rebuild;
  *   4. warm query latency after the purge (tombstone tax gone).
  * Sanity: no deleted docId may appear in any post-delete top-k.
  *
  * `sbt "runMain DriveBigR5Del"` (needs ~11 GB under /tmp; /tmp/big_wh —
  * the old v5 warehouse — is NOT touched).
  */
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.api.SparkSearchEngine
import graft.build.{IndexBuilder, Tables}
import graft.model.Turn
import graft.store.ParquetTableIO

object DriveBigR5Del {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val src = "/tmp/big_turns"
    require(new java.io.File(src + "/_SUCCESS").exists(),
      "run DriveBig first to generate /tmp/big_turns")
    val wh = "/tmp/big_wh6"
    val io = new ParquetTableIO(spark, wh)
    val b = new IndexBuilder(spark, io, rawShards = 4)
    val turns = spark.read.parquet(src).as[Turn]
    if (!io.exists(Tables.Blocks)) {
      val t0 = System.nanoTime()
      b.build(turns, resume = true)
      println(f"BUILD6: wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    } else println("BUILD6: reused existing /tmp/big_wh6")

    val queries = Seq(
      "whale",
      "\"blue whale\"",
      "(\"blue whale\" OR \"query engine\") NOT \"red fish\"")
    def timeQueries(label: String, e: SparkSearchEngine): Map[String, Set[Long]] =
      queries.map { q =>
        var top: Seq[(Long, Double)] = Seq.empty
        val secs = (1 to 2).map { _ =>
          val t = System.nanoTime()
          top = e.topKAuto(q, 0.0, 100)
          (System.nanoTime() - t) / 1e9
        }
        println(f"QUERY[$label] [$q] ${secs.map(s => f"$s%.2f").mkString("/")} s top=${top.headOption}")
        q -> top.map(_._1).toSet
      }.toMap

    // warm pass BEFORE deletes (fresh engine: no tombstone tables exist)
    timeQueries("pre-delete", new SparkSearchEngine(spark, io))

    val nBefore = io.read(Tables.DocDict).count()
    val delIds = io.read(Tables.DocDict).select(col("docId"))
      .filter(col("docId") % 100 === 7).as[Long]
    val t1 = System.nanoTime()
    b.deleteDocs(delIds, batchId = 500L)
    val delSec = (System.nanoTime() - t1) / 1e9
    val nDel = io.read(Tables.Deletes).count()
    println(f"DELETE: $nDel ids of $nBefore docs in $delSec%.1f s (${nDel / delSec}%.0f ids/s)")

    // queries THROUGH the tombstones (new engine: snapshot semantics)
    val eDel = new SparkSearchEngine(spark, io)
    val delSet = delIds.collect().toSet
    val topDel = timeQueries("tombstoned", eDel)
    topDel.foreach { case (q, ids) =>
      require(ids.intersect(delSet).isEmpty, s"deleted doc in top-k of $q")
    }

    val t2 = System.nanoTime()
    val cm = b.compact()
    println(f"COMPACT: ${(System.nanoTime() - t2) / 1e9}%.1f s " +
      cm.map(x => f"${x.stage}=${x.wallMs / 1000.0}%.1f").mkString(" "))
    require(!io.exists(Tables.Deletes), "compact must retire tombstones")

    // after the purge the tombstone tax (anti-join/skip set) is gone; the
    // results must be unchanged
    val topC = timeQueries("compacted", new SparkSearchEngine(spark, io))
    queries.foreach(q => require(topC(q) == topDel(q), s"purge changed $q"))
    println("POST-COMPACT top-k identical to tombstoned top-k: OK")
    spark.stop()
  }
}
