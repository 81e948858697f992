package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Streaming events: watermark + tumbling window vs the identical batch
  * aggregation on the same rows, and stateful per-user sessions. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = graft.EngineSpecFixture.spark

  private def rows = {
    val base = 1735689600000L // 2025-01-01T00:00Z
    (0 until 500).map { i =>
      EventAggregates.EventRow(i.toLong, new Timestamp(base + i * 37000L),
        (i % 7).toLong, if (i % 3 == 0) "click" else "view", i * 0.5)
    }
  }

  test("watermarked windowed counts equal the batch aggregation") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[EventAggregates.EventRow]
    val q = EventAggregates.windowedCounts(stream.toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // two micro-batches + a final far-future row to advance the watermark
      val (a, b) = rows.splitAt(250)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      stream.addData(Seq(EventAggregates.EventRow(9999L,
        new Timestamp(1735689600000L + 86400000L), 0L, "view", 0.0)))
      q.processAllAvailable()
      val streamed = spark.table("win_out")
        .filter($"bucket" < new Timestamp(1735689600000L + 86000000L))
        .as[(Timestamp, String, Long, Long)].collect().toSet
      val batch = EventAggregates.windowedCounts(spark.createDataset(rows).toDF())
        .as[(Timestamp, String, Long, Long)].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("stateful user sessions accumulate across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[EventAggregates.EventRow]
    val q = EventAggregates.userSessions(stream.toDS())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Update()).start()
    try {
      val (a, b) = rows.splitAt(250)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      // latest state per user must equal the batch totals
      val latest = spark.table("sess_out")
        .as[(Long, Long, Double)].collect()
        .groupBy(_._1).map { case (u, vs) => u -> vs.maxBy(_._2) }
      val expected = rows.groupBy(_.user_id).map { case (u, rs) =>
        u -> ((u, rs.size.toLong, rs.map(_.value).sum)) }
      assert(latest.keySet == expected.keySet)
      expected.foreach { case (u, (_, n, total)) =>
        val (_, gn, gt) = latest(u)
        assert(gn == n && math.abs(gt - total) < 1e-9, s"user $u")
      }
    } finally q.stop()
  }
}
