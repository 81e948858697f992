/** Round-5 stretch (VERDICT item 8): sustained query throughput of the
  * HTTP server over a warm index — the reference serves from one
  * process's RAM; this serves from a warehouse through Spark jobs, so
  * the honest number is request latency (job scheduling + pruned scan)
  * and the sequential QPS it implies (the engine is single-query-at-a-
  * time, like the reference's server).
  *
  * `sbt "runMain DriveServerQps [convs]"` — builds (or resumes) a
  * transcript warehouse, starts the server on an ephemeral port, warms
  * each route, then times N sequential requests per query class.
  */
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.build.{IndexBuilder, Tables}
import graft.model.Turn
import graft.store.ParquetTableIO

object DriveServerQps {
  private def get(url: String): Int = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("GET")
    val body = conn.getInputStream.readAllBytes()
    conn.disconnect()
    body.length
  }

  def main(args: Array[String]): Unit = {
    val convs = args.headOption.map(_.toLong).getOrElse(20000L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val wh = s"/tmp/qps_wh_fmt${Tables.FormatVersion}_$convs"
    val io = new ParquetTableIO(spark, wh)
    if (!io.exists(Tables.Blocks))
      new IndexBuilder(spark, io)
        .build(graft.corpus.TranscriptGen.generate(spark, convs),
          resume = true, assumeSorted = true)
    val nTurns = io.read(Tables.DocDict).count()

    val port = { val s = new java.net.ServerSocket(0); val p = s.getLocalPort; s.close(); p }
    val server = new graft.server.SearchEngineServer(spark, wh, None, port)
    server.start()
    try {
      val base = s"http://127.0.0.1:$port"
      def enc(q: String) = java.net.URLEncoder.encode(q, "UTF-8")
      val routes = Seq(
        "term (WAND)" -> s"$base/search?query=${enc("whale")}&accuracy=0",
        "phrase" -> s"$base/search?query=${enc("\"blue whale\"")}&accuracy=0",
        "boolean" -> (s"$base/search?query=" +
          enc("(\"blue whale\" OR \"query engine\") NOT \"red fish\"") + "&accuracy=0"),
        "bulk x4 (searchMany)" ->
          s"$base/searchMany?queries=${enc("whale,blue,red,fish")}&accuracy=0")
      val n = 40
      println(s"SERVER corpus=$nTurns turns, $n sequential requests per route, warm")
      routes.foreach { case (label, url) =>
        (1 to 3).foreach(_ => get(url)) // warm
        val times = (1 to n).map { _ =>
          val t0 = System.nanoTime()
          get(url)
          (System.nanoTime() - t0) / 1e9
        }.sorted
        val total = times.sum
        val p50 = times(n / 2)
        val p95 = times((n * 95) / 100 - 1)
        println(f"QPS [$label] ${n / total}%.2f req/s  p50=${p50 * 1000}%.0f ms  p95=${p95 * 1000}%.0f ms")
      }
    } finally server.stop()
    spark.stop()
  }
}
