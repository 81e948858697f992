package graft.tools

/** Dev utility: print which corpus vocabulary tokens map to each stem —
  * the DuckDB BM25 oracles (SparkEntry.oracleSql q19-q22) hard-code these
  * token-form lists, so regenerate them here after any vocab change. */
object StemMapCheck {
  def main(args: Array[String]): Unit = {
    val vocab = Vector(
      "run", "runs", "running", "ran", "runner",
      "query", "queries", "querying", "engine", "engines",
      "whale", "whales", "blue", "red", "fish", "fishes",
      "don't", "it's", "can't", "won't",
      "state-of-the-art", "well-known", "self-serve",
      "__", "the", "a", "an", "of", "to", "and", "or", "not",
      "index", "indexes", "indexing", "search", "searching", "searched",
      "data", "spark", "cluster", "partition", "partitions",
      "token", "tokens", "score", "scores", "scoring",
      "fast", "faster", "fastest", "slowly", "quickly",
      "nation", "national", "nationalization", "rational", "rationalize",
      "connect", "connected", "connection", "connections",
      "happy", "happily", "happiness", "sad", "sadly",
      "generate", "generated", "generously", "communication",
      "x", "y", "z", "w", "b", "c",
      "alpha", "beta", "gamma", "delta", "epsilon",
      "tool", "call", "calls", "result", "results", "error", "errors",
      "user", "assistant", "agent", "agents", "model", "models",
      "long", "short", "big", "small", "large",
      "time", "times", "day", "days", "week")
    val targets = Set("whale", "blue", "red", "fish") ++
      Seq("query", "engine", "red", "fish", "whale", "blue").map(graft.text.TextPipeline.term)
    println("stems of query terms: query=" + graft.text.TextPipeline.term("query") +
      " engine=" + graft.text.TextPipeline.term("engine") +
      " blue=" + graft.text.TextPipeline.term("blue") +
      " whale=" + graft.text.TextPipeline.term("whale") +
      " red=" + graft.text.TextPipeline.term("red") +
      " fish=" + graft.text.TextPipeline.term("fish"))
    val all = vocab ++ vocab.map(_.capitalize)
    all.foreach { w =>
      val st = graft.text.TextPipeline.term(w)
      if (targets.contains(st)) println(s"form '$w' -> stem '$st'")
    }
    // tok-tail words can never hit these stems, but assert a sample anyway
    val tokHit = (0 to 50000 by 7).map(i => "tok" + i)
      .exists(w => targets.contains(graft.text.TextPipeline.term(w)))
    println(s"tok-tail hits target stems: $tokHit")
  }
}
