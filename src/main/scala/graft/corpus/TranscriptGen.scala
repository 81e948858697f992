package graft.corpus

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.Turn
import java.sql.Timestamp

/** Deterministic synthetic transcript corpus (FIXTURES.md §1) in the exact
  * BASELINE.json input_hint schema. Seeded per-conversation so the result
  * is identical at any parallelism level — generation is a distributed
  * `spark.range(convs).flatMap`, scalable to any corpus size.
  */
object TranscriptGen {

  /** Bump when generated content changes — cache paths embed this so a
    * resume never mixes corpora across generator versions. */
  val Version = 3

  /** Vocabulary chosen to exercise stem collisions, apostrophes, hyphens,
    * ghost tokens (normalize→""), stop words, and planted phrases. */
  private val vocab: Vector[String] = Vector(
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
    "time", "times", "day", "days", "week",
    "code", "coding", "coded", "test", "tests", "testing")

  private val phrases: Vector[Vector[String]] = Vector(
    Vector("blue", "whale"),
    Vector("query", "engine"),
    Vector("red", "fish"),
    Vector("a", "b", "c"),
    Vector("x", "y"),
    Vector("blue", "blue"))

  private val roles = Vector("user", "assistant", "tool")
  private val tools = Vector("", "search", "calc")
  private val epochMs = 1735689600000L // 2025-01-01T00:00:00Z, fixed

  /** Pure per-conversation turn synthesis — usable without Spark (oracle
    * tests) and inside executors (distributed generation). */
  def turnsFor(conv: Long, maxTurns: Int, seed: Long): Seq[Turn] = {
    val rnd = new scala.util.Random(seed ^ (conv * 0x9E3779B97F4A7C15L))
    val nTurns = 1 + rnd.nextInt(maxTurns)
    (0 until nTurns).map { t =>
      // realistic transcript-turn lengths (tens to a few hundred tokens)
      val nWords = 10 + rnd.nextInt(120)
      val words = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < nWords) {
        val r = rnd.nextInt(10)
        if (r == 0 && phrases.nonEmpty) {
          words ++= phrases(rnd.nextInt(phrases.size))
        } else if (r <= 3) {
          // log-uniform long tail (~50k distinct terms): real transcript
          // vocabularies are heavy-tailed; without this every term is a
          // head term and the index layout is never exercised on rare terms
          words += "tok" + math.exp(rnd.nextDouble() * 10.82).toLong // e^10.82 ≈ 50k
        } else {
          words += vocab(rnd.nextInt(vocab.size))
        }
        i += 1
      }
      // occasional punctuation/casing noise — tokenizer must see realistic text
      val text = words.zipWithIndex.map { case (w, j) =>
        val w2 = if (rnd.nextInt(7) == 0) w.capitalize else w
        if (rnd.nextInt(11) == 0 && j > 0) w2 + "," else w2
      }.mkString(" ") + (if (rnd.nextInt(3) == 0) "." else "")
      Turn(
        conv_id = f"conv-$conv%08d",
        turn_idx = t,
        role = roles(t % roles.size),
        text = text,
        tool = tools(t % tools.size),
        ts = new Timestamp(epochMs + conv * 3600000L + t * 60000L))
    }
  }

  def generate(spark: SparkSession, convs: Long, maxTurns: Int = 8, seed: Long = 42L): Dataset[Turn] = {
    import spark.implicits._
    spark.range(0, convs)
      .flatMap(conv => turnsFor(conv, maxTurns, seed))
  }

  /** Driver-side generation for tiny oracle corpora. */
  def generateLocal(convs: Long, maxTurns: Int = 8, seed: Long = 42L): Seq[Turn] =
    (0L until convs).flatMap(turnsFor(_, maxTurns, seed))
}
