package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.OpsFixture.spark

/** The round-6 optimization contract: every TextKernel function must be
  * BIT-identical to the Catalyst expression it replaced, on adversarial
  * inputs the synthetic corpus never exercises — mixed case, unicode,
  * punctuation runs, empty/whitespace strings, heavy repetition. The
  * expressions here are copied verbatim from the round-5 operators, so
  * this spec IS the old implementation run side-by-side with the kernel.
  */
class TextKernelSpec extends AnyFunSuite {
  import spark.implicits._

  private val nasty: Seq[String] = Seq(
    "",
    " ",
    "   ",
    "a",
    "A",
    "the the the THE tHe",
    "a a a a b",
    "x y x y x y x y",
    "Hello, World!  123 foo_bar-baz",
    "punct!@#$%^&*()_+-=[]{}|;':\",./<>?~`only",
    "ünïcödé ÉLAN Straße İstanbul ʼn",
    "tabs\tand\nnewlines\r\nmixed  spaces",
    "trailing space ",
    " leading",
    "UPPERCASE LOWERCASE MiXeD 0123456789",
    "the quick brown fox jumps over the lazy dog",
    "is it that for was with are this you and of to in it",
    "one-token",
    "a1b2c3 d4e5 f6",
    "samesamesame samesamesame samesamesame")

  private def df = spark.createDataset(
    nasty.zipWithIndex.map { case (t, i) => (i.toLong, t) }).toDF("doc_id", "text")

  test("lowerTokens ≡ regexp_extract_all(lower(text), \"[a-z0-9]+\")") {
    val exprRows = df
      .select($"doc_id",
        regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0)).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    nasty.zipWithIndex.foreach { case (t, i) =>
      assert(TextKernel.lowerTokens(t).toSeq == exprRows(i.toLong),
        s"tokens diverge on <$t>")
      assert(TextKernel.lowerTokenCount(t) == exprRows(i.toLong).length,
        s"token count diverges on <$t>")
    }
  }

  test("alnumRunCount ≡ size(regexp_extract_all(text, \"[A-Za-z0-9]+\"))") {
    val exprRows = df
      .select($"doc_id",
        size(regexp_extract_all($"text", lit("[A-Za-z0-9]+"), lit(0))).as("n"))
      .as[(Long, Int)].collect().toMap
    nasty.zipWithIndex.foreach { case (t, i) =>
      assert(TextKernel.alnumRunCount(t) == exprRows(i.toLong), s"diverges on <$t>")
    }
  }

  test("repSignals ≡ the round-5 distinct/maxMultiplicity/stop-hit expressions") {
    val stops = lit(TextOps.StopWords.toArray)
    val toks = regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0))
    val bigrams = when(size($"toks") < 2, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size($"toks") - 1),
        i => concat_ws(" ", slice($"toks", i, lit(2)))))
    val exprRows = df.select($"doc_id", toks.as("toks"))
      .select($"doc_id",
        size($"toks").as("n"),
        size(filter($"toks", t => array_contains(stops, t))).as("hits"),
        size(array_distinct($"toks")).as("nd"),
        TextOps.maxMultiplicity($"toks").as("tt"),
        TextOps.maxMultiplicity(bigrams).as("tb"))
      .as[(Long, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6)).toMap
    nasty.zipWithIndex.foreach { case (t, i) =>
      val s = TextKernel.repSignals(TextKernel.lowerTokens(t), needBigrams = true)
      assert((s.nTokens, s.hits, s.nDistinct, s.topTok, s.topBigram) == exprRows(i.toLong),
        s"signals diverge on <$t>")
    }
  }

  test("qualitySignals ≡ the round-5 four-regex quality expressions") {
    val exprRows = df.select($"doc_id",
        length($"text").as("len"),
        size(regexp_extract_all($"text", lit("[A-Za-z0-9]+"), lit(0))).as("words"),
        size(regexp_extract_all($"text", lit("""[!-/:-@\[-`{-~]"""), lit(0))).as("punct"),
        size(regexp_extract_all($"text", lit("[0-9]"), lit(0))).as("digits"),
        size(regexp_extract_all($"text", lit("[A-Z]"), lit(0))).as("uppers"))
      .as[(Long, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6)).toMap
    nasty.zipWithIndex.foreach { case (t, i) =>
      val q = TextKernel.qualitySignals(t)
      assert((q.nChars, q.nWords, q.punct, q.digits, q.uppers) == exprRows(i.toLong),
        s"quality counters diverge on <$t>")
    }
  }

  test("distinctGrams ≡ the round-5 tokenNgrams expression (as a set)") {
    for (n <- Seq(1, 2, 4, 8)) {
      val exprRows = df
        .select($"doc_id", TextOps.tokenNgrams($"text", n).as("g"))
        .as[(Long, Seq[String])].collect().toMap
      nasty.zipWithIndex.foreach { case (t, i) =>
        import scala.jdk.CollectionConverters._
        assert(TextKernel.distinctGrams(t, n).asScala.toSet == exprRows(i.toLong).toSet,
          s"grams diverge on <$t> n=$n")
      }
    }
  }

  test("fingerprint ≡ md5(concat_ws(array_sort(array_distinct(tokens))))") {
    val expr = df.select($"doc_id",
        md5(concat_ws(" ", array_sort(array_distinct(
          regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0)))))).as("f"))
      .as[(Long, String)].collect().toMap
    val got = TextOps.fingerprint(df).as[(Long, String)].collect().toMap
    assert(got == expr)
  }

  test("windowHashes ≡ conv(substring(md5(window), 1, 15), 16, 10)") {
    val window = 3
    val toks = regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0))
    val wins = when(size($"toks") < window, array().cast("array<long>"))
      .otherwise(transform(
        sequence(lit(1), size($"toks") - (window - 1)),
        i => conv(substring(md5(concat_ws(" ", slice($"toks", i, lit(window)))),
          1, 15), 16, 10).cast("long")))
    val exprRows = df.select($"doc_id", toks.as("toks"))
      .select($"doc_id", wins.as("w"))
      .as[(Long, Seq[Long])].collect().toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    nasty.zipWithIndex.foreach { case (t, i) =>
      val got = TextKernel.windowHashes(TextKernel.lowerTokens(t), window, md).toSeq
      assert(got == exprRows(i.toLong), s"window hashes diverge on <$t>")
    }
  }
}
