package graft.text

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

class Porter2Spec extends AnyFunSuite {
  test("golden vocabulary matches libstemmer english bit-exactly") {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream("/porter2_golden.tsv"), "UTF-8")
    val pairs = try src.getLines().map { l =>
      val i = l.indexOf('\t'); (l.substring(0, i), l.substring(i + 1))
    }.toVector finally src.close()
    assert(pairs.size > 10000, "golden fixture should be large")
    val bad = pairs.filter { case (w, exp) => Porter2Stemmer.stem(w) != exp }
    if (bad.nonEmpty) {
      val sample = bad.take(25).map { case (w, exp) =>
        s"$w -> got '${Porter2Stemmer.stem(w)}' want '$exp'"
      }.mkString("\n")
      fail(s"${bad.size}/${pairs.size} mismatches:\n$sample")
    }
  }

  test("hand cases") {
    assert(Porter2Stemmer.stem("running") == "run")
    assert(Porter2Stemmer.stem("skies") == "sky")
    assert(Porter2Stemmer.stem("queries") == "queri")
    assert(Porter2Stemmer.stem("engine") == "engin")
    assert(Porter2Stemmer.stem("the") == "the")
    assert(Porter2Stemmer.stem("") == "")
    assert(Porter2Stemmer.stem("ab") == "ab")
  }
}

class TextPipelineSpec extends AnyFunSuite {
  test("tokenize matches C++ std::regex golden output (2.5k cases)") {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream("/tokenize_golden.tsv"), "UTF-8")
    val cases = try src.getLines().map { l =>
      val i = l.indexOf('')
      val toks = l.substring(i + 1)
      (l.substring(0, i), if (toks.isEmpty) Seq.empty[String] else toks.split('\t').toSeq)
    }.toVector finally src.close()
    assert(cases.size > 2000)
    val bad = cases.filter { case (in, exp) => TextPipeline.tokenize(in).toSeq != exp }
    if (bad.nonEmpty) {
      val sample = bad.take(10).map { case (in, exp) =>
        s"'$in' -> got ${TextPipeline.tokenize(in).toSeq} want $exp"
      }.mkString("\n")
      fail(s"${bad.size}/${cases.size} tokenizer mismatches:\n$sample")
    }
  }

  test("tokenize matches reference regex semantics") {
    assert(TextPipeline.tokenize("Hello, world!").toSeq == Seq("Hello", "world"))
    // tokens must start/end on \w chars; ' and - only interior
    assert(TextPipeline.tokenize("don't stop").toSeq == Seq("don't", "stop"))
    assert(TextPipeline.tokenize("state-of-the-art").toSeq == Seq("state-of-the-art"))
    assert(TextPipeline.tokenize("a - b").toSeq == Seq("a", "b"))
    assert(TextPipeline.tokenize("x-- --y").toSeq == Seq("x", "y"))
    assert(TextPipeline.tokenize("__ a").toSeq == Seq("__", "a")) // _ is \w
    assert(TextPipeline.tokenize("café ok").toSeq == Seq("caf", "ok")) // non-ASCII breaks tokens
    assert(TextPipeline.tokenize("").isEmpty)
    assert(TextPipeline.tokenize("...").isEmpty)
  }

  test("normalize = ascii lowercase + strip C-locale punct") {
    assert(TextPipeline.normalize("Don't") == "dont")
    assert(TextPipeline.normalize("state-of-the-art") == "stateoftheart")
    assert(TextPipeline.normalize("__") == "")   // ghost token
    assert(TextPipeline.normalize("A_B-C'd") == "abcd")
  }

  test("analyze: positions count ghost tokens, doc_len is raw count") {
    val (len, terms) = TextPipeline.analyze("__ Running runs run")
    assert(len == 4)
    assert(terms("run").toSeq == Seq(1, 2, 3)) // position 0 was the ghost
  }
}
