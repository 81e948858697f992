package graft.query

import graft.text.TextPipeline

/** Snippet extraction — transcription of the reference's best-window scan
  * (/root/reference/source/BM25Ranker.cpp:587-674), including its quirks:
  *  - candidate positions = every recorded query-term position in the doc,
  *    sorted, duplicates kept (BM25Ranker.cpp:44-47,504-519);
  *  - weights keyed by RAW query text, so phrase-constituent stems usually
  *    weigh 0 (the key mismatch between :461 and :559/:576);
  *  - the best window is computed over occurrence SLOTS but then applied as
  *    TOKEN indices in constructDocumentSnippet (:591-610 vs :639) — kept;
  *  - a matched slot advances the cursor once, so duplicate positions stall
  *    highlighting from there on (:641-649) — kept;
  *  - C++ out-of-bounds reads (`documentPositions[index]` at :651 when
  *    index == size; `document_vector[i]` when the slot window exceeds the
  *    token count) are defined here as "plain append" / loop guard.
  */
object Snippeter {

  /** Per-doc recorded positions (insertIntoDocumentsWordAndPhrasePositions,
    * BM25Ranker.cpp:504-519): sorted position list with duplicates, and
    * position → key where later inserts overwrite. */
  final case class DocPositions(
      positions: Vector[Int],
      positionToKey: Map[Int, String])

  /** Recompute the bookkeeping for one doc from its text (identical to the
    * index contents for that doc). `keysInOrder` = operand lookup keys in
    * query-appearance order: the raw text of each bare term, then each
    * quoted phrase's stemmed constituent terms in phrase order. */
  def docPositions(text: String, keysInOrder: Seq[String]): DocPositions = {
    val (_, analyzed) = TextPipeline.analyze(text)
    val positions = scala.collection.mutable.ArrayBuffer.empty[Int]
    val posToKey = scala.collection.mutable.Map.empty[Int, String]
    keysInOrder.foreach { key =>
      analyzed.get(key).foreach { occ =>
        occ.foreach { p => positions += p; posToKey(p) = key }
      }
    }
    DocPositions(positions.toVector.sorted, posToKey.toMap)
  }

  /** getBestDocumentSnippetPositions: O(n·40) max-weight window over
    * occurrence slots (prefix sums). */
  def bestWindow(dp: DocPositions, weights: Map[String, Int]): (Int, Int) = {
    val ps = dp.positions
    var maxPos = (0, 0)
    var maxWeight = -10e10 // reference initial (BM25Ranker.cpp:592)
    val prefix = new Array[Double](ps.length + 1)
    var i = 0
    while (i < ps.length) {
      prefix(i + 1) = prefix(i) + weights.getOrElse(dp.positionToKey(ps(i)), 0)
      i += 1
    }
    i = 0
    while (i < ps.length) {
      var j = i
      while (j < ps.length && j - i <= 40) {
        val w = prefix(j + 1) - prefix(i)
        if (w > maxWeight) { maxWeight = w; maxPos = (i, j) }
        j += 1
      }
      i += 1
    }
    maxPos
  }

  /** constructDocumentSnippet (BM25Ranker.cpp:612-674). `window` slot pair
    * is used directly as token indices — the reference quirk. */
  def construct(dp: DocPositions, tokens: Array[String], window: (Int, Int)): String = {
    if (tokens.isEmpty) return ""
    val ps = dp.positions
    var first = window._1
    var second = window._2
    var diff = second - first
    if (diff < 40) {
      while (diff < 40 && first > 0) { first -= 1; diff += 1 }
      while (diff < 40 && second < tokens.length - 1) { second += 1; diff += 1 }
    }
    var index = 0
    while (index < ps.length && ps(index) < first) index += 1
    val sb = new StringBuilder
    var inSpan = false
    var i = first
    while (i <= second && i < tokens.length) {
      if (index < ps.length && i == ps(index)) {
        if (!inSpan) { sb.append("<span>"); inSpan = true }
        sb.append(tokens(i))
        index += 1 // one slot only — duplicates stall, as in the reference
      } else {
        if (inSpan) { sb.append("</span>"); inSpan = false }
        sb.append(tokens(i))
      }
      if (i != second) sb.append(' ')
      i += 1
    }
    if (inSpan) sb.append("</span>")
    sb.toString
  }

  def snippet(text: String, keysInOrder: Seq[String], weights: Map[String, Int]): String = {
    val dp = docPositions(text, keysInOrder)
    val tokens = TextPipeline.tokenize(text)
    construct(dp, tokens, bestWindow(dp, weights))
  }

  /** Operand lookup keys in query-appearance order (for docPositions). */
  def queryKeys(query: String, stemBareTerms: Boolean): Seq[String] = {
    import QueryLexer._
    lex(query).flatMap {
      case QTerm(t) => Seq(if (stemBareTerms) TextPipeline.term(t) else t)
      case QPhrase(p) => TextPipeline.tokenizeQuery(p)
      case _ => Nil
    }
  }
}
