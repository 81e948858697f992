package graft.query

import graft.GraftParams
import graft.query.QueryLexer._
import scala.collection.mutable

/** The boolean/phrase score algebra — the reference's fuzzy-set semantics
  * over [0,1] score vectors (SURVEY.md §2.6). One abstract interface, two
  * implementations: the dense in-memory oracle (tests) and the sparse
  * distributed Spark frames (the engine). The evaluator below drives both,
  * so query semantics cannot drift between them.
  */
trait ScoreAlgebra[S] {
  /** all-zero dense vector (BM25Ranker::getEmptyScoresDocument) */
  def empty: S
  /** bare-term BM25 + max-normalize (BM25Ranker.cpp:350-378) */
  def termScore(rawTerm: String): S
  /** quoted-phrase positional BM25 + max-normalize (BM25Ranker.cpp:204-212) */
  def phraseScore(phraseText: String): S
  def not(a: S): S                                  // 1 − s        (:219-230)
  def and(a: S, b: S): S                            // min          (:241-252)
  def or(a: S, b: S): S                             // max          (:269-281)
  def add(a: S, b: S, wa: Double = 1.0, wb: Double = 1.0): S // w·sum (:254-267)
  def normalize(a: S): S                            // ÷ max        (:283-300)
}

/** Faithful transcription of BM25Ranker::ProcessQuery
  * (/root/reference/source/BM25Ranker.cpp:64-182): the fused shunting-yard
  * parse/eval with its exact quirks —
  *  - precedence by enum value NOT(0) < AND(1) < OR(2); pop while
  *    `stackTop <= incoming` (so equal precedence pops — left-assoc);
  *  - operators pop the PHRASE stack only; bare terms collect on their own
  *    stack and never participate in boolean ops;
  *  - a trailing sentinel `!` (OTHER=5) flushes the operator stack;
  *  - an opening bracket on the stack is popped-and-discarded when any
  *    operator drains past it;
  *  - final combine: each stack folds to
  *    0.4·normalize(Σ) + 0.6·(min over stack); when both stacks are
  *    non-empty the phrase result is boosted ×PHRASE_BOOST, pushed onto
  *    the term stack, combined again, then normalized (:161-175).
  */
object QueryEvaluator {

  def evaluate[S](query: String, alg: ScoreAlgebra[S], params: GraftParams): S = {
    val tokens = QueryLexer.lex(query) :+ QOp("!")
    val opStack = mutable.Stack.empty[Int]
    val phraseStack = mutable.Stack.empty[S]
    val termStack = mutable.Stack.empty[S]

    tokens.foreach {
      case QOp(text) =>
        val currentOp = opCode(text)
        if (opStack.nonEmpty) {
          var op = opStack.top
          var looping = true
          while (looping && op <= currentOp && currentOp != OPEN) {
            opStack.pop()
            if (op == NOT) {
              if (phraseStack.isEmpty) throw new IllegalArgumentException(
                s"NOT requires a quoted-phrase operand in: $query")
              phraseStack.push(alg.not(phraseStack.pop()))
            } else if (op == AND || op == OR) {
              if (phraseStack.size < 2) throw new IllegalArgumentException(
                s"${if (op == AND) "AND" else "OR"} requires two quoted-phrase operands in: $query")
              val o1 = phraseStack.pop(); val o2 = phraseStack.pop()
              phraseStack.push(if (op == AND) alg.and(o1, o2) else alg.or(o1, o2))
            } else {
              looping = false // popped-and-discarded bracket/sentinel
            }
            if (looping) {
              if (opStack.isEmpty) looping = false else op = opStack.top
            }
          }
          if (currentOp != CLOSE) opStack.push(currentOp)
        } else {
          opStack.push(currentOp)
        }
      case QPhrase(text) => phraseStack.push(alg.phraseScore(text))
      case QTerm(text) => termStack.push(alg.termScore(text))
    }

    if (termStack.nonEmpty) stackCombine(termStack, alg, params)
    if (phraseStack.nonEmpty) stackCombine(phraseStack, alg, params)

    if (termStack.isEmpty && phraseStack.isEmpty) alg.empty
    else if (termStack.isEmpty) phraseStack.top
    else if (phraseStack.isEmpty) termStack.top
    else {
      val boosted = alg.add(phraseStack.top, phraseStack.top, params.phraseBoost, 0)
      termStack.push(boosted)
      stackCombine(termStack, alg, params)
      alg.normalize(termStack.top)
    }
  }

  /** documentsStackCombineOperation (BM25Ranker.cpp:183-203). */
  private def stackCombine[S](stack: mutable.Stack[S], alg: ScoreAlgebra[S], params: GraftParams): Unit = {
    var termFrequency = stack.top
    var exactMatch = stack.top
    stack.pop()
    while (stack.nonEmpty) {
      termFrequency = alg.add(termFrequency, stack.top)
      exactMatch = alg.and(exactMatch, stack.top)
      stack.pop()
    }
    termFrequency = alg.normalize(termFrequency)
    stack.push(alg.add(termFrequency, exactMatch,
      params.termFrequencyWeight, params.exactMatchWeight))
  }

  /** getWordsAndPhrasesWeight (BM25Ranker.cpp:521-585) — snippet weights:
    * +1 per positive term/phrase, −5 per NOT'd operand (incl. every operand
    * inside a NOT'd bracket group). Keys are the RAW lexer texts. */
  def wordsAndPhrasesWeights(query: String): Map[String, Int] = {
    val weights = mutable.Map.empty[String, Int]
    val tokens = QueryLexer.lex(query)
    var negative = false
    var i = 0
    while (i < tokens.length) {
      tokens(i) match {
        case QOp(text) =>
          val op = opCode(text)
          if (negative) {
            if (op == OPEN) {
              // mark every operand until the matching-ish CLOSE (no nesting
              // count in the reference either)
              var done = false
              while (!done && i + 1 < tokens.length) {
                i += 1
                tokens(i) match {
                  case QOp(t2) => if (opCode(t2) == CLOSE) done = true
                  case QPhrase(t2) => weights(t2) = -5
                  case QTerm(t2) => weights(t2) = -5
                }
              }
              negative = false
            }
          } else if (op == NOT) negative = true
        case QPhrase(text) =>
          if (negative) { weights(text) = -5; negative = false }
          else weights(text) = 1
        case QTerm(text) =>
          if (negative) { weights(text) = -5; negative = false }
          else weights(text) = 1
      }
      i += 1
    }
    weights.toMap
  }
}
