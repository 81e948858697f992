package graft.query

import java.util.regex.Pattern

/** Query lexer — same combined pattern as the reference
  * (/root/reference/source/PhraseTypes.cpp:4-7, WordProcessor.cpp:76-115):
  *
  *   (\"{1,})(.*?)\1 | (AND|OR|NOT|\(|\)) | ([^\s"]+)     (case-insensitive)
  *
  * Ordered alternation is faithful, including its quirks: `android` lexes
  * as operator `AND` + term `roid`; nested quotes `""x""` capture `x` via
  * the backreference. Java regex shares ECMAScript's leftmost/ordered
  * alternation semantics, so the same pattern reproduces the token stream.
  */
object QueryLexer {

  sealed trait QToken
  final case class QPhrase(text: String) extends QToken
  final case class QOp(text: String) extends QToken
  final case class QTerm(text: String) extends QToken

  // LogicalOperation enum values define operator precedence in the
  // reference's fused parse/eval loop (PhraseTypes.h:15-22).
  final val NOT = 0
  final val AND = 1
  final val OR = 2
  final val OPEN = 3
  final val CLOSE = 4
  final val OTHER = 5

  private val pattern = Pattern.compile(
    "(\"{1,})(.*?)\\1|(AND|OR|NOT|\\(|\\))|([^\\s\"]+)",
    Pattern.CASE_INSENSITIVE)

  def lex(query: String): Vector[QToken] = {
    val out = Vector.newBuilder[QToken]
    val m = pattern.matcher(query)
    while (m.find()) {
      if (m.group(2) != null) out += QPhrase(m.group(2))
      else if (m.group(3) != null) out += QOp(m.group(3))
      else if (m.group(4) != null) out += QTerm(m.group(4))
    }
    out.result()
  }

  /** GetLogicalOperation (PhraseTypes.cpp:9-22): whole-string icase match. */
  def opCode(s: String): Int = s.toLowerCase match {
    case "and" => AND
    case "or" => OR
    case "not" => NOT
    case "(" => OPEN
    case ")" => CLOSE
    case _ => OTHER
  }
}
