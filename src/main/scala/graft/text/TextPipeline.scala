package graft.text

/** Tokenize → normalize → stem pipeline, faithful to the reference:
  *
  *  - tokenize: ECMAScript regex `\b[\w'-]+\b` over the raw string
  *    (/root/reference/source/WordProcessor.cpp:3-17). `\w`/`\b` are
  *    ASCII-only in C-locale std::regex, which matches java.util.regex's
  *    default (non-UNICODE_CHARACTER_CLASS) semantics, so the same pattern
  *    yields the same tokens.
  *  - normalize: byte-wise `::tolower` (ASCII A-Z only in the C locale)
  *    then strip `::ispunct` chars (the 32 ASCII punctuation bytes)
  *    (/root/reference/source/WordProcessor.cpp:24-30). Tokens only contain
  *    [A-Za-z0-9_'-], so in practice this lowercases and strips `_ ' -`.
  *  - stem: Porter2 (WordProcessor.cpp:32-50).
  *
  * Reference invariants preserved (SURVEY.md §1.3):
  *  - stop words are NOT removed and the 3..20-length filter stays disabled;
  *  - a position is the token's index in the RAW token vector — tokens that
  *    normalize to empty (e.g. "__") still consume a position;
  *  - doc_length is the RAW token count;
  *  - empty normalized tokens are dropped from the index (the reference
  *    drops term "" at persist time, DataBase.cpp:36-39).
  */
object TextPipeline extends Serializable {

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'
  @inline private def isTokenChar(c: Char): Boolean =
    isWordChar(c) || c == '\'' || c == '-'

  /** Raw tokens, exactly as the reference's WordProcessor::tokenize.
    *
    * The C++ `\b[\w'-]+\b` under C-locale std::regex is ASCII-byte-wise:
    * a match is a maximal run of [A-Za-z0-9_'-] trimmed so it starts and
    * ends on a `\w` char (the greedy match + `\b` backtracking). Java's
    * `\b` is Unicode-aware (é counts as a word char), so we scan manually
    * to stay byte-faithful — it is also faster than java.util.regex.
    */
  def tokenize(content: String): Array[String] = {
    if (content == null || content.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = content.length
    var i = 0
    while (i < n) {
      while (i < n && !isTokenChar(content.charAt(i))) i += 1
      var j = i
      while (j < n && isTokenChar(content.charAt(j))) j += 1
      // trim run [i, j) to first/last \w char
      var s = i
      while (s < j && !isWordChar(content.charAt(s))) s += 1
      var e = j
      while (e > s && !isWordChar(content.charAt(e - 1))) e -= 1
      if (e > s) out += content.substring(s, e)
      i = j
    }
    out.toArray
  }

  /** ASCII-only lowercase + strip C-locale punct (reference normalize). */
  def normalize(token: String): String = {
    val sb = new StringBuilder(token.length)
    var i = 0
    while (i < token.length) {
      var c = token.charAt(i)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
      val isPunct = (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
        (c >= '[' && c <= '`') || (c >= '{' && c <= '~')
      if (!isPunct) sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** normalize + stem of one raw token. Empty result = positional ghost. */
  @inline def term(rawToken: String): String =
    Porter2Stemmer.stem(normalize(rawToken))

  /** One indexed document in a single pass.
    *
    * @return (rawTokenCount = doc_length,
    *          terms: (term -> sorted raw positions), empties dropped)
    */
  def analyze(text: String): (Int, scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.ArrayBuffer[Int]]) = {
    val tokens = tokenize(text)
    val map = scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.ArrayBuffer[Int]]
    var i = 0
    while (i < tokens.length) {
      val t = term(tokens(i))
      if (t.nonEmpty)
        map.getOrElseUpdate(t, scala.collection.mutable.ArrayBuffer.empty[Int]) += i
      i += 1
    }
    (tokens.length, map)
  }

  /** Query-side tokenization (BM25Ranker::tokenizeQuery): tokenize,
    * normalize, stem, drop empties — order preserved, duplicates kept. */
  def tokenizeQuery(text: String): Vector[String] =
    tokenize(text).iterator.map(term).filter(_.nonEmpty).toVector
}
