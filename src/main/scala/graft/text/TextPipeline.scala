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

  // ---- API-parity scalar functions ------------------------------------
  // The reference defines but DISABLES the next two in both index and
  // query paths (WordProcessor.cpp:13,19-22,52-55; InvertedIndex.cpp:139-144;
  // BM25Ranker.cpp:332-340). They are provided for API parity and stay
  // unwired, preserving the reference's observable scoring behavior.

  /** WordProcessor::isValidWord — 3..20 chars (disabled in the pipeline). */
  def isValidWord(word: String): Boolean = word.length >= 3 && word.length <= 20

  private val stopWords: Set[String] = Set(
    "a", "about", "above", "after", "again", "against", "all", "am", "an",
    "and", "any", "are", "as", "at", "be", "because", "been", "before",
    "being", "below", "between", "both", "but", "by", "can", "did", "do",
    "does", "doing", "down", "during", "each", "few", "for", "from",
    "further", "had", "has", "have", "having", "he", "her", "here", "hers",
    "him", "his", "how", "i", "if", "in", "into", "is", "it", "its",
    "itself", "just", "me", "more", "most", "my", "myself", "no", "nor",
    "not", "now", "of", "off", "on", "once", "only", "or", "other", "our",
    "ours", "out", "over", "own", "same", "she", "should", "so", "some",
    "such", "than", "that", "the", "their", "theirs", "them", "then",
    "there", "these", "they", "this", "those", "through", "to", "too",
    "under", "until", "up", "very", "was", "we", "were", "what", "when",
    "where", "which", "while", "who", "whom", "why", "will", "with", "you",
    "your", "yours")

  /** WordProcessor::isStopWord — membership test (disabled in the
    * pipeline: "stop words will complicate phrase search"). */
  def isStopWord(word: String): Boolean = stopWords.contains(word)

  /** WordProcessor::isQuotedPhrase (WordProcessor.cpp:67-74). */
  def isQuotedPhrase(text: String): Boolean =
    text.nonEmpty && text.head == '"' && text.last == '"'

  /** WordProcessor::normalizeQuotedPhrase — strip nested surrounding
    * quotes (WordProcessor.cpp:57-65). */
  def normalizeQuotedPhrase(text: String): String = {
    var r = text
    while (isQuotedPhrase(r))
      r = if (r.length <= 1) "" else r.substring(1, r.length - 1)
    r
  }

  /** WordProcessor::cleanSnippet — drop \n\r\t, collapse runs of spaces
    * (WordProcessor.cpp:143-153). */
  def cleanSnippet(snippet: String): String = {
    val noCtl = snippet.filterNot(c => c == '\n' || c == '\r' || c == '\t')
    val sb = new StringBuilder(noCtl.length)
    var prevSpace = false
    noCtl.foreach { c =>
      if (c != ' ' || !prevSpace) sb.append(c)
      prevSpace = c == ' '
    }
    sb.toString
  }

  /** WordProcessor::splitStringBySpace (WordProcessor.cpp:154-162) —
    * istream>> semantics: split on any whitespace, drop empties. */
  def splitStringBySpace(s: String): Vector[String] =
    s.split("\\s+").iterator.filter(_.nonEmpty).toVector
}
