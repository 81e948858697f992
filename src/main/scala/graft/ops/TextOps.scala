package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, all
  * pure Catalyst column expressions (codegen'd, no UDF in the scan path).
  * Each has a DuckDB-expressible twin in SparkEntry.oracleSql.
  */
object TextOps {

  /** Whitespace token count + word-ish token count (BPE-ish regex runs). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(col("text"), " ", -1)).as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[A-Za-z0-9]+"), lit(0))).as("word_tokens"),
      length(col("text")).as("n_chars_computed"))
      .orderBy(col("doc_id"))

  /** Quality signals: length, word count, punctuation / digit / upper
    * ratios, mean word length — the usual pre-training quality features. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val len = length(col("text")).cast("double")
    val words = size(regexp_extract_all(col("text"), lit("[A-Za-z0-9]+"), lit(0))).cast("double")
    val punct = size(regexp_extract_all(col("text"), lit("""[!-/:-@\[-`{-~]"""), lit(0))).cast("double")
    val digits = size(regexp_extract_all(col("text"), lit("[0-9]"), lit(0))).cast("double")
    val uppers = size(regexp_extract_all(col("text"), lit("[A-Z]"), lit(0))).cast("double")
    docs.select(
      col("doc_id"),
      len.cast("long").as("n_chars"),
      words.cast("long").as("n_words"),
      when(len > 0, punct / len).otherwise(lit(0.0)).as("punct_ratio"),
      when(len > 0, digits / len).otherwise(lit(0.0)).as("digit_ratio"),
      when(len > 0, uppers / len).otherwise(lit(0.0)).as("upper_ratio"),
      when(words > 0, len / words).otherwise(lit(0.0)).as("chars_per_word"))
      .orderBy(col("doc_id"))
  }

  private[ops] val StopWords = Seq("the", "and", "of", "to", "in", "is", "it",
    "that", "for", "was", "with", "are", "this", "you")

  /** Language-ID heuristic: English stop-word hit ratio over word tokens.
    * A real pipeline would use char-n-gram profiles; the heuristic is the
    * n-gram-free SQL-expressible baseline. ONE regex tokenize pass + a
    * codegen'd array filter (round 2 ran a second 14-way \b-alternation
    * regex over the text for the stop-word count — the regex scan, not the
    * membership test, is the hot part of this operator). */
  def langId(docs: DataFrame, threshold: Double = 0.08): DataFrame = {
    val stops = lit(StopWords.toArray)
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    docs.select(col("doc_id"), toks.as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("double").as("words"),
        size(filter(col("toks"), t => array_contains(stops, t))).cast("double").as("hits"))
      .select(
        col("doc_id"),
        when(col("words") > 0, col("hits") / col("words")).otherwise(lit(0.0)).as("stopword_ratio"))
      .select(
        col("doc_id"),
        col("stopword_ratio"),
        when(col("stopword_ratio") >= threshold, lit("en")).otherwise(lit("unknown")).as("lang_pred"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprint: md5 over the sorted distinct lowercase word set
    * — an order-insensitive content fingerprint for near-dup bucketing. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(concat_ws(" ", array_sort(array_distinct(
        regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))))).as("fingerprint"))
      .orderBy(col("doc_id"))

  /** Deterministic train/val/test split + shard assignment — the step a
    * training pipeline ends with. The bucket is a salt-keyed md5 of the
    * doc id (15 hex chars = 60 bits, always positive), so the split is
    * stable under reruns, subsets, and incremental appends: a document's
    * split NEVER depends on what else is in the corpus. The shard uses an
    * independent salt so shards are uncorrelated with splits. Pure
    * Catalyst (codegen'd md5), no shuffle — per-row arithmetic only;
    * writers can `partitionBy("split", "shard")` downstream. */
  def splitAssign(
      docs: DataFrame,
      trainPerMille: Int = 900,
      valPerMille: Int = 50,
      nShards: Int = 8,
      salt: String = "graft"): DataFrame = {
    def h(tag: String): Column =
      conv(substring(md5(concat_ws(":", lit(salt), lit(tag),
        col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")
    docs.select(col("doc_id"), (h("split") % 1000).cast("int").as("bucket"))
      .select(
        col("doc_id"),
        col("bucket"),
        when(col("bucket") < trainPerMille, lit("train"))
          .when(col("bucket") < trainPerMille + valPerMille, lit("val"))
          .otherwise(lit("test")).as("split"))
      .withColumn("shard", (h("shard") % nShards).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** Distinct lowercase token n-grams of `textCol` (space-joined), the unit
    * of benchmark-decontamination overlap. Documents shorter than n tokens
    * contribute their whole token sequence as one gram (so short benchmark
    * items still participate); empty documents contribute nothing. */
  private[ops] def tokenNgrams(textCol: Column, n: Int): Column = {
    val toks = regexp_extract_all(lower(textCol), lit("[a-z0-9]+"), lit(0))
    when(size(toks) === 0, array().cast("array<string>"))
      .when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** Benchmark decontamination: flag corpus documents that share any token
    * n-gram with a benchmark (held-out eval) set — the standard pre-training
    * hygiene step (GPT-3-style 8..13-gram overlap). Returns one row per
    * contaminated corpus document: `(doc_id, n_shared)` where `n_shared` is
    * the number of DISTINCT n-grams of the document that occur anywhere in
    * the benchmark.
    *
    * Scale shape: benchmark n-grams are distinct'd and BROADCAST (eval sets
    * are small by nature — millions of grams, not billions), so the corpus
    * side is ONE linear codegen'd pass (tokenize → gram transform → explode
    * → broadcast hash semi-probe) with a map-side-combined count; no
    * corpus-sized shuffle, no benchmark re-scan per partition. At 100 TB the
    * cost is the document scan itself. */
  def contamination(corpus: DataFrame, benchmark: DataFrame, n: Int = 8): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val bench = benchmark.select(explode(tokenNgrams(col("text"), n)).as("gram")).distinct()
    corpus.select(col("doc_id"), explode(tokenNgrams(col("text"), n)).as("gram"))
      .join(broadcast(bench), "gram")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  /** Largest multiplicity of any element in `arr`: sort the array in-row,
    * then fold the longest equal-run. O(d log d) per row, shuffle-free —
    * the per-document statistic never leaves its row, so the operator
    * scales as a pure map over the corpus (vs the naive explode → groupBy
    * (doc, gram) → max(doc) double shuffle). */
  private[ops] def maxMultiplicity(arr: Column): Column =
    aggregate(
      array_sort(arr),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Gopher-style repetition filter: per-document repetition signals over
    * word tokens — type/token ratio, most-frequent-token fraction,
    * most-frequent-bigram fraction — and a keep/drop verdict. (The
    * line-based Gopher rules degrade to these on single-line documents.)
    * All in-row Catalyst (one tokenize pass, sorted-run folds), no shuffle:
    * at 100 TB this is a pure map stage a writer can fuse with quality /
    * langId filters (cf. Pipeline.trainingCorpus). */
  def repetitionFilter(
      docs: DataFrame,
      maxTopBigramFrac: Double = 0.1,
      minDistinctRatio: Double = 0.3): DataFrame = {
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    val bigrams = when(size(col("toks")) < 2, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => concat_ws(" ", slice(col("toks"), i, lit(2)))))
    docs.select(col("doc_id"), toks.as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("double").as("n_distinct"),
        maxMultiplicity(col("toks")).cast("double").as("top_tok"),
        maxMultiplicity(bigrams).cast("double").as("top_bigram"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        when(col("n_tokens") > 0, col("n_distinct") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)).as("distinct_ratio"),
        when(col("n_tokens") > 0, col("top_tok") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)).as("top_token_frac"),
        when(col("n_tokens") > 1, col("top_bigram") / (col("n_tokens") - 1).cast("double"))
          .otherwise(lit(0.0)).as("top_bigram_frac"))
      .withColumn("verdict",
        when(col("top_bigram_frac") > maxTopBigramFrac ||
          col("distinct_ratio") < minDistinctRatio, lit("repetitive"))
          .otherwise(lit("ok")))
      .orderBy(col("doc_id"))
  }

  /** Rolling polynomial hash (Rabin-Karp style) over word tokens — the
    * positional fingerprint (not SQL-expressible; ScalaTest-verified). */
  def rollingHash(tokens: Seq[String], window: Int = 8): Seq[Long] = {
    val B = 1000000007L
    val hashes = tokens.map(t => t.hashCode.toLong & 0x7fffffffL)
    if (hashes.length < window) {
      if (hashes.isEmpty) Seq.empty
      else Seq(hashes.foldLeft(0L)((acc, h) => (acc * B + h) & 0x7fffffffffffffL))
    } else hashes.sliding(window).map(
      _.foldLeft(0L)((acc, h) => (acc * B + h) & 0x7fffffffffffffL)).toSeq
  }
}
