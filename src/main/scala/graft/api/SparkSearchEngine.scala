package graft.api

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftParams
import graft.build.Tables
import graft.model.{IndexStats, SearchHit}
import graft.query._
import graft.store.TableIO
import graft.text.TextPipeline

/** Distributed BM25 search over the index tables.
  *
  * The reference loads the whole index into driver memory and scores dense
  * per-corpus vectors (/root/reference/source/BM25Ranker.cpp:26-30,311-319).
  * Here a score vector is a sparse (docId, score) DataFrame plus the score
  * every absent doc implicitly holds (`default`) — an exact, lazy encoding
  * of the dense algebra: NOT flips the default to 1−d instead of
  * materializing 10^12 rows; only the final top-k pass densifies, and only
  * when the default can still reach the result set.
  *
  * Everything stays one lazy Catalyst plan until top-k: per-term df and the
  * max-normalization constants are broadcast 1-row aggregates
  * (crossJoin(broadcast(agg))) instead of driver actions, so a term query
  * is a single job over a term-pruned scan of the (term, docId)-sorted
  * postings table — parquet min/max on `term` makes that a near-point read.
  * No UDF in the scoring path. The only eager case is re-normalizing a
  * vector whose absent-doc default is nonzero (i.e. under NOT), where the
  * new default is data-dependent.
  */
final class SparkSearchEngine(
    spark: SparkSession,
    io: TableIO,
    val params: GraftParams = GraftParams()) {
  import spark.implicits._

  // refuse a warehouse whose block layout this engine cannot decode
  graft.build.FormatGuard.check(spark, io, "SparkSearchEngine")

  lazy val stats: IndexStats = {
    val r = io.read(Tables.Stats).as[(Long, Double)].head()
    IndexStats(r._1, r._2)
  }

  /** Un-compacted tombstones (IndexBuilder.deleteDocs), applied by every
    * query path; None on the common never-deleted path — the exists()
    * check is one file stat, and the plans below are byte-identical to
    * the pre-deletes engine when it returns None. Engine-lifetime
    * snapshot, like every other table here: re-open the engine after a
    * maintenance op (delete/compact/incremental append). */
  private lazy val deletes: Option[DataFrame] =
    if (io.exists(Tables.Deletes)) Some(io.read(Tables.Deletes).select($"docId"))
    else None
  private def minusDeleted(df: DataFrame): DataFrame =
    deletes.fold(df)(d => df.join(broadcast(d), Seq("docId"), "left_anti"))
  private lazy val postings = minusDeleted(io.read(Tables.Postings))
  private lazy val dict = minusDeleted(io.read(Tables.DocDict))

  /** Exact deleted-id skip set for the WAND kernels (a Bloom filter's
    * false positive would drop a LIVE doc — unacceptable, unlike the
    * phrase prefilter where FPs fold to tf=0). Collected once per engine;
    * bounded by `params.maxDeletedIdsInMemory`, past which the warehouse
    * needs a compact() before block-index queries. */
  private lazy val deletedIdsSorted: Option[Array[Long]] = deletes.map { d =>
    val arr = d.limit(params.maxDeletedIdsInMemory + 1).as[Long].collect()
    if (arr.length > params.maxDeletedIdsInMemory) throw new IllegalStateException(
      s"more than ${params.maxDeletedIdsInMemory} tombstoned docs — run " +
        "IndexBuilder.compact() to purge them (or raise maxDeletedIdsInMemory)")
    java.util.Arrays.sort(arr)
    arr
  }
  /** (broadcast handle, executor-side membership test) for the kernels. */
  private lazy val deletedBroadcast
      : Option[org.apache.spark.broadcast.Broadcast[Array[Long]]] =
    deletedIdsSorted.map(spark.sparkContext.broadcast(_))
  /** NOTE: must be resolved to a local `val` BEFORE entering a
    * mapPartitions closure — invoking this instance method inside one
    * captures the (non-serializable) engine itself. The returned lambdas
    * capture only the broadcast handle. */
  private def deletedFn(
      b: Option[org.apache.spark.broadcast.Broadcast[Array[Long]]]): Long => Boolean =
    b match {
      case Some(bc) =>
        id => java.util.Arrays.binarySearch(bc.value, id) >= 0
      case None => _ => false
    }

  /** Per-term tombstone df deltas (sum across delete batches) for the
    * paths that derive df from block metadata instead of filtered rows. */
  private def termDeltas(keys: Seq[String]): Map[String, Long] =
    if (deletes.isEmpty || !io.exists(Tables.DeletedTermDf)) Map.empty
    else io.read(Tables.DeletedTermDf).filter($"term".isin(keys: _*))
      .groupBy($"term").agg(sum($"delta").as("d"))
      .as[(String, Long)].collect().toMap

  /** sparse frame (docId: Long, score: Double) + implicit default score */
  final case class Scores(df: DataFrame, default: Double)

  private def emptyFrame: DataFrame =
    spark.emptyDataset[(Long, Double)].toDF("docId", "score")

  /** The df-only BM25 factor (Catalyst log = StrictMath.log, matching the
    * oracle and the WAND path). Strictly positive for every df ≤ N. */
  private def idfCol(dfCount: Column): Column = {
    val n = stats.total_docs.toDouble
    log(((lit(n) - dfCount) + lit(0.5)) / (dfCount + lit(0.5)) + lit(1.0))
  }

  /** The per-posting BM25 factor (everything but idf) — monotone in tf and
    * doc_len, independent of df. */
  private def tfPartCol(tf: Column, dl: Column): Column = {
    val docNorm = lit(1 - params.b) + lit(params.b) * (dl.cast("double") / lit(stats.avg_doc_len))
    val tfD = tf.cast("double")
    (tfD * lit(params.k1 + 1)) / (tfD + lit(params.k1) * docNorm)
  }

  /** BM25 with df as a column — identical operation order to the oracle
    * (BM25Ranker.cpp:431-437) so scores are bit-identical, not just close. */
  private def bm25Col(tf: Column, dl: Column, dfCount: Column): Column =
    idfCol(dfCount) * tfPartCol(tf, dl)

  /** Lazy max-normalize: max over the conceptually-dense vector as a
    * broadcast scalar aggregate. The default only competes when some doc
    * is absent from the sparse frame. Falls back to one eager aggregate
    * when the (rare, NOT-produced) nonzero default must itself rescale. */
  private def maxNormalize(s: Scores): Scores = {
    if (s.default == 0.0) {
      val m = s.df.agg(max($"score").as("mx"), count(lit(1)).as("cnt"))
      val trueMax = when($"cnt" >= lit(stats.total_docs), coalesce($"mx", lit(0.0)))
        .otherwise(greatest(coalesce($"mx", lit(0.0)), lit(0.0)))
      val norm = s.df.crossJoin(broadcast(m))
        .select($"docId",
          when(trueMax > 0, $"score" / trueMax).otherwise($"score").as("score"))
      Scores(norm, 0.0)
    } else {
      val (mx, cnt) = s.df.agg(max($"score"), count(lit(1))).as[(Option[Double], Long)].head()
      val sparseMax = mx.getOrElse(0.0)
      val trueMax = if (cnt >= stats.total_docs) sparseMax else math.max(sparseMax, s.default)
      if (trueMax > 0)
        Scores(s.df.select($"docId", ($"score" / lit(trueMax)).as("score")), s.default / trueMax)
      else s
    }
  }

  /** Frames cached by algebra evaluation, released once a top-k
    * materializes — without this a long-lived session leaks cached frames
    * until LRU eviction. The engine is single-query-at-a-time (like the
    * reference's server); concurrent evaluations would release each
    * other's caches early (correct, just slower). */
  private val liveCaches = new scala.collection.mutable.ArrayBuffer[DataFrame]
  private def track(df: DataFrame): DataFrame =
    liveCaches.synchronized { liveCaches += df; df }

  /** Unpersist every frame cached by evaluation since the last release.
    * Called by topK/search after collecting; safe to call any time (held
    * Scores recompute lazily if re-used). */
  def releaseCaches(): Unit = liveCaches.synchronized {
    liveCaches.foreach(_.unpersist(false)); liveCaches.clear()
  }

  /** Map-side candidate prefilter for the phrase fold. Phrase tf can be
    * nonzero ONLY for docs containing the FIRST stem: `PhraseMatch.phraseTf`
    * returns 0 when `stems.head` is absent, while every LATER missing stem
    * is skip-folded (the reference's stale-postings quirk,
    * BM25Ranker.cpp:439-491) — so the head stem is the one necessary
    * condition a prefilter may use. When the head stems' df is big enough
    * AND selective enough to pay for the Bloom build + per-row test
    * (df(head) ≤ maxRatio·Σdf — measured 0.76–0.87× when head df was
    * ~40% of the shuffle), broadcast a Bloom filter of their docIds and
    * drop non-candidate postings BEFORE the docId shuffle: the shuffle
    * falls from Σ df(all stems) to ≈ df(head) rows. False positives are
    * harmless (they fold to tf=0 and are filtered), so results are
    * bit-identical at any fpp; the filter is pure plan surgery, the fold
    * is untouched. On corpora smaller than the minDf threshold the df
    * lookup itself is skipped — zero extra jobs on the common path. */
  private def headDocFilter(heads: Seq[String], allStems: Seq[String]): Option[Column] = {
    if (stats.total_docs < params.phrasePrefilterMinDf) return None // no job
    val dfByTerm = io.read(Tables.Blocks)
      .filter($"term".isin(allStems.distinct: _*))
      .groupBy($"term").agg(sum($"n_docs").as("df"))
      .as[(String, Long)].collect().toMap
    val dfHead = heads.distinct.map(dfByTerm.getOrElse(_, 0L)).sum
    val dfAll = allStems.distinct.map(dfByTerm.getOrElse(_, 0L)).sum
    // gate on what the filter SAVES (the Σdf shuffle) and on selectivity
    // (df(head)/Σdf) — NOT on df(head) being large: the canonical win is
    // a rare head against a stop-word-class tail stem, where df(head) is
    // tiny and the saved shuffle is nearly all of Σdf
    if (dfAll < params.phrasePrefilterMinDf ||
      dfHead > dfAll * params.phrasePrefilterMaxRatio) None
    else {
      val bf = postings.filter($"term".isin(heads: _*)).select($"docId")
        .stat.bloomFilter("docId", math.max(dfHead, 1L), 0.01)
      val bBf = spark.sparkContext.broadcast(bf)
      val mightContain = udf((id: Long) => bBf.value.mightContain(id))
      Some(mightContain($"docId"))
    }
  }

  object Algebra extends ScoreAlgebra[Scores] {
    /** Every op output is cached: the evaluator reuses operands in several
      * branches (stackCombine feeds each stack element into both the Σ and
      * the min chain; normalize reads its input twice — aggregate + body),
      * and without materialization the nested plans re-evaluate
      * exponentially. This is the sparse analogue of the reference
      * materializing every op as a dense map (BM25Ranker.cpp:241-300);
      * frames are query-sized and released after top-k (see liveCaches). */
    private def cached(s: Scores): Scores = Scores(track(s.df.cache()), s.default)

    override def empty: Scores = Scores(emptyFrame, 0.0)

    override def termScore(rawTerm: String): Scores = {
      val key = if (params.stemBareTerms) TextPipeline.term(rawTerm) else rawTerm
      val rows = postings.filter($"term" === key)
      val dfAgg = rows.agg(count(lit(1)).cast("double").as("df_count"))
      val scored = rows.crossJoin(broadcast(dfAgg))
        .select($"docId", bm25Col($"tf", $"doc_len", $"df_count").as("score"))
      cached(maxNormalize(Scores(scored, 0.0)))
    }

    override def phraseScore(phraseText: String): Scores = {
      val stems = TextPipeline.tokenizeQuery(phraseText)
      if (stems.isEmpty) return empty
      val base = postings.filter($"term".isin(stems.distinct: _*))
      val rows = headDocFilter(Seq(stems.head), stems).fold(base)(base.filter)
        .select($"docId", $"doc_len", $"term", $"positions_vb")
      // one shuffle on docId (alone — so downstream docId joins can reuse
      // the partitioning); the positional fold is doc-local. Cached because
      // both the df-count aggregate and the scores read it.
      val perDoc = rows
        .groupBy($"docId")
        .agg(first($"doc_len").as("doc_len"), // constant per doc
          collect_list(struct($"term", $"positions_vb")).as("tp"))
        .as[(Long, Int, Seq[(String, Array[Byte])])]
      val tfs = perDoc.map { case (docId, dl, tp) =>
        val termPos = tp.iterator.map { case (t, vb) =>
          t -> graft.codec.VarByte.decodePositions(vb).toSeq
        }.toMap
        (docId, dl, PhraseMatch.phraseTf(stems, termPos))
      }.filter(_._3 > 0).toDF("docId", "doc_len", "tf")
      val tfsC = track(tfs.cache())
      val dfAgg = tfsC.agg(count(lit(1)).cast("double").as("df_count"))
      val scored = tfsC.crossJoin(broadcast(dfAgg))
        .select($"docId", bm25Col($"tf", $"doc_len", $"df_count").as("score"))
      cached(maxNormalize(Scores(scored, 0.0)))
    }

    override def not(a: Scores): Scores =
      cached(Scores(a.df.select($"docId", (lit(1.0) - $"score").as("score")), 1.0 - a.default))

    private def combine(a: Scores, b: Scores, f: (Column, Column) => Column, d: Double): Scores = {
      val l = a.df.select($"docId", $"score".as("s1"))
      val r = b.df.select($"docId", $"score".as("s2"))
      val j = l.join(r, Seq("docId"), "full_outer").select($"docId",
        f(coalesce($"s1", lit(a.default)), coalesce($"s2", lit(b.default))).as("score"))
      cached(Scores(j, d))
    }

    override def and(a: Scores, b: Scores): Scores =
      combine(a, b, least(_, _), math.min(a.default, b.default))
    override def or(a: Scores, b: Scores): Scores =
      combine(a, b, greatest(_, _), math.max(a.default, b.default))
    override def add(a: Scores, b: Scores, wa: Double, wb: Double): Scores =
      combine(a, b, (x, y) => lit(wa) * x + lit(wb) * y, wa * a.default + wb * b.default)
    override def normalize(a: Scores): Scores = cached(maxNormalize(a))
  }

  /** Evaluate a query to its (still lazy/sparse) score vector. */
  def scores(query: String): Scores =
    QueryEvaluator.evaluate(query, Algebra, params)

  /** Driver-side algebra over sparse (map, default) vectors — operand
    * FETCH is a distributed term-pruned scan + fold (that's where 10^12
    * docs matter), but once an operand fits on the driver the boolean
    * algebra is pure arithmetic; paying a Spark stage per min/max would be
    * all scheduling overhead. Bails out (TooBig) when any operand exceeds
    * `params.driverAlgebraMaxDocs`, falling back to the distributed
    * algebra. Identical operation order → bit-identical scores (tested).
    */
  final class TooBigForDriver extends RuntimeException
  type DScores = (scala.collection.Map[Long, Double], Double)

  /** Scalar sparse-vector algebra with a PLUGGABLE operand fetch: the
    * per-query path fetches each atom's rows with its own distributed
    * scan; the bulk path (`searchManyAuto`) prefetches every atom of the
    * whole batch in shared scans and hands the rows over from a map.
    * Everything after fetch is the same code, so the two paths are
    * bit-identical by construction. Fetchers throw TooBigForDriver when
    * an operand exceeds `driverAlgebraMaxDocs`. */
  private final class DriverScalarAlgebra(
      fetchTermRows: String => Array[(Long, Int, Int)], // post-stem key → (docId, tf, doc_len)
      fetchPhraseRows: Vector[String] => Array[(Long, Int, Int)])
    extends ScoreAlgebra[DScores] {

    private val limit = params.driverAlgebraMaxDocs

    private def bm25(tf: Double, dl: Double, dfCount: Double): Double = {
      val n = stats.total_docs.toDouble
      val idf = StrictMath.log(((n - dfCount) + 0.5) / (dfCount + 0.5) + 1.0)
      val docNorm = (1 - params.b) + params.b * (dl / stats.avg_doc_len)
      idf * ((tf * (params.k1 + 1)) / (tf + params.k1 * docNorm))
    }

    private def scoreRows(rows: Array[(Long, Int, Int)]): DScores = {
      val dfCount = rows.length.toDouble
      var mx = 0.0
      val m = new scala.collection.mutable.HashMap[Long, Double]()
      rows.foreach { case (d, tf, dl) =>
        val s = bm25(tf.toDouble, dl.toDouble, dfCount)
        if (s > mx) mx = s
        m(d) = s
      }
      val trueMax = if (m.size >= stats.total_docs) mx else math.max(mx, 0.0)
      if (trueMax > 0) (m.map { case (d, s) => d -> s / trueMax }, 0.0)
      else (m, 0.0)
    }

    override def empty: DScores = (Map.empty[Long, Double], 0.0)

    override def termScore(rawTerm: String): DScores = {
      val key = if (params.stemBareTerms) TextPipeline.term(rawTerm) else rawTerm
      scoreRows(fetchTermRows(key))
    }

    override def phraseScore(phraseText: String): DScores = {
      val stems = TextPipeline.tokenizeQuery(phraseText)
      if (stems.isEmpty) return empty
      scoreRows(fetchPhraseRows(stems))
    }

    override def not(a: DScores): DScores =
      (a._1.map { case (d, s) => d -> (1 - s) }, 1.0 - a._2)

    private def merge(a: DScores, b: DScores, f: (Double, Double) => Double, d: Double): DScores = {
      val keys = a._1.keySet ++ b._1.keySet
      if (keys.size > limit) throw new TooBigForDriver
      (keys.iterator.map { k =>
        k -> f(a._1.getOrElse(k, a._2), b._1.getOrElse(k, b._2))
      }.toMap, d)
    }

    override def and(a: DScores, b: DScores): DScores =
      merge(a, b, math.min, math.min(a._2, b._2))
    override def or(a: DScores, b: DScores): DScores =
      merge(a, b, math.max, math.max(a._2, b._2))
    override def add(a: DScores, b: DScores, wa: Double, wb: Double): DScores =
      merge(a, b, (x, y) => wa * x + wb * y, wa * a._2 + wb * b._2)

    override def normalize(a: DScores): DScores = {
      var mx = 0.0
      a._1.valuesIterator.foreach(v => if (v > mx) mx = v)
      val trueMax = if (a._1.size >= stats.total_docs) mx else math.max(mx, a._2)
      if (trueMax > 0) (a._1.map { case (d, s) => d -> s / trueMax }, a._2 / trueMax)
      else a
    }
  }

  private def fetchLimited(df: DataFrame): Array[(Long, Int, Int)] = {
    val rows = df.limit(params.driverAlgebraMaxDocs + 1).as[(Long, Int, Int)].collect()
    if (rows.length > params.driverAlgebraMaxDocs) throw new TooBigForDriver
    rows
  }

  /** The per-phrase positional-fold frame (docId, doc_len, tf) — shared by
    * the distributed per-query fetch below and Algebra.phraseScore's shape. */
  private def phraseTfRows(stems: Vector[String]): Array[(Long, Int, Int)] = {
    val base = postings.filter($"term".isin(stems.distinct: _*))
    val rows = headDocFilter(Seq(stems.head), stems).fold(base)(base.filter)
      .select($"docId", $"doc_len", $"term", $"positions_vb")
    val tfs = rows
      .groupBy($"docId")
      .agg(first($"doc_len").as("doc_len"),
        collect_list(struct($"term", $"positions_vb")).as("tp"))
      .as[(Long, Int, Seq[(String, Array[Byte])])]
      .map { case (docId, dl, tp) =>
        val termPos = tp.iterator.map { case (t, vb) =>
          t -> graft.codec.VarByte.decodePositions(vb).toSeq
        }.toMap
        (docId, dl, PhraseMatch.phraseTf(stems, termPos))
      }.filter(_._3 > 0)
      .toDF("docId", "doc_len", "tf")
    fetchLimited(tfs.select($"docId", $"tf", $"doc_len"))
  }

  /** Per-query driver algebra: one distributed scan per atom. */
  private lazy val DriverAlgebra: ScoreAlgebra[DScores] = new DriverScalarAlgebra(
    key => fetchLimited(postings.filter($"term" === key)
      .select($"docId", $"tf", $"doc_len")),
    stems => phraseTfRows(stems))

  /** The top-k tail over a driver-side sparse vector: accuracy filter,
    * (score desc, docId asc) order, dense fill with absent docs when the
    * default can still qualify. */
  private def driverTopK(
      m: scala.collection.Map[Long, Double],
      default: Double,
      accuracy: Double,
      k: Int): Vector[(Long, Double)] = {
    val sparseTop = m.toVector.filter(_._2 >= accuracy)
      .sortBy { case (d, s) => (-s, d) }.take(k)
    val needFill = default >= accuracy &&
      (sparseTop.length < k || sparseTop.last._2 <= default)
    if (!needFill) sparseTop
    else {
      val present = m.keySet
      val absentSrc =
        if (present.size <= 10000)
          dict.select($"docId").filter(!$"docId".isin(present.toSeq: _*))
        else
          dict.select($"docId").join(
            spark.createDataset(present.toSeq).toDF("docId"),
            Seq("docId"), "left_anti")
      val absent = absentSrc.orderBy($"docId".asc).limit(k)
        .as[Long].collect().toVector.map(d => (d, default))
      (sparseTop ++ absent).sortBy { case (d, sc) => (-sc, d) }.take(k)
    }
  }

  /** Driver-algebra top-k; None when an operand is too big for the driver. */
  def topKDriver(query: String, accuracy: Double, k: Int): Option[Vector[(Long, Double)]] =
    try {
      val (m, default) = QueryEvaluator.evaluate(query, DriverAlgebra, params)
      Some(driverTopK(m, default, accuracy, k))
    } catch { case _: TooBigForDriver => None }

  /** Dense ONE-SHUFFLE evaluator for arbitrary boolean/mixed queries — the
    * beyond-driver-sized path (round-3/4 carried item). The `Scores`
    * algebra pays a full_outer shuffle join per operator plus a cache and
    * a max-aggregate per op; at 10^7+ docs with head-stem operands the
    * join cascade dominates. Here the whole query costs:
    *   1. ONE pruned postings scan per atom shape (bare terms; phrase
    *      stems with the head-stem Bloom prefilter) feeding ONE docId
    *      shuffle that aligns every atom's (tf, doc_len) per doc — every
    *      phrase's positional fold runs inside that same grouping;
    *   2. one no-shuffle aggregate pass over the cached aligned frame per
    *      normalization node (the data-dependent max constants, resolved
    *      bottom-up — stackCombine contributes one per stack + one final);
    *   3. one no-shuffle map computing the final per-doc score with the
    *      SAME scalar arithmetic as `DriverScalarAlgebra` (DenseEval
    *      replicates its IEEE operation order exactly), then the top-k.
    * Results are bit-identical to the driver and distributed algebras
    * (EngineSpec asserts all paths equal). */
  def topKDense(query: String, accuracy: Double, k: Int): Vector[(Long, Double)] = {
    import graft.query.DenseEval
    import graft.query.DenseEval._
    val ast = new DenseEval.AstAlgebra(params.stemBareTerms)
    val root = QueryEvaluator.evaluate(query, ast, params)
    val atoms = ast.atomList
    val nAtoms = atoms.length
    val norms = DenseEval.normNodes(root)
    val termAtoms = atoms.zipWithIndex.collect { case (Left(t), i) => (t, i) }
    val phraseAtoms = atoms.zipWithIndex.collect { case (Right(st), i) => (st, i) }

    // ---- 1. aligned frame: (docId, [(atomIdx, tf, doc_len)]) ----------
    // row: (docId, doc_len, isStem, atomIdx, tf, term, positions_vb)
    type Row = (Long, Int, Boolean, Int, Int, String, Array[Byte])
    val termRows: Option[Dataset[Row]] =
      if (termAtoms.isEmpty) None
      else {
        val bIdx = spark.sparkContext.broadcast(termAtoms.toMap)
        Some(postings.filter($"term".isin(termAtoms.map(_._1).distinct: _*))
          .select($"term", $"docId", $"tf", $"doc_len")
          .as[(String, Long, Int, Int)]
          .map { case (t, d, tf, dl) => (d, dl, false, bIdx.value(t), tf, "", Array.empty[Byte]) })
      }
    val stemRows: Option[Dataset[Row]] =
      if (phraseAtoms.isEmpty) None
      else {
        val allStems = phraseAtoms.flatMap(_._1).distinct
        val heads = phraseAtoms.map(_._1.head).distinct
        val base = postings.filter($"term".isin(allStems: _*))
        Some(headDocFilter(heads, allStems).fold(base)(base.filter)
          .select($"docId", $"doc_len", $"term", $"positions_vb")
          .as[(Long, Int, String, Array[Byte])]
          .map { case (d, dl, t, vb) => (d, dl, true, -1, 0, t, vb) })
      }
    val rows: Dataset[Row] = (termRows.toSeq ++ stemRows.toSeq)
      .reduceOption(_ union _)
      .getOrElse(spark.emptyDataset[(Long, Int, Boolean, Int, Int, String, Array[Byte])])
    val bPhrases = spark.sparkContext.broadcast(phraseAtoms.toArray)
    val aligned = rows
      .groupByKey(_._1)
      .flatMapGroups { (docId: Long, it: Iterator[Row]) =>
        val entries = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
        var termPos: scala.collection.mutable.HashMap[String, Seq[Int]] = null
        var dl = 0
        it.foreach { case (_, dlr, isStem, aIdx, tf, term, vb) =>
          dl = dlr
          if (!isStem) entries += ((aIdx, tf, dlr))
          else {
            if (termPos == null) termPos = scala.collection.mutable.HashMap.empty
            termPos(term) = graft.codec.VarByte.decodePositions(vb).toSeq
          }
        }
        if (termPos != null) {
          val tp = termPos.toMap
          bPhrases.value.foreach { case (stems, aIdx) =>
            val tf = PhraseMatch.phraseTf(stems, tp)
            if (tf > 0) entries += ((aIdx, tf, dl))
          }
        }
        if (entries.nonEmpty) Iterator.single((docId, entries.toArray))
        else Iterator.empty
      }
      .cache()
    try {
      // ---- 2a. per-atom constants: df + max tf-part in one pass --------
      val k1L = params.k1; val bL = params.b; val avgdlL = stats.avg_doc_len
      val nDocs = stats.total_docs
      val aggParts = aligned.mapPartitions { it =>
        val cnt = new Array[Long](nAtoms)
        val mx = new Array[Double](nAtoms)
        it.foreach { case (_, entries) =>
          entries.foreach { case (a, tf, dl) =>
            cnt(a) += 1
            val tp = DenseEval.tfPart(tf.toDouble, dl.toDouble, k1L, bL, avgdlL)
            if (tp > mx(a)) mx(a) = tp
          }
        }
        Iterator.single((cnt, mx))
      }.collect()
      val dfA = new Array[Long](nAtoms)
      val mxTf = new Array[Double](nAtoms)
      aggParts.foreach { case (c, m) =>
        var i = 0
        while (i < nAtoms) {
          dfA(i) += c(i); if (m(i) > mxTf(i)) mxTf(i) = m(i); i += 1
        }
      }
      // idf exactly as DriverScalarAlgebra.bm25; the atom's max score is
      // idf · maxTfPart — bitwise the driver's max-of-per-row-scores loop
      // (x → fl(idf·x) is monotone for idf > 0, attained at the argmax)
      val idf = Array.tabulate(nAtoms) { i =>
        StrictMath.log(((nDocs.toDouble - dfA(i).toDouble) + 0.5) / (dfA(i).toDouble + 0.5) + 1.0)
      }
      val atomMax = Array.tabulate(nAtoms) { i =>
        val mxS = if (dfA(i) == 0) 0.0 else idf(i) * mxTf(i)
        if (dfA(i) >= nDocs) mxS else math.max(mxS, 0.0)
      }
      // per-doc normalized atom scores — the scoreRows arithmetic
      val docArrays: Array[(Int, Int, Int)] => (Array[Double], Array[Boolean]) =
        entries => {
          val vals = new Array[Double](nAtoms)
          val pres = new Array[Boolean](nAtoms)
          entries.foreach { case (a, tf, dl) =>
            val s = idf(a) * DenseEval.tfPart(tf.toDouble, dl.toDouble, k1L, bL, avgdlL)
            vals(a) = if (atomMax(a) > 0) s / atomMax(a) else s
            pres(a) = true
          }
          (vals, pres)
        }

      // ---- 2b. normalization constants, bottom-up, one pass each -------
      val normMax = new Array[Double](norms.length)
      norms.foreach { nn =>
        val sub = nn.a
        val subAtoms = DenseEval.atomsOf(sub)
        val resolved = normMax.clone() // ids < nn.id are final
        val parts = aligned.mapPartitions { it =>
          var cnt = 0L
          var mx = 0.0
          it.foreach { case (_, entries) =>
            val (vals, pres) = docArrays(entries)
            if (subAtoms.exists(pres)) {
              val v = DenseEval.evalDoc(sub, vals, pres, resolved)
              cnt += 1
              if (v > mx) mx = v
            }
          }
          Iterator.single((cnt, mx))
        }.collect()
        val cnt = parts.map(_._1).sum
        var mx = 0.0
        parts.foreach(p => if (p._2 > mx) mx = p._2)
        normMax(nn.id) =
          if (cnt >= nDocs) mx
          else math.max(mx, DenseEval.defaultOf(sub, resolved))
      }

      // ---- 3. final scores + top-k (+ dense fill, as driverTopK) -------
      val rootDefault = DenseEval.defaultOf(root, normMax)
      val sparseTop = aligned.flatMap { case (d, entries) =>
          val (vals, pres) = docArrays(entries)
          val v = DenseEval.evalDoc(root, vals, pres, normMax)
          if (v >= accuracy) Iterator.single((d, v)) else Iterator.empty
        }
        .toDF("docId", "score")
        .orderBy($"score".desc, $"docId".asc).limit(k)
        .as[(Long, Double)].collect().toVector
      val needFill = rootDefault >= accuracy &&
        (sparseTop.length < k || sparseTop.last._2 <= rootDefault)
      if (!needFill) sparseTop
      else {
        val absent = dict.select($"docId")
          .join(aligned.toDF("docId", "entries").select($"docId"), Seq("docId"), "left_anti")
          .orderBy($"docId".asc).limit(k)
          .as[Long].collect().toVector.map(d => (d, rootDefault))
        (sparseTop ++ absent).sortBy { case (d, sc) => (-sc, d) }.take(k)
      }
    } finally { aligned.unpersist(false); () }
  }

  /** Top-k (score desc, docId asc) after the accuracy filter
    * (BM25Ranker.cpp:40-42 + our defined tiebreak, SURVEY.md §7). Densifies
    * against the doc dictionary only when absent docs can still qualify. */
  def topK(s: Scores, accuracy: Double, k: Int): Vector[(Long, Double)] = try {
    val sparseTop = s.df
      .filter($"score" >= accuracy)
      .orderBy($"score".desc, $"docId".asc)
      .limit(k)
      .as[(Long, Double)].collect().toVector
    val defaultQualifies = s.default >= accuracy
    val needFill = defaultQualifies &&
      (sparseTop.length < k || sparseTop.last._2 <= s.default)
    if (!needFill) sparseTop
    else {
      val absent = dict.select($"docId")
        .join(s.df.select($"docId"), Seq("docId"), "left_anti")
        .orderBy($"docId".asc).limit(k)
        .as[Long].collect().toVector.map(d => (d, s.default))
      (sparseTop ++ absent).sortBy { case (d, sc) => (-sc, d) }.take(k)
    }
  } finally releaseCaches()

  /** Block-max WAND top-k for a single bare term — rank- and
    * score-identical to the exhaustive path (same IEEE operation order;
    * the normalization max IS the top-1 score), but reads the compressed
    * block index and stops decoding once a block's upper bound can no
    * longer enter the top-k. The 10^12-doc fast path for the most common
    * query shape. */
  def termTopKWand(rawTerm: String, accuracy: Double = 0.0, k: Int = params.topK): Vector[(Long, Double)] = {
    val key = if (params.stemBareTerms) TextPipeline.term(rawTerm) else rawTerm
    // df derived from the block metadata itself (term-pruned read): exact,
    // and — unlike the batch-only term_stats table — correct across
    // incrementally appended segments
    val dfArr = io.read(Tables.Blocks).filter($"term" === key)
      .agg(sum($"n_docs")).as[Option[Long]].collect()
    // block metadata counts tombstoned docs too — subtract the recorded
    // per-term delta so idf matches a filtered-postings recount exactly
    val dfLive = dfArr.headOption.flatten
      .map(_ - termDeltas(Seq(key)).getOrElse(key, 0L)).filter(_ > 0L)
    val raw: Vector[(Long, Double)] =
      if (dfLive.isEmpty) Vector.empty
      else {
        val dfCount = dfLive.get.toDouble
        val n = stats.total_docs.toDouble
        // StrictMath: Catalyst's log expression uses StrictMath.log, and
        // Math.log may differ in the last ulp on some JITs
        val idf = StrictMath.log(((n - dfCount) + 0.5) / (dfCount + 0.5) + 1.0)
        val p = params; val st = stats
        val delFn = deletedFn(deletedBroadcast)
        val cands = io.read(Tables.Blocks).filter($"term" === key)
          .as[graft.model.IndexBlock]
          .mapPartitions(it =>
            Wand.topKForPartition(it, idf, k, p, st, delFn))
          .collect()
        Wand.mergeTopK(cands.toIndexedSeq, k)
      }
    val mx = raw.headOption.map(_._2).getOrElse(0.0)
    val normed = if (mx > 0) raw.map { case (d, s) => (d, s / mx) } else raw
    // single-operand stackCombine (ProcessQuery :152-154,183-203): the
    // final score is TFW·normalize(x) + EMW·x — not an IEEE no-op, so it
    // must be applied here too for bit-identity with the algebra path
    val tfw = params.termFrequencyWeight; val emw = params.exactMatchWeight
    val combined = normed.map { case (d, s) => (d, tfw * s + emw * s) }
    val filtered = combined.filter(_._2 >= accuracy)
    if (filtered.length >= k || accuracy > 0.0) filtered.take(k)
    else {
      // dense zero-fill (reference vectors are dense; absent docs hold 0)
      val present = raw.map(_._1).toSet
      val absent = dict.select($"docId")
        .filter(!$"docId".isin(present.toSeq: _*))
        .orderBy($"docId".asc).limit(k)
        .as[Long].collect().toVector.map(d => (d, 0.0))
      (filtered ++ absent).sortBy { case (d, sc) => (-sc, d) }.take(k)
    }
  }

  /** Single bare term (no quotes, no operators) → WAND-routable. */
  private def asSingleTerm(query: String): Option[String] =
    QueryLexer.lex(query) match {
      case Vector(QueryLexer.QTerm(t)) => Some(t)
      case _ => None
    }

  /** Route a query along the cheapest exact path: single bare term → WAND
    * over the block index; driver-sized operands → distributed fetch +
    * driver algebra; otherwise the dense one-shuffle evaluator (which
    * replaced the per-operator join cascade as the beyond-driver-sized
    * fallback). All paths are bit-identical (tested). */
  def topKAuto(query: String, accuracy: Double, k: Int): Vector[(Long, Double)] =
    asSingleTerm(query) match {
      case Some(t) => termTopKWand(t, accuracy, k)
      case None => topKDriver(query, accuracy, k)
        .getOrElse(topKDense(query, accuracy, k))
    }

  /** Full search with snippets over the source turns table. */
  def search(query: String, turns: DataFrame, accuracy: Double = 0.0): Vector[SearchHit] = {
    val top = topKAuto(query, accuracy, params.topK)
    if (top.isEmpty) return Vector.empty
    val ids = top.map(_._1)
    val byId = top.toMap
    val keys = Snippeter.queryKeys(query, params.stemBareTerms)
    val weights = QueryEvaluator.wordsAndPhrasesWeights(query)
    val hits = dict.filter($"docId".isin(ids: _*))
      .join(turns, Seq("conv_id", "turn_idx"))
      .select($"docId", $"conv_id", $"turn_idx", $"text")
      .as[(Long, String, Int, String)].collect()
    hits.map { case (docId, convId, turnIdx, text) =>
      SearchHit(docId, convId, turnIdx, byId(docId), text,
        Snippeter.snippet(text, keys, weights))
    }.sortBy(h => (-h.score, h.docId)).toVector
  }

  /** Bulk multi-query scoring: the top-k of MANY bare-term queries in one
    * distributed plan. The single-query paths cost ≥ one Spark job each —
    * fine interactively, but a training-data pipeline re-scoring thousands
    * of filter queries pays that scheduling overhead per query. Every
    * term runs the block-max WAND kernel inside ONE pruned scan of the
    * compressed blocks table (termAtomFrame — pruning, not just batching:
    * full-scoring head terms measured slower than per-query WAND), and
    * the per-query top-k is a SALTED two-phase window — partial top-k per
    * (query, salt), then final top-k over ≤ salts·k survivors — so a
    * stop-word term with 10^9 postings still never concentrates on a
    * single partition.
    *
    * Scores are bit-identical to the single-query paths (same WAND
    * kernel, same IEEE order everywhere after it): asserted against WAND
    * in EngineSpec. Semantics: per query, the top-k MATCHING docs (score
    * desc, docId asc) after the accuracy filter. The single-query paths'
    * dense zero-fill of sub-k result sets (a reference presentation
    * quirk) is deliberately not replicated — absent docs score 0 and a
    * bulk filtering pipeline wants matches, not padding; with
    * accuracy > 0 the single-query paths agree exactly.
    *
    * @return (query, docId, conv_id, turn_idx, score), k rows max per query
    */
  def searchManyTerms(
      queries: Seq[String],
      k: Int = params.topK,
      accuracy: Double = 0.0): DataFrame = {
    require(queries.nonEmpty, "searchManyTerms needs at least one query")
    val keyed = queries.distinct
      .map(q => (q, if (params.stemBareTerms) TextPipeline.term(q) else q))
    bulkTopK(termAtomFrame(keyed, k), k, accuracy)
  }

  /** Bulk scoring for single-ATOM queries of either shape — a bare term
    * OR a quoted phrase — in the same one-plan pipeline as
    * `searchManyTerms`. Terms ride the pruned postings scan; all phrases
    * share ONE docId shuffle (the union of their stems' postings grouped
    * per doc) with the positional fold evaluated doc-locally for every
    * phrase at once. Per-query results are bit-identical to the
    * single-query evaluator (q20's single-phrase fold is
    * tfw·normalize(x) + emw·x with x already max-normalized — the same
    * combine as a bare term, no PHRASE_BOOST outside mixed queries). */
  def searchMany(
      queries: Seq[String],
      k: Int = params.topK,
      accuracy: Double = 0.0): DataFrame = {
    require(queries.nonEmpty, "searchMany needs at least one query")
    val atoms = queries.distinct.map { q =>
      QueryLexer.lex(q) match {
        case Vector(QueryLexer.QTerm(t)) =>
          q -> Left(if (params.stemBareTerms) TextPipeline.term(t) else t)
        case Vector(QueryLexer.QPhrase(p)) =>
          q -> Right(TextPipeline.tokenizeQuery(p))
        case _ => sys.error(
          s"searchMany supports single-atom queries (bare term or quoted phrase); " +
            s"route '$q' through searchFrame/topKAuto")
      }
    }
    val termAtoms = atoms.collect { case (q, Left(t)) => (q, t) }
    val phraseAtoms = atoms.collect { case (q, Right(st)) if st.nonEmpty => (q, st) }
    val frames =
      (if (termAtoms.nonEmpty) Seq(termAtomFrame(termAtoms, k)) else Nil) ++
        (if (phraseAtoms.nonEmpty) Seq(phraseAtomFrame(phraseAtoms)) else Nil)
    require(frames.nonEmpty, "no evaluable atoms (all phrases tokenized to nothing)")
    bulkTopK(frames.reduce(_ union _), k, accuracy)
  }

  /** Bulk evaluation of ARBITRARY queries — boolean, NOT, brackets and
    * mixed term+phrase shapes included — with the distributed operand
    * FETCH shared across the whole batch: ONE pruned postings scan for
    * every bare-term atom of every query, and ONE docId shuffle (head-
    * stem Bloom-prefiltered) folding every phrase atom of every query
    * doc-locally. The boolean combine itself is per-query driver
    * arithmetic over the prefetched sparse vectors (`DriverScalarAlgebra`
    * — the same code the single-query driver path runs, so results are
    * bit-identical to `topKAuto` by construction; EngineSpec asserts it).
    * A query whose operand exceeds `driverAlgebraMaxDocs` falls back to
    * its own `topKAuto` evaluation — correct, just unshared.
    *
    * This is the filtering-pipeline shape: thousands of `"a" AND "b"`
    * style queries pay atom-count scans, not query-count scans.
    *
    * @return (query, docId, conv_id, turn_idx, score), k rows max per query
    */
  def searchManyAuto(
      queries: Seq[String],
      k: Int = params.topK,
      accuracy: Double = 0.0): DataFrame = {
    require(queries.nonEmpty, "searchManyAuto needs at least one query")
    val qs = queries.distinct
    val limit = params.driverAlgebraMaxDocs
    def stemKey(t: String) = if (params.stemBareTerms) TextPipeline.term(t) else t
    val lexed = qs.map(q => q -> QueryLexer.lex(q))
    val allTermKeys = lexed.flatMap(_._2.collect {
      case QueryLexer.QTerm(t) => stemKey(t)
    }).distinct
    val allPhrases = lexed.flatMap(_._2.collect {
      case QueryLexer.QPhrase(p) => TextPipeline.tokenizeQuery(p)
    }).distinct.filter(_.nonEmpty)

    // ---- shared term fetch: size gate, then ONE pruned scan ------------
    val termCounts: Map[String, Long] =
      if (allTermKeys.isEmpty) Map.empty
      else postings.filter($"term".isin(allTermKeys: _*))
        .groupBy($"term").agg(count(lit(1)).as("c"))
        .as[(String, Long)].collect().toMap
    val oversizedTerms = termCounts.collect { case (t, c) if c > limit => t }.toSet
    val okTerms = allTermKeys.filterNot(oversizedTerms)
    val termRows: Map[String, Array[(Long, Int, Int)]] =
      if (okTerms.isEmpty) Map.empty
      else postings.filter($"term".isin(okTerms: _*))
        .select($"term", $"docId", $"tf", $"doc_len")
        .as[(String, Long, Int, Int)].collect()
        .groupBy(_._1).map { case (t, rs) => t -> rs.map(r => (r._2, r._3, r._4)) }

    // ---- shared phrase fetch: one shuffle, per-phrase doc-local fold ---
    var oversizedPhrases = Set.empty[Vector[String]]
    val phraseRows: Map[Vector[String], Array[(Long, Int, Int)]] =
      if (allPhrases.isEmpty) Map.empty
      else {
        val allStems = allPhrases.flatten.distinct
        val heads = allPhrases.map(_.head).distinct
        val base = postings.filter($"term".isin(allStems: _*))
        val perDoc = headDocFilter(heads, allStems).fold(base)(base.filter)
          .select($"docId", $"doc_len", $"term", $"positions_vb")
          .groupBy($"docId")
          .agg(first($"doc_len").as("doc_len"),
            collect_list(struct($"term", $"positions_vb")).as("tp"))
          .as[(Long, Int, Seq[(String, Array[Byte])])]
        val bPhrases = spark.sparkContext.broadcast(allPhrases.zipWithIndex.toArray)
        val folded = track(perDoc.flatMap { case (docId, dl, tp) =>
          val termPos = tp.iterator.map { case (t, vb) =>
            t -> graft.codec.VarByte.decodePositions(vb).toSeq
          }.toMap
          bPhrases.value.iterator.flatMap { case (stems, i) =>
            val tf = PhraseMatch.phraseTf(stems, termPos)
            if (tf > 0) Iterator.single((i, docId, tf, dl)) else Iterator.empty
          }
        }.toDF("pidx", "docId", "tf", "doc_len").cache())
        val counts = folded.groupBy($"pidx").agg(count(lit(1)).as("c"))
          .as[(Int, Long)].collect().toMap
        oversizedPhrases = counts.collect {
          case (i, c) if c > limit => allPhrases(i)
        }.toSet
        val okIdx = counts.collect { case (i, c) if c <= limit => i }.toSeq
        if (okIdx.isEmpty) Map.empty
        else folded.filter($"pidx".isin(okIdx: _*))
          .as[(Int, Long, Int, Int)].collect()
          .groupBy(_._1)
          .map { case (i, rs) => allPhrases(i) -> rs.map(r => (r._2, r._3, r._4)) }
      }

    // ---- per-query combine: pure arithmetic over the prefetched atoms --
    val bulkAlg: ScoreAlgebra[DScores] = new DriverScalarAlgebra(
      key =>
        if (oversizedTerms(key)) throw new TooBigForDriver
        else termRows.getOrElse(key, Array.empty),
      stems =>
        if (oversizedPhrases(stems)) throw new TooBigForDriver
        else phraseRows.getOrElse(stems, Array.empty))
    val perQuery = qs.map { q =>
      val top =
        try {
          val (m, default) = QueryEvaluator.evaluate(q, bulkAlg, params)
          driverTopK(m, default, accuracy, k)
        } catch { case _: TooBigForDriver => topKAuto(q, accuracy, k) }
      q -> top
    }
    releaseCaches()
    val rows = perQuery.flatMap { case (q, top) =>
      top.map { case (d, s) => (q, d, s) }
    }
    spark.createDataset(rows).toDF("query", "docId", "score")
      .join(dict, Seq("docId"))
      .select($"query", $"docId", $"conv_id", $"turn_idx", $"score")
  }

  /** (query, docId, s = raw BM25) candidates for bare-term atoms — the
    * WAND kernel fanned over every term in ONE job: a pruned scan of the
    * compressed BLOCKS table (never the flat postings), per-partition
    * block-max pruned top-k per term, ≤ partitions·k candidate rows out.
    * At head terms this skips exactly the block decodes the single-query
    * WAND path skips (full-scoring 64 head terms at 10M docs measured
    * SLOWER than 64 WAND round-trips — pruning, not just batching, is
    * what scales). Per-term df comes from the block metadata in one
    * batched aggregate, like termTopKWand's per-term lookup. */
  private def termAtomFrame(keyed: Seq[(String, String)], k: Int): DataFrame = {
    val keys = keyed.map(_._2).distinct
    val blocks = io.read(Tables.Blocks).filter($"term".isin(keys: _*))
    val n = stats.total_docs.toDouble
    val deltas = termDeltas(keys)
    val idfByTerm = blocks.groupBy($"term").agg(sum($"n_docs").as("df"))
      .as[(String, Long)].collect()
      .map { case (t, dfRaw) =>
        val df = dfRaw - deltas.getOrElse(t, 0L)
        t -> StrictMath.log(((n - df) + 0.5) / (df + 0.5) + 1.0)
      }.toMap
    val p = params; val st = stats
    val bIdf = spark.sparkContext.broadcast(idfByTerm)
    val delFn = deletedFn(deletedBroadcast)
    val qdf = spark.createDataset(keyed).toDF("query", "term")
    blocks.as[graft.model.IndexBlock]
      .mapPartitions(it =>
        Wand.topKForPartitionMulti(it, bIdf.value, k, p, st, delFn))
      .toDF("term", "docId", "s")
      .join(broadcast(qdf), Seq("term"))
      .select($"query", $"docId", $"s")
  }

  /** (query, docId, s = raw BM25) for phrase atoms: ONE shuffle on docId
    * over the union of all phrases' stems, then every phrase's positional
    * fold (stale-postings quirk included) runs doc-locally in one pass;
    * per-query df is a map-side-combined aggregate. No block-max bound
    * exists for phrase tf, so phrases score exhaustively (as the
    * single-query path does). */
  private def phraseAtomFrame(phraseAtoms: Seq[(String, Vector[String])]): DataFrame = {
    val allStems = phraseAtoms.flatMap(_._2).distinct
    // a doc is a candidate iff it contains SOME phrase's head stem (each
    // phrase's fold returns 0 without its own head — see headDocFilter)
    val heads = phraseAtoms.map(_._2.head).distinct
    val base = postings.filter($"term".isin(allStems: _*))
    val perDoc = headDocFilter(heads, allStems).fold(base)(base.filter)
      .select($"docId", $"doc_len", $"term", $"positions_vb")
      .groupBy($"docId")
      .agg(first($"doc_len").as("doc_len"),
        collect_list(struct($"term", $"positions_vb")).as("tp"))
      .as[(Long, Int, Seq[(String, Array[Byte])])]
    val bAtoms = spark.sparkContext.broadcast(phraseAtoms)
    val fF = perDoc.flatMap { case (docId, dl, tp) =>
      val termPos = tp.iterator.map { case (t, vb) =>
        t -> graft.codec.VarByte.decodePositions(vb).toSeq
      }.toMap
      bAtoms.value.iterator.flatMap { case (q, stems) =>
        val tf = PhraseMatch.phraseTf(stems, termPos)
        if (tf > 0) Iterator.single((q, docId, tf, dl)) else Iterator.empty
      }
    }.toDF("query", "docId", "tf", "doc_len")
      .select($"query", $"docId", tfPartCol($"tf", $"doc_len").as("f"))
    // cached so the postings decode + positional fold runs ONE job: the
    // broadcast df aggregate populates the cache, the join then reads it
    // (uncached, fF would evaluate twice — round-3 ADVICE)
    val fFc = track(fF.cache())
    val perQuery = fFc.groupBy($"query")
      .agg(count(lit(1)).cast("double").as("df_count"))
    fFc.join(broadcast(perQuery), Seq("query"))
      .select($"query", $"docId", (idfCol($"df_count") * $"f").as("s"))
  }

  /** Shared bulk tail over raw (query, docId, s): per-query max in one
    * map-side-combined agg (for term atoms the true max is always among
    * the WAND candidates — it IS the top-1 score), max-normalize,
    * single-operand stack combine, SALTED two-phase per-query top-k,
    * dict attach. */
  private def bulkTopK(atomF: DataFrame, k: Int, accuracy: Double): DataFrame = {
    val perQuery = atomF.groupBy($"query").agg(max($"s").as("mx"))
    val tfw = params.termFrequencyWeight; val emw = params.exactMatchWeight
    val scored = atomF.join(broadcast(perQuery), Seq("query"))
      .select($"query", $"docId",
        when($"mx" > 0, $"s" / $"mx").otherwise($"s").as("norm"))
      .select($"query", $"docId",
        (lit(tfw) * $"norm" + lit(emw) * $"norm").as("score"))
      .filter($"score" >= accuracy)
    val salts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy($"query", $"salt").orderBy($"score".desc, $"docId".asc)
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy($"query").orderBy($"score".desc, $"docId".asc)
    val top = scored
      .withColumn("salt", pmod(hash($"docId"), lit(salts)))
      .withColumn("rn", row_number().over(w1)).filter($"rn" <= k)
      .withColumn("rn2", row_number().over(w2)).filter($"rn2" <= k)
      .select($"query", $"docId", $"score")
    // inner join: the dict is complete by the row-level build invariant,
    // and inner lets Spark broadcast the (N·k-row) result side instead of
    // shuffling the corpus-sized dictionary
    top.join(dict, Seq("docId"))
      .select($"query", $"docId", $"conv_id", $"turn_idx", $"score")
  }

  /** Bulk search with snippets over the source turns table: the bulk
    * top-k joined to turns, each query's snippet keys/weights broadcast,
    * and the snippet computed ON THE EXECUTORS per hit (the single-query
    * `search` snippets its few hits on the driver; N·k bulk hits stay
    * distributed). */
  def searchManyWithSnippets(
      queries: Seq[String],
      turns: DataFrame,
      k: Int = params.topK,
      accuracy: Double = 0.0): DataFrame = {
    val meta = queries.distinct.map { q =>
      q -> ((Snippeter.queryKeys(q, params.stemBareTerms),
        QueryEvaluator.wordsAndPhrasesWeights(q)))
    }.toMap
    val bMeta = spark.sparkContext.broadcast(meta)
    searchMany(queries, k, accuracy)
      .join(turns.select($"conv_id", $"turn_idx", $"text"), Seq("conv_id", "turn_idx"))
      .select($"query", $"docId", $"conv_id", $"turn_idx", $"score", $"text")
      .as[(String, Long, String, Int, Double, String)]
      .map { case (q, d, c, t, s, text) =>
        val (keys, weights) = bMeta.value(q)
        (q, d, c, t, s, text, Snippeter.snippet(text, keys, weights))
      }
      .toDF("query", "docId", "conv_id", "turn_idx", "score", "text", "snippet")
  }

  /** DataFrame variant for the driver harness (SparkEntry). */
  def searchFrame(query: String, accuracy: Double = 0.0, k: Int = 100): DataFrame = {
    val top = topKAuto(query, accuracy, k)
    spark.createDataset(top).toDF("docId", "score")
      .join(dict, Seq("docId"), "left")
      .select($"docId", $"conv_id", $"turn_idx", $"score")
      .orderBy($"score".desc, $"docId".asc)
  }
}

/** The phrase positional fold, doc-local form — equivalent to the
  * reference's global iteration (BM25Ranker.cpp:439-491), including the
  * stale-postings quirk; unit-tested against the oracle's independent
  * global-fold transcription. */
object PhraseMatch {
  def phraseTf(stems: Seq[String], termPos: Map[String, Seq[Int]]): Int = {
    if (stems.isEmpty || !termPos.contains(stems.head)) return 0
    var meta: Seq[Int] = termPos(stems.head)
    stems.foreach { t =>
      termPos.get(t) match {
        case Some(occ) =>
          val cur = meta.toSet
          meta = occ.collect { case p if cur.contains(p) => p + 1 }
        case None => ()
      }
    }
    meta.size
  }
}
