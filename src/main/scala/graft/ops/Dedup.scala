package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale notes: every variant is one `groupBy` on a bounded-width key
  * (hash / band bucket), i.e. a single shuffle whose reduce-side state per
  * key is tiny; pairwise work only happens inside near-dup buckets
  * (candidate pairs), never across the corpus.
  */
object Dedup {

  /** Exact dedup by content hash: keep the smallest doc_id per md5(text).
    * Map-side partial agg → one shuffle of (hash, id) pairs. */
  def exact(docs: DataFrame): DataFrame =
    docs.select(md5(col("text")).as("content_md5"), col("doc_id"))
      .groupBy(col("content_md5"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("content_md5"))

  /** Repeated-substring duplication (the Lee-et-al.-2021 axis): fingerprint
    * every `window`-token span (md5 of the space-joined window) and
    * measure, per document, how much of it consists of spans occurring
    * MORE THAN ONCE across the corpus — including repeats within the same
    * document. This is the positional/substring signal the whole-document
    * MinHash / SimHash / n-gram-Jaccard family cannot see (boilerplate,
    * quoted spans, templated intros). Returns
    * `(doc_id, n_windows, n_dup_windows, dup_frac)`; documents shorter
    * than `window` tokens have zero windows.
    *
    * Scale shape: window fingerprints are computed IN-ROW (tokenize →
    * transform → md5, codegen'd) and carried as 60-BIT LONGS (the first 15
    * hex chars of the md5, the splitAssign trick — 8 bytes on the wire vs
    * a 32-char hex string; measured 3× shuffle-volume cut at 10M docs);
    * the (doc, hash) multiset is pre-aggregated map-side before the one
    * hash shuffle, global occurrence counts hold a counter per hash (never
    * a list), and the dup flags flow back through a hash-keyed join of two
    * ALREADY-AGGREGATED frames — a window repeated a billion times costs
    * a counter, not executor memory. Fingerprint collisions (≈n²/2^61)
    * can only mark a unique window as duplicated, and the DuckDB oracle
    * derives the identical 60-bit value, so contract parity is exact by
    * construction. */
  def substringDup(docs: DataFrame, window: Int = 10): DataFrame = {
    require(window >= 2, s"window must be >= 2 tokens, got $window")
    import docs.sparkSession.implicits._
    val src = docs.select(col("doc_id"), col("text")).as[(Long, String)]
    // Round 6: window fingerprints come from a typed kernel (one tokenize
    // char-scan + one MD5 per span, TextKernel.windowHashes) instead of
    // the interpreted `transform(... md5(concat_ws(...)))` expression —
    // identical 60-bit values (first 15 md5 hex nibbles), same plan shape
    // downstream (the one hash shuffle, counters not lists).
    val dh = src.mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else TextKernel.windowHashes(TextKernel.lowerTokens(text), window, md)
            .iterator.map(h => (id, h))
        }
      }.toDF("doc_id", "h")
      // per-(doc, window-hash) multiplicity — the only corpus-sized shuffle
      .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("c"))
    val occ = dh.groupBy(col("h")).agg(sum(col("c")).as("occ"))
    val dupPerDoc = dh.join(occ.filter(col("occ") > 1), Seq("h"))
      .groupBy(col("doc_id")).agg(sum(col("c")).as("n_dup_windows"))
    // n_windows needs only the token COUNT: a substring-free scan
    // (`greatest(size(toks) - (window-1), 0)`, with NULL text → 0 exactly
    // as greatest(NULL, 0) did)
    src.map { case (id, text) =>
        val nw = if (text == null) 0L
          else math.max(TextKernel.lowerTokenCount(text) - (window - 1), 0).toLong
        (id, nw)
      }.toDF("doc_id", "n_windows")
      .join(dupPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
      .withColumn("dup_frac",
        when(col("n_windows") > 0,
          col("n_dup_windows").cast("double") / col("n_windows").cast("double"))
          .otherwise(lit(0.0)))
      .orderBy(col("doc_id"))
  }

  /** Word n-gram shingle set of a text (lowercased word tokens). */
  def shingles(text: String, n: Int): Set[String] = {
    val toks = graft.text.TextPipeline.tokenize(text).map(_.toLowerCase)
    if (toks.length < n) if (toks.isEmpty) Set.empty else Set(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Deterministic 64-bit shingle hash (md5-based so any engine can
    * reproduce it; Spark's hash() is engine-specific). The digest instance
    * is reused per thread — getInstance per call is allocation-bound. */
  def shingleHash64(s: String, seed: Int): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest((seed.toString + ":" + s).getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(d).getLong
  }

  private val coeffCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[(Long, Long)]]()
  private def coeffs(k: Int): Array[(Long, Long)] =
    coeffCache.computeIfAbsent(k, DetHash.permCoeffs(_))

  /** Empty-shingle-set sentinel component: P itself is outside the hash
    * range [0, P−1], so only two empty docs can share it (est 1.0 — the
    * convention jaccard(∅,∅)=1 also uses). */
  val EmptySig: Long = DetHash.P

  /** MinHash signature: ONE md5 per shingle, then k universal-hash
    * "permutations" h_i(x) = (a_i·x + b_i) mod (2^61−1) — the classical
    * Carter–Wegman family (same estimator guarantees as true permutations,
    * ~k× fewer digests than hashing each shingle k times — the round-1 hot
    * path was 64 MD5s per shingle). The modular wraparound is what makes a
    * linear family non-monotone and hence usable; it is also exactly
    * reproducible in DuckDB HUGEINT arithmetic, which is what lets the
    * driver oracle q07/q25 (the round-2 mix64(x + i·φ) family was
    * JVM-wrapping-dependent only in spirit — this one is plain math). */
  def minHashSignature(sh: Set[String], k: Int): Array[Long] = {
    val cs = coeffs(k)
    val sig = Array.fill(k)(EmptySig)
    sh.foreach { s =>
      val x = java.lang.Long.remainderUnsigned(shingleHash64(s, 0), DetHash.P)
      var i = 0
      while (i < k) {
        val v = {
          val t = DetHash.mulModP(cs(i)._1, x) + cs(i)._2
          if (t >= DetHash.P) t - DetHash.P else t
        }
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** `minHashSignature(shingles(text, n), k)` fused into one pass: the
    * token windows are hashed as they are built (no Set[String] or
    * intermediate shingle collection), deduplicated by their 64-bit
    * residue x — equal shingle strings hash to equal x, and equal x
    * values contribute identical minima, so the signature is the same by
    * construction (an x collision between two distinct shingles would
    * also have produced identical updates twice). */
  private[ops] def signatureOfText(text: String, shingleN: Int, k: Int): Array[Long] = {
    val toks = graft.text.TextPipeline.tokenize(text).map(_.toLowerCase)
    val cs = coeffs(k)
    val sig = Array.fill(k)(EmptySig)
    if (toks.isEmpty) return sig
    val md = md5Local.get()
    val seen = new java.util.HashSet[java.lang.Long]()
    def update(s: String): Unit = {
      md.reset()
      val d = md.digest(("0:" + s).getBytes("UTF-8"))
      val x = java.lang.Long.remainderUnsigned(
        java.nio.ByteBuffer.wrap(d).getLong, DetHash.P)
      if (seen.add(x)) {
        var i = 0
        while (i < k) {
          val t = DetHash.mulModP(cs(i)._1, x) + cs(i)._2
          val v = if (t >= DetHash.P) t - DetHash.P else t
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
    }
    if (toks.length < shingleN) update(toks.mkString(" "))
    else {
      val arr = toks.toArray
      var i = 0
      while (i <= arr.length - shingleN) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < shingleN) {
          if (j > 0) sb.append(' ')
          sb.append(arr(i + j))
          j += 1
        }
        update(sb.toString)
        i += 1
      }
    }
    sig
  }

  private def minHashSigs(
      spark: SparkSession, docs: DataFrame, shingleN: Int, k: Int): DataFrame = {
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) => (id, signatureOfText(text, shingleN, k)) }
      .toDF("doc_id", "sig")
  }

  /** LSH candidate pairs only — band rows carry (band, 8-byte bucket hash,
    * doc_id), NOT the k-long signature (round 1 shipped the full signature
    * on both sides of a self-join: bands×sigBytes×2 shuffle bytes per doc;
    * this is bands×16 bytes per doc plus one groupBy). Pairs are emitted
    * inside each bucket; `maxBucket` caps degenerate buckets (e.g. all
    * empty docs share one signature) so bucket width can't go quadratic —
    * capped buckets are SKIPPED, trading recall on pathological keys for
    * bounded work, like AQE skew-join salting would. */
  def minHashLshCandidates(
      spark: SparkSession,
      docs: DataFrame,
      shingleN: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      maxBucket: Int = 100000): DataFrame =
    candidatesFromSigs(spark, minHashSigs(spark, docs, shingleN, k), k, bands, maxBucket)

  /** (band, bucket, doc_id) banding rows of a signature frame — 24 bytes
    * per (doc, band); the shuffle unit of every LSH variant. */
  private def bandRows(
      spark: SparkSession, sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    import spark.implicits._
    require(k % bands == 0, s"k ($k) must be a multiple of bands ($bands)")
    val r = k / bands
    sigs.as[(Long, Seq[Long])]
      .flatMap { case (id, sig) =>
        (0 until bands).iterator.map { b =>
          // polynomial fold of the band's components in GF(2^61−1): SQL-
          // reproducible (h·31 < 2^66 needs mulModP on the JVM side only)
          var h = 1125899906842597L
          var i = b * r
          while (i < (b + 1) * r) {
            val t = DetHash.mulModP(h, 31L) + sig(i)
            h = if (t >= DetHash.P) t - DetHash.P else t
            i += 1
          }
          (b, h, id)
        }
      }.toDF("band", "bucket", "doc_id")
  }

  /** Keep only rows whose key group has 2..maxBucket members — a
    * map-side-combined COUNT pass + semi-join, so collect_list never
    * materializes a singleton's group (the overwhelmingly common case:
    * 10M docs → ~40M banding rows but ~all buckets are singletons; the
    * one-pass collect_list-then-filter shape measured 962 s and heavy GC
    * where this is minutes) nor a degenerate hot key's (the skew cap
    * applies BEFORE the array is built, bounding executor memory at any
    * corpus size). The groupBy after the join reuses the join's hash
    * partitioning — no extra shuffle of the wide rows. */
  private def keepMidSizedGroups(
      df: DataFrame, keys: Seq[String], maxBucket: Int): DataFrame = {
    val sizes = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1 && col("n") <= maxBucket)
      .select(keys.map(col): _*)
    df.join(sizes, keys, "left_semi")
  }

  /** Above this many banding/keying rows the in-bucket pair search runs
    * the distributed group chain; at or below it the rows (≤ ~24 bytes
    * each, ≤ ~5 MB) are collected once and the grouping + cap + pair
    * emission + dedup run on the driver — one job instead of the
    * 4-shuffle groupBy/semi-join/collect_list/dropDuplicates cascade.
    * Same gate philosophy (and the same bucket-cap semantics, replicated
    * exactly) as MaxIsinIds / MaxDriverEdgeRows; a 10M-doc corpus blows
    * the gate and keeps the skew-capped distributed path. */
  private val MaxDriverBandRows = 200000

  /** In-bucket candidate pairs of a grouped row set, driver-side: the
    * EXACT semantics of keepMidSizedGroups → collect_list → sorted pair
    * loop → dropDuplicates (groups of 2..maxBucket members only, ids
    * sorted, i<j pairs, first-seen dedup). */
  private def driverPairs[K](
      rows: Iterable[(K, Long)], maxBucket: Int): Array[(Long, Long)] = {
    val groups = new java.util.HashMap[K, scala.collection.mutable.ArrayBuffer[Long]]()
    rows.foreach { case (k, id) =>
      var b = groups.get(k)
      if (b == null) { b = new scala.collection.mutable.ArrayBuffer[Long](4); groups.put(k, b) }
      b += id
    }
    val seen = new java.util.HashSet[(Long, Long)]()
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    groups.values.forEach { ids =>
      if (ids.length >= 2 && ids.length <= maxBucket) {
        val s = ids.toArray
        java.util.Arrays.sort(s)
        var i = 0
        while (i < s.length) {
          var j = i + 1
          while (j < s.length) {
            val p = (s(i), s(j))
            if (seen.add(p)) out += p
            j += 1
          }
          i += 1
        }
      }
    }
    out.toArray
  }

  /** Candidate pairs from banding rows: size-gated buckets, in-bucket
    * pairs, skew-capped before materialization; driver fast path below
    * the row gate. */
  private def pairsFromBandRows(
      spark: SparkSession, banded: DataFrame, maxBucket: Int): DataFrame = {
    import spark.implicits._
    val head = banded.select($"band", $"bucket", $"doc_id")
      .limit(MaxDriverBandRows + 1).as[(Int, Long, Long)].collect()
    if (head.length <= MaxDriverBandRows) {
      val pairs = driverPairs(head.iterator.map(r => ((r._1, r._2), r._3)).toIterable, maxBucket)
      return spark.createDataset(pairs.toIndexedSeq).toDF("doc_a", "doc_b")
    }
    keepMidSizedGroups(banded, Seq("band", "bucket"), maxBucket)
      .groupBy($"band", $"bucket")
      .agg(collect_list($"doc_id").as("ids"))
      .select($"ids").as[Seq[Long]]
      .flatMap { ids =>
        // decoded Seq is a LIST: materialize to Array or the indexed
        // accesses below cost O(k) each (O(k^3) per bucket — measured as
        // an 85-minute stall on full 1000-member buckets at 10M docs)
        val s = ids.sorted.toArray
        s.indices.iterator.flatMap(i =>
          (i + 1 until s.length).iterator.map(j => (s(i), s(j))))
      }
      .toDF("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")
  }

  private def candidatesFromSigs(
      spark: SparkSession,
      sigs: DataFrame,
      k: Int,
      bands: Int,
      maxBucket: Int): DataFrame =
    pairsFromBandRows(spark, bandRows(spark, sigs, k, bands), maxBucket)

  /** Above this many distinct candidate ids the signature prune switches
    * from a collected-id `isin` (parquet row-group pushdown) to a broadcast
    * semi-join (no driver collect, still never widens the join input). */
  private val MaxIsinIds = 10000

  /** Above this many distinct batch (band, bucket) keys the dedup-batch
    * corpus prefilter switches from an exact collected hash set (~12
    * bytes/key broadcast) to the adaptive Bloom filter. */
  private val MaxExactPrefilterKeys = 500000

  /** est_jaccard = matching signature components / k, per candidate pair;
    * pairs ≪ docs so AQE broadcasts the pair side of both joins.
    *
    * The signature side is PRUNED to candidate-sized before the join
    * (round-4 VERDICT item 2): without it the estimate scanned the FULL
    * sigs table per call — at 10^10 docs ≈ 5 TB of 64-long signatures to
    * estimate a handful of pairs, the dominant avoidable cost of the
    * batch-dedup path. Small candidate sets collect their ids and push an
    * `isin` into the parquet scan (row-group min/max pruning); larger ones
    * semi-join (ids stay ≪ corpus, so AQE broadcasts them). Results are
    * identical either way — non-candidate signatures never joined anyway.
    *
    * Returns the estimate frame plus the candidate cache backing it (the
    * candidate plan is consumed twice: id prune + join); managed callers
    * unpersist it after consuming, one-shot callers leave it evictable. */
  private def estimatePairsImpl(
      spark: SparkSession,
      cands: DataFrame,
      sigs: DataFrame,
      threshold: Double): (DataFrame, Seq[DataFrame]) = {
    import spark.implicits._
    val c = cands.cache()
    val ids = c.select($"doc_a".as("doc_id"))
      .union(c.select($"doc_b".as("doc_id"))).distinct()
    val idArr = ids.limit(MaxIsinIds + 1).as[Long].collect()
    val pruned =
      if (idArr.isEmpty) sigs.filter(lit(false))
      else if (idArr.length <= MaxIsinIds) sigs.filter(col("doc_id").isin(idArr.toIndexedSeq: _*))
      // explicit broadcast: a size-estimated sort-merge semi-join would
      // SHUFFLE the corpus-sized sigs table, which is worse than the scan
      // it replaces; the id set is candidate-sized by construction
      else sigs.join(broadcast(ids), Seq("doc_id"), "left_semi")
    val est = c
      .join(pruned.toDF("doc_a", "sig_a"), Seq("doc_a"))
      .join(pruned.toDF("doc_b", "sig_b"), Seq("doc_b"))
      .select($"doc_a", $"doc_b", $"sig_a", $"sig_b")
      .as[(Long, Long, Seq[Long], Seq[Long])]
      .map { case (a, b, sa, sb) =>
        val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / sa.length
        (a, b, est)
      }
      .toDF("doc_a", "doc_b", "est_jaccard")
      .filter($"est_jaccard" >= threshold)
      .orderBy($"doc_a", $"doc_b")
    (est, Seq(c))
  }

  private def estimatePairs(
      spark: SparkSession,
      cands: DataFrame,
      sigs: DataFrame,
      threshold: Double): DataFrame =
    estimatePairsImpl(spark, cands, sigs, threshold)._1

  /** MinHash + LSH banding: docs sharing any band bucket are candidate
    * pairs; reported candidates = estimated Jaccard ≥ threshold.
    *
    * shingle→minhash is a doc-local flatMap, computed ONCE and cached for
    * the duration of the query (round 2 recomputed the tokenize+md5 pass
    * for the estimate join); candidate generation is one groupBy on
    * (band, bucket) with 24-byte rows; signatures join back once per side
    * for the estimate (pairs ≪ docs, so AQE broadcasts the pair side). At
    * warehouse scale persist `minHashSigs` as a table instead. */
  def minHashLsh(
      spark: SparkSession,
      docs: DataFrame,
      shingleN: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      maxBucket: Int = 100000): DataFrame = {
    // plain cache (recomputable lineage, evictable, caller-unpersistable) —
    // NOT a localCheckpoint, so there is no leak-on-return hazard here
    val sigs = minHashSigs(spark, docs, shingleN, k).cache()
    val cands = candidatesFromSigs(spark, sigs, k, bands, maxBucket)
    estimatePairs(spark, cands, sigs, threshold)
  }

  // ------------------------------------------- persisted MinHash index --
  // The index-once/query-many contract the ANN families already have,
  // for TEXT dedup: the expensive pass (tokenize → shingle → 1 md5/shingle
  // → k Carter–Wegman permutations) runs once per document ever; daily
  // batches append their signatures and probe the corpus WITHOUT
  // rescanning or re-hashing it. Layout (version-guarded like
  // Similarity.buildLshIndex):
  //   path/sigs    (doc_id, sig ARRAY<LONG>[k])
  //   path/buckets (band, bucket, doc_id) — range-sorted on (band, bucket)
  //                so point/range probes prune files via parquet min-max
  //   path/meta    (shingle_n, k, bands)
  //   path/version

  /** One-time signature index build over a document corpus. */
  def buildMinHashIndex(
      spark: SparkSession,
      docs: DataFrame,
      path: String,
      shingleN: Int = 3,
      k: Int = 64,
      bands: Int = 16): Unit = {
    import spark.implicits._
    require(k % bands == 0, s"k ($k) must be a multiple of bands ($bands)")
    val sigs = minHashSigs(spark, docs, shingleN, k).cache()
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // sigs range-sorted on doc_id: the candidate-pruned estimate pushes an
    // id `isin` into this scan, and tight per-file min/max makes that a
    // row-group-pruned point read instead of a table scan
    sigs.repartitionByRange(n, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(s"$path/sigs")
    bandRows(spark, sigs, k, bands)
      .repartitionByRange(n, col("band"), col("bucket"))
      .sortWithinPartitions("band", "bucket")
      .write.mode("overwrite").parquet(s"$path/buckets")
    Seq((shingleN, k, bands)).toDF("shingle_n", "k", "bands")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    Similarity.writeVersion(spark, path)
    sigs.unpersist()
  }

  private def readMinHashMeta(spark: SparkSession, path: String): (Int, Int, Int) = {
    import spark.implicits._
    // stamp-cached like the ANN metadata (Similarity.cachedLoad): meta is
    // written once per build; repeated probes skip the per-call read job
    Similarity.cachedLoad[(Integer, Integer, Integer)](spark, s"$path/meta") {
      val t = spark.read.parquet(s"$path/meta").as[(Int, Int, Int)].head()
      (Integer.valueOf(t._1), Integer.valueOf(t._2), Integer.valueOf(t._3))
    } match { case (a, b, c) => (a.intValue(), b.intValue(), c.intValue()) }
  }

  /** Incremental growth: sign a NEW disjoint batch with the index's own
    * parameters and append signatures + banding rows — the next read sees
    * the union (same contract as appendLshAssignments / appendIvfAssignments). */
  def appendMinHashSigs(spark: SparkSession, newDocs: DataFrame, path: String): Unit = {
    Similarity.checkVersion(spark, path)
    val (shingleN, k, bands) = readMinHashMeta(spark, path)
    val sigs = minHashSigs(spark, newDocs, shingleN, k).cache()
    sigs.write.mode("append").parquet(s"$path/sigs")
    bandRows(spark, sigs, k, bands).write.mode("append").parquet(s"$path/buckets")
    sigs.unpersist()
  }

  /** Compact the MinHash index's appended segments (round-4 VERDICT item
    * 1): `appendMinHashSigs` (and every streaming-gate micro-batch) appends
    * banding rows UNSORTED and sigs as small files — after thousands of
    * batches the buckets table degrades to a small-file sprawl with no
    * (band, bucket) clustering, so probes lose their parquet min/max
    * pruning and pay per-file open costs. This restores the build layout:
    * buckets range-sorted on (band, bucket), sigs range-sorted on doc_id.
    * Same rows → pairs and batch probes are bit-identical (spec-pinned).
    * meta/version/stream_ledger are untouched; single-writer maintenance
    * op — run between batches, not under a live appender. When the index
    * carries tombstones (`deleteFromMinHashIndex`), the rewrite purges
    * them and retires the `deleted` table. */
  def compactMinHashIndex(spark: SparkSession, path: String): Unit = {
    Similarity.checkVersion(spark, path)
    val n = Similarity.shuffleN(spark)
    Similarity.replaceDir(spark, s"$path/buckets") { tmp =>
      Similarity.readLive(spark, path, "buckets", "doc_id")
        .repartitionByRange(n, col("band"), col("bucket"))
        .sortWithinPartitions("band", "bucket")
        .write.mode("overwrite").parquet(tmp)
    }
    Similarity.replaceDir(spark, s"$path/sigs") { tmp =>
      Similarity.readLive(spark, path, "sigs", "doc_id")
        .repartitionByRange(n, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(tmp)
    }
    val del = new org.apache.hadoop.fs.Path(s"$path/deleted")
    del.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(del, true)
  }

  /** Tombstone documents out of the persisted MinHash index — the dedup
    * side of the retraction story (`IndexBuilder.deleteDocs` for the text
    * index, `Similarity.deleteFromIndex` for the ANN indexes): deleted
    * docs stop appearing in any pair/probe immediately (every sigs/
    * buckets read goes through the `readLive` anti-join), and
    * `compactMinHashIndex` purges them physically. Exactness is free
    * here: signatures are per-doc, so a tombstoned index behaves
    * identically to one built over the surviving corpus with the same
    * parameters (OpsSpec pins it). Append-only, replay-safe, ids never
    * reused — same contracts as the other two. */
  def deleteFromMinHashIndex(spark: SparkSession, path: String, ids: Dataset[Long]): Unit = {
    Similarity.checkVersion(spark, path)
    ids.toDF("id").distinct().coalesce(1)
      .write.mode("append").parquet(s"$path/deleted")
  }

  def deleteFromMinHashIndex(spark: SparkSession, path: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    deleteFromMinHashIndex(spark, path, spark.createDataset(ids))
  }

  /** Full-corpus near-dup pairs off the persisted index — identical output
    * to `minHashLsh` over the same corpus/parameters, but the signature
    * pass is a parquet read, not a recompute. */
  def minHashLshIndexed(
      spark: SparkSession,
      indexPath: String,
      threshold: Double = 0.5,
      maxBucket: Int = 100000): DataFrame = {
    Similarity.checkVersion(spark, indexPath)
    val cands = pairsFromBandRows(
      spark, Similarity.readLive(spark, indexPath, "buckets", "doc_id"), maxBucket)
    estimatePairs(spark, cands, Similarity.readLive(spark, indexPath, "sigs", "doc_id"), threshold)
  }

  /** Dedup a NEW batch against the indexed corpus (and within itself) —
    * THE daily-pipeline operator: new signatures are computed once
    * (batch-sized work), the corpus contributes only its persisted
    * banding rows, prefiltered MAP-SIDE by a broadcast Bloom filter of
    * the batch's bucket keys before the shuffle. Correctness is exact:
    * Bloom false positives form buckets with no new member, dropped by
    * the `has_new` gate; false negatives don't exist. Output = the pairs
    * `minHashLsh` over the union corpus would report that touch ≥ 1 new
    * doc (same banding, same cap semantics, same estimates). New doc_ids
    * must be disjoint from the corpus (as with the ANN appends). */
  def minHashDedupBatch(
      spark: SparkSession,
      indexPath: String,
      newDocs: DataFrame,
      threshold: Double = 0.5,
      maxBucket: Int = 100000): DataFrame =
    minHashDedupBatchImpl(spark, indexPath, newDocs, threshold, maxBucket)._1

  /** minHashDedupBatch with deterministic cleanup: the per-batch caches
    * (batch signatures, banding rows, candidate pairs) are unpersisted after
    * `use` returns — the contract a continuous ingest (the streaming gate)
    * needs, where one evictable-but-live cache entry per micro-batch would
    * otherwise accumulate for the life of the query. The result must be
    * fully consumed inside `use` (it recomputes from scratch afterwards). */
  def minHashDedupBatchManaged[T](
      spark: SparkSession,
      indexPath: String,
      newDocs: DataFrame,
      threshold: Double = 0.5,
      maxBucket: Int = 100000)(use: DataFrame => T): T = {
    val (out, caches) = minHashDedupBatchImpl(spark, indexPath, newDocs, threshold, maxBucket)
    try use(out) finally caches.foreach(_.unpersist(false))
  }

  private def minHashDedupBatchImpl(
      spark: SparkSession,
      indexPath: String,
      newDocs: DataFrame,
      threshold: Double,
      maxBucket: Int): (DataFrame, Seq[DataFrame]) = {
    import spark.implicits._
    Similarity.checkVersion(spark, indexPath)
    val (shingleN, k, bands) = readMinHashMeta(spark, indexPath)
    val newSigs = minHashSigs(spark, newDocs, shingleN, k).cache()
    val newBands = bandRows(spark, newSigs, k, bands).cache()
    // Corpus-side prefilter on the batch's (band, bucket) keys. Round 6:
    // when the DISTINCT key set is gate-small (the daily-batch common
    // case) it is collected exactly and probed as a broadcast hash set —
    // ONE job (which also populates both caches) instead of the round-5
    // count + bloom-build pair, and zero false positives. Above the gate
    // the Bloom filter remains (a 10M-doc batch must not collect 40M
    // keys). Results are identical either way: neither filter has false
    // negatives, and false positives only admit corpus rows whose
    // buckets the `has_new` gate drops.
    val keyCol = xxhash64(col("band"), col("bucket"))
    val keyArr = newBands.select($"band", $"bucket").distinct()
      .limit(MaxExactPrefilterKeys + 1).as[(Int, Long)].collect()
    val mightContainKey: org.apache.spark.sql.Column =
      if (keyArr.length <= MaxExactPrefilterKeys) {
        val bSet = spark.sparkContext.broadcast(keyArr.toSet)
        val f = udf((b: Int, h: Long) => bSet.value.contains((b, h)))
        f(col("band"), col("bucket"))
      } else {
        val nKeys = newBands.count()
        val bf = newBands.select(keyCol.as("bk"))
          .stat.bloomFilter("bk", math.max(nKeys, 1L), 0.01)
        val bBf = spark.sparkContext.broadcast(bf)
        val mightContain = udf((x: Long) => bBf.value.mightContain(x))
        mightContain(keyCol)
      }
    // Replay robustness (round-4 ADVICE): corpus rows whose doc_id is in
    // the batch are the batch's OWN previously-appended copies (an
    // at-least-once replay after the append committed). Excluding them
    // keeps every doc single-counted — without this a bucket one duplicate
    // short of maxBucket could cross the cap on replay and silently drop,
    // yielding different survivors than the original run. On a first run
    // (disjoint ids, the documented contract) the anti-join removes
    // nothing, so results are bit-identical.
    val newIds = newSigs.select($"doc_id")
    val corpusBands = Similarity.readLive(spark, indexPath, "buckets", "doc_id")
      .filter(mightContainKey)
      .join(newIds, Seq("doc_id"), "left_anti")
    val members = newBands
      .select($"band", $"bucket", $"doc_id", lit(true).as("is_new"))
      .union(corpusBands.select($"band", $"bucket", $"doc_id", lit(false).as("is_new")))
    // driver fast path below the row gate — the exact cap + has-new-member
    // gate + new-touching-pair + dedup semantics of the chain below
    val headMembers = members.limit(MaxDriverBandRows + 1)
      .as[(Int, Long, Long, Boolean)].collect()
    val cands =
      if (headMembers.length <= MaxDriverBandRows) {
        val groups = new java.util.HashMap[(Int, Long),
          scala.collection.mutable.ArrayBuffer[(Long, Boolean)]]()
        headMembers.foreach { case (b, bk, id, isNew) =>
          val k = (b, bk)
          var buf = groups.get(k)
          if (buf == null) {
            buf = new scala.collection.mutable.ArrayBuffer[(Long, Boolean)](4)
            groups.put(k, buf)
          }
          buf += ((id, isNew))
        }
        val seen = new java.util.HashSet[(Long, Long)]()
        val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        groups.values.forEach { ms =>
          if (ms.length >= 2 && ms.length <= maxBucket && ms.exists(_._2)) {
            val s = ms.sortBy(_._1).toArray
            var i = 0
            while (i < s.length) {
              var j = i + 1
              while (j < s.length) {
                if ((s(i)._2 || s(j)._2) && seen.add((s(i)._1, s(j)._1)))
                  out += ((s(i)._1, s(j)._1))
                j += 1
              }
              i += 1
            }
          }
        }
        spark.createDataset(out.toIndexedSeq).toDF("doc_a", "doc_b")
      } else keepMidSizedGroups(members, Seq("band", "bucket"), maxBucket)
        .groupBy($"band", $"bucket")
        .agg(collect_list(struct($"doc_id", $"is_new")).as("ms"))
        .filter(exists($"ms", m => m.getField("is_new")))
        .select($"ms").as[Seq[(Long, Boolean)]]
        .flatMap { ms =>
          val s = ms.sortBy(_._1).toArray // List indexing is O(k) — see above
          s.indices.iterator.flatMap(i =>
            (i + 1 until s.length).iterator
              .filter(j => s(i)._2 || s(j)._2) // pairs touching a new doc only
              .map(j => (s(i)._1, s(j)._1)))
        }
        .toDF("doc_a", "doc_b")
        .dropDuplicates("doc_a", "doc_b")
    // same replay rule for the estimate: the index copy of a replayed
    // batch doc would duplicate its signature row and multiply pair rows
    val allSigs = Similarity.readLive(spark, indexPath, "sigs", "doc_id")
      .join(newIds, Seq("doc_id"), "left_anti")
      .union(newSigs.toDF("doc_id", "sig"))
    val (est, estCaches) = estimatePairsImpl(spark, cands, allSigs, threshold)
    (est, Seq(newSigs, newBands) ++ estCaches)
  }

  /** SimHash: 64-bit weighted-bit fingerprint; near-dups differ in few
    * bits. Doc-local computation, dedup by fingerprint or bit-band. */
  def simHash64(text: String): Long = {
    val toks = graft.text.TextPipeline.tokenize(text).map(_.toLowerCase)
    if (toks.isEmpty) return 0L
    val acc = new Array[Int](64)
    // distinct-token counts via one HashMap pass (the round-5
    // `groupBy(identity)` allocated a Map of Lists per doc); per-bit
    // integer adds are commutative, so iteration order is irrelevant —
    // identical fingerprints
    val counts = new java.util.HashMap[String, Int](toks.length * 2)
    toks.foreach(t => counts.merge(t, 1, (a, b) => a + b))
    counts.forEach { (t, w) =>
      val h = shingleHash64(t, 0)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) acc(i) += w else acc(i) -= w
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  def simHash(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .map { case (id, t) => (id, simHash64(t)) }
      .toDF("doc_id", "simhash")
      .orderBy($"doc_id")
  }

  /** SimHash near-dup PAIRS with GUARANTEED recall at any corpus size:
    * split the 64-bit fingerprint into `blocks` equal blocks and key each
    * doc on every combination of (blocks − maxBits) blocks (Manku, Jain &
    * Sarma, WWW'07 §3). A pair within hamming ≤ maxBits has ≤ maxBits
    * dirty blocks, so at least one combination is entirely clean on both
    * sides — recall is EXACTLY 1.0 (which is why the q26 contract row is
    * checkable against an all-pairs DuckDB oracle), with key width
    * 64·(blocks−maxBits)/blocks bits. blocks=4 (default) reproduces the
    * round-2 4×16-bit banding; at 10^10-doc scale use blocks=8 —
    * C(8,5)=56 keys of 40 bits: expected bucket occupancy n/2^40 ≈ 10
    * keeps `maxBucket` trimming only true pathological keys instead of
    * (as 16-bit buckets at that n would) silently skipping ALL of them.
    * One groupBy on (combo, key); in-bucket pairs; exact hamming verify. */
  def simHashNearDup(
      spark: SparkSession,
      docs: DataFrame,
      maxBits: Int = 3,
      blocks: Int = 4,
      maxBucket: Int = 100000): DataFrame = {
    import spark.implicits._
    val sh = docs.select("doc_id", "text").as[(Long, String)]
      .map { case (id, t) => (id, simHash64(t)) }
      .toDF("doc_id", "simhash")
    simHashNearDupBits(spark, sh, maxBits, blocks, maxBucket)
  }

  /** Core pair search over a (doc_id, simhash) frame — split out so scale
    * specs can plant synthetic fingerprints directly. */
  def simHashNearDupBits(
      spark: SparkSession,
      hashes: DataFrame,
      maxBits: Int = 3,
      blocks: Int = 4,
      maxBucket: Int = 100000): DataFrame = {
    import spark.implicits._
    require(64 % blocks == 0, s"blocks ($blocks) must divide 64")
    require(maxBits < blocks,
      s"maxBits ($maxBits) must be < blocks ($blocks) for the pigeonhole guarantee")
    val width = 64 / blocks
    val mask = if (width == 64) -1L else (1L << width) - 1
    val combos: Array[Array[Int]] =
      (0 until blocks).combinations(blocks - maxBits).map(_.toArray).toArray
    val keyed = hashes.select("doc_id", "simhash").as[(Long, Long)]
      .flatMap { case (id, h) =>
        combos.iterator.zipWithIndex.map { case (c, ci) =>
          var key = 0L
          var j = 0
          while (j < c.length) { key = (key << width) | ((h >>> (c(j) * width)) & mask); j += 1 }
          (ci, key, id, h)
        }
      }.toDF("combo", "key", "doc_id", "simhash")
    // driver fast path below the row gate (same exact cap/pair/hamming/
    // dedup semantics as the distributed chain below — hamming is a pair
    // function, identical in every bucket copy, so first-seen dedup
    // matches dropDuplicates)
    val head = keyed.limit(MaxDriverBandRows + 1)
      .as[(Int, Long, Long, Long)].collect()
    if (head.length <= MaxDriverBandRows) {
      val groups = new java.util.HashMap[(Int, Long),
        scala.collection.mutable.ArrayBuffer[(Long, Long)]]()
      head.foreach { case (ci, key, id, h) =>
        val k = (ci, key)
        var b = groups.get(k)
        if (b == null) {
          b = new scala.collection.mutable.ArrayBuffer[(Long, Long)](4)
          groups.put(k, b)
        }
        b += ((id, h))
      }
      val seen = new java.util.HashSet[(Long, Long)]()
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
      groups.values.forEach { ms =>
        if (ms.length >= 2 && ms.length <= maxBucket) {
          val s = ms.sortBy(_._1).toArray
          var i = 0
          while (i < s.length) {
            var j = i + 1
            while (j < s.length) {
              val h = java.lang.Long.bitCount(s(i)._2 ^ s(j)._2)
              if (h <= maxBits && seen.add((s(i)._1, s(j)._1)))
                out += ((s(i)._1, s(j)._1, h))
              j += 1
            }
            i += 1
          }
        }
      }
      return spark.createDataset(out.toIndexedSeq)
        .toDF("doc_a", "doc_b", "hamming")
        .orderBy($"doc_a", $"doc_b")
    }
    keepMidSizedGroups(keyed, Seq("combo", "key"), maxBucket)
      .groupBy($"combo", $"key")
      .agg(collect_list(struct($"doc_id", $"simhash")).as("members"))
      .select($"members").as[Seq[(Long, Long)]]
      .flatMap { ms =>
        val s = ms.sortBy(_._1).toArray // List indexing is O(k) — see above
        val mb = maxBits
        // hamming filter INSIDE the pair emission: hamming is a function
        // of the pair (identical for every bucket the pair co-occurs in),
        // so filtering before dropDuplicates is semantics-preserving and
        // keeps the dedup shuffle at true-near-dup size — under-sized
        // band keys at large n otherwise push billions of non-dup
        // candidate rows through the distinct (measured: the whole
        // stage's cost at 10M docs with 16-bit keys)
        s.indices.iterator.flatMap(i => (i + 1 until s.length).iterator.flatMap { j =>
          val h = java.lang.Long.bitCount(s(i)._2 ^ s(j)._2)
          if (h <= mb) Iterator.single((s(i)._1, s(j)._1, h)) else Iterator.empty
        })
      }
      .toDF("doc_a", "doc_b", "hamming")
      .dropDuplicates("doc_a", "doc_b")
      .orderBy($"doc_a", $"doc_b")
  }

  /** Exact word-n-gram Jaccard for candidate pairs (the verify step after
    * any LSH/banding pass). */
  def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else (a intersect b).size.toDouble / (a union b).size.toDouble

  /** |a ∩ b| for SORTED distinct arrays by a single merge walk — the
    * per-pair kernel of the brute-force jaccard (no per-pair set builds). */
  private def sortedIntersectionSize(a: Array[String], b: Array[String]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      val c = a(i).compareTo(b(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  /** Exact ALL-PAIRS n-gram Jaccard — the contract/oracle-scale ground
    * truth (O(n²) pairs: use only on bounded inputs; the 100 TB path is
    * ngramJaccardPairs, which prunes candidates with MinHash LSH first).
    * Shingle arrays are sorted once per doc; each pair is one merge walk
    * (|union| = |a|+|b|−|∩|), so the inner loop allocates nothing. */
  /** Row cap for the brute-force all-pairs fast paths: at or below it the
    * per-doc features (shingle arrays / embeddings) are collected once and
    * BROADCAST, and the O(n²) pair loop runs over `spark.range(n)` with
    * nothing but the verdict rows ever materialized — the round-5 shape
    * shipped BOTH feature arrays through a nested-loop join row per pair
    * (n²·|features| join bytes for n²·24-byte results). Above the cap the
    * join shape remains (these ops are documented bounded-input ground
    * truth; the cap just keeps the driver safe if one is misused). */
  private val MaxBruteRows = 20000

  def ngramJaccardBrute(
      spark: SparkSession,
      docs: DataFrame,
      shingleN: Int = 3,
      threshold: Double = 0.4): DataFrame = {
    import spark.implicits._
    val sh = docs.select("doc_id", "text").as[(Long, String)]
      .map { case (id, t) => (id, shingles(t, shingleN).toArray.sorted) }
      .toDF("doc_id", "sh")
    val head = sh.limit(MaxBruteRows + 1).as[(Long, Array[String])].collect()
    if (head.length <= MaxBruteRows) {
      // sort by id so position pairs (i, j>i) with distinct ids reproduce
      // exactly the join's doc_a < doc_b pair set (duplicate ids pair each
      // copy with every strictly-larger id, as the strict join did)
      val sorted = head.sortBy(_._1)
      val bc = spark.sparkContext.broadcast(sorted)
      spark.range(sorted.length).as[Long]
        .flatMap { i0 =>
          val arr = bc.value
          val i = i0.toInt
          val (a, sa) = arr(i)
          (i + 1 until arr.length).iterator.flatMap { j =>
            val (b, sb) = arr(j)
            if (a == b) Iterator.empty
            else {
              val inter = sortedIntersectionSize(sa, sb)
              val union = sa.length + sb.length - inter
              val jac = if (union == 0) 1.0 else inter.toDouble / union.toDouble
              if (jac >= threshold) Iterator.single((a, b, jac)) else Iterator.empty
            }
          }
        }
        .toDF("doc_a", "doc_b", "jaccard")
        .orderBy($"doc_a", $"doc_b")
    } else
      sh.select($"doc_id".as("doc_a"), $"sh".as("sh_a"))
        .join(sh.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), $"doc_a" < $"doc_b")
        .as[(Long, Array[String], Long, Array[String])]
        .map { case (a, sa, b, sb) =>
          val inter = sortedIntersectionSize(sa, sb)
          val union = sa.length + sb.length - inter
          val j = if (union == 0) 1.0 else inter.toDouble / union.toDouble
          (a, b, j)
        }
        .toDF("doc_a", "doc_b", "jaccard")
        .filter($"jaccard" >= threshold)
        .orderBy($"doc_a", $"doc_b")
  }

  /** N-gram-Jaccard near-dup pairs, bucketed by fingerprint-prefix to keep
    * the self-join bounded (the exact verify over LSH candidates). */
  def ngramJaccardPairs(
      spark: SparkSession,
      docs: DataFrame,
      shingleN: Int = 3,
      threshold: Double = 0.4): DataFrame = {
    import spark.implicits._
    // all bucket-sharing candidates (no estimate needed — the exact
    // jaccard below is the filter), so the signature join is skipped
    val lsh = minHashLshCandidates(spark, docs, shingleN)
    val texts = docs.select("doc_id", "text")
    val withA = lsh.join(texts.withColumnRenamed("doc_id", "doc_a")
      .withColumnRenamed("text", "text_a"), Seq("doc_a"))
    val withB = withA.join(texts.withColumnRenamed("doc_id", "doc_b")
      .withColumnRenamed("text", "text_b"), Seq("doc_b"))
    withB.select($"doc_a", $"doc_b", $"text_a", $"text_b")
      .as[(Long, Long, String, String)]
      .map { case (a, b, ta, tb) =>
        (a, b, jaccard(shingles(ta, shingleN), shingles(tb, shingleN)))
      }
      .toDF("doc_a", "doc_b", "jaccard")
      .filter($"jaccard" >= threshold)
      .orderBy($"doc_a", $"doc_b")
  }

  /** Exact ALL-PAIRS embedding-cosine near-dup — contract/oracle-scale
    * ground truth (O(n²) pairs over broadcast-nested-loop; bounded inputs
    * only — at corpus scale use embeddingNearDup's hyperplane buckets).
    * Pure Catalyst (`zip_with`/`aggregate` cosine), whole-stage codegen'd. */
  def embeddingNearDupExact(embeddings: DataFrame, threshold: Double): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val head = embeddings.select(col("vec_id"), col("embedding"))
      .limit(MaxBruteRows + 1).as[(Long, Array[Float])].collect()
    if (head.length <= MaxBruteRows) {
      // broadcast (id, double-cast vector, norm), pair loop over range —
      // same gate rationale as ngramJaccardBrute. The arithmetic is the
      // exact dotCol/norm chain of the expression version: dot is a left
      // fold in index order, norms once per vector, cosine =
      // dot / (nrm_a * nrm_b), all in the identical IEEE order.
      val sorted = head.sortBy(_._1).map { case (id, v) =>
        val d = new Array[Double](v.length)
        var i = 0
        while (i < v.length) { d(i) = v(i).toDouble; i += 1 }
        var acc = 0.0
        i = 0
        while (i < d.length) { acc = acc + d(i) * d(i); i += 1 }
        (id, d, math.sqrt(acc))
      }
      val bc = spark.sparkContext.broadcast(sorted)
      spark.range(sorted.length).as[Long]
        .flatMap { i0 =>
          val arr = bc.value
          val i = i0.toInt
          val (a, da, na) = arr(i)
          (i + 1 until arr.length).iterator.flatMap { j =>
            val (b, db, nb) = arr(j)
            if (a == b) Iterator.empty
            else {
              var dot = 0.0
              var k = 0
              while (k < da.length) { dot = dot + da(k) * db(k); k += 1 }
              val cos = dot / (na * nb)
              if (cos >= threshold) Iterator.single((a, b, cos)) else Iterator.empty
            }
          }
        }
        .toDF("vec_a", "vec_b", "cosine")
        .orderBy(col("vec_a"), col("vec_b"))
    } else {
      // norms once per vector (not per pair): cosine = dot/(‖a‖·‖b‖) with
      // identical IEEE values, 3× fewer per-pair flops
      val withNorm = embeddings.select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("emb"))
        .select(col("vec_id"), col("emb"),
          sqrt(Similarity.dotCol(col("emb"), col("emb"))).as("nrm"))
      val l = withNorm.select(col("vec_id").as("vec_a"), col("emb").as("emb_a"), col("nrm").as("nrm_a"))
      val r = withNorm.select(col("vec_id").as("vec_b"), col("emb").as("emb_b"), col("nrm").as("nrm_b"))
      l.join(r, col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          (Similarity.dotCol(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b"))).as("cosine"))
        .filter(col("cosine") >= threshold)
        .orderBy(col("vec_a"), col("vec_b"))
    }
  }

  /** Connected components over near-dup pairs — the keeper-selection step
    * of a dedup pipeline (near-dup is transitive only through clustering;
    * keeping min-id per PAIR over-deletes). Pregel-style min-label
    * propagation: each iteration is one distributed join+aggregate, and
    * the loop runs ≤ component-diameter times (near-dup clusters are
    * shallow; `maxIter` guards pathological chains). The driver loop holds
    * only a change COUNTER per iteration — never rows.
    *
    * @return (doc_id, cluster_id = min doc_id in the component, keep) for
    *         every node in `nodes`; singletons cluster to themselves. */
  def dedupClusters(
      spark: SparkSession,
      pairs: DataFrame, // (doc_a, doc_b) near-dup pairs
      nodes: DataFrame, // (doc_id) universe
      maxIter: Int = 30): DataFrame =
    dedupClustersImpl(spark, pairs, nodes, maxIter)._1

  /** Unpersist the RDD a `Dataset.localCheckpoint` materialized.
    * `Dataset.unpersist` only clears CacheManager entries, but
    * localCheckpoint persists its RDD directly — without this, every
    * checkpoint lives until a GC lets the ContextCleaner collect it
    * (unbounded growth between GCs in a long-lived session; OpsSpec's
    * no-growth test pins the fix). The checkpointed frame's analyzed plan
    * IS a LogicalRDD, so the match is exact; any other shape falls back
    * to the CacheManager path. */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => df.unpersist(false); ()
    }

  /** Above this many symmetric edge rows the cluster step runs the
    * distributed Pregel loop; at or below it, a driver union-find over the
    * already-materialized edge checkpoint (16 bytes/row collected — ≤
    * ~3 MB) replaces `diameter` join+aggregate jobs with one broadcast
    * join. Same gate philosophy as `MaxIsinIds`: near-dup EDGES are ≪
    * corpus by construction, so the common case is tiny even when the
    * node universe is 10^10 docs — and the node side NEVER leaves the
    * cluster (only edge-endpoint ids, bounded by the gate, are collected). */
  private val MaxDriverEdgeRows = 200000L

  private[ops] def dedupClustersImpl(
      spark: SparkSession,
      pairs: DataFrame,
      nodes: DataFrame,
      maxIter: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    val shuffleN = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // localCheckpoint (not cache) each iteration: iterative self-joins grow
    // the logical plan linearly and the optimizer cost superlinearly —
    // truncating lineage per step is the standard iterative-algorithm
    // pattern (on a real cluster use reliable checkpointing for fault
    // tolerance; localCheckpoint trades that for speed).
    // The edge list is hash-partitioned+sorted on dst ONCE (explicit
    // numPartitions — AQE would coalesce a bare repartition; CLAUDE.md):
    // LogicalRDD keeps partitioning/ordering metadata through the
    // checkpoint, so every iteration's join reuses this exchange and only
    // the (changing) labels side reshuffles.
    val sym = pairs.select($"doc_a".as("src"), $"doc_b".as("dst"))
      .union(pairs.select($"doc_b".as("src"), $"doc_a".as("dst")))
      .repartition(shuffleN, $"dst")
      .sortWithinPartitions($"dst")
      .localCheckpoint(true)
    // Round-6 fast path: the edge checkpoint is already materialized, so
    // its count is free — when it is gate-small, cluster on the driver.
    // Semantics are EXACTLY the induced-subgraph CC the loop computes:
    // the loop only ever propagates labels of dst ids that are in
    // `nodes`, so edges touching out-of-universe ids are inert — the fast
    // path reproduces that by keeping only edges whose endpoints survive
    // the nodes semi-join below. min-id-per-component union-find is the
    // loop's exact fixpoint.
    val nSymRows = sym.count()
    if (nSymRows <= MaxDriverEdgeRows) {
      val rawEdges = sym.as[(Long, Long)].collect()
      // which edge endpoints are actually in the node universe: one
      // broadcast semi-join over nodes, collecting ≤ 2·edges ids
      val endpointIds = rawEdges.iterator.flatMap(e => Iterator(e._1, e._2))
        .toArray.distinct
      val present: java.util.HashSet[java.lang.Long] = {
        val epDf = spark.createDataset(endpointIds.toIndexedSeq).toDF("doc_id")
        val s = new java.util.HashSet[java.lang.Long](endpointIds.length * 2)
        nodes.select($"doc_id")
          .join(broadcast(epDf), Seq("doc_id"), "left_semi")
          .as[Long].collect().foreach(id => s.add(id))
        s
      }
      // union-find with the min id as the representative
      val parent = new java.util.HashMap[Long, Long](endpointIds.length * 2)
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
        var c = x
        while (parent.getOrDefault(c, c) != r) {
          val nxt = parent.getOrDefault(c, c); parent.put(c, r); c = nxt
        }
        r
      }
      rawEdges.foreach { case (a, b) =>
        if (present.contains(a) && present.contains(b)) {
          val ra = find(a); val rb = find(b)
          if (ra != rb) {
            if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
          }
        }
      }
      val lbl = endpointIds.iterator
        .filter(present.contains(_))
        .map(id => (id, find(id)))
        .filter { case (id, r) => id != r } // self-labels are the coalesce default
        .toSeq
      val lblDf = spark.createDataset(lbl).toDF("id", "clab")
      val out = nodes.select($"doc_id".as("id"))
        .join(broadcast(lblDf), Seq("id"), "left")
        .select($"id".as("doc_id"),
          coalesce($"clab", $"id").as("cluster_id"),
          ($"id" === coalesce($"clab", $"id")).as("keep"))
        .orderBy($"doc_id")
      releaseCheckpoint(sym)
      return (out, out) // nothing checkpoint-backed to release
    }
    var labels = nodes.select($"doc_id".as("id"), $"doc_id".as("label"))
      .localCheckpoint(true)
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val nbr = sym.join(labels, sym("dst") === labels("id"))
        .groupBy($"src").agg(min($"label").as("nlabel"))
      // ONE job per iteration: the change count rides the eager-checkpoint
      // materialization as an accumulator instead of a second join+count
      // (the round-2 shape). A retried task can only overcount — which at
      // worst costs one extra (no-op) iteration, never a wrong result.
      val acc = spark.sparkContext.longAccumulator(s"cc_changed_$it")
      val next = labels.as("l").join(nbr, $"l.id" === nbr("src"), "left")
        .select($"l.id".as("id"), $"l.label".as("old"),
          least($"l.label", coalesce($"nlabel", $"l.label")).as("label"))
        .as[(Long, Long, Long)]
        .map { case (id, old, lab) => if (lab != old) acc.add(1L); (id, lab) }
        .toDF("id", "label")
        .localCheckpoint(true)
      changed = acc.value
      releaseCheckpoint(labels)
      labels = next
      it += 1
    }
    releaseCheckpoint(sym)
    require(changed == 0, s"dedupClusters did not converge in $maxIter iterations")
    // NOTE: the returned frame is backed by the final localCheckpoint —
    // long-lived sessions should consume it via dedupClustersManaged (which
    // releases the checkpoint), else one materialized RDD leaks per call.
    (labels.select($"id".as("doc_id"), $"label".as("cluster_id"),
      ($"id" === $"label").as("keep"))
      .orderBy($"doc_id"),
      labels)
  }

  /** The last dedup step: keep ONE document per near-dup cluster (the
    * min-id keeper `dedupClusters` elected), dropping the other n−1;
    * the output row carries the cluster size so downstream pipelines can
    * weight or audit the survivors. Joins are keeper-sized (≤ one row per
    * cluster) against the docs universe. */
  def applyKeepers(spark: SparkSession, docs: DataFrame, clusters: DataFrame): DataFrame = {
    import spark.implicits._
    val sizes = clusters.groupBy($"cluster_id").agg(count(lit(1)).as("n_members"))
    docs.select($"doc_id")
      .join(clusters.filter($"keep").select($"doc_id", $"cluster_id"), Seq("doc_id"))
      .join(sizes, Seq("cluster_id"))
      .select($"doc_id", $"cluster_id", $"n_members")
  }

  /** dedupClusters with deterministic cleanup: runs `use` on the result and
    * unpersists the final checkpoint afterwards (the result must be fully
    * consumed inside `use` — it is not recomputable once released). */
  def dedupClustersManaged[T](
      spark: SparkSession,
      pairs: DataFrame,
      nodes: DataFrame,
      maxIter: Int = 30)(use: DataFrame => T): T = {
    val (out, ckpt) = dedupClustersImpl(spark, pairs, nodes, maxIter)
    try use(out) finally releaseCheckpoint(ckpt)
  }

  /** Embedding-cosine near-dup pairs over an LSH-style bucket (random
    * hyperplane signs, seeded) — the scale path for embedding dedup.
    * Bucket rows carry only (vec_id, bucket) — 16 bytes, NOT the vector —
    * pairs are emitted inside buckets (skew-capped), and embeddings join
    * back once per side for the exact cosine verify (AQE broadcasts the
    * small pair side). Single-probe buckets are disjoint, so pairs are
    * already unique. The two head() / count() calls are per-query
    * constants (dims, corpus size), not per-row actions. */
  def embeddingNearDup(
      spark: SparkSession,
      embeddings: DataFrame,
      planesOpt: Option[Int] = None,
      threshold: Double = 0.95,
      seed: Long = 7L,
      maxBucket: Int = 100000): DataFrame = {
    import spark.implicits._
    // dims + corpus size in ONE job (round 5 ran head() then count());
    // the dim of the first-encountered row equals head()'s on any
    // fixed-dim embedding table
    val (dims, nVecs) = embeddings
      .agg(first(size(col("embedding"))), count(lit(1))).as[(Int, Long)].head()
    val planes = planesOpt.getOrElse(Similarity.adaptivePlanes(nVecs))
    // deterministic ±1 hyperplanes (DetHash.signPlanes): engine-reproducible,
    // so the q24 DuckDB oracle recomputes the identical buckets
    val hyper = DetHash.signPlanes(planes, dims, seed)
    val bHyper = spark.sparkContext.broadcast(hyper)
    val bucketed = embeddings.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .map { case (id, v) => (id, Similarity.hyperplaneSig(v, bHyper.value)) }
      .toDF("vec_id", "bucket")
    pairsFromBuckets(spark, bucketed, embeddings, threshold, maxBucket)
  }

  /** embeddingNearDup over a PERSISTED LSH index (Similarity.buildLshIndex):
    * the bucket assignment pass is skipped entirely — buckets AND vectors
    * come off the index table, so repeated dedup sweeps (or dedup after
    * ANN indexing) pay zero re-assignment. Identical output to
    * embeddingNearDup when the index was built with the same planes/seed. */
  def embeddingNearDupIndexed(
      spark: SparkSession,
      indexPath: String,
      threshold: Double = 0.95,
      maxBucket: Int = 100000): DataFrame = {
    Similarity.checkVersion(spark, indexPath)
    val assignments = Similarity.readLive(spark, indexPath, "assignments", "vec_id")
    pairsFromBuckets(spark, assignments.select("vec_id", "bucket"),
      assignments.select("vec_id", "embedding"), threshold, maxBucket)
  }

  /** Shared tail: 16-byte (vec_id, bucket) rows → in-bucket pairs (skew-
    * capped) → exact-cosine verify with norms precomputed once per side. */
  private def pairsFromBuckets(
      spark: SparkSession,
      bucketed: DataFrame, // (vec_id, bucket)
      embeddings: DataFrame, // (vec_id, embedding)
      threshold: Double,
      maxBucket: Int): DataFrame = {
    import spark.implicits._
    // driver fast path below the row gate — identical cap/pair/dedup
    // semantics (single-probe buckets are disjoint, but first-seen dedup
    // is harmless and matches the distributed shape's contract)
    val headRows = bucketed.select($"bucket", $"vec_id")
      .limit(MaxDriverBandRows + 1).as[(Long, Long)].collect()
    val cands =
      if (headRows.length <= MaxDriverBandRows)
        spark.createDataset(
            driverPairs(headRows.iterator.map(r => (r._1, r._2)).toIterable, maxBucket)
              .toIndexedSeq)
          .toDF("vec_a", "vec_b")
      else keepMidSizedGroups(bucketed.select($"vec_id", $"bucket"),
          Seq("bucket"), maxBucket)
        .groupBy($"bucket").agg(collect_list($"vec_id").as("ids"))
        .select($"ids").as[Seq[Long]]
        .flatMap { ids =>
          val s = ids.sorted.toArray // List indexing is O(k) — see above
          s.indices.iterator.flatMap(i =>
            (i + 1 until s.length).iterator.map(j => (s(i), s(j))))
        }
        .toDF("vec_a", "vec_b")
    // round 6: the cast/norm pass and the per-pair cosine ran as
    // interpreted transform/aggregate expressions over EVERY embedding row
    // (twice — once per join side); now one typed pass each with the
    // identical IEEE chain (cast-to-double, left-fold dot, sqrt;
    // cosine = dot / (nrm_a * nrm_b))
    val withNorm = embeddings.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .map { case (id, v) =>
        val d = new Array[Double](v.length)
        var i = 0
        while (i < v.length) { d(i) = v(i).toDouble; i += 1 }
        var acc = 0.0
        i = 0
        while (i < d.length) { acc = acc + d(i) * d(i); i += 1 }
        (id, d, math.sqrt(acc))
      }
      .toDF("vec_id", "emb", "nrm")
    cands
      .join(withNorm.toDF("vec_a", "emb_a", "nrm_a"), Seq("vec_a"))
      .join(withNorm.toDF("vec_b", "emb_b", "nrm_b"), Seq("vec_b"))
      .select($"vec_a", $"vec_b", $"emb_a", $"nrm_a", $"emb_b", $"nrm_b")
      .as[(Long, Long, Array[Double], Double, Array[Double], Double)]
      .map { case (a, b, da, na, db, nb) =>
        var dot = 0.0
        var i = 0
        while (i < da.length) { dot = dot + da(i) * db(i); i += 1 }
        (a, b, dot / (na * nb))
      }
      .toDF("vec_a", "vec_b", "cosine")
      .filter($"cosine" >= threshold)
      .orderBy($"vec_a", $"vec_b")
  }
}
