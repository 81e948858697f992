package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.api.SparkSearchEngine
import graft.build.{IndexBuilder, Tables}
import graft.corpus.TranscriptGen
import graft.oracle.RefOracle
import graft.store.ParquetTableIO

/** End-to-end rank/score identity: the distributed engine vs the
  * reference-faithful in-memory oracle on the q01–q20 reference query set
  * (FIXTURES.md §3) over the deterministic synthetic transcript corpus. */
object EngineSpecFixture {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val warehouse: String =
    java.nio.file.Files.createTempDirectory("graft_wh_").toString

  val Convs = 40L

  lazy val built: (ParquetTableIO, RefOracle) = {
    val io = new ParquetTableIO(spark, warehouse)
    import spark.implicits._
    val turns = TranscriptGen.generate(spark, Convs)
    new IndexBuilder(spark, io, blockSize = 8).build(turns)
    val oracle = new RefOracle(TranscriptGen.generateLocal(Convs))
    (io, oracle)
  }

  val queries: Seq[(String, (String, Double))] = EngineQueries.all
}

class EngineSpec extends AnyFunSuite {
  import EngineSpecFixture._

  test("index tables match the oracle index exactly") {
    val (io, oracle) = built
    import spark.implicits._

    // stats
    val (n, avg) = io.read(Tables.Stats).as[(Long, Double)].head()
    assert(n == oracle.totalDocs)
    assert(avg == oracle.avgDocLen, s"avgdl $avg vs ${oracle.avgDocLen}")

    // doc dict: docId assignment + doc_len
    val dict = io.read(Tables.DocDict)
      .as[(Long, String, Int, Int)].collect().sortBy(_._1)
    val oracleDict = oracle.docs.map { case (id, t) =>
      (id, t.conv_id, t.turn_idx, oracle.docLens(id)) }
    assert(dict.toSeq == oracleDict)

    // postings: full content equality (positions stored delta+varbyte)
    val got = io.read(Tables.Postings)
      .as[(String, Long, Int, Int, Array[Byte])].collect()
      .map(r => (r._1, r._2) ->
        ((r._3, r._4, graft.codec.VarByte.decodePositions(r._5).toSeq))).toMap
    val want = for {
      (term, byDoc) <- oracle.index.toSeq
      (docId, poss) <- byDoc
    } yield (term, docId) -> ((poss.length, oracle.docLens(docId), poss.toSeq))
    assert(got.size == want.size, s"posting count ${got.size} vs ${want.size}")
    want.foreach { case (k, v) =>
      assert(got.contains(k), s"missing posting $k")
      assert(got(k) == v, s"posting $k: ${got(k)} vs $v")
    }
  }

  test("compressed blocks round-trip to the same posting scores") {
    // blocks are the positions-FREE scoring index (positions live in the
    // postings table, asserted positionally in the previous test)
    val (io, oracle) = built
    import spark.implicits._
    val decoded = io.read(Tables.Blocks)
      .as[(String, Long, Long, Int, Int, Int, Array[Byte])].collect()
      .flatMap { case (term, _, _, _, _, _, block) =>
        graft.codec.VarByte.decodeBlock(block).map(p => (term, p.docId) -> p)
      }.toMap
    val want = oracle.index.iterator.flatMap { case (t, byDoc) =>
      byDoc.iterator.map { case (d, ps) => (t, d) -> ps }
    }.toMap
    assert(decoded.size == want.size)
    want.foreach { case (k, ps) =>
      val p = decoded(k)
      assert(p.tf == ps.length)
      assert(p.docLen == oracle.docLens(k._2))
      assert(p.positions.isEmpty, "built blocks must not carry positions")
    }
  }

  test("algebra caches are released after top-k: no growth across queries") {
    val (io, _) = built
    val engine = new SparkSearchEngine(spark, io)
    def persisted = spark.sparkContext.getPersistentRDDs.size
    // warm once (lazy stats/postings), snapshot, then run repeatedly
    engine.topK(engine.scores("(\"blue whale\" OR \"query engine\") NOT \"red fish\""), 0.0, 10)
    val base = persisted
    (1 to 15).foreach { _ =>
      engine.topK(engine.scores("(\"blue whale\" OR \"query engine\") NOT \"red fish\""), 0.0, 10)
      engine.topK(engine.scores("\"blue whale\" whale engine"), 0.0, 10)
    }
    assert(persisted <= base, s"cached RDDs grew across queries: $base -> $persisted")
  }

  test("q01-q20: rank- and score-identical to the oracle") {
    val (io, oracle) = built
    val engine = new SparkSearchEngine(spark, io)
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    queries.sortBy(_._1).foreach { case (name, (q, accuracy)) =>
      val want = oracle.search(q, accuracy, 100)
      val got = engine.topK(engine.scores(q), accuracy, 100)
      if (got.map(_._1) != want.map(_._1)) {
        failures += s"$name '$q': docIds ${got.take(5)} vs ${want.take(5)}"
      } else {
        got.zip(want).foreach { case ((gd, gs), (wd, ws)) =>
          val rel = if (ws == 0.0) math.abs(gs) else math.abs(gs - ws) / math.abs(ws)
          if (rel > 1e-9) failures += s"$name '$q': score doc $gd $gs vs $ws"
        }
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("driver-algebra path bit-identical to the distributed path on q01-q20") {
    val (io, _) = built
    val engine = new SparkSearchEngine(spark, io)
    val tiny = new SparkSearchEngine(spark, io,
      GraftParams(driverAlgebraMaxDocs = 2)) // forces TooBig fallback
    queries.foreach { case (name, (q, accuracy)) =>
      val distributed = engine.topK(engine.scores(q), accuracy, 100)
      val driver = engine.topKDriver(q, accuracy, 100)
      assert(driver.isDefined, s"$name should fit the driver path")
      assert(driver.get == distributed, s"$name '$q'")
      // the too-big bailout must fall back, not fail
      assert(tiny.topKAuto(q, accuracy, 100) == distributed, s"$name fallback")
    }
  }

  test("dense one-shuffle path bit-identical to driver + distributed algebras on q01-q20") {
    val (io, _) = built
    val engine = new SparkSearchEngine(spark, io)
    queries.foreach { case (name, (q, accuracy)) =>
      val distributed = engine.topK(engine.scores(q), accuracy, 100)
      assert(engine.topKDense(q, accuracy, 100) == distributed, s"$name '$q'")
    }
    // extra shapes: nonzero defaults (NOT), empty atoms, duplicate atoms,
    // several accuracies — the dense fill and normalization constants must
    // track the driver exactly everywhere
    val extra = Seq(
      "NOT \"blue whale\"",
      "\"blue whale\" AND \"red fish\"",
      "(\"blue whale\" OR \"query engine\") NOT \"red fish\"",
      "\"blue whale\" whale whale engine",
      "\"zzz nothing\"",
      "\"blue whale\" \"blue whale\"")
    for (q <- extra; acc <- Seq(0.0, Double.MinPositiveValue, 0.4)) {
      assert(engine.topKDense(q, acc, 50) == engine.topK(engine.scores(q), acc, 50),
        s"'$q' at accuracy $acc")
    }
    // dense path leaves no cached frames behind
    def persisted = spark.sparkContext.getPersistentRDDs.size
    val base = persisted
    engine.topKDense("\"blue whale\" whale engine", 0.0, 10)
    assert(persisted <= base, "dense evaluator must release its aligned cache")
  }

  test("WAND term top-k identical to the exhaustive path (all q terms + edge cases)") {
    val (io, oracle) = built
    val engine = new SparkSearchEngine(spark, io)
    val terms = Seq("whale", "blue", "the", "run", "engin", "a", "zzzunknown", "dont")
    terms.foreach { t =>
      val exhaustive = engine.topK(engine.scores(t), 0.0, 100)
      val wand = engine.termTopKWand(t, 0.0, 100)
      assert(wand == exhaustive, s"term '$t': wand ${wand.take(3)} vs ${exhaustive.take(3)}")
      val oracleTop = oracle.search(t, 0.0, 100)
      assert(wand.map(_._1) == oracleTop.map(_._1), s"term '$t' vs oracle")
    }
    // accuracy threshold path
    assert(engine.termTopKWand("whale", 0.5, 100) ==
      engine.topK(engine.scores("whale"), 0.5, 100))
    // small k triggers real pruning (blockSize=8 in this fixture)
    assert(engine.termTopKWand("the", 0.0, 3) ==
      engine.topK(engine.scores("the"), 0.0, 3))
  }

  test("bulk multi-term search is bit-identical to the per-term WAND path") {
    val (io, _) = built
    import spark.implicits._
    val engine = new SparkSearchEngine(spark, io)
    val terms = Seq("whale", "blue", "the", "run", "engin", "a", "zzzunknown")
    val bulk = engine.searchManyTerms(terms, k = 50)
      .select("query", "docId", "score")
      .as[(String, Long, Double)].collect()
      .groupBy(_._1)
      .map { case (q, rs) =>
        q -> rs.map(r => (r._2, r._3)).sortBy { case (d, s) => (-s, d) }.toVector
      }
    terms.foreach { t =>
      // accuracy > 0 suppresses the single-query dense zero-fill (bulk
      // returns matching docs only); scores compare with exact ==
      val single = engine.termTopKWand(t, Double.MinPositiveValue, 50)
      assert(bulk.getOrElse(t, Vector.empty) == single, s"term '$t'")
    }
    // a missing term yields no rows, not an error
    assert(!bulk.contains("zzzunknown"))
    // the scan prunes to the queried terms (pushed-down In filter) and
    // reads the compressed BLOCKS table (WAND kernel), not flat postings
    val plan = engine.searchManyTerms(Seq("whale", "blue"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term, [blue,whale])"),
      s"term In-filter must reach the parquet scan:\n$plan")
    assert(plan.contains("index_blocks") && !plan.contains("/postings]"),
      s"bulk term scoring must read the block index, not flat postings:\n$plan")
  }

  test("bulk mixed search (terms + phrases) is bit-identical to the single-query paths") {
    val (io, _) = built
    import spark.implicits._
    val engine = new SparkSearchEngine(spark, io)
    val qs = Seq("whale", "\"blue whale\"", "\"red fish\"", "blue", "\"zzz nothing\"")
    val bulk = engine.searchMany(qs, k = 50)
      .select("query", "docId", "score").as[(String, Long, Double)].collect()
      .groupBy(_._1)
      .map { case (q, rs) =>
        q -> rs.map(r => (r._2, r._3)).sortBy { case (d, s) => (-s, d) }.toVector
      }
    val tiny = Double.MinPositiveValue // accuracy > 0: no dense zero-fill
    qs.foreach { q =>
      val single = engine.topKAuto(q, tiny, 50)
      assert(bulk.getOrElse(q, Vector.empty) == single, s"query '$q'")
    }
    // non-atomic queries are rejected, not silently mis-scored
    intercept[RuntimeException](engine.searchMany(Seq("whale AND blue")))
  }

  test("phrase head-stem Bloom prefilter: forced path bit-identical on all phrase queries") {
    val (io, _) = built
    import spark.implicits._
    val engine = new SparkSearchEngine(spark, io)
    // the default gates (min corpus size, head-selectivity ratio) never
    // trigger at this corpus, so force the Bloom path and assert full
    // bit-identity — false positives must fold to tf=0, never perturb a
    // score
    val forced = new SparkSearchEngine(spark, io,
      GraftParams(phrasePrefilterMinDf = 1L, phrasePrefilterMaxRatio = 1.0))
    val phraseQueries = queries.filter(_._2._1.contains("\""))
    assert(phraseQueries.nonEmpty)
    phraseQueries.foreach { case (name, (q, acc)) =>
      assert(forced.topK(forced.scores(q), acc, 100) ==
        engine.topK(engine.scores(q), acc, 100), s"$name distributed")
      assert(forced.topKDriver(q, acc, 100) == engine.topKDriver(q, acc, 100),
        s"$name driver")
      assert(forced.topKDense(q, acc, 100) == engine.topKDense(q, acc, 100),
        s"$name dense")
    }
    // bulk phrase path under the forced filter
    val qs = Seq("\"blue whale\"", "\"red fish\"", "whale")
    def rows(e: SparkSearchEngine) = e.searchMany(qs, k = 50)
      .select("query", "docId", "score").as[(String, Long, Double)]
      .collect().sortBy(r => (r._1, -r._3, r._2)).toSeq
    assert(rows(forced) == rows(engine))
  }

  test("bulk boolean/mixed search (searchManyAuto) bit-identical to topKAuto per query") {
    val (io, _) = built
    import spark.implicits._
    val engine = new SparkSearchEngine(spark, io)
    val qs = Seq(
      "(\"blue whale\" OR \"query engine\") NOT \"red fish\"",
      "\"blue whale\" whale engine",
      "\"blue whale\" AND \"red fish\"",
      "NOT \"blue whale\"", // nonzero default → dense fill path
      "whale", // single term: WAND on the single path, algebra in bulk
      "\"blue whale\"",
      "\"zzz nothing\"")
    def collectBulk(e: SparkSearchEngine, acc: Double) =
      e.searchManyAuto(qs, k = 50, accuracy = acc)
        .select("query", "docId", "score").as[(String, Long, Double)].collect()
        .groupBy(_._1)
        .map { case (q, rs) =>
          q -> rs.map(r => (r._2, r._3)).sortBy { case (d, s) => (-s, d) }.toVector
        }
    for (acc <- Seq(0.0, Double.MinPositiveValue, 0.4)) {
      val bulk = collectBulk(engine, acc)
      qs.foreach { q =>
        assert(bulk.getOrElse(q, Vector.empty) == engine.topKAuto(q, acc, 50),
          s"query '$q' at accuracy $acc")
      }
    }
    // forced per-query fallback (operands exceed the driver cap): identical
    val tiny = new SparkSearchEngine(spark, io, GraftParams(driverAlgebraMaxDocs = 2))
    val bulkTiny = collectBulk(tiny, 0.0)
    qs.foreach { q =>
      assert(bulkTiny.getOrElse(q, Vector.empty) == engine.topKAuto(q, 0.0, 50),
        s"fallback query '$q'")
    }
  }

  test("bulk snippets equal the single-query search snippets") {
    val (io, _) = built
    import spark.implicits._
    val engine = new SparkSearchEngine(spark, io)
    val turns = TranscriptGen.generate(spark, Convs).toDF()
    val tiny = Double.MinPositiveValue
    val qs = Seq("whale", "\"blue whale\"")
    val bulk = engine.searchManyWithSnippets(qs, turns, k = 20, accuracy = tiny)
      .select("query", "docId", "score", "snippet")
      .as[(String, Long, Double, String)].collect()
      .groupBy(_._1)
      .map { case (q, rs) =>
        q -> rs.map(r => (r._2, r._3, r._4)).sortBy(x => (-x._2, x._1)).toVector
      }
    qs.foreach { q =>
      val single = engine.search(q, turns, tiny).take(20)
        .map(h => (h.docId, h.score, h.snippet)).toVector
      assert(bulk.getOrElse(q, Vector.empty) == single, q)
    }
  }

  test("row-level invariant: per-turn text equality via the dictionary") {
    val (io, _) = built
    import spark.implicits._
    val turns = TranscriptGen.generate(spark, Convs).toDF()
    val joined = io.read(Tables.DocDict)
      .join(turns, Seq("conv_id", "turn_idx"), "full_outer")
    assert(joined.filter($"docId".isNull || $"text".isNull).count() == 0)
    assert(io.read(Tables.DocDict).count() == turns.count())
    // doc_len must equal the raw token count of the source text, per row
    val badLen = joined.select($"doc_len", $"text")
      .as[(Int, String)]
      .filter { case (dl, text) => graft.text.TextPipeline.tokenize(text).length != dl }
      .count()
    assert(badLen == 0)
  }

  test("golden files: oracle top-10 matches the checked-in fixtures exactly") {
    val (_, oracle) = built
    queries.foreach { case (name, (q, accuracy)) =>
      val src = scala.io.Source.fromInputStream(
        getClass.getResourceAsStream(s"/golden/$name.json"), "UTF-8")
      val text = try src.mkString finally src.close()
      val pat = """\{"docId":(\d+),"score":([-0-9.eE]+)\}""".r
      val want = pat.findAllMatchIn(text)
        .map(m => (m.group(1).toLong, m.group(2).toDouble)).toVector
      val got = oracle.search(q, accuracy, 10)
      assert(got == want, s"$name '$q'")
    }
  }

  test("determinism: rebuild at a different parallelism yields identical tables and results") {
    val (io, _) = built
    import spark.implicits._
    val wh2 = java.nio.file.Files.createTempDirectory("graft_wh2_").toString
    val io2 = new ParquetTableIO(spark, wh2)
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      new IndexBuilder(spark, io2, blockSize = 8).build(TranscriptGen.generate(spark, Convs))
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
    def content(i: graft.store.TableIO) = i.read(Tables.Postings)
      .as[(String, Long, Int, Int, Array[Byte])].collect()
      .map(r => (r._1, r._2, r._3, r._4, r._5.toSeq)).sortBy(r => (r._1, r._2)).toSeq
    assert(content(io2) == content(io))
    val e1 = new SparkSearchEngine(spark, io)
    val e2 = new SparkSearchEngine(spark, io2)
    queries.take(6).foreach { case (name, (q, acc)) =>
      assert(e1.topK(e1.scores(q), acc, 50) == e2.topK(e2.scores(q), acc, 50), name)
    }
  }

  test("sharded tokenize stage: identical index, per-shard resume") {
    val (io, _) = built
    import spark.implicits._
    val wh4 = java.nio.file.Files.createTempDirectory("graft_wh4_").toString
    val io4 = new ParquetTableIO(spark, wh4)
    val turns = TranscriptGen.generate(spark, Convs)
    new IndexBuilder(spark, io4, blockSize = 8, rawShards = 3).build(turns)
    def content(i: graft.store.TableIO) = i.read(Tables.Postings)
      .as[(String, Long, Int, Int, Array[Byte])].collect()
      .map(r => (r._1, r._2, r._3, r._4, r._5.toSeq)).sortBy(r => (r._1, r._2)).toSeq
    assert(content(io4) == content(io))
    // drop one shard + downstream stages: resume redoes only those
    io4.drop(s"${Tables.PostingsRaw}/shard=1")
    io4.drop(Tables.PostingsRaw + "/_SUCCESS_DUMMY") // no-op guard
    new java.io.File(s"$wh4/${Tables.PostingsRaw}/_SUCCESS").delete()
    Seq(Tables.DocDict, Tables.Stats, Tables.TermStats, Tables.Postings, Tables.Blocks)
      .foreach(io4.drop)
    new IndexBuilder(spark, io4, blockSize = 8, rawShards = 3).build(turns, resume = true)
    assert(content(io4) == content(io))
  }

  test("resume: killed-after-stage build completes to an identical index") {
    val (io, _) = built
    import spark.implicits._
    val wh3 = java.nio.file.Files.createTempDirectory("graft_wh3_").toString
    val io3 = new ParquetTableIO(spark, wh3)
    val turns = TranscriptGen.generate(spark, Convs)
    new IndexBuilder(spark, io3, blockSize = 8).build(turns)
    // simulate a crash that lost everything after stage 2
    io3.drop(Tables.Postings); io3.drop(Tables.Blocks); io3.drop(Tables.TermStats)
    val metrics = new IndexBuilder(spark, io3, blockSize = 8).build(turns, resume = true)
    val skipped = metrics.filter(_.skipped).map(_.stage).toSet
    assert(skipped == Set(Tables.PostingsRaw, Tables.DocDict, Tables.Stats))
    def content(i: graft.store.TableIO) = i.read(Tables.Postings)
      .as[(String, Long, Int, Int, Array[Byte])].collect()
      .map(r => (r._1, r._2, r._3, r._4, r._5.toSeq)).sortBy(r => (r._1, r._2)).toSeq
    assert(content(io3) == content(io))
  }

  test("plans: term lookup pushes down; top-k is TakeOrdered; scoring is codegen'd") {
    val (io, _) = built
    val engine = new SparkSearchEngine(spark, io)
    val df = engine.scores("whale").df
      .orderBy(org.apache.spark.sql.functions.col("score").desc).limit(10)
    df.collect() // finalize the adaptive plan so codegen ids are visible
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(term), EqualTo(term,whale)]"),
      s"term filter must reach the parquet scan:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), "top-k must not global-sort")
    assert(plan.contains("*("), "BM25 scoring must stay in whole-stage codegen")
    assert(!plan.contains("positions_vb"), "term scoring must not read the positions column")
  }

  test("search returns snippets over top-k") {
    val (io, _) = built
    val engine = new SparkSearchEngine(spark, io)
    val turns = TranscriptGen.generate(spark, Convs).toDF()
    val hits = engine.search("\"blue whale\" whale", turns)
    assert(hits.nonEmpty)
    assert(hits.head.snippet.contains("<span>"))
    assert(hits == hits.sortBy(h => (-h.score, h.docId)))
  }
}
