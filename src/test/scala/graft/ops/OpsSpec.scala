package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object OpsFixture {
  lazy val spark: SparkSession = graft.EngineSpecFixture.spark
  val sfDir = "/root/testdata/sf0.001"
}

class OpsSpec extends AnyFunSuite {
  import OpsFixture._
  private def docsWithDups = {
    import spark.implicits._
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().take(50)
    // plant exact dups and a near-dup (one word changed)
    val planted = base ++ Seq(
      (1000L, base(0)._2),
      (1001L, base(1)._2),
      (1002L, base(2)._2.replaceFirst("\\w+", "zzzz")))
    spark.createDataset(planted.toIndexedSeq).toDF("doc_id", "text")
  }

  test("exact dedup groups planted duplicates") {
    import spark.implicits._
    val out = Dedup.exact(docsWithDups).filter($"n_copies" > 1)
      .as[(String, Long, Long)].collect()
    assert(out.length == 2)
    assert(out.forall { case (_, keep, n) => n == 2 && keep < 1000 })
  }

  test("minhash LSH finds the planted dups with est_jaccard 1.0") {
    import spark.implicits._
    val pairs = Dedup.minHashLsh(spark, docsWithDups, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs.exists(p => p._1 == 0 && p._2 == 1000 && p._3 == 1.0))
    assert(pairs.exists(p => p._1 == 1 && p._2 == 1001 && p._3 == 1.0))
    // estimated jaccard of every reported pair is close to the true value
    val texts = docsWithDups.as[(Long, String)].collect().toMap
    pairs.foreach { case (a, b, est) =>
      val truth = Dedup.jaccard(Dedup.shingles(texts(a), 3), Dedup.shingles(texts(b), 3))
      assert(math.abs(est - truth) < 0.35, s"pair ($a,$b): est $est vs true $truth")
    }
  }

  test("simhash: identical texts identical, near-dup within few bits") {
    val a = Dedup.simHash64("the quick brown fox jumps over the lazy dog again and again")
    val b = Dedup.simHash64("the quick brown fox jumps over the lazy dog again and again")
    val c = Dedup.simHash64("the quick brown fox jumps over the lazy cat again and again")
    val far = Dedup.simHash64("completely unrelated content about spark query engines")
    assert(a == b)
    assert(java.lang.Long.bitCount(a ^ c) <= 16)
    assert(java.lang.Long.bitCount(a ^ far) > java.lang.Long.bitCount(a ^ c))
  }

  test("simhash near-dup pairs: banded search equals brute force (pigeonhole recall)") {
    import spark.implicits._
    val docs = docsWithDups
    val got = Dedup.simHashNearDup(spark, docs, maxBits = 3, blocks = 4)
      .as[(Long, Long, Int)].collect().toSet
    val hashes = docs.as[(Long, String)].collect().map { case (id, t) => (id, Dedup.simHash64(t)) }
    val want = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      h = java.lang.Long.bitCount(ha ^ hb) if h <= 3
    } yield (a, b, h)).toSet
    assert(got == want)
    assert(want.exists { case (a, b, h) => a == 0 && b == 1000 && h == 0 }) // planted dup
  }

  test("dedup clusters: connected components equal a driver union-find") {
    import spark.implicits._
    val docs = docsWithDups
    val pairs = Dedup.simHashNearDup(spark, docs, maxBits = 3, blocks = 4)
    val got = Dedup.dedupClustersManaged(spark, pairs, docs)(
      _.as[(Long, Long, Boolean)].collect()).map(r => r._1 -> r._2).toMap
    // driver union-find ground truth
    val ids = docs.select("doc_id").as[Long].collect()
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x0: Long): Long = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    pairs.select("doc_a", "doc_b").as[(Long, Long)].collect().foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    ids.foreach(i => assert(got(i) == find(i), s"doc $i"))
    assert(got(1000L) == 0L, "planted exact dup clusters with its source")
  }

  test("applyKeepers: one survivor per cluster, sizes account for every doc") {
    import spark.implicits._
    val docs = docsWithDups
    val clusters = Dedup.dedupClusters(
      spark, Dedup.simHashNearDup(spark, docs, maxBits = 3, blocks = 4), docs)
    val kept = Dedup.applyKeepers(spark, docs, clusters)
      .as[(Long, Long, Long)].collect()
    val nClusters = clusters.select("cluster_id").distinct().count()
    assert(kept.length.toLong == nClusters, "exactly one keeper per cluster")
    assert(kept.map(_._3).sum == docs.count(), "cluster sizes sum to the corpus")
    assert(kept.forall { case (d, c, _) => d == c }, "keeper = min-id = cluster id")
    // the planted exact dup of doc 0 is dropped; doc 0 survives with size ≥ 2
    assert(!kept.exists(_._1 == 1000L))
    assert(kept.find(_._1 == 0L).exists(_._3 >= 2))
  }

  test("ngram jaccard verifies planted near-dup above threshold") {
    import spark.implicits._
    val pairs = Dedup.ngramJaccardPairs(spark, docsWithDups, threshold = 0.3)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 0 && p._2 == 1000 && p._3 == 1.0))
    assert(pairs.exists(p => p._1 == 2 && p._2 == 1002 && p._3 >= 0.3 && p._3 < 1.0))
  }

  test("brute-force ANN matches a driver-side exact computation") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val got = Similarity.bruteForceTopK(emb, 0L, 10).as[(Long, Double)].collect()
    val all = emb.select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val q = all.find(_._1 == 0L).get._2
    val want = all.filter(_._1 != 0L)
      .map { case (id, v) => (id, Similarity.cosine(v, q)) }
      .sortBy { case (id, c) => (-c, id) }.take(10)
    assert(got.map(_._1).toSeq == want.map(_._1).toSeq)
    got.zip(want).foreach { case ((_, g), (_, w)) => assert(math.abs(g - w) < 1e-12) }
  }

  private def clusteredVecs = {
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(8, 16)(rnd.nextGaussian())
    (0L until 400L).map { i =>
      val c = centers((i % 8).toInt)
      (i, c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq)
    }
  }

  test("LSH ANN: good recall on clustered vectors") {
    import spark.implicits._
    val emb = spark.createDataset(clusteredVecs).toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(emb, 0L, 10).as[(Long, Double)].collect().map(_._1).toSet
    val lsh = Similarity.lshTopK(spark, emb, 0L, 10, probeHamming = 2)
      .as[(Long, Double)].collect().map(_._1).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.7, s"recall $recall")
  }

  test("IVF ANN (persisted index): good recall; scores exact within probed cells; partition-pruned scan") {
    import spark.implicits._
    val emb = spark.createDataset(clusteredVecs).toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    Similarity.buildIvfIndex(spark, emb, idx, nCells = 16)
    val q = clusteredVecs.find(_._1 == 0L).get._2
    val probe = Similarity.ivfTopKIndexed(spark, idx, q, 0L, 10, nProbe = 6)
    // the probe must be a partition-pruned read of the persisted table —
    // the index-once/query-many contract (VERDICT r2 item 1)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("cell"),
      s"expected partition filters on cell in:\n$plan")
    val ivf = probe.as[(Long, Double)].collect()
    val brute = Similarity.bruteForceTopK(emb, 0L, 10).as[(Long, Double)].collect()
    val recall = (brute.map(_._1).toSet intersect ivf.map(_._1).toSet).size.toDouble / brute.length
    assert(recall >= 0.7, s"recall $recall")
    val exact = brute.toMap
    ivf.foreach { case (id, c) =>
      exact.get(id).foreach(e => assert(math.abs(c - e) < 1e-12))
    }
  }

  test("IVF ANN: k-means-trained codebook tightens recall at the same nProbe") {
    import spark.implicits._
    val emb = spark.createDataset(clusteredVecs).toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("ivf_trained").toString
    Similarity.buildIvfIndex(spark, emb, idx, nCells = 16)
    Similarity.trainIvfCentroids(spark, emb, idx, nCells = 16, iters = 5)
    val q = clusteredVecs.find(_._1 == 0L).get._2
    val brute = Similarity.bruteForceTopK(emb, 0L, 10).as[(Long, Double)]
      .collect().map(_._1).toSet
    val ivf = Similarity.ivfTopKIndexed(spark, idx, q, 0L, 10, nProbe = 4)
      .as[(Long, Double)].collect().map(_._1).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.85, s"trained recall $recall")
  }

  test("LSH ANN (persisted index): recall vs one-shot identity, partition-pruned scan") {
    import spark.implicits._
    val emb = spark.createDataset(clusteredVecs).toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("lsh_idx").toString
    Similarity.buildLshIndex(spark, emb, idx)
    val q = clusteredVecs.find(_._1 == 0L).get._2
    val probe = Similarity.lshTopKIndexed(spark, idx, q, 0L, 10, probeHamming = 2)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["),
      s"expected partition filters in:\n$plan")
    // indexed path ≡ one-shot path (same planes, same probes, same scores)
    val indexed = probe.as[(Long, Double)].collect().toSeq
    val oneShot = Similarity.lshTopK(spark, emb, 0L, 10, probeHamming = 2)
      .as[(Long, Double)].collect().toSeq
    assert(indexed == oneShot)
  }

  test("PQ ANN: ADC shortlist + exact re-rank has good recall; codes are m ints") {
    import spark.implicits._
    val emb = spark.createDataset(clusteredVecs).toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("pq_idx").toString
    Similarity.buildPqIndex(spark, emb, idx, m = 8, nCodes = 16)
    // the persisted index stores m codes per vector, not the raw floats —
    // the 32×-at-dims-64 compression claim is structural
    val codes = spark.read.parquet(s"$idx/codes")
    assert(codes.columns.toSeq == Seq("vec_id", "codes"))
    val sample = codes.limit(5).as[(Long, Seq[Int])].collect()
    assert(sample.forall(_._2.length == 8))
    assert(sample.forall(_._2.forall(c => c >= 0 && c < 16)))
    val q = clusteredVecs.find(_._1 == 0L).get._2
    val pq = Similarity.pqTopKIndexed(spark, idx, emb, q, 0L, 10, shortlist = 100)
      .as[(Long, Double)].collect()
    val brute = Similarity.bruteForceTopK(emb, 0L, 10).as[(Long, Double)].collect()
    val recall = (brute.map(_._1).toSet intersect pq.map(_._1).toSet).size.toDouble / brute.length
    assert(recall >= 0.7, s"PQ recall $recall")
    // the re-rank is EXACT cosine: any overlap with brute force must agree
    val exact = brute.toMap
    pq.foreach { case (id, c) =>
      exact.get(id).foreach(e => assert(math.abs(c - e) < 1e-12))
    }
  }

  test("IVF-PQ ANN: partition-pruned ADC scan, good recall, exact re-rank") {
    import spark.implicits._
    val emb = spark.createDataset(clusteredVecs).toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    Similarity.buildIvfPqIndex(spark, emb, idx, nCells = 16, m = 8, nCodes = 16)
    val q = clusteredVecs.find(_._1 == 0L).get._2
    val probe = Similarity.ivfPqTopKIndexed(spark, idx, emb, q, 0L, 10,
      nProbe = 6, shortlist = 100)
    val got = probe.as[(Long, Double)].collect()
    val brute = Similarity.bruteForceTopK(emb, 0L, 10).as[(Long, Double)].collect()
    val recall = (brute.map(_._1).toSet intersect got.map(_._1).toSet).size.toDouble / brute.length
    assert(recall >= 0.7, s"IVF-PQ recall $recall")
    val exact = brute.toMap
    got.foreach { case (id, c) =>
      exact.get(id).foreach(e => assert(math.abs(c - e) < 1e-12))
    }
    // the ADC scan must be a partition-pruned read of the codes table
    import org.apache.spark.sql.functions.col
    val scan = spark.read.parquet(s"$idx/codes")
      .filter(col("cell").isin(0, 1) && col("vec_id") =!= 0L)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("cell"),
      s"expected partition filters on cell in:\n$plan")
  }

  test("bulk PQ ANN: one ADC scan for M queries, per-query identical to the single path") {
    import spark.implicits._
    val emb = spark.createDataset(clusteredVecs).toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("pq_bulk").toString
    Similarity.buildPqIndex(spark, emb, idx, m = 8, nCodes = 16)
    val qids = Seq(0L, 7L, 123L)
    val qs = qids.map(id => id -> clusteredVecs.find(_._1 == id).get._2)
    val bulk = Similarity.pqTopKManyIndexed(spark, idx, emb, qs, k = 10, shortlist = 60)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1)
      .map { case (q, rs) =>
        q -> rs.map(r => (r._2, r._3)).sortBy { case (id, c) => (-c, id) }.toVector
      }
    qs.foreach { case (qid, v) =>
      val single = Similarity.pqTopKIndexed(spark, idx, emb, v, qid, 10, shortlist = 60)
        .as[(Long, Double)].collect().toVector
      assert(bulk.getOrElse(qid, Vector.empty) == single, s"query $qid")
    }
  }

  test("bulk LSH/IVF ANN: one pruned scan for M queries, per-query identical to the single path") {
    import spark.implicits._
    val emb = spark.createDataset(clusteredVecs).toDF("vec_id", "embedding")
    val qids = Seq(0L, 7L, 123L)
    val qs = qids.map(id => id -> clusteredVecs.find(_._1 == id).get._2)
    def grouped(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1)
      .map { case (q, rs) =>
        q -> rs.map(r => (r._2, r._3)).sortBy { case (id, c) => (-c, id) }.toVector
      }

    val lsh = java.nio.file.Files.createTempDirectory("lsh_bulk").toString
    Similarity.buildLshIndex(spark, emb, lsh, planesOpt = Some(4))
    val lshBulk = grouped(
      Similarity.lshTopKManyIndexed(spark, lsh, qs, k = 10, probeHamming = 2))
    qs.foreach { case (qid, v) =>
      val single = Similarity.lshTopKIndexed(spark, lsh, v, qid, 10, probeHamming = 2)
        .as[(Long, Double)].collect().toVector
      assert(lshBulk.getOrElse(qid, Vector.empty) == single, s"lsh query $qid")
    }
    // one scan: the union of probe buckets reaches the parquet source as
    // partition + data filters (pruned, not a corpus scan)
    val plan = Similarity.lshTopKManyIndexed(spark, lsh, qs, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("part"),
      s"expected partition filters in:\n$plan")

    val ivf = java.nio.file.Files.createTempDirectory("ivf_bulk").toString
    Similarity.buildIvfIndex(spark, emb, ivf, nCells = 16)
    val ivfBulk = grouped(
      Similarity.ivfTopKManyIndexed(spark, ivf, qs, k = 10, nProbe = 6))
    qs.foreach { case (qid, v) =>
      val single = Similarity.ivfTopKIndexed(spark, ivf, v, qid, 10, nProbe = 6)
        .as[(Long, Double)].collect().toVector
      assert(ivfBulk.getOrElse(qid, Vector.empty) == single, s"ivf query $qid")
    }
  }

  test("ANN version guard: probes refuse a stale or unversioned index") {
    import spark.implicits._
    val emb = spark.createDataset(clusteredVecs).toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("pq_ver").toString
    Similarity.buildPqIndex(spark, emb, idx)
    val q = clusteredVecs.find(_._1 == 0L).get._2
    // healthy index probes fine
    assert(Similarity.pqTopKIndexed(spark, idx, emb, q, 0L, 5).count() == 5)
    // tamper: an older layout version must be refused, not misdecoded
    Seq(1).toDF("version").coalesce(1)
      .write.mode("overwrite").parquet(s"$idx/version")
    intercept[IllegalStateException](
      Similarity.pqTopKIndexed(spark, idx, emb, q, 0L, 5))
    intercept[IllegalStateException](Similarity.appendPqCodes(spark, emb, idx))
    // unversioned (pre-marker) index: also refused
    val idx2 = java.nio.file.Files.createTempDirectory("pq_nover").toString
    Similarity.buildPqIndex(spark, emb, idx2)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(s"$idx2/version"))
    intercept[IllegalStateException](
      Similarity.pqTopKIndexed(spark, idx2, emb, q, 0L, 5))
  }

  test("incremental ANN appends: build-half + append-half ≡ build-all (PQ, IVF, LSH)") {
    import spark.implicits._
    val emb = spark.createDataset(clusteredVecs).toDF("vec_id", "embedding")
    val first = emb.filter($"vec_id" < 200)
    val second = emb.filter($"vec_id" >= 200)
    val q = clusteredVecs.find(_._1 == 0L).get._2

    val pqInc = java.nio.file.Files.createTempDirectory("pq_inc").toString
    val pqAll = java.nio.file.Files.createTempDirectory("pq_all").toString
    Similarity.buildPqIndex(spark, first, pqInc) // codebook = 16 lowest (in first half)
    Similarity.appendPqCodes(spark, second, pqInc)
    Similarity.buildPqIndex(spark, emb, pqAll)
    assert(
      Similarity.pqTopKIndexed(spark, pqInc, emb, q, 0L, 10).as[(Long, Double)].collect().toSeq ==
        Similarity.pqTopKIndexed(spark, pqAll, emb, q, 0L, 10).as[(Long, Double)].collect().toSeq)

    val ivfInc = java.nio.file.Files.createTempDirectory("ivf_inc").toString
    val ivfAll = java.nio.file.Files.createTempDirectory("ivf_all").toString
    Similarity.buildIvfIndex(spark, first, ivfInc)
    Similarity.appendIvfAssignments(spark, second, ivfInc)
    Similarity.buildIvfIndex(spark, emb, ivfAll)
    assert(
      Similarity.ivfTopKIndexed(spark, ivfInc, q, 0L, 10).as[(Long, Double)].collect().toSeq ==
        Similarity.ivfTopKIndexed(spark, ivfAll, q, 0L, 10).as[(Long, Double)].collect().toSeq)

    // LSH planes adapt to corpus size, so pin them for the comparison
    val lshInc = java.nio.file.Files.createTempDirectory("lsh_inc").toString
    val lshAll = java.nio.file.Files.createTempDirectory("lsh_all").toString
    Similarity.buildLshIndex(spark, first, lshInc, planesOpt = Some(3))
    Similarity.appendLshAssignments(spark, second, lshInc)
    Similarity.buildLshIndex(spark, emb, lshAll, planesOpt = Some(3))
    assert(
      Similarity.lshTopKIndexed(spark, lshInc, q, 0L, 10).as[(Long, Double)].collect().toSeq ==
        Similarity.lshTopKIndexed(spark, lshAll, q, 0L, 10).as[(Long, Double)].collect().toSeq)
  }

  test("PQ ANN: Lloyd's-trained codebook keeps recall at the same shortlist") {
    import spark.implicits._
    val emb = spark.createDataset(clusteredVecs).toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("pq_trained").toString
    Similarity.trainPqCodebook(spark, emb, idx, m = 8, nCodes = 16, iters = 5)
    val q = clusteredVecs.find(_._1 == 0L).get._2
    val brute = Similarity.bruteForceTopK(emb, 0L, 10).as[(Long, Double)]
      .collect().map(_._1).toSet
    val pq = Similarity.pqTopKIndexed(spark, idx, emb, q, 0L, 10, shortlist = 60)
      .as[(Long, Double)].collect().map(_._1).toSet
    val recall = (brute intersect pq).size.toDouble / brute.size
    assert(recall >= 0.8, s"trained PQ recall $recall")
  }

  test("embedding near-dup off the persisted LSH index equals the inline path") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("lsh_dedup").toString
    Similarity.buildLshIndex(spark, emb, idx) // same adaptive planes + seed
    val inline = Dedup.embeddingNearDup(spark, emb, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSeq
    val indexed = Dedup.embeddingNearDupIndexed(spark, idx, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSeq
    assert(inline == indexed)
    assert(inline.nonEmpty)
  }

  test("composed training pipeline ≡ the standalone stages chained by hand") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val out = Pipeline.trainingCorpus(spark, docs)
      .as[(Long, Long, Double, Long, Long, Int, String, Int)].collect().toSeq
    // survivors via the standalone q12/q13 operators
    val nWords = TextOps.qualityScore(docs)
      .select("doc_id", "n_words").as[(Long, Long)].collect().toMap
    val ratios = TextOps.langId(docs)
      .select("doc_id", "stopword_ratio").as[(Long, Double)].collect().toMap
    val survIds = nWords.keySet.filter(id => nWords(id) >= 15 && ratios(id) >= 0.02)
    assert(survIds.nonEmpty && survIds.size < nWords.size, "filters must bite")
    val surv = docs.filter($"doc_id".isin(survIds.toSeq: _*))
    // dedup + split via the standalone q26/q28/q36/q37 operators
    val keepers = Dedup.applyKeepers(spark, surv,
      Dedup.dedupClusters(spark, Dedup.simHashNearDup(spark, surv), surv.select($"doc_id")))
      .as[(Long, Long, Long)].collect().map(r => r._2 -> ((r._1, r._3))).toMap
    val split = TextOps.splitAssign(surv)
      .as[(Long, Int, String, Int)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val want = keepers.toSeq.map { case (docId, (cid, n)) =>
      val (bucket, sp, shard) = split(docId)
      (docId, nWords(docId), ratios(docId), cid, n, bucket, sp, shard)
    }.sortBy(_._1)
    assert(out == want)
  }

  test("hygiene pipeline ≡ the standalone stages chained by hand") {
    import spark.implicits._
    val all = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val docs = all.filter($"doc_id" % 50 =!= 7)
    val bench = all.filter($"doc_id" % 50 === 7)
    val out = Pipeline.hygieneCorpus(spark, docs, bench)
      .as[(Long, Long, Double, Double, Double, Long, Long, Int, String, Int)]
      .collect().toSeq
    // survivors via the standalone q12/q13/q47/q46 operators
    val nWords = TextOps.qualityScore(docs)
      .select("doc_id", "n_words").as[(Long, Long)].collect().toMap
    val ratios = TextOps.langId(docs)
      .select("doc_id", "stopword_ratio").as[(Long, Double)].collect().toMap
    val rep = TextOps.repetitionFilter(docs)
      .select("doc_id", "distinct_ratio", "top_bigram_frac", "verdict")
      .as[(Long, Double, Double, String)].collect().map(r => r._1 -> r).toMap
    val filtIds = nWords.keySet.filter(id =>
      nWords(id) >= 15 && ratios(id) >= 0.02 && rep(id)._4 == "ok")
    val filt = docs.filter($"doc_id".isin(filtIds.toSeq: _*))
    val contaminated = TextOps.contamination(filt, bench, n = 4)
      .select("doc_id").as[Long].collect().toSet
    val survIds = filtIds -- contaminated
    assert(contaminated.nonEmpty && survIds.nonEmpty && survIds.size < nWords.size,
      "every filter must bite")
    val surv = docs.filter($"doc_id".isin(survIds.toSeq: _*))
    val keepers = Dedup.applyKeepers(spark, surv,
      Dedup.dedupClusters(spark, Dedup.simHashNearDup(spark, surv), surv.select($"doc_id")))
      .as[(Long, Long, Long)].collect().map(r => r._2 -> ((r._1, r._3))).toMap
    val split = TextOps.splitAssign(surv)
      .as[(Long, Int, String, Int)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val want = keepers.toSeq.map { case (docId, (cid, n)) =>
      val (bucket, sp, shard) = split(docId)
      (docId, nWords(docId), ratios(docId), rep(docId)._2, rep(docId)._3,
        cid, n, bucket, sp, shard)
    }.sortBy(_._1)
    assert(out == want)
  }

  test("minhash index: indexed ≡ one-shot; build-half+append-half ≡ build-all; version guard") {
    import spark.implicits._
    val docs = docsWithDups
    val oneShot = Dedup.minHashLsh(spark, docs, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(oneShot.nonEmpty)

    val idxAll = java.nio.file.Files.createTempDirectory("mh_all").toString
    Dedup.buildMinHashIndex(spark, docs, idxAll)
    assert(Dedup.minHashLshIndexed(spark, idxAll, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq == oneShot)

    val idxInc = java.nio.file.Files.createTempDirectory("mh_inc").toString
    Dedup.buildMinHashIndex(spark, docs.filter($"doc_id" < 25), idxInc)
    Dedup.appendMinHashSigs(spark, docs.filter($"doc_id" >= 25), idxInc)
    assert(Dedup.minHashLshIndexed(spark, idxInc, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq == oneShot)

    // stale/unversioned index refused like the ANN families
    Seq(1).toDF("version").coalesce(1)
      .write.mode("overwrite").parquet(s"$idxAll/version")
    intercept[IllegalStateException](Dedup.minHashLshIndexed(spark, idxAll))
    intercept[IllegalStateException](Dedup.appendMinHashSigs(spark, docs, idxAll))
    intercept[IllegalStateException](Dedup.minHashDedupBatch(spark, idxAll, docs))
  }

  test("minhash dedup-batch-vs-corpus equals the union one-shot restricted to new pairs") {
    import spark.implicits._
    val docs = docsWithDups // planted dups live at ids 1000-1002 (the "new" batch)
    val corpus = docs.filter($"doc_id" < 1000)
    val batch = docs.filter($"doc_id" >= 1000)
    val idx = java.nio.file.Files.createTempDirectory("mh_batch").toString
    Dedup.buildMinHashIndex(spark, corpus, idx)
    val got = Dedup.minHashDedupBatch(spark, idx, batch, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    val want = Dedup.minHashLsh(spark, docs, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
      .filter { case (a, b, _) => a >= 1000 || b >= 1000 }
    assert(got == want)
    assert(got.nonEmpty) // the planted dups must be found against the corpus
    // the corpus documents were NOT re-signed: probing only touches the
    // batch (compute) + the index tables (read)
    assert(got.exists { case (a, b, est) => a == 0 && b == 1000 && est == 1.0 })
  }

  test("minhash index deletes: tombstoned ≡ built-over-survivors; compact purges") {
    import spark.implicits._
    val docs = docsWithDups
    // doc 0 pairs with planted 1000, doc 2 with near-dup 1002 — deleting
    // them must retract those pairs exactly
    val delIds = Seq(0L, 2L)
    val idxDel = java.nio.file.Files.createTempDirectory("mh_del").toString
    Dedup.buildMinHashIndex(spark, docs, idxDel)
    Dedup.deleteFromMinHashIndex(spark, idxDel, delIds)
    val idxSurv = java.nio.file.Files.createTempDirectory("mh_surv").toString
    Dedup.buildMinHashIndex(spark, docs.filter(!$"doc_id".isin(delIds: _*)), idxSurv)
    def pairs(p: String) = Dedup.minHashLshIndexed(spark, p, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    val want = pairs(idxSurv)
    assert(pairs(idxDel) == want)
    assert(want.exists { case (a, b, _) => a == 1L && b == 1001L })
    assert(!want.exists { case (a, b, _) => delIds.contains(a) || delIds.contains(b) })
    // the batch probe applies the tombstones to bands AND the estimate
    val batch = docs.filter($"doc_id" >= 1000)
    def probe(p: String) = Dedup.minHashDedupBatch(spark, p, batch, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(probe(idxDel) == probe(idxSurv))
    // physical purge: identical results, tombstones retired, rows gone
    Dedup.compactMinHashIndex(spark, idxDel)
    assert(!new java.io.File(s"$idxDel/deleted").exists())
    assert(spark.read.parquet(s"$idxDel/sigs")
      .filter($"doc_id".isin(delIds: _*)).count() == 0)
    assert(pairs(idxDel) == want)
  }

  test("ANN index deletes: tombstoned ≡ built-over-survivors (LSH/IVF/PQ/IVF-PQ); compact purges") {
    import spark.implicits._
    val emb = spark.createDataset(clusteredVecs).toDF("vec_id", "embedding")
    // keep the codebook-training rows (the 16 lowest vec_ids) so the
    // survivors rebuild trains the IDENTICAL centroids/codebooks — the
    // contract is filter-then-topk under the same quantization
    val delIds = (20L to 40L).toSeq
    val surv = emb.filter(!$"vec_id".isin(delIds: _*))
    val q = clusteredVecs.find(_._1 == 0L).get._2
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

    val (lshDel, lshSurv) = (tmp("lsh_del"), tmp("lsh_surv"))
    Similarity.buildLshIndex(spark, emb, lshDel, planesOpt = Some(4))
    Similarity.deleteFromIndex(spark, lshDel, delIds)
    Similarity.buildLshIndex(spark, surv, lshSurv, planesOpt = Some(4))
    def lshTop(p: String) = Similarity.lshTopKIndexed(spark, p, q, 0L, 15, probeHamming = 2)
      .as[(Long, Double)].collect().toSeq
    assert(lshTop(lshDel) == lshTop(lshSurv))
    assert(!lshTop(lshDel).exists { case (id, _) => delIds.contains(id) })

    val (ivfDel, ivfSurv) = (tmp("ivf_del"), tmp("ivf_surv"))
    Similarity.buildIvfIndex(spark, emb, ivfDel, nCells = 16)
    Similarity.deleteFromIndex(spark, ivfDel, delIds)
    Similarity.buildIvfIndex(spark, surv, ivfSurv, nCells = 16)
    def ivfTop(p: String) = Similarity.ivfTopKIndexed(spark, p, q, 0L, 15, nProbe = 6)
      .as[(Long, Double)].collect().toSeq
    assert(ivfTop(ivfDel) == ivfTop(ivfSurv))

    val (pqDel, pqSurv) = (tmp("pq_del"), tmp("pq_surv"))
    Similarity.buildPqIndex(spark, emb, pqDel, m = 8, nCodes = 16)
    Similarity.deleteFromIndex(spark, pqDel, delIds)
    Similarity.buildPqIndex(spark, surv, pqSurv, m = 8, nCodes = 16)
    def pqTop(p: String) = Similarity.pqTopKIndexed(spark, p, emb, q, 0L, 15, shortlist = 60)
      .as[(Long, Double)].collect().toSeq
    assert(pqTop(pqDel) == pqTop(pqSurv))

    val (ipDel, ipSurv) = (tmp("ivfpq_del"), tmp("ivfpq_surv"))
    Similarity.buildIvfPqIndex(spark, emb, ipDel, nCells = 16, m = 8, nCodes = 16)
    Similarity.deleteFromIndex(spark, ipDel, delIds)
    Similarity.buildIvfPqIndex(spark, surv, ipSurv, nCells = 16, m = 8, nCodes = 16)
    def ipTop(p: String) = Similarity.ivfPqTopKIndexed(spark, p, emb, q, 0L, 15,
      nProbe = 6, shortlist = 60).as[(Long, Double)].collect().toSeq
    assert(ipTop(ipDel) == ipTop(ipSurv))

    // physical purge on both layouts (IVF-PQ: codes; IVF: assignments):
    // probes identical, tombstones retired, rows gone
    val before = ipTop(ipDel)
    Similarity.compactIndex(spark, ipDel)
    assert(!new java.io.File(s"$ipDel/deleted").exists())
    assert(spark.read.parquet(s"$ipDel/codes")
      .filter($"vec_id".isin(delIds: _*)).count() == 0)
    assert(ipTop(ipDel) == before)
    val ivfBefore = ivfTop(ivfDel)
    Similarity.compactIndex(spark, ivfDel)
    assert(!new java.io.File(s"$ivfDel/deleted").exists())
    assert(spark.read.parquet(s"$ivfDel/assignments")
      .filter($"vec_id".isin(delIds: _*)).count() == 0)
    assert(ivfTop(ivfDel) == ivfBefore)
  }

  test("minhash dedup-batch replay: already-appended batch ids yield identical pairs") {
    import spark.implicits._
    // an at-least-once replay AFTER the append committed: the index holds
    // the batch's own signatures/banding rows. Without excluding those
    // copies the estimate join duplicates rows and bucket sizes double-
    // count (the round-4 ADVICE cap edge) — the replay must recompute the
    // first run's pairs exactly.
    val docs = docsWithDups
    val corpus = docs.filter($"doc_id" < 1000)
    val batch = docs.filter($"doc_id" >= 1000)
    val idx = java.nio.file.Files.createTempDirectory("mh_replay").toString
    Dedup.buildMinHashIndex(spark, corpus, idx)
    val first = Dedup.minHashDedupBatch(spark, idx, batch, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    Dedup.appendMinHashSigs(spark, batch, idx) // the committed append
    val replay = Dedup.minHashDedupBatch(spark, idx, batch, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(replay == first)
    assert(first.nonEmpty)
  }

  test("managed dedup/pipeline variants: no cache growth across repeated calls") {
    import spark.implicits._
    val docs = docsWithDups
    val corpus = docs.filter($"doc_id" < 1000)
    val batch = docs.filter($"doc_id" >= 1000)
    val idx = java.nio.file.Files.createTempDirectory("mh_managed").toString
    Dedup.buildMinHashIndex(spark, corpus, idx)
    def persisted = spark.sparkContext.getPersistentRDDs.size
    // warm once, snapshot, then repeat: the managed variants must release
    // every per-call cache/checkpoint (the daily-pipeline leak, round-4
    // VERDICT item 3 + ADVICE)
    Dedup.minHashDedupBatchManaged(spark, idx, batch)(_.count())
    Pipeline.trainingCorpusManaged(spark, docs)(_.count())
    val base = persisted
    (1 to 4).foreach { _ =>
      Dedup.minHashDedupBatchManaged(spark, idx, batch)(_.count())
      Pipeline.trainingCorpusManaged(spark, docs)(_.count())
    }
    // getPersistentRDDs is JVM-global and sbt runs suites in parallel, so
    // a query mid-flight in another suite counts its transient caches
    // here. Those drain when that query finishes; a genuine managed-
    // variant leak never drains — poll before declaring one.
    var now = persisted
    val deadline = System.nanoTime + 120L * 1000 * 1000 * 1000
    while (now > base && System.nanoTime < deadline) {
      Thread.sleep(2000); now = persisted
    }
    val held = spark.sparkContext.getPersistentRDDs.values
      .map(r => s"[${r.id}] ${r.toString.replace('\n', ' ').take(120)}").mkString("; ")
    assert(now <= base,
      s"managed caches grew: $base -> $now (stable after drain wait); held: $held")
    // managed ≡ unmanaged results
    val managed = Pipeline.trainingCorpusManaged(spark, docs)(
      _.as[(Long, Long, Double, Long, Long, Int, String, Int)].collect().toSeq)
    val plain = Pipeline.trainingCorpus(spark, docs)
      .as[(Long, Long, Double, Long, Long, Int, String, Int)].collect().toSeq
    assert(managed == plain && managed.nonEmpty)
  }

  test("simhash banding survives bucket-overflow scale (Manku block-combination keys)") {
    import spark.implicits._
    // adversarial corpus: every 16-bit band value is shared by > maxBucket
    // docs (the round-2 scheme would skip EVERY bucket → recall 0), but
    // the planted near-dup pairs still collide on a wide combination key.
    // 64-bit hashes: id-th hash spreads ids across high bits while the
    // low 16 bits cycle through only 8 values → 16-bit buckets overflow.
    val n = 4000
    val hashes = (0 until n).map { i =>
      val base = DetHash.mix64(i.toLong) & ~0xFFFFL
      (i.toLong, base | (i % 8).toLong)
    }
    // plant 20 near-dup pairs at hamming EXACTLY 3, one flipped bit in each
    // of the three high 16-bit bands — so under blocks=4 the only clean
    // band is the overflowing low one, and the pair is only findable there
    val planted = (0 until 20).map { i =>
      ((n + i).toLong, hashes(i)._2 ^ (1L << 20) ^ (1L << 36) ^ (1L << 52))
    }
    val df = spark.createDataset((hashes ++ planted).toIndexedSeq).toDF("doc_id", "simhash")
    val maxBucket = 100
    // old shape: blocks=4 → 16-bit keys; every key overflows maxBucket=100
    val old = Dedup.simHashNearDupBits(spark, df, maxBits = 3, blocks = 4, maxBucket = maxBucket)
      .as[(Long, Long, Int)].collect()
    // Manku keys: blocks=8 → C(8,5)=56 combos of 40-bit keys; recall 1.0
    val got = Dedup.simHashNearDupBits(spark, df, maxBits = 3, blocks = 8, maxBucket = maxBucket)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    val plantedPairs = (0 until 20).map(i => (i.toLong, (n + i).toLong)).toSet
    assert((plantedPairs -- got).isEmpty,
      s"wide-key recall lost pairs: ${(plantedPairs -- got).take(5)}")
    val oldSet = old.map(r => (r._1, r._2)).toSet
    assert((plantedPairs intersect oldSet).isEmpty,
      "narrow 16-bit buckets were expected to collapse (skip) under maxBucket here")
  }

  test("media features: deterministic, exercises all kinds") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(60)
    val media = Multimodal.synthesize(docs)
    val f1 = Multimodal.extractFeatures(spark, media).collect()
    val f2 = Multimodal.extractFeatures(spark, media).collect()
    assert(f1.toSeq == f2.toSeq)
    val kinds = f1.map(_.getString(1)).toSet
    assert(kinds == Set("image", "audio", "video"))
    assert(f1.forall(_.getDouble(5) > 0)) // feature_norm
    val frames = Multimodal.sampleFrames(spark, media).collect()
    assert(frames.nonEmpty)
  }

  test("kind-dispatched real media: features + sampled frames recompute from the formulas") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(30)
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    val feats = Multimodal.extractFeaturesReal(spark, Multimodal.synthesizeMedia(docs))
      .as[(Long, String, Long, Seq[Long])].collect()
    assert(feats.length == 30)
    assert(feats.map(_._2).toSet == Set("image", "audio", "video"))
    feats.foreach { case (id, kind, nBytes, sums) =>
      assert(nBytes > 0)
      val s = (texts(id) + id).getBytes("UTF-8")
      val l = s.length
      kind match {
        case "image" =>
          var r = 0L; var g = 0L; var b = 0L
          (0 until 256).foreach { i =>
            r += s(i % l) & 0xff; g += s((i * 7 + 3) % l) & 0xff; b += (id + i) & 0xff
          }
          assert(sums == Seq(16L, 16L, r, g, b), s"image $id")
        case "audio" =>
          val vs = (0 until 256).map(i => ((s(i % l) & 0xff) - 128) * 256 + ((id + i) % 256).toInt)
          assert(sums == Seq(8000L, 256L, vs.sum.toLong, vs.map(math.abs).sum.toLong), s"audio $id")
        case "video" =>
          var r = 0L; var g = 0L; var b = 0L
          for (f <- 0 until 4; i <- 0 until 256) {
            r += s((i + 3 * f) % l) & 0xff
            g += s((i * 7 + 3 + f) % l) & 0xff
            b += (id + i + f) & 0xff
          }
          assert(sums == Seq(4L, r, g, b), s"video $id")
      }
    }
    // sampled frames: stride-2 over an 8-frame AVI decodes exactly 0,2,4,6
    val vids = docs.filter($"doc_id" % 3 === 2)
    val frames = Multimodal.sampleFramesReal(spark,
      Multimodal.synthesizeVideos(vids, nFrames = 8), stride = 2, maxFrames = 4)
      .as[(Long, Int, Int, Int, Double, Double, Double)].collect()
    assert(frames.map(_._2).toSet == Set(0, 2, 4, 6))
    frames.foreach { case (id, f, w, h, mr, mg, mb) =>
      assert(w == 16 && h == 16)
      val s = (texts(id) + id).getBytes("UTF-8"); val l = s.length
      var r = 0L; var g = 0L; var b = 0L
      (0 until 256).foreach { i =>
        r += s((i + 3 * f) % l) & 0xff
        g += s((i * 7 + 3 + f) % l) & 0xff
        b += (id + i + f) & 0xff
      }
      assert(mr == r / 256.0 && mg == g / 256.0 && mb == b / 256.0, s"media $id frame $f")
    }
  }

  test("real image decode: PNG round-trip through ImageIO, resize, features") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(40)
    val images = Multimodal.synthesizeImages(docs)
    val feats = Multimodal.imageFeatures(spark, images)
      .as[(Long, Int, Int, Double, Double, Double, Seq[Float])].collect()
    assert(feats.length == 40)
    feats.foreach { case (_, w, h, r, g, b, thumb) =>
      assert(w == 16 && h == 16)
      assert(r >= 0 && r <= 255 && g >= 0 && g <= 255 && b >= 0 && b <= 255)
      assert(thumb.length == 16 && thumb.forall(v => v >= 0 && v <= 255))
    }
    // deterministic across runs
    val again = Multimodal.imageFeatures(spark, Multimodal.synthesizeImages(docs))
      .as[(Long, Int, Int, Double, Double, Double, Seq[Float])].collect()
    assert(feats.map(f => (f._1, f._4, f._5, f._6)).toSeq ==
      again.map(f => (f._1, f._4, f._5, f._6)).toSeq)
  }

  test("real audio decode: WAV round-trip through javax.sound.sampled") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(40)
    val feats = Multimodal.audioFeatures(spark, Multimodal.synthesizeAudio(docs))
      .as[(Long, Int, Long, Double, Double)].collect()
    assert(feats.length == 40)
    // decoded means equal a direct driver-side computation from the formula
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    feats.foreach { case (id, rate, n, mean, meanAbs) =>
      assert(rate == 8000 && n == 256)
      val s = (texts(id) + id).getBytes("UTF-8")
      val vs = (0 until 256).map(i => ((s(i % s.length) & 0xff) - 128) * 256 + ((id + i) % 256).toInt)
      assert(mean == vs.sum.toDouble / 256)
      assert(meanAbs == vs.map(math.abs).sum.toDouble / 256)
    }
  }

  test("real video decode: RIFF/AVI container walk + per-frame PNG round-trip") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(20)
    val feats = Multimodal.videoFrameFeatures(spark, Multimodal.synthesizeVideos(docs))
      .as[(Long, Int, Int, Int, Double, Double, Double)].collect()
    assert(feats.length == 20 * 4)
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    feats.foreach { case (id, f, w, h, mr, mg, mb) =>
      assert(w == 16 && h == 16 && f >= 0 && f < 4)
      val bytes = (texts(id) + id).getBytes("UTF-8")
      val l = bytes.length
      var r = 0L; var g = 0L; var b = 0L
      (0 until 256).foreach { i =>
        r += bytes((i + 3 * f) % l) & 0xff
        g += bytes((i * 7 + 3 + f) % l) & 0xff
        b += (id + i + f) & 0xff
      }
      assert(mr == r / 256.0 && mg == g / 256.0 && mb == b / 256.0,
        s"media $id frame $f")
    }
  }

  test("splitAssign: md5-exact, subset-stable, proportioned") {
    import spark.implicits._
    val big = spark.range(0, 10000).toDF("doc_id")
    val out = TextOps.splitAssign(big).as[(Long, Int, String, Int)].collect()
    assert(out.length == 10000)
    val trainFrac = out.count(_._3 == "train").toDouble / out.length
    val valFrac = out.count(_._3 == "val").toDouble / out.length
    assert(math.abs(trainFrac - 0.9) < 0.02, s"train $trainFrac")
    assert(math.abs(valFrac - 0.05) < 0.01, s"val $valFrac")
    // subset stability: a doc's split NEVER depends on the rest of the corpus
    val sub = TextOps.splitAssign(big.filter($"doc_id" % 3 === 0))
      .as[(Long, Int, String, Int)].collect().toSet
    assert(sub.nonEmpty && sub.subsetOf(out.toSet))
    // bit-exact vs an independent JDK MessageDigest computation
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long, tag: String, m: Int): Int = {
      val hex = md.digest(s"graft:$tag:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.take(15), 16) % m).toInt
    }
    out.take(100).foreach { case (id, b, split, shard) =>
      assert(b == bucket(id, "split", 1000), s"doc $id bucket")
      assert(shard == bucket(id, "shard", 8), s"doc $id shard")
      val want = if (b < 900) "train" else if (b < 950) "val" else "test"
      assert(split == want)
    }
  }

  test("rolling hash: shift-sensitive, deterministic") {
    val t1 = Seq("a", "b", "c", "d", "e", "f", "g", "h", "i")
    assert(TextOps.rollingHash(t1) == TextOps.rollingHash(t1))
    assert(TextOps.rollingHash(t1) != TextOps.rollingHash(t1.reverse))
    assert(TextOps.rollingHash(Seq("x")).nonEmpty)
    assert(TextOps.rollingHash(Nil).isEmpty)
  }

  test("token counts agree with a hand computation") {
    import spark.implicits._
    val df = spark.createDataset(Seq((1L, "a b  c"), (2L, ""), (3L, "one,two three4five")))
      .toDF("doc_id", "text")
    val got = TextOps.tokenCounts(df).as[(Long, Int, Int, Int)].collect().toSeq
    // "three4five" is ONE [A-Za-z0-9]+ run — digits don't split word tokens
    assert(got == Seq((1L, 4, 3, 6), (2L, 1, 0, 0), (3L, 2, 3, 18)))
  }

  test("contamination: planted n-gram overlap flagged, clean docs not") {
    import spark.implicits._
    val bench = spark.createDataset(Seq(
      (900L, "the quick brown fox jumps over the lazy dog"),
      (901L, "one two"))) // < n tokens → whole sequence is the gram
      .toDF("doc_id", "text")
    val corpus = spark.createDataset(Seq(
      (1L, "he said the quick brown fox runs"), // shares "the quick brown fox"
      (2L, "totally unrelated words here today"),
      (3L, "one two"),                          // equals the short benchmark gram
      (4L, "quick brown fox jumps over the lazy dog indeed"), // 3 shared 4-grams... compute below
      (5L, "")))
      .toDF("doc_id", "text")
    val got = TextOps.contamination(corpus, bench, n = 4)
      .as[(Long, Long)].collect().toMap
    // driver-side ground truth over the same definition
    def grams(s: String): Set[String] = {
      val t = "[a-z0-9]+".r.findAllIn(s.toLowerCase).toVector
      if (t.isEmpty) Set.empty
      else if (t.length < 4) Set(t.mkString(" "))
      else t.sliding(4).map(_.mkString(" ")).toSet
    }
    val bg = Set("the quick brown fox jumps over the lazy dog", "one two").flatMap(grams)
    val want = Seq(1L, 2L, 3L, 4L, 5L)
      .map(id => id -> grams(Map(
        1L -> "he said the quick brown fox runs",
        2L -> "totally unrelated words here today",
        3L -> "one two",
        4L -> "quick brown fox jumps over the lazy dog indeed",
        5L -> "")(id)).count(bg.contains).toLong)
      .filter(_._2 > 0).toMap
    assert(got == want)
    assert(got.contains(1L) && got.contains(3L) && got.contains(4L))
    assert(!got.contains(2L) && !got.contains(5L))
    // a doc whose 4-grams all appear in the benchmark counts each once
    assert(got(4L) == grams("quick brown fox jumps over the lazy dog indeed").count(bg.contains))
  }

  test("contamination plan: one linear corpus pass, no join, no corpus shuffle") {
    // round 6: the benchmark gram set is a broadcast hash set probed inside
    // the corpus-side kernel pass — the plan must contain NO join operator
    // and NO shuffle of the corpus (the only exchange is the final
    // orderBy's range partitioning of the already-tiny result)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val plan = TextOps.contamination(
      docs.filter(col("doc_id") % 50 =!= 7),
      docs.filter(col("doc_id") % 50 === 7), n = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin") &&
      !plan.contains("ShuffledHashJoin"),
      s"corpus side must not join at all:\n$plan")
    assert(plan.contains("MapPartitions"), s"kernel pass missing:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      s"no hash shuffle may remain (round-5 had the groupBy exchange):\n$plan")
  }

  test("repetition filter: hand-computed signals and verdicts") {
    import spark.implicits._
    val df = spark.createDataset(Seq(
      (1L, "a a a a b"),          // top token 4/5, top bigram "a a" 3/4 → repetitive
      // all distinct, long enough that top_bigram 1/(n-1) clears 0.1 → ok
      (2L, "the quick brown fox jumps over one lazy dog while two cats watch from a tall green fence near town"),
      (3L, ""),                    // empty → zeros, distinct_ratio 0 → repetitive
      (4L, "x y x y x y x y")))    // bigram "x y" 4/7 → repetitive
      .toDF("doc_id", "text")
    val got = TextOps.repetitionFilter(df)
      .as[(Long, Long, Double, Double, Double, String)].collect().toSeq
    assert(got == Seq(
      (1L, 5L, 2.0 / 5, 4.0 / 5, 3.0 / 4, "repetitive"),
      (2L, 20L, 1.0, 1.0 / 20, 1.0 / 19, "ok"),
      (3L, 0L, 0.0, 0.0, 0.0, "repetitive"),
      (4L, 8L, 2.0 / 8, 4.0 / 8, 4.0 / 7, "repetitive")))
  }

  test("substring dup: planted repeated spans measured, within-doc repeats count") {
    import spark.implicits._
    val span = (1 to 10).map(i => s"w$i").mkString(" ") // exactly one window
    val df = spark.createDataset(Seq(
      (1L, span),                                  // window shared with doc 2 → dup
      (2L, s"lead in words then $span"),           // contains the span + unique windows
      (3L, "all fresh tokens " + (1 to 10).map(i => s"u$i").mkString(" ")),
      (4L, s"$span $span"),                        // 20 toks: within-doc repeat at offset 10
      (5L, "too short")))                          // < 10 tokens → no windows
      .toDF("doc_id", "text")
    val got = Dedup.substringDup(df).as[(Long, Long, Long, Double)].collect().toSeq
    // driver ground truth over the same definition
    val texts = df.as[(Long, String)].collect().toMap
    val wins = texts.map { case (id, t) =>
      id -> "[a-z0-9]+".r.findAllIn(t.toLowerCase).toVector.sliding(10)
        .filter(_.length == 10).map(_.mkString(" ")).toVector
    }
    val occ = wins.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val want = wins.toSeq.sortBy(_._1).map { case (id, ws) =>
      val dup = ws.count(w => occ(w) > 1).toLong
      (id, ws.length.toLong, dup, if (ws.nonEmpty) dup.toDouble / ws.length else 0.0)
    }
    assert(got == want)
    assert(got.find(_._1 == 1L).get._4 == 1.0, "doc 1 is entirely a shared span")
    assert(got.find(_._1 == 3L).get._3 == 0L, "fresh doc has no dup windows")
    val d4 = got.find(_._1 == 4L).get
    assert(d4._2 == 11 && d4._3 >= 2, "within-doc repeat makes both copies dup windows")
    assert(got.find(_._1 == 5L).get == ((5L, 0L, 0L, 0.0)), "short doc → zeros")
  }

  test("substring dup on the fixture corpus matches a driver computation") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val got = Dedup.substringDup(docs).as[(Long, Long, Long, Double)].collect().toSeq
    val texts = docs.as[(Long, String)].collect()
    val wins = texts.map { case (id, t) =>
      id -> "[a-z0-9]+".r.findAllIn(t.toLowerCase).toVector.sliding(10)
        .filter(_.length == 10).map(_.mkString(" ")).toVector
    }
    val occ = wins.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val want = wins.sortBy(_._1).map { case (id, ws) =>
      val dup = ws.count(w => occ(w) > 1).toLong
      (id, ws.length.toLong, dup, if (ws.nonEmpty) dup.toDouble / ws.length else 0.0)
    }.toSeq
    assert(got == want)
    assert(got.exists(_._4 == 1.0), "fixture's exact dups are fully duplicated spans")
    assert(got.exists(r => r._4 > 0.0 && r._4 < 1.0), "and some spans are partial")
  }

  test("repetition filter on the fixture corpus matches a driver computation") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val got = TextOps.repetitionFilter(docs)
      .as[(Long, Long, Double, Double, Double, String)].collect().toSeq
    val want = docs.as[(Long, String)].collect().sortBy(_._1).map { case (id, text) =>
      val t = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toVector
      val bi = if (t.length < 2) Vector.empty else t.sliding(2).map(_.mkString(" ")).toVector
      def topMult(xs: Vector[String]): Double =
        if (xs.isEmpty) 0.0 else xs.groupBy(identity).values.map(_.size).max.toDouble
      val n = t.length
      val dr = if (n > 0) t.distinct.length.toDouble / n else 0.0
      val ttf = if (n > 0) topMult(t) / n else 0.0
      val tbf = if (n > 1) topMult(bi) / (n - 1) else 0.0
      (id, n.toLong, dr, ttf, tbf, if (tbf > 0.1 || dr < 0.3) "repetitive" else "ok")
    }.toSeq
    assert(got == want)
    assert(got.exists(_._6 == "repetitive") && got.exists(_._6 == "ok"),
      "fixture exercises both verdicts")
  }
}
