package graft.operators

import graft.{SparkEntry, TestSpark}
import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup + ANN behavior tests: known near-dups are found, LSH recalls a
  * sane fraction of the brute-force top-k, vector identities hold.
  */
class DedupSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private def run(name: String) = SparkEntry.queries(name)(spark, TestSpark.Sf001)

  test("cosine of a vector with itself is exactly 1.0") {
    val v = Array.tabulate(64)(i => (math.sin(i + 1) * 0.3).toFloat)
    val df = Seq((1L, v)).toDF("id", "embedding")
      .withColumn("nrm", VectorOps.normScaled($"embedding"))
      .withColumn("cos", VectorOps.cosineFromScaled(
        VectorOps.dotScaled($"embedding", $"embedding"), $"nrm", $"nrm"))
    assert(df.select("cos").as[Double].head() === 1.0)
  }

  test("orthogonal one-hot vectors have cosine 0") {
    val a = Array.tabulate(64)(i => if (i == 0) 1f else 0f)
    val b = Array.tabulate(64)(i => if (i == 1) 1f else 0f)
    val df = Seq((a, b)).toDF("a", "b")
      .withColumn("cos", VectorOps.cosineFromScaled(
        VectorOps.dotScaled($"a", $"b"),
        VectorOps.normScaled($"a"), VectorOps.normScaled($"b")))
    assert(df.select("cos").as[Double].head() === 0.0)
  }

  test("minhash LSH finds the word-level near-dup pairs that n-gram Jaccard finds") {
    // q35 (char-5 shingle MinHash, jaccard>=0.5) and q37 (word-3-gram,
    // blocked) both target the same engineered near-dups; the exact
    // char-shingle pair set must contain every high-sim word-gram pair
    // that shares a block.
    val mh = run("q35_minhash_lsh").select("i", "j").as[(Long, Long)].collect().toSet
    assert(mh.nonEmpty)
    val ng = run("q37_ngram_jaccard").filter($"jaccard" >= 0.9)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(ng.nonEmpty)
    assert((ng -- mh).isEmpty, s"word-gram near-dups missed by MinHash: ${ng -- mh}")
  }

  test("q242 JL projection preserves norms within concentration bounds") {
    import graft.sources.Tables
    val proj = run("q242_random_projection")
    // E[Σ_j y_j² / k] = Σ_i x_i² for ±1 JL — per-vector ratio concentrates
    val pn = proj.groupBy(col("vec_id"))
      .agg(sum(col("y_q") * col("y_q")).as("p2"))
    val xn = Tables.embeddings(spark, TestSpark.Sf001)
      .select(col("vec_id"), explode(col("embedding")).as("x"))
      .withColumn("xq", floor(col("x").cast("double") * 1000000L).cast("long"))
      .groupBy(col("vec_id")).agg(sum(col("xq") * col("xq")).as("x2"))
    val ratios = pn.join(xn, "vec_id")
      .select((col("p2").cast("double") / 16.0 / col("x2").cast("double"))
        .as("r")).as[Double].collect()
    assert(ratios.nonEmpty)
    val mean = ratios.sum / ratios.length
    assert(mean > 0.8 && mean < 1.2, s"mean norm ratio $mean")
    assert(ratios.forall(r => r > 0.15 && r < 4.0),
      s"outlier ratio: ${ratios.min} .. ${ratios.max}")
  }

  test("LSH ANN recalls a useful fraction of brute-force top-10") {
    val brute = run("q39_knn_brute").select("q_id", "vec_id")
      .as[(Long, Long)].collect().toSet
    val lsh = run("q40_knn_lsh").select("q_id", "vec_id")
      .as[(Long, Long)].collect().toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    info(s"LSH recall@10 = $recall (candidates examined ≪ corpus)")
    assert(recall >= 0.1, s"recall $recall collapsed")
    // and LSH never invents neighbors that don't exist
    assert(lsh.map(_._1).subsetOf(brute.map(_._1)))
  }

  test("MinHashAgg one-pass signature equals per-column min() signature") {
    import graft.functions.{MinHashAgg, Portable}
    val a = Seq(3L, 2654435761L)
    val b = Seq(7L, 99991L)
    val df = Seq((1L, "aaa"), (1L, "bbb"), (1L, "ccc"), (2L, "aaa"))
      .toDF("id", "s")
      .withColumn("h", Portable.md5Hash64($"s") % Portable.P)
    val viaAgg = df.groupBy($"id")
      .agg(MinHashAgg.signature($"h", a, b).as("ms"))
      .select($"id", $"ms".getItem(0).as("m0"), $"ms".getItem(1).as("m1"))
    val viaCols = df.groupBy($"id")
      .agg(min((lit(a(0)) * $"h" + lit(b(0))) % Portable.P).as("m0"),
           min((lit(a(1)) * $"h" + lit(b(1))) % Portable.P).as("m1"))
    assert(viaAgg.orderBy("id").collect().toSeq ===
      viaCols.orderBy("id").collect().toSeq)
  }

  test("CharShinglesExpr equals the declarative array_distinct/transform chain") {
    import graft.functions.CharShinglesExpr
    val texts = Seq("hello world", "", "abc", "aaaaaaaa", "ab", "exact")
    val df = texts.toDF("text")
    val viaExpr = df.select(CharShinglesExpr.shingles($"text", 5).as("s"))
      .as[Seq[String]].collect().map(_.toSet)
    val viaChain = df.select(array_distinct(transform(
        sequence(lit(1), greatest(length($"text") - 4, lit(1))),
        i => $"text".substr(i, lit(5)))).as("s"))
      .as[Seq[String]].collect().map(_.toSet)
    assert(viaExpr.toSeq === viaChain.toSeq)
  }

  test("exact dedup counts: n_distinct + n_dup_docs == n_docs") {
    val bad = run("q34_exact_dedup")
      .filter(col("n_distinct") + col("n_dup_docs") =!= col("n_docs")).count()
    assert(bad === 0)
  }

  test("q232 ppjoin: subsumes q37's blocked pairs and catches the df-cap's blind spot") {
    // completeness vs the heuristic: every pair the df-capped blocked
    // variant (q37) emits must also be found by the prefix filter (same
    // gram family; q37's jaccard is block-free too, so sets coincide
    // where blocking allows the pair at all)
    val pp = run("q232_ppjoin").select("i", "j").as[(Long, Long)].collect().toSet
    val ng = run("q37_ngram_jaccard").select("i", "j").as[(Long, Long)].collect().toSet
    assert((ng -- pp).isEmpty, s"pairs found by q37 but not ppjoin: ${ng -- pp}")
    // the adversarial case for a df-cap: two identical docs whose grams
    // are ALL corpus-hot (> GramDfCap would drop every candidate gram);
    // the prefix filter must still pair them — its pruning has no recall
    // cliff, only the canonical order changes
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (0 until 60).map { i =>
      val txt = if (i < 2) boiler else boiler + s" unique$i tail$i"
      (i.toLong, txt, "en", "src", txt.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_q232_").toString
    try {
      docs.write.parquet(s"$tmp/documents.parquet")
      val pairs = SparkEntry.queries("q232_ppjoin")(spark, tmp)
        .select("i", "j").as[(Long, Long)].collect().toSet
      assert(pairs.contains((0L, 1L)),
        s"identical hot-gram docs not paired: $pairs")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator()
        .asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("q106 packing: token conservation, full packs everywhere but the tail") {
    import graft.sources.Tables
    import graft.functions.Portable
    val packs = run("q106_sequence_packing").collect()
    val totalTokens = Tables.documents(spark, TestSpark.Sf001)
      .select(sum(size(Portable.tokens(col("text"))).cast("long")))
      .as[Long].head()
    // every corpus token lands in exactly one pack
    assert(packs.map(_.getAs[Long]("n_tokens")).sum === totalTokens)
    // pack ids are contiguous from 0; all but the last hold exactly CtxLen
    assert(packs.map(_.getAs[Long]("pack_id")).toSeq ===
      (0L until packs.length.toLong))
    packs.init.foreach(r => assert(r.getAs[Long]("n_tokens") === 512L))
    // doc ranges tile the corpus in order: the next pack starts at the
    // previous pack's last doc (straddle) or later — never earlier
    packs.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("first_doc") >= a.getAs[Long]("last_doc"))
    }
  }

  test("q98 k-means: deterministic k-means|| seeds, inertia strictly improves per Lloyd's pass") {
    val k = Corpus.derivedK(500L).toInt // sf0.001 corpus → 4·⌈√500⌉ = 92
    val seeds = Corpus.seedCentroids(spark, TestSpark.Sf001)
    assert(seeds.size === k)
    assert(seeds.map(_._1) === (0L until k.toLong)) // relabeled 0..K-1
    assert(seeds.map(_._2).distinct.size === k) // farthest-point ⇒ distinct centers
    // rerun-deterministic (the whole point of the d²-top-l selection)
    assert(Corpus.seedCentroids(spark, TestSpark.Sf001) === seeds)
    // Lloyd's monotonicity, strictly: each pass must reduce total inertia
    // (a plateau this early would mean the update step is a no-op)
    val inertias = (0 to 2).map { it =>
      Corpus.inertia(spark, TestSpark.Sf001,
        Corpus.kmeansCentroids(spark, TestSpark.Sf001, it))
    }
    assert(inertias(1) < inertias(0),
      s"pass 1 did not improve inertia: ${inertias(0)} -> ${inertias(1)}")
    assert(inertias(2) < inertias(1),
      s"pass 2 did not improve inertia: ${inertias(1)} -> ${inertias(2)}")
  }

  test("q204 PQ: bounded codebooks, total code coverage, ADC beats random") {
    // model state is the architecture constant M·k rows of subdim coords
    val cb = Similarity.pqCodebooks(spark, TestSpark.Sf001)
      .select($"m", $"cid", size($"cs").as("dim")).collect()
    assert(cb.length === 4 * 16)
    assert(cb.forall(_.getInt(2) === 16))
    assert(cb.map(r => (r.getInt(0), r.getLong(1))).distinct.length === 64)
    val out = run("q204_pq_adc_search").collect()
    // every query returns a full top-10, ranks dense 1..10
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.size === 8)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getInt(1)).sorted === (1 to 10).toArray, s"q=$q")
      // ADC distances are nonneg and nondecreasing in rank
      val ds = rows.sortBy(_.getInt(1)).map(_.getLong(3))
      assert(ds.forall(_ >= 0L) && ds.sameElements(ds.sorted), s"q=$q")
    }
    // the recall audit finds SOME true top-10 hits corpus-wide — ADC is
    // an approximation but must beat the ~10/500 random-hit floor
    val hits = out.map(_.getLong(4)).sum
    assert(hits >= 8, s"ADC recall implausibly low: $hits/80 hits")
  }

  test("q225 winnowing: density near 2/(w+1), and the shared-substring guarantee holds") {
    val out = run("q225_winnowing").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_grams")
      val fp = r.getAs[Long]("n_fp")
      if (n >= 16) {
        assert(fp >= 1L, s"doc ${r.getLong(0)}: full windows but no fingerprint")
        // windows overlap, so selections repeat: density well under 1000;
        // for long docs it concentrates near the theoretical 2/(w+1)≈118
        val d = r.getAs[Long]("density_milli")
        assert(in18(d), s"doc ${r.getLong(0)}: density $d")
      } else assert(fp === 0L)
    }
    // the paper's guarantee, end to end on the real selector: two texts
    // sharing a substring of length ≥ k + w − 1 = 23 share a fingerprint
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val shared = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (1L, s"aaaa bbbb cccc $shared dddd eeee"),
      (2L, s"zzzz yyyy $shared xxxx wwww qqqq rrrr"),
      (3L, "totally unrelated text with no common run at all here"))
      .toDF("doc_id", "text")
    val fps = winnowFingerprints(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "shared 43-char substring produced no shared fingerprint")
  }

  private def in18(d: Long): Boolean = d >= 60L && d <= 400L

  /** Re-run the q225 selector on an ad-hoc corpus (same constants). */
  private def winnowFingerprints(docs: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.functions.Portable
    val frame = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-15, 0)
    docs.select(col("doc_id"), lower(col("text")).as("t"))
      .filter(length(col("t")) >= 8)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), length(col("t")) - 7),
          i => Portable.md5Hash64(col("t").substr(i, lit(8)))))
          .as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("h"))
      .withColumn("m", min(struct(col("h"), (-col("pos")).as("np"))).over(frame))
      .filter(col("pos") >= 16)
      .select(col("doc_id"), col("m.h").as("sh"))
      .distinct()
  }

  test("q312 semdedup keep: driver union-find + quality-argmax recompute, pair stage cell-bounded") {
    val (emb, assign, pairs) =
      Similarity.semanticDupStage(spark, TestSpark.Sf001)
    try {
      // cell-bounded pair counts (the JoinFanoutBounds contract the r12
      // verdict asked the spec to assert): per cell, the rank-window
      // join emits ≤ min(n·PairWindow, C(n,2)) candidate pairs
      val cellN = assign.groupBy("cell").count().collect()
        .map(r => r.get(0).toString -> r.getLong(1)).toMap
      pairs.groupBy("cell").count().collect().foreach { r =>
        val n = cellN(r.get(0).toString)
        val cap = math.min(n * Similarity.SemPairWindow, n * (n - 1) / 2)
        assert(r.getLong(1) <= cap,
          s"cell ${r.get(0)} pair count ${r.getLong(1)} exceeds bound $cap")
      }
      // first-principles recompute of components + keep policy: driver
      // union-find over the SAME pair set, quality argmax with the
      // documented (score desc, node asc) tie-break — the q200
      // policy-consistency check
      val pcol = pairs.select("i", "j").as[(Long, Long)].collect()
      val scores = TextOps.withQuality(
          graft.sources.Tables.documents(spark, TestSpark.Sf001))
        .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pcol.foreach { case (i, j) =>
        val (ri, rj) = (find(i), find(j))
        if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
      }
      val expected = pcol.flatMap(p => Seq(p._1, p._2)).distinct
        .groupBy(find).map { case (_, ns) =>
          val scored = ns.filter(scores.contains).sorted
          val qk = scored.maxBy(n => (scores(n), -n))
          (ns.min, scored.length.toLong, qk, scored.min,
            if (qk == scored.min) 1L else 0L, scored.length - 1L)
        }.toSet
      val got = run("q312_semdedup_keep")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(got === expected)
      assert(got.nonEmpty, "fixture must exercise at least one semantic cluster")
    } finally {
      emb.unpersist(); assign.unpersist(); pairs.unpersist(); ()
    }
  }

  test("q319 minhash recall: driver brute-force ground truth matches; found never exceeds true") {
    import graft.functions.{CharShinglesExpr, Portable}
    val rows = run("q319_minhash_recall").collect()
    assert(rows.nonEmpty, "sample must contain docs with true near-dups")
    // driver ground truth: exact char-5 shingle Jaccard over all pairs
    // involving the salted-hash sample (500-doc fixture — tractable)
    val sets = graft.sources.Tables.documents(spark, TestSpark.Sf001)
      .select($"doc_id", CharShinglesExpr.shingles($"text", 5).as("sh"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, sh) => id -> sh.toSet }.toMap
    val sample = sets.keys.filter(id =>
      Portable.md5Hash64Jvm(s"mrc|$id") % 8 == 0L).toSeq.sorted
    val truth = sample.map { q =>
      q -> sets.keys.filter { d =>
        d != q && {
          val k = (sets(q) & sets(d)).size
          k.toDouble / (sets(q).size + sets(d).size - k).toDouble >= 0.5
        }
      }.toSet
    }.toMap
    val lsh = run("q35_minhash_lsh").select("i", "j")
      .as[(Long, Long)].collect()
      .flatMap(p => Seq(p, p.swap)).toSet
    val expected = truth.collect { case (q, ds) if ds.nonEmpty =>
      val found = ds.count(d => lsh.contains((q, d))).toLong
      (q, ds.size.toLong, found, 1000L * found / ds.size)
    }.toSet
    val got = rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_true"),
      r.getAs[Long]("n_found"), r.getAs[Long]("recall_milli"))).toSet
    assert(got === expected, "recall audit drifts from brute-force truth")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_found") <= r.getAs[Long]("n_true"),
        "LSH verify filters by exact Jaccard — found ⊆ true must hold")
      assert(r.getAs[Long]("recall_milli") >= 0L &&
        r.getAs[Long]("recall_milli") <= 1000L)
    }
  }
}
