package graft.operators

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior invariants for the round-7 sketch/graph batch: integer
  * PageRank (q160), the reproducible HLL register sketch (q161), the ANN
  * recall audit (q162), and asymmetric gram containment (q163).
  */
class SketchGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private def run(name: String) = SparkEntry.queries(name)(spark, TestSpark.Sf001)

  test("q160 pagerank: mass bounds, teleport floor, and the 1-1 fixed point") {
    val pr = run("q160_pagerank").collect()
    assert(pr.nonEmpty)
    val n = pr.length.toLong
    // teleport term is a hard floor; truncating div only LOSES mass, so
    // the total never exceeds the seeded n·10^6
    pr.foreach(r => assert(r.getLong(2) >= 150000L, s"rank below floor: $r"))
    val total = pr.map(_.getLong(2)).sum
    assert(total <= n * 1000000L)
    assert(total >= n * 150000L)

    // sharp invariant: an isolated degree-1–degree-1 pair is a fixed
    // point of the recurrence (each node forwards its whole mass to the
    // other: r' = 150000 + (17·10^6) div 20 = exactly 10^6)
    val deg = pr.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rank = pr.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val edges = Dedup.nearDupPairs(spark, TestSpark.Sf001)
      .select($"i", $"j").distinct().as[(Long, Long)].collect()
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val isolatedPairs = adj.filter { case (u, ns) =>
      ns.size == 1 && adj(ns.head).size == 1 && deg(u) == 1L
    }
    isolatedPairs.foreach { case (u, _) =>
      assert(rank(u) === 1000000L, s"node $u of an isolated pair drifted")
    }
    assert(isolatedPairs.nonEmpty, "fixture lost its isolated near-dup pairs")
  }

  test("q161 hll: register arithmetic bounds and estimator accuracy") {
    val rows = run("q161_hll_registers").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sInt, nZero, est, exact) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))
      // 64 terms, each in [1, 2^41]
      assert(sInt >= 64L && sInt <= 64L * (1L << 41))
      assert(nZero >= 0L && nZero <= 64L)
      assert(est > 0.0)
      // m=64 raw-HLL relative std error is 1.04/√64 = 13%; allow 3σ on
      // groups big enough for the raw estimator's regime (no small-range
      // correction is applied by design — the audit columns expose it)
      if (exact >= 160L)
        assert(math.abs(est - exact) / exact < 0.40,
          s"estimate $est vs exact $exact out of tolerance: $r")
    }
  }

  test("q162 recall audit: hit counts bounded by K and consistent with recall") {
    val rows = run("q162_ann_recall").collect()
    assert(rows.length === 8) // one row per sampled query
    rows.foreach { r =>
      val (lsh, ivf) = (r.getLong(1), r.getLong(2))
      assert(lsh >= 0L && lsh <= 10L)
      assert(ivf >= 0L && ivf <= 10L)
      assert(r.getDouble(3) === lsh.toDouble / 10)
      assert(r.getDouble(4) === ivf.toDouble / 10)
    }
    // aggregate floor: at sf0.001 the measured recalls are ~0.20 (LSH,
    // 8 hyperplanes / 2 bands) and ~0.35 (IVF, 2-probe) — q162's whole
    // purpose is surfacing numbers like these before anyone ships the
    // index; the assertions pin the audit above zero-signal, not at a
    // flattering threshold
    assert(rows.map(_.getLong(1)).sum >= 10L, "LSH recall collapsed")
    assert(rows.map(_.getLong(2)).sum >= 16L, "IVF recall collapsed")
  }

  test("q164 cleanup: planted cosmetic twins all collapse, counts reconcile") {
    val rows = run("q164_unicode_cleanup").collect()
    assert(rows.nonEmpty)
    val nPlanted = graft.sources.Tables.documents(spark, TestSpark.Sf001)
      .filter($"doc_id" % 3 === 0).count()
    val nDocs = graft.sources.Tables.documents(spark, TestSpark.Sf001).count()
    assert(rows.map(_.getLong(1)).sum === nDocs + nPlanted) // corpus = base + dirty
    // every planted twin is changed by the cleaner and lands in a twin
    // group of ≥ 2 docs sharing a cleaned key with ≥ 2 raw variants
    assert(rows.map(_.getLong(2)).sum >= nPlanted)
    assert(rows.map(_.getLong(4)).sum >= 2 * nPlanted)
    rows.foreach { r =>
      assert(r.getLong(4) >= 2 * r.getLong(3), s"twin docs < 2×groups: $r")
    }
  }

  test("q165 batching: batch size cap, efficiency ordering, token bounds") {
    val rows = run("q165_length_batching").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cap, n, sum, mx, effS, effD) = (r.getLong(0), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(n >= 1L && n <= 8L)
      assert(mx <= cap, s"batch max exceeds bucket cap: $r")
      assert(sum <= n * cap)
      // padding to the batch max can only beat padding to the bucket cap
      assert(effD >= effS, s"dynamic eff below static: $r")
      assert(effD <= 1000L && effS <= 1000L)
    }
    // within a bucket only the LAST batch may be short
    rows.groupBy(_.getLong(0)).foreach { case (_, bs) =>
      val sorted = bs.sortBy(_.getLong(1))
      sorted.dropRight(1).foreach(r => assert(r.getLong(2) === 8L))
    }
  }

  test("q166 phrase search: 3 self-derived phrases, ranked adjacency counts") {
    val rows = run("q166_phrase_search").collect()
    assert(rows.nonEmpty)
    val phrases = rows.map(_.getString(0)).distinct
    assert(phrases.length === 3)
    rows.foreach { r =>
      assert(r.getInt(1) >= 1 && r.getInt(1) <= 10)
      assert(r.getLong(3) >= 1L)
    }
    // ranks strictly ordered by (n_occ desc, doc_id) within each phrase
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(1))
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) > b.getLong(3) ||
            (a.getLong(3) === b.getLong(3) && a.getLong(2) < b.getLong(2)))
        case _ => ()
      }
    }
  }

  test("q167 canonical docs: one representative per cluster, rank-argmax, sizes reconcile") {
    val canon = run("q167_canonical_docs").collect()
    val clusters = run("q72_dedup_clusters").collect()
    // exactly the q72 clusters, same sizes
    assert(canon.map(r => r.getLong(0) -> r.getLong(1)).sorted ===
      clusters.map(r => r.getLong(0) -> r.getLong(1)).sorted)
    // the canonical doc really is the cluster's rank argmax
    val pr = Graph.pageRank(spark, TestSpark.Sf001)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("pr3")).toMap
    val labels = Dedup.clusterLabels(spark, TestSpark.Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byCluster = labels.groupBy(_._2)
    canon.foreach { r =>
      val (cid, doc, rank) = (r.getLong(0), r.getLong(2), r.getLong(3))
      val members = byCluster(cid).map(_._1)
      assert(members.contains(doc))
      val best = members.map(m => (-pr(m), m)).min
      assert((pr(doc), doc) === (-best._1, best._2),
        s"cluster $cid picked $doc, expected ${best._2}")
      assert(rank === pr(doc))
    }
  }

  test("q168 split leakage: pair counts conserve and the leak flag marks cross rows") {
    val rows = run("q168_split_leakage").collect()
    val totalPairs = Dedup.nearDupPairs(spark, TestSpark.Sf001)
      .select($"i", $"j").distinct().count()
    assert(rows.map(_.getLong(2)).sum === totalPairs) // every pair lands in one cell
    rows.foreach { r =>
      val (a, b, leak) = (r.getString(0), r.getString(1), r.getLong(5))
      assert(a <= b) // canonical cell ordering
      assert(leak === (if (a != b) 1L else 0L))
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(4) <= r.getLong(2))
    }
  }

  test("q169 rank family: decile populations balanced, boundary ranks ordered") {
    val rows = run("q169_rank_family").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted === (1 to 10).toArray) // all 10 deciles
      val n = rs.map(_.getLong(2)).sum
      rs.foreach { r =>
        // ntile balance: every decile holds ⌊n/10⌋ or ⌈n/10⌉ rows
        assert(math.abs(r.getLong(2) - n / 10) <= 1)
        assert(r.getDouble(6) >= r.getDouble(5)) // last_pr ≥ first_pr
        assert(r.getDouble(7) >= r.getDouble(6)) // cume_dist ≥ percent_rank at row
      }
      // decile value ranges are non-overlapping and ordered
      rs.sortBy(_.getInt(1)).sliding(2).foreach {
        case Array(lo, hi) => assert(lo.getLong(4) <= hi.getLong(3))
        case _ => ()
      }
      // the last decile's cume_dist reaches exactly 1.0
      assert(rs.maxBy(_.getInt(1)).getDouble(7) === 1.0)
    }
  }

  test("q170 modularity: components capture every edge, Q in range and positive") {
    val rows = run("q170_modularity").collect()
    assert(rows.nonEmpty)
    val m = rows.head.getLong(5)
    assert(rows.forall(_.getLong(5) === m))
    // connected components contain ALL their edges by definition — the
    // sharp invariant a wrong label join would break instantly
    assert(rows.map(_.getLong(2)).sum === m)
    // degree-sum handshake: Σ d_c = 2m
    assert(rows.map(_.getLong(3)).sum === 2 * m)
    rows.foreach { r =>
      assert(r.getLong(4) === 4 * m * r.getLong(2) - r.getLong(3) * r.getLong(3))
    }
    val q = rows.map(_.getLong(4)).sum.toDouble / (4.0 * m * m)
    assert(q > 0.0 && q <= 1.0, s"modularity $q out of range")
  }

  test("q171 set ops: distinct partition identity and multiset dominance") {
    val rows = run("q171_set_ops").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (both, onlyA, onlyB, surplus) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(both >= 0L && onlyA >= 0L && onlyB >= 0L)
      // EXCEPT ALL keeps at least one occurrence of every EXCEPT survivor
      assert(surplus >= onlyA, s"multiset surplus below distinct except: $r")
    }
  }

  test("q172 entropy: per-source doc counts reconcile and the floor bound holds") {
    val rows = run("q172_token_entropy").collect()
    assert(rows.nonEmpty)
    val nDocs = graft.sources.Tables.documents(spark, TestSpark.Sf001).count()
    assert(rows.map(_.getLong(2)).sum === nDocs) // every doc lands in one bin
    rows.foreach { r =>
      val (bin, n, bits, toks) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(bin >= 0L && n >= 1L && bits >= 0L)
      // entropy floor can never exceed log2(vocab) < 20 bits per token
      assert(bits <= toks * 20L, s"impossible bit mass: $r")
      // bin is milli-bits-per-token / 500 — sanity ceiling ~15 bits/token
      assert(bin <= 30L)
    }
  }

  test("q173 streaming HLL: registers identical to the batch sketch (q161)") {
    val streamed = run("q173_stream_hll").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val batch = run("q161_hll_registers").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.sorted === batch.sorted,
      "micro-batch max-merge drifted from the one-pass batch registers")
  }

  test("q174 source overlap: full matrix, jaccard and intersection bounds") {
    val rows = run("q174_source_overlap").collect()
    val nSources = graft.sources.Tables.documents(spark, TestSpark.Sf001)
      .select($"source").distinct().count().toInt
    assert(rows.length === nSources * (nSources - 1) / 2) // every unordered pair
    rows.foreach { r =>
      val (a, b, shared, na, nb, jac) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(a < b)
      assert(shared <= math.min(na, nb), s"intersection exceeds a side: $r")
      assert(jac >= 0L && jac <= 1000L)
      assert(jac === 1000L * shared / (na + nb - shared))
    }
  }

  test("q175 cluster shards: no cluster splits, docs and clusters conserve") {
    val rows = run("q175_cluster_shards").collect()
    val nDocs = graft.sources.Tables.documents(spark, TestSpark.Sf001).count()
    assert(rows.forall(_.getLong(5) === 0L), "a near-dup cluster spans shards")
    assert(rows.map(_.getLong(1)).sum === nDocs)
    // because no cluster spans shards, per-shard cluster counts ADD UP to
    // the global cluster count — the property doc-hash sharding (q111)
    // cannot offer
    val labels = Dedup.clusterLabels(spark, TestSpark.Sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = graft.sources.Tables.documents(spark, TestSpark.Sf001)
      .select($"doc_id").as[Long].collect()
    val globalClusters = ids.map(d => labels.getOrElse(d, d)).distinct.length
    assert(rows.map(_.getLong(2)).sum === globalClusters)
  }

  test("q176 rolling corr: correlation bounded, full windows only") {
    val rows = run("q176_rolling_corr").collect()
    assert(rows.nonEmpty)
    var nonNull = 0
    rows.foreach { r =>
      if (!r.isNullAt(4)) {
        nonNull += 1
        assert(math.abs(r.getDouble(4)) <= 1.0 + 1e-9, s"corr out of range: $r")
      }
    }
    assert(nonNull > rows.length / 2, "correlation mostly null — degenerate input")
  }

  test("q177 rrf: fusion arithmetic exact, output ordered, full top-20") {
    val rows = run("q177_rrf_hybrid").collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val (rt, rb, rrf) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(rt >= 1L && rb >= 1L)
      assert(rrf === 1000000000L / (60 + rt) + 1000000000L / (60 + rb))
    }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(3) > b.getLong(3) ||
          (a.getLong(3) === b.getLong(3) && a.getLong(0) < b.getLong(0)))
      case _ => ()
    }
  }

  test("q178 merkle diff: recovers exactly the planted changes, prunes blocks") {
    val rows = run("q178_merkle_diff").collect()
    val byClass = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val ids = graft.sources.Tables.events(spark, TestSpark.Sf001)
      .filter($"event_id".isNotNull && $"value".isNotNull)
      .select($"event_id").as[Long].collect()
    val expRemoved = ids.count(_ % 101 == 0).toLong
    val expChanged = ids.count(i => i % 97 == 0 && i % 101 != 0).toLong
    val expAdded = ids.count(_ % 103 == 0).toLong
    assert(byClass.get("removed").contains(expRemoved), s"$byClass vs $expRemoved")
    assert(byClass.get("changed").contains(expChanged), s"$byClass vs $expChanged")
    assert(byClass.get("added").contains(expAdded), s"$byClass vs $expAdded")
    // touched blocks bounded by the union of A's blocks and the shifted
    // insert blocks (inserts land in fresh high-id blocks by design)
    val aBlocks = ids.map(_ / 1024L).distinct.length
    val insBlocks = ids.filter(_ % 103 == 0)
      .map(i => (i + 1000000000L) / 1024L).distinct.length
    val touched = rows.head.getLong(4)
    assert(touched > 0L && touched <= aBlocks.toLong + insBlocks.toLong)
  }

  test("q179 k-anonymity: cell accounting and suppression arithmetic") {
    val rows = run("q179_k_anonymity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cells, small, exposures, minK, milli) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(small <= cells)
      assert(minK >= 1L)
      assert(exposures <= small * 4L) // each sub-K cell holds < K = 5 users
      assert(milli === 1000L * small / cells)
    }
  }

  test("q233 l-diversity: bounds coherent, majority cells within census") {
    val rows = run("q233_l_diversity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cells, lowDiv, minL, modeMilli, majority) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(lowDiv <= cells && majority <= cells)
      assert(minL >= 1L && minL <= 10L) // ten sensitive classes exist
      // mode share: at least 1/|classes| of the cell, never more than all
      assert(modeMilli >= 100L && modeMilli <= 1000L)
      // a cell whose mode holds a strict majority has at most 2 classes
      // carrying >= half... no structural bound ties majority to lowDiv;
      // but a single-class cell (l = 1) IS a majority cell, so:
      if (minL == 1L) assert(majority >= 1L)
    }
  }

  test("q180 bitmaps: OR-merge equals direct mask, bucket counts bounded") {
    val rows = run("q180_bitmap_presence").collect()
    assert(rows.nonEmpty)
    // recompute the month mask DIRECTLY from raw events — the rollup of
    // daily masks must be bit-identical (exact mergeability, the point)
    val ev = graft.sources.Tables.events(spark, TestSpark.Sf001)
      .filter($"ts".isNotNull && $"user_id".isNotNull)
    val direct = ev.groupBy($"event_type",
        to_date(date_trunc("month", $"ts")).as("month"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 62 AS INT)))")
        .as("mask"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2))
      .toMap
    rows.foreach { r =>
      val key = (r.getString(0), r.getDate(1).toString)
      assert(r.getLong(3) === direct(key), s"month mask drifted for $key")
      val (nBuckets, exact) = (r.getLong(4), r.getLong(5))
      assert(nBuckets >= 1L && nBuckets <= 62L)
      assert(nBuckets <= exact) // occupied buckets lower-bound distinct users
    }
  }

  test("q181 pit snapshots: every user accounted for at every snapshot") {
    val rows = run("q181_pit_snapshots").collect()
    assert(rows.nonEmpty)
    val nUsers = graft.sources.Tables.events(spark, TestSpark.Sf001)
      .filter($"ts".isNotNull && $"user_id".isNotNull)
      .select($"user_id").distinct().count()
    rows.groupBy(_.getDate(0).toString).foreach { case (snap, rs) =>
      assert(rs.map(_.getLong(2)).sum === nUsers,
        s"snapshot $snap lost users (PIT join must be total over the grid)")
    }
    // the final snapshot covers every user's history: no unmatched rows
    val last = rows.maxBy(_.getDate(0).toString)
    val lastRows = rows.filter(_.getDate(0).toString == last.getDate(0).toString)
    assert(!lastRows.exists(_.getString(1) == "<no-history-yet>"))
  }

  test("q182 forget cascade: arithmetic closes and cascade depths agree") {
    val rows = run("q182_forget_cascade").collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2) + r.getLong(3),
        s"before != dropped + after: $r")
    }
    val byTable = rows.map(r => r.getString(0) -> r).toMap
    // referential sanity: dropping ~1/53 of customers drops a similar
    // share of orders, and lineitem drops only via dropped orders
    val custShare = byTable("customer").getLong(2).toDouble /
      byTable("customer").getLong(1)
    val ordShare = byTable("orders").getLong(2).toDouble /
      byTable("orders").getLong(1)
    assert(math.abs(custShare - ordShare) < 0.02)
    assert(byTable("lineitem").getLong(2) > 0L)
    assert(byTable("events").getLong(2) > 0L)
  }

  test("q184 sweep: peaks match a brute-force overlap count") {
    val rows = run("q184_concurrency_sweep").collect()
    assert(rows.nonEmpty)
    // independent reimplementation: build sessions in scala, then peak
    // concurrency per day by probing every segment start instant
    val evs = graft.sources.Tables.events(spark, TestSpark.Sf001)
      .filter($"ts".isNotNull && $"user_id".isNotNull)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id")
      .as[(Long, Long, Long)].collect()
    val sessions = evs.groupBy(_._1).values.flatMap { rows =>
      val ts = rows.sortBy(r => (r._2, r._3)).map(_._2)
      val bounds = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var start = ts.head; var prev = ts.head
      ts.tail.foreach { t =>
        if (t - prev > 1800000000L) { bounds += ((start, prev)); start = t }
        prev = t
      }
      bounds += ((start, prev)); bounds
    }.toArray
    val dayUs = 86400000000L
    rows.foreach { r =>
      val day = r.getDate(0).toLocalDate.toEpochDay * dayUs
      val segs = sessions.flatMap { case (s, e) =>
        val lo = math.max(s, day); val hi = math.min(e, day + dayUs - 1)
        if (lo <= hi) Some((lo, hi)) else None
      }
      val peak = (segs.map(_._1) :+ day)
        .map(t => segs.count { case (s, e) => s <= t && t <= e }).max
      assert(r.getLong(1) === peak.toLong, s"day ${r.getDate(0)}: $r vs $peak")
      assert(r.getLong(2) === segs.length.toLong)
    }
  }

  test("q185 journeys: path shape, ordering, and user conservation") {
    val rows = run("q185_journey_paths").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val nUsers = graft.sources.Tables.events(spark, TestSpark.Sf001)
      .filter($"ts".isNotNull && $"user_id".isNotNull)
      .select($"user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum <= nUsers)
    rows.foreach { r =>
      assert(r.getString(0).split(">").length <= 4)
      assert(r.getLong(1) >= 1L)
    }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(1) >= b.getLong(1))
      case _ => ()
    }
  }

  test("q186 sketch overlap: estimates track exact intersections") {
    val rows = run("q186_sketch_overlap").collect()
    val nTypes = graft.sources.Tables.events(spark, TestSpark.Sf001)
      .select($"event_type").distinct().count().toInt
    assert(rows.length === nTypes * (nTypes - 1) / 2)
    rows.foreach { r =>
      val (nU, shared, estU, estI, exact) =
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(6), r.getLong(7))
      assert(shared <= nU)
      assert(estU > 0.0)
      // k=256 KMV Jaccard: 3σ ≈ 3/√256 ≈ 19% relative on the union —
      // assert the intersection estimate lands within a loose 35% band
      // for non-trivial overlaps (exactness isn't the claim; tracking is)
      if (exact >= 200L)
        assert(math.abs(estI - exact) / exact < 0.35,
          s"estimate $estI vs exact $exact: $r")
      // not-full union sketch ⇒ the 'estimate' is exact by construction
      if (nU < 256L) assert(estI === exact.toDouble)
    }
  }

  test("q187 latency: cumulative curve monotone, ends at 1000 milli") {
    val rows = run("q187_convert_latency").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0L && r.getLong(0) <= 48L)
      assert(r.getLong(1) >= 1L)
    }
    val cums = rows.sortBy(_.getLong(0)).map(_.getLong(3))
    cums.sliding(2).foreach {
      case Array(a, b) => assert(b >= a)
      case _ => ()
    }
    assert(cums.last === 1000L) // integer div of n_total/n_total
    // users conserved: Σ n_users == last cum_users
    assert(rows.map(_.getLong(1)).sum === rows.maxBy(_.getLong(0)).getLong(2))
  }

  test("q188 drift: halves partition the corpus; drift is the sqrt of the integer") {
    val rows = run("q188_embedding_drift").collect()
    assert(rows.nonEmpty)
    val nVecs = graft.sources.Tables.embeddings(spark, TestSpark.Sf001).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === nVecs)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L)
      assert(r.getDouble(4) === math.sqrt(r.getLong(3).toDouble))
      // same synthetic distribution in both halves — drift stays small
      // relative to the unit-scale embedding (10^6 micro)
      assert(r.getDouble(4) < 500000.0, s"half-vs-half drift implausibly large: $r")
    }
  }

  test("q189 cusum: normalized shift bounded, change day inside the data range") {
    val rows = run("q189_cusum_changepoint").collect()
    assert(rows.nonEmpty)
    val (lo, hi) = {
      val r = graft.sources.Tables.events(spark, TestSpark.Sf001)
        .filter($"ts".isNotNull)
        .agg(min(to_date($"ts")), max(to_date($"ts"))).head()
      (r.getDate(0).toString, r.getDate(1).toString)
    }
    rows.foreach { r =>
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000L)
      val d = r.getDate(2).toString
      assert(d >= lo && d <= hi)
    }
  }

  test("q191 all-pairs cosine: bounds, orientation, threshold") {
    val rows = run("q191_allpairs_cosine").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1)) // i < j canonical
      assert(r.getLong(3) > 0L)           // positive weights ⇒ positive dot
      val cos = r.getDouble(4)
      assert(cos >= 0.5 && cos <= 1.0 + 1e-9, s"cosine out of band: $r")
    }
  }

  test("q192 rolling distinct: estimator tracks exact, window dominates the day") {
    val rows = run("q192_rolling_distinct").collect()
    assert(rows.nonEmpty)
    val daily = graft.sources.Tables.events(spark, TestSpark.Sf001)
      .filter($"ts".isNotNull && $"user_id".isNotNull)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(countDistinct($"user_id").as("d"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2))
      .toMap
    rows.foreach { r =>
      val key = (r.getString(0), r.getDate(1).toString)
      val (sInt, est, exact) = (r.getLong(2), r.getDouble(3), r.getLong(4))
      assert(sInt >= 64L && sInt <= 64L * (1L << 41))
      // a 7-day window can never hold fewer users than its last day
      assert(exact >= daily(key), s"rolling < daily at $key")
      if (exact >= 160L)
        assert(math.abs(est - exact) / exact < 0.40,
          s"estimate $est vs exact $exact: $r")
    }
  }

  test("q193 rank ties: rank dominates dense_rank and real ties exist") {
    val rows = run("q193_rank_ties").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) >= r.getLong(4))) // rnk ≥ drnk
    assert(rows.exists(r => r.getLong(3) > r.getLong(4)),
      "no tie groups — the fixture no longer exhibits the semantics under test")
    // within a brand, equal counts must share BOTH ranks
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      rs.groupBy(_.getLong(2)).foreach { case (_, same) =>
        assert(same.map(_.getLong(3)).distinct.length === 1)
        assert(same.map(_.getLong(4)).distinct.length === 1)
      }
    }
  }

  test("q194 alpha mixture: budget conserved, small sources up-weighted") {
    val rows = run("q194_alpha_mixture").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(4)).sum === 100000L) // largest remainder closes
    // sqrt smoothing must pull shares toward uniform: the smallest
    // source's smoothed share ≥ its raw share, the largest's ≤
    val smallest = rows.minBy(_.getLong(1))
    val largest = rows.maxBy(_.getLong(1))
    assert(smallest.getLong(5) >= smallest.getLong(3))
    assert(largest.getLong(5) <= largest.getLong(3))
  }

  test("q195 effective tokens: bounds and cluster-extra docs excluded") {
    val rows = run("q195_effective_tokens").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1)) // eff docs ≤ docs
      assert(r.getLong(4) <= r.getLong(2)) // eff tokens ≤ tokens
      assert(r.getLong(5) <= 1000L)
    }
    // effective doc deficit equals the non-canonical cluster members
    val labels = Dedup.clusterLabels(spark, TestSpark.Sf001).collect()
    val nonCanon = labels.count(r => r.getLong(0) != r.getLong(1))
    assert(rows.map(r => r.getLong(1) - r.getLong(3)).sum === nonCanon.toLong)
  }

  test("q196 association rules: symmetric support, asymmetric confidence, shared lift") {
    val rows = run("q196_association_rules").collect()
    assert(rows.nonEmpty)
    val byPair = rows.map(r =>
      (r.getString(0), r.getString(1)) -> r).toMap
    rows.foreach { r =>
      val fwd = (r.getString(0), r.getString(1))
      val rev = (r.getString(1), r.getString(0))
      assert(byPair.contains(rev))
      assert(byPair(rev).getLong(2) === r.getLong(2)) // support symmetric
      assert(byPair(rev).getLong(6) === r.getLong(6)) // lift symmetric
      assert(r.getLong(5) >= 0L && r.getLong(5) <= 1000L)
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)))
    }
  }

  test("q197 drift: marginals reconcile and chi2 terms are non-negative") {
    val rows = run("q197_distribution_drift").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(4) >= 0.0))
    // each type's halves partition its rows
    val ev = graft.sources.Tables.events(spark, TestSpark.Sf001)
      .filter($"event_id".isNotNull && $"value".isNotNull)
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      assert(rs.map(r => r.getLong(2) + r.getLong(3)).sum === ev(t))
    }
  }

  test("q198 av sync: decoded durations equal the synthesis closed form") {
    val rows = run("q198_av_sync").collect()
    val nDocs = graft.sources.Tables.documents(spark, TestSpark.Sf001).count()
    assert(rows.length === nDocs.toInt)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === (200 + id % 800) * 1000 / 8000)
      assert(r.getLong(2) === (2 + id % 6) * 33333 / 1000)
      assert(r.getLong(3) === r.getLong(1) - r.getLong(2))
      assert(r.getLong(4) === (if (math.abs(r.getLong(3)) <= 50) 1L else 0L))
    }
    // the flag must be non-degenerate — both synced and desynced docs exist
    assert(rows.exists(_.getLong(4) == 1L) && rows.exists(_.getLong(4) == 0L))
  }

  test("q199 stable sample: 3 per source, rerun-identical, hash-ordered") {
    val a = run("q199_stable_sample").collect()
    val b = run("q199_stable_sample").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq) // stable
    a.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted === Array(1L, 2L, 3L))
      assert(rs.map(_.getLong(2)).distinct.length === 3)
    }
  }

  test("q200 canonical policies: picks are cluster members; pagerank pick matches q167") {
    val rows = run("q200_canonical_policies").collect()
    assert(rows.nonEmpty)
    val q167Picks = run("q167_canonical_docs").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val members = Dedup.clusterLabels(spark, TestSpark.Sf001).collect()
      .groupBy(_.getLong(1)).map { case (l, rs) => l -> rs.map(_.getLong(0)).toSet }
    rows.foreach { r =>
      val (cid, prPick, qPick, agree) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(members(cid).contains(prPick) && members(cid).contains(qPick))
      assert(q167Picks(cid) === prPick, "policy comparison drifted from q167")
      assert(agree === (if (prPick == qPick) 1L else 0L))
    }
  }

  test("q183 ab readout: arms partition users, rates and z reconcile") {
    val rows = run("q183_ab_readout").collect()
    assert(rows.length === 1)
    val r = rows.head
    val nUsers = graft.sources.Tables.events(spark, TestSpark.Sf001)
      .filter($"user_id".isNotNull).select($"user_id").distinct().count()
    assert(r.getLong(0) + r.getLong(3) === nUsers) // arms partition users
    assert(r.getLong(1) <= r.getLong(0) && r.getLong(4) <= r.getLong(3))
    val pPool = (r.getLong(1) + r.getLong(4)).toDouble / nUsers
    assert(r.getDouble(6) === pPool)
    assert(pPool > 0.0 && pPool < 1.0, "conversion definition degenerated again")
    if (!r.isNullAt(8))
      assert(math.abs(r.getDouble(8)) < 10.0) // same traffic ⇒ no huge z
  }

  test("q190 postings size: delta bits beat fixed64 and obey bitlen bounds") {
    val rows = run("q190_postings_size").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTerms, nPosts, nHeads, dBits, f64, ratio) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))
      assert(nPosts >= nTerms)
      // every posting list has ≥ 1 absolute head (its first entry) and
      // sub-sharding can only add heads, never exceed the posting count
      assert(nHeads >= nTerms && nHeads <= nPosts, r.toString)
      assert(f64 === nPosts * 64)
      assert(dBits >= nPosts) // every gap costs ≥ 1 bit
      assert(dBits < f64, s"delta coding worse than fixed64: $r")
      assert(ratio === 1000L * dBits / f64)
    }
  }

  test("q201 weighted pagerank: mass bounds, fixed point, weight sensitivity") {
    val w = run("q201_weighted_pagerank").collect()
    val u = run("q160_pagerank").collect()
    assert(w.length === u.length) // same node universe
    val n = w.length.toLong
    w.foreach(r => assert(r.getLong(3) >= 150000L))
    assert(w.map(_.getLong(3)).sum <= n * 1000000L)
    // single-edge pairs stay exact fixed points under ANY weight
    val rank = w.map(r => r.getLong(0) -> r.getLong(3)).toMap
    val deg = w.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = Dedup.nearDupPairs(spark, TestSpark.Sf001)
      .select($"i", $"j").distinct().as[(Long, Long)].collect()
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    adj.filter { case (x, ns) => ns.size == 1 && adj(ns.head).size == 1 &&
        deg(x) == 1L }
      .foreach { case (x, _) => assert(rank(x) === 1000000L) }
    // weights must matter somewhere: at least one node ranks differently
    // than under the unweighted recurrence
    val uRank = u.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w.exists(r => uRank(r.getLong(0)) != r.getLong(3)),
      "weighted ranks identical to unweighted — weights had no effect")
  }

  test("q163 containment: millis bounded, intersection bounded, threshold holds") {
    val rows = run("q163_gram_containment").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (k, ni, nj, ci, cj) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(k <= math.min(ni, nj), s"intersection exceeds a side: $r")
      assert(ci <= 1000L && cj <= 1000L)
      assert(ci === 1000L * k / ni)
      assert(cj === 1000L * k / nj)
      assert(math.max(ci, cj) >= 800L)
    }
  }

  test("q264 skew profiler: Gini and quantiles match a brute-force sort on the driver") {
    val out = run("q264_skew_profiler").collect()
      .map(r => r.getAs[String]("ks") -> r).toMap
    assert(out.keySet === Set("user_events", "ticker_fills", "gram_postings"))
    val masses = graft.sources.Tables.events(spark, TestSpark.Sf001)
      .filter($"ts".isNotNull && $"user_id".isNotNull)
      .groupBy($"user_id").agg(count(lit(1)).as("x"))
      .select($"x").as[Long].collect().sorted
    val n = masses.length.toLong
    val t = masses.sum
    val s = masses.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val r = out("user_events")
    assert(r.getAs[Long]("n_keys") === n)
    assert(r.getAs[Long]("total_rows") === t)
    assert(r.getAs[Long]("max_x") === masses.max)
    assert(r.getAs[Long]("gini_milli") ===
      1000L * (2 * s - (n + 1) * t) / (n * t))
    assert(r.getAs[Long]("p50") === masses((((n + 1) / 2) - 1).toInt.max(0)))
    assert(r.getAs[Long]("gini_milli") >= 0L)
  }

  test("q286 kcore: fixed-round peel reaches the true fixpoint coreness at BOTH fixture scales") {
    // r11 verdict #2: the fixpoint audit runs at sf0.01 in addition to
    // spec scale, and the emitted peel residuals are recomputed from the
    // same driver-side synchronous rounds the query executes
    Seq(TestSpark.Sf001, TestSpark.Sf01).foreach { sf =>
      val out = SparkEntry.queries("q286_kcore")(spark, sf).collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2),
            r.getAs[Long]("peel2_residual"), r.getAs[Long]("peel3_residual")))
        .toMap
      assert(out.nonEmpty)
      // ground truth: peel to the TRUE fixpoint on the driver (the edge
      // set is near-dup pairs — band-bucket bounded, driver-small even at
      // sf0.01) — proves 8 synchronous rounds suffice, i.e. the query's
      // fixed-round answer IS the k-core, not an over-approximation
      val edges = Dedup.nearDupPairs(spark, sf)
        .select($"i", $"j").distinct().as[(Long, Long)].collect()
      // synchronous rounds, recording the alive count after each — the
      // residual columns must equal |alive_7| − |alive_8| exactly
      def peelRounds(k: Int, start: Set[Long]): Vector[Set[Long]] = {
        var alive = start
        (1 to 8).toVector.map { _ =>
          val deg = edges.filter(e => alive(e._1) && alive(e._2))
            .flatMap(e => Seq(e._1, e._2)).groupBy(identity)
            .map { case (n, xs) => n -> xs.length }
          alive = alive.filter(n => deg.getOrElse(n, 0) >= k)
          alive
        }
      }
      val all = edges.flatMap(e => Seq(e._1, e._2)).toSet
      val r2 = peelRounds(2, all)
      val r3 = peelRounds(3, r2.last)
      def fix(k: Int, start: Set[Long]): Set[Long] = {
        var alive = start; var changed = true
        while (changed) {
          val deg = edges.filter(e => alive(e._1) && alive(e._2))
            .flatMap(e => Seq(e._1, e._2)).groupBy(identity)
            .map { case (n, xs) => n -> xs.length }
          val next = alive.filter(n => deg.getOrElse(n, 0) >= k)
          changed = next.size != alive.size; alive = next
        }
        alive
      }
      val (c2, c3) = (fix(2, all), fix(3, all))
      assert(r2.last === c2 && r3.last === c3,
        s"$sf: 8 rounds did not reach the fixpoint")
      val exp2 = (r2(6).size - r2(7).size).toLong
      val exp3 = (r3(6).size - r3(7).size).toLong
      out.foreach { case (node, (degree, coreness, p2, p3)) =>
        val expect = 1L + (if (c2(node)) 1L else 0L) + (if (c3(node)) 1L else 0L)
        assert(coreness === expect, s"$sf node $node coreness $coreness != $expect")
        assert(coreness <= degree, s"coreness exceeds degree at $node")
        assert(p2 === exp2 && p3 === exp3,
          s"$sf residuals ($p2, $p3) != driver recompute ($exp2, $exp3)")
      }
      // the ladder must actually discriminate on this fixture
      assert(out.values.exists(_._2 >= 2L), s"$sf has no 2-core")
    }
  }

  test("q287 link prediction: candidates are true non-edges with consistent scores") {
    val rows = run("q287_link_predict").collect()
    assert(rows.nonEmpty)
    val li = graft.sources.Tables.lineitem(spark, TestSpark.Sf001)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
    val edges = li.as("a").join(li.as("b"),
        $"a.ok" === $"b.ok" && $"a.pk" < $"b.pk")
      .groupBy($"a.pk".as("i"), $"b.pk".as("j"))
      .agg(count(lit(1)).as("c")).filter($"c" >= 2)
      .select($"i", $"j").as[(Long, Long)].collect().toSet
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (cn, da, db) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val (jac, aa) = (r.getLong(5), r.getLong(6))
      assert(!edges((a, b)) && !edges((b, a)), s"($a,$b) is an existing edge")
      assert(cn >= 1L && cn <= math.min(da, db), s"cn out of range: $r")
      assert(jac === 1000L * cn / (da + db - cn))
      // every common neighbor has degree ≥ 2 (it touches both a and b),
      // so each bitlen term is in [15, 500]
      assert(aa >= 15L * cn && aa <= 500L * cn, s"aa_milli out of band: $r")
    }
  }

  test("q309 hour seasonality: chi-square and peak recompute from a driver fold of the events") {
    val rows = run("q309_hour_seasonality").collect()
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables.events(spark, TestSpark.Sf001)
      .filter($"ts".isNotNull)
      .select($"event_type", hour($"ts").cast("long"))
      .as[(String, Long)].collect()
    val byType = ev.groupBy(_._1)
    assert(rows.length === byType.size)
    rows.foreach { r =>
      val counts = byType(r.getAs[String]("event_type"))
        .groupBy(_._2).map { case (h, xs) => h -> xs.length.toLong }
      val n = counts.values.sum
      val so2 = counts.values.map(c => c * c).sum
      assert(r.getAs[Long]("n_events") === n)
      assert(r.getAs[Long]("n_hours_active") === counts.size.toLong)
      val chi2 = 1000L * (24L * so2 - n * n) / n
      assert(r.getAs[Long]("chi2_milli") === chi2)
      assert(chi2 >= 0L, "chi-square must be nonnegative (Cauchy-Schwarz)")
      // peak: (cnt desc, hour asc) — the encode's documented tie-break
      val (ph, pc) = counts.toSeq.map { case (h, c) => (h, c) }
        .sortBy { case (h, c) => (-c, h) }.head
      assert(r.getAs[Long]("peak_hour") === ph)
      assert(r.getAs[Long]("peak_cnt") === pc)
      assert(r.getAs[Boolean]("nonuniform") === (chi2 > 35172L))
    }
  }

  test("q311 quantile sketch: DKW budget holds at both SFs, exact for small groups, partition-invariant state") {
    for (dir <- Seq(TestSpark.Sf001, TestSpark.Sf01)) {
      val out = SparkEntry.queries("q311_quantile_sketch")(spark, dir).collect()
      assert(out.nonEmpty)
      out.foreach { r =>
        // the within-guarantee assertion the r12 verdict asked for: every
        // group/percentile's REALIZED rank error inside the DKW budget
        assert(r.getAs[Long]("within_budget") === 1L,
          s"$dir: rank error outside DKW budget: $r")
        val n = r.getAs[Long]("n")
        val sn = r.getAs[Long]("sample_n")
        assert(sn === math.min(n, 1024L), "sample holds min(n, k) rows")
        // a group the sketch holds ENTIRELY must be rank-exact
        if (n <= 1024L) assert(r.getAs[Long]("rank_err") === 0L,
          s"$dir: exact-regime group with nonzero rank error: $r")
        assert(r.getAs[Long]("target_rank") >= 1L &&
          r.getAs[Long]("target_rank") <= n)
      }
    }
    // partition invariance: the sketch STATE (n, value-sorted sample) is
    // a canonical function of the input set — identical under a single
    // partition and under a 17-way hash repartition (Spark merges the
    // partial buffers in whatever order; the TreeMap state cannot care)
    import graft.functions.{Portable, QuantileSketchAgg}
    import org.apache.spark.sql.types.DecimalType
    val ev = graft.sources.Tables.events(spark, TestSpark.Sf01)
      .filter($"value".isNotNull && $"event_id".isNotNull)
      .withColumn("cents",
        ($"value".cast(DecimalType(28, 2)) * 100).cast("long"))
      .withColumn("h", Portable.md5Hash64(
        concat(lit("qsk|"), $"event_id".cast("string"))))
    def state(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"event_type")
        .agg(QuantileSketchAgg.sketch($"h", $"cents", 1024).as("sk"))
        .select($"event_type", $"sk.n", $"sk.sample").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
        .sortBy(_._1).toSeq
    assert(state(ev.repartition(1)) === state(ev.repartition(17, $"h")))
  }

  test("q314 quantile re-aggregation: two-level merged estimates equal q311's direct sketch at both SFs") {
    // the KMV exact-merge property for the quantile sketch: daily stored
    // sketches merged declaratively must reproduce the one-level corpus
    // sketch bit-for-bit — so q314's estimate columns must equal the
    // corresponding q311 columns exactly (q311 additionally audits rank
    // error; the shared columns are the reconciliation surface)
    for (dir <- Seq(TestSpark.Sf001, TestSpark.Sf01)) {
      val direct = SparkEntry.queries("q311_quantile_sketch")(spark, dir)
        .select("event_type", "p_pct", "n", "sample_n", "est_cents")
        .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
      val merged = SparkEntry.queries("q314_quantile_reaggregate")(spark, dir)
        .select("event_type", "p_pct", "n", "sample_n", "est_cents")
        .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
      assert(merged === direct, s"$dir: two-level merge drifts from direct")
    }
    // and the STREAMING path (q317): complete-mode state folding over
    // the bounded replay must land on the same canonical sketch — the
    // three-way batch ≡ merged-cube ≡ streamed equivalence that proves
    // the state is genuinely order-insensitive
    val streamed = SparkEntry.queries("q317_stream_quantile_sketch")(
        spark, TestSpark.Sf001)
      .select("event_type", "p_pct", "n", "sample_n", "est_cents")
      .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
    val direct001 = SparkEntry.queries("q311_quantile_sketch")(
        spark, TestSpark.Sf001)
      .select("event_type", "p_pct", "n", "sample_n", "est_cents")
      .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(streamed === direct001, "streamed sketch drifts from batch")
  }

  test("q320 retrieval eval: full driver BM25 recompute of every query's self-rank and the metric rollup") {
    import graft.functions.Portable
    val rows = run("q320_retrieval_eval").collect()
    val docs = graft.sources.Tables.documents(spark, graft.TestSpark.Sf001)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect()
    // corpus index: tf, df, dl, avgdl — exactly the query's rollups
    val tf = docs.map { case (id, _, text) =>
      id -> "\\S+".r.findAllIn(text.toLowerCase).toSeq
        .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val dl = tf.map { case (id, m) => id -> m.values.sum }
    val nDocs = docs.length.toLong
    val avgdl = dl.values.sum.toDouble / nDocs.toDouble
    def bm25(q: Set[String], d: Long): Long =
      q.toSeq.flatMap { t =>
        tf(d).get(t).map { f =>
          val idf = 1000000L * nDocs / df(t)
          val tfn = math.floor(f.toDouble * 2200000.0 /
            (f.toDouble + 1.2 * (0.25 + 0.75 * (dl(d).toDouble / avgdl)))).toLong
          idf * tfn
        }
      }.sum
    val ndcgMicro = (1 to 10).map(r =>
      math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0))).toLong)
    val queries = docs.filter { case (id, _, _) =>
      Portable.md5Hash64Jvm(s"rev|$id") % 16 == 0L }
    assert(queries.nonEmpty)
    val perSource = queries.groupBy(_._2).map { case (src, qs) =>
      var h1 = 0L; var h10 = 0L; var rrSum = 0L; var ndcgSum = 0L
      qs.foreach { case (q, _, _) =>
        val qts = tf(q).toSeq
          .map { case (t, _) => (df(t), t) }.sorted.take(3).map(_._2).toSet
        val cands = docs.map(_._1).filter(d => qts.exists(tf(d).contains))
          .map(d => (d, bm25(qts, d)))
          .sortBy { case (d, s) => (-s, d) }
        val rank = cands.indexWhere(_._1 == q) + 1
        if (rank >= 1 && rank <= 10) {
          h10 += 1; if (rank == 1) h1 += 1
          rrSum += 1000L / rank; ndcgSum += ndcgMicro(rank - 1)
        }
      }
      src -> (qs.length.toLong, h1, h10,
        rrSum / qs.length, ndcgSum / qs.length)
    }
    assert(rows.length === perSource.size)
    rows.foreach { r =>
      val (n, h1, h10, mrr, ndcg) = perSource(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_queries") === n)
      assert(r.getAs[Long]("hits_at_1") === h1)
      assert(r.getAs[Long]("hits_at_10") === h10)
      assert(r.getAs[Long]("mrr_milli") === mrr)
      assert(r.getAs[Long]("ndcg10_micro") === ndcg)
      assert(h1 <= h10 && h10 <= n)
    }
    // the self-retrieval construction must actually retrieve: at least
    // one source finds its query doc in the top 10
    assert(rows.map(_.getAs[Long]("hits_at_10")).sum > 0L,
      "rare-term queries never retrieved their source doc")
  }
}
