package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Tests for similarity search over the `embeddings` table: exact top-k
 * sanity (self-match first, descending scores), near-dup symmetry with the
 * threshold, and ANN-vs-exact recall behavior (SURVEY.md §2.3 Tier B Q10).
 */
class SimilaritySearchSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"${sf()}/embeddings.parquet")

  test("top-k cosine: query vector matches itself with score 1.0, scores descend") {
    val e = emb.cache()
    val q = e.filter(col("vec_id") === 0)
    val rows = SimilaritySearch.topKCosine(e, q, k = 5).collect()
    assert(rows.length == 5)
    assert(rows.head.getLong(0) == 0L)
    assert(math.abs(rows.head.getDouble(1) - 1.0) < 1e-12)
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("near-dup pairs are ordered (a < b) and all meet the threshold") {
    val rows = SimilaritySearch.cosineNearDupPairs(emb, threshold = 0.3).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.3)
    }
  }

  test("IVF ANN: self-match first, exact scores, candidates confined to probed cells") {
    val e = emb.cache()
    val q = e.filter(col("vec_id") === 0)
    val ivf = SimilaritySearch.annTopKIvf(e, q, k = 10, nlist = 16, nprobe = 4).collect()
    assert(ivf.nonEmpty)
    // vec 0 is a centroid, assigned to its own cell, which the query (== vec 0) probes first
    assert(ivf.head.getLong(0) == 0L)
    assert(math.abs(ivf.head.getDouble(1) - 1.0) < 1e-12)
    val scores = ivf.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
    // re-rank is exact: every IVF score equals the brute-force cosine for that id
    val exact = SimilaritySearch.topKCosine(e, q, k = e.count().toInt).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ivf.foreach(r => assert(exact(r.getLong(0)) == r.getDouble(1)))
  }

  test("IVF ANN with all cells probed == exact brute-force top-k") {
    val e = emb.cache()
    val q = e.filter(col("vec_id") === 0)
    val all = SimilaritySearch.annTopKIvf(e, q, k = 10, nlist = 16, nprobe = 16).collect()
    val exact = SimilaritySearch.topKCosine(e, q, k = 10).collect()
    assert(all.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      exact.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("k-means codebook training improves assignment quality, query path stays exact") {
    val e = emb.cache()
    val seed = SimilaritySearch.trainIvfCentroids(e, nlist = 8, iters = 0)
    val trained = SimilaritySearch.trainIvfCentroids(e, nlist = 8, iters = 5)
    assert(seed.size == 8 && trained.size == 8)
    assert(trained.forall(_.length == 64))
    // mean best-cell cosine must not degrade after Lloyd iterations
    def quality(cb: Seq[Array[Float]]): Double = {
      val best = greatest(cb.map(cv =>
        graft.functions.VectorFunctions.cosine(col("embedding"),
          typedLit(cv), 64)): _*)
      e.select(avg(best)).collect().head.getDouble(0)
    }
    assert(quality(trained) >= quality(seed) - 1e-9)
    // a trained codebook plugs into the same exact-re-rank query path
    val q = e.filter(col("vec_id") === 0)
    val ivf = SimilaritySearch.annTopKIvf(e, q, k = 10, nprobe = 3,
      codebook = Some(trained)).collect()
    assert(ivf.nonEmpty)
    val exact = SimilaritySearch.topKCosine(e, q, k = e.count().toInt).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ivf.foreach(r => assert(exact(r.getLong(0)) == r.getDouble(1)))
  }

  test("ANN LSH returns the self-match and a subset of brute-force candidates' scores") {
    val e = emb.cache()
    val q = e.filter(col("vec_id") === 0)
    val ann = SimilaritySearch.annTopKLsh(e, q, k = 10).collect()
    assert(ann.nonEmpty)
    assert(ann.head.getLong(0) == 0L) // the query shares its own bucket
    // every ANN score must equal the exact cosine for that id (re-rank is exact)
    val exact = SimilaritySearch.topKCosine(e, q, k = e.count().toInt).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ann.foreach(r => assert(exact(r.getLong(0)) == r.getDouble(1)))
  }

  test("LSH near-dup pairs: subset of exact pairs, same scores, no cross join") {
    val e = emb.cache()
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = pairs(SimilaritySearch.cosineNearDupPairs(e, threshold = 0.3))
    val lsh = SimilaritySearch.cosineNearDupPairsLsh(e, threshold = 0.3)
    val got = pairs(lsh)
    assert(got.nonEmpty)
    // candidates are a subset of the exact pair set with identical scores
    got.foreach { case (pair, c) => assert(exact(pair) == c) }
    val recall = got.size.toDouble / exact.size
    info(f"pair recall = $recall%.2f (${got.size}/${exact.size})")
    assert(recall >= 0.5, f"LSH pair recall dropped to $recall%.2f")
    // the blocking must plan as an equi-join, never a cross product
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("ANN LSH recall@10 vs exact top-10 stays above the pinned floor") {
    // q19 has no SQL oracle by design (driver records rows-only), so this
    // spec is the recall gate: bucket-logic regressions (wrong plane set,
    // bucket key drift, lost candidates) cannot hide behind "approximate
    // by design". The fixture is deterministic, so recall is a constant;
    // the floor is pinned just below the measured value.
    val e = emb.cache()
    val q = e.filter(col("vec_id") === 0)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSet
    val exact = ids(SimilaritySearch.topKCosine(e, q, k = 10))
    val ann = ids(SimilaritySearch.annTopKLsh(e, q, k = 10))
    val recall = exact.intersect(ann).size.toDouble / exact.size
    info(f"recall@10 = $recall%.2f (15 tables x 4 planes, 1-bit multiprobe)")
    assert(recall >= 0.9, f"recall@10 dropped to $recall%.2f")
    // multiprobe only ADDS probed buckets: its candidate set must contain
    // every exact-bucket candidate (recall is monotone in the probe set)
    val annNoProbe = ids(SimilaritySearch.annTopKLsh(e, q, k = 10, multiprobe = false))
    val recallNoProbe = exact.intersect(annNoProbe).size.toDouble / exact.size
    info(f"recall@10 without multiprobe = $recallNoProbe%.2f")
    assert(recall >= recallNoProbe)
    // widening the probe (fewer planes -> bigger buckets) must not lose
    // candidates: with 0 planes every vector shares one bucket == exact
    val annAll = ids(SimilaritySearch.annTopKLsh(e, q, k = 10, nPlanes = 0))
    assert(annAll == exact)
  }

  test("annTopKLsh probeBits: depth -1 replays the multiprobe flag " +
      "exactly; recall and the k-th score are monotone in probe depth " +
      "(the r16 recall@10 frontier knob)") {
    val e = emb.cache()
    val q = e.filter(col("vec_id") === 0)
    def top(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val d0 = top(SimilaritySearch.annTopKLsh(e, q, k = 10,
      multiprobe = false))
    val d1 = top(SimilaritySearch.annTopKLsh(e, q, k = 10))
    val d2 = top(SimilaritySearch.annTopKLsh(e, q, k = 10, probeBits = 2))
    // -1 (the default) derives the depth from the legacy flag
    assert(top(SimilaritySearch.annTopKLsh(e, q, k = 10,
      multiprobe = false, probeBits = 0)) == d0)
    assert(top(SimilaritySearch.annTopKLsh(e, q, k = 10,
      probeBits = 1)) == d1)
    // a deeper probe only ADDS candidate buckets: the k-th (minimum)
    // surviving score can never drop, and recall vs exact top-10 can
    // never drop (an exact-top-10 member in the pool outranks every
    // non-member, so growing the pool never evicts one)
    def minScore(d: Seq[(Long, Double)]) = d.map(_._2).min
    assert(minScore(d0) <= minScore(d1) && minScore(d1) <= minScore(d2))
    val exact = top(SimilaritySearch.topKCosine(e, q, k = 10))
      .map(_._1).toSet
    def recall(d: Seq[(Long, Double)]) =
      d.map(_._1).toSet.intersect(exact).size
    assert(recall(d0) <= recall(d1) && recall(d1) <= recall(d2))
  }

  test("mean ANN recall@10 over 20 query vectors stays above the pinned floor") {
    // The single-query recall gate (above) can be lucky: one query vector
    // exercises one bucket path. This aggregate gate runs 20 queries so a
    // plane-set or probe-logic regression cannot hide behind one good
    // query. The fixture is deterministic, so the mean is a constant; the
    // floor is pinned just below the measured value.
    val spark0 = spark
    import spark0.implicits._
    val e = emb.cache()
    val vecs = e.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val recalls = (0L until 20L).map { qid =>
      val qv = vecs.find(_._1 == qid).get._2
      val exact = vecs.map { case (id, v) => (-cos(qv, v), id) }
        .sorted.take(10).map(_._2).toSet
      val ann = SimilaritySearch.annTopKLsh(e, e.filter(col("vec_id") === qid), k = 10)
        .collect().map(_.getLong(0)).toSet
      exact.intersect(ann).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@10 over 20 queries = $mean%.3f (min ${recalls.min}%.2f)")
    assert(mean >= 0.95, f"mean recall@10 dropped to $mean%.3f")
    assert(recalls.min >= 0.85, f"worst-query recall@10 dropped to ${recalls.min}%.2f")
  }

  test("knnJoin == per-query topKCosine, and plans the per-query cut as WindowGroupLimit") {
    val e = emb.cache()
    val knn = SimilaritySearch.knnJoin(e, e.filter(col("vec_id") < 5), k = 5)
    val got = knn.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .groupBy(_._1)
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L))
    got.foreach { case (qid, rows) =>
      val expect = SimilaritySearch.topKCosine(e, e.filter(col("vec_id") === qid), k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(rows.sortBy(_._4).map(r => (r._2, r._3)).toSeq == expect,
        s"query $qid diverged from single-query top-k")
    }
    val p = knn.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("lshPlanesFor: bucket-bounded width at any corpus size; 63-bit " +
      "key budget respected; auto call delegates to the explicit one") {
    import SimilaritySearch.lshPlanesFor
    // small corpora: minPlanes binds (the q58/q264 oracle-equivalence)
    assert(lshPlanesFor(200L) == ((4, 8)))
    assert(lshPlanesFor(0L) == ((4, 8)))
    // 10x the bench corpus: one plane more — the scale-probe fix
    assert(lshPlanesFor(2000L) == ((5, 8)))
    assert(lshPlanesFor(20000L) == ((9, 7))) // re-fit into 63 bits
    // exact power boundary: want = n div 64 crosses 32 at n = 64*33
    assert(lshPlanesFor(64L * 32) == ((5, 8)))
    assert(lshPlanesFor(64L * 32 + 1) == ((5, 8))) // floor div: want still 32
    assert(lshPlanesFor(64L * 33) == ((6, 8)))
    // web scale: width capped at 30, tables re-fit, budget respected
    for (n <- Seq(1000000L, 1000000000L, Long.MaxValue)) {
      val (p, t) = lshPlanesFor(n)
      assert(p <= 30 && p * t <= 63 && t >= 1, s"n=$n -> ($p, $t)")
    }
    assert(lshPlanesFor(1000000000L)._1 == 24)
    // expected occupancy n / 2^planes stays <= 2*targetBucket whenever
    // the cap doesn't bind — the bound that kills the quadratic join
    for (n <- Seq(1000L, 50000L, 3000000L)) {
      val (p, _) = lshPlanesFor(n)
      assert(n.toDouble / (1L << p) <= 128.0, s"n=$n planes=$p")
    }
    // the degenerate-bucket cap is a SCALE guard: provably OFF below
    // 16x its own size (so the small-corpus delegation — and the q58
    // oracle's uncapped SQL — is exact BY CONSTRUCTION, sf0.01's 500
    // vectors included), ON above
    import SimilaritySearch.lshBucketCapFor
    assert(lshBucketCapFor(500L, 64) == Int.MaxValue)
    assert(lshBucketCapFor(2000L, 64) == Int.MaxValue) // sf0.1 bench corpus
    assert(lshBucketCapFor(16L * 256, 64) == Int.MaxValue) // boundary
    assert(lshBucketCapFor(16L * 256 + 1, 64) == 256)
    assert(lshBucketCapFor(2000000L, 64) == 256) // the 100x probe point
    // the auto entry point is exactly the explicit call at the chosen
    // width (same rows) on the fixture corpus
    val e = emb.cache()
    val n = e.count()
    val (planes, tables) = lshPlanesFor(n)
    val auto = SimilaritySearch.knnJoinLshAuto(e, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sorted
    val explicit = SimilaritySearch
      .knnJoinLsh(e, k = 5, nPlanes = planes, nTables = tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sorted
    assert(auto.nonEmpty && auto == explicit)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("knnJoinLsh: exact scores over LSH candidates, WindowGroupLimit cut, sane recall") {
    val e = emb.cache()
    val knn = SimilaritySearch.knnJoinLsh(e, k = 5)
    val rows = knn.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    // per query: ranks are 1..n in strictly (score desc, id asc) order
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.size).toSeq)
      assert(sorted.map(r => (-r._3, r._2)).toSeq ==
        sorted.map(r => (-r._3, r._2)).sorted.toSeq, s"rank order broken for $qid")
      assert(rs.forall(r => r._2 != qid), "a vector must not be its own neighbor")
    }
    // every score equals the exact cosine (re-rank is exact)
    val exactAll = SimilaritySearch.cosineNearDupPairs(e, threshold = -2.0).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)) -> r.getDouble(2),
        (r.getLong(1), r.getLong(0)) -> r.getDouble(2))).toMap
    rows.foreach { case (q, c, s, _) => assert(exactAll((q, c)) == s) }
    // recall@1 vs the exact kNN graph: the fixture's planted near-dups
    // collide with high probability, so the top neighbor should usually
    // survive bucketing
    val exactTop = exactAll.toSeq.groupBy(_._1._1)
      .map { case (q, ss) => q -> ss.map(x => (-x._2, x._1._2)).min._2 }
    val gotTop = rows.filter(_._4 == 1).map(r => r._1 -> r._2).toMap
    val hits = exactTop.count { case (q, c) => gotTop.get(q).contains(c) }
    val recall = hits.toDouble / exactTop.size
    info(f"kNN-graph recall@1 = $recall%.2f ($hits/${exactTop.size})")
    // measured 0.67 on the full 500-vector corpus; pinned just below so a
    // plane-set or bucket-key regression is a test failure, not a shrug
    assert(recall >= 0.6, f"recall@1 collapsed to $recall%.2f")
    val p = knn.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("auto-sized pair/store/query LSH delegate to the explicit call " +
      "at the width lshPlanesFor picks (minPlanes regime)") {
    val e = emb.cache()
    val n = e.count()
    val (planes, tables) = SimilaritySearch.lshPlanesFor(n)
    def canon3(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    // pair face (q265 ≡ q41 shape)
    val autoPairs = canon3(
      SimilaritySearch.cosineNearDupPairsLshAuto(e, threshold = 0.4))
    assert(autoPairs.nonEmpty && autoPairs == canon3(SimilaritySearch
      .cosineNearDupPairsLsh(e, 0.4, nPlanes = planes, nTables = tables)))
    // store face (q266 ≡ q103 shape), sized from the OLD side
    val newSide = e.filter(col("vec_id") % 2 === 0)
    val oldSide = e.filter(col("vec_id") % 2 === 1)
    val (op, ot) = SimilaritySearch.lshPlanesFor(oldSide.count())
    val autoCross = canon3(SimilaritySearch.crossCorpusNearDupLshAuto(
      newSide, oldSide, threshold = 0.4))
    assert(autoCross.nonEmpty && autoCross == canon3(SimilaritySearch
      .crossCorpusNearDupLsh(newSide, oldSide, 0.4, nPlanes = op, nTables = ot)))
    // single-query face (q267 ≡ q19 shape) at the (4, 15) default
    val q = e.filter(col("vec_id") === 0)
    val (qp, qt) = SimilaritySearch.lshPlanesFor(n, maxTables = 15)
    assert(qp == 4 && qt == 15) // the q19 config must bind on the fixture
    def canon2(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val autoAnn = canon2(SimilaritySearch.annTopKLshAuto(e, q, k = 10))
    assert(autoAnn.nonEmpty && autoAnn == canon2(
      SimilaritySearch.annTopKLsh(e, q, k = 10, nPlanes = qp, nTables = qt)))
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("semanticDedupAuto: delegates to q67's exact rule at fixture " +
      "scale; a forced sub-split stays a subset that keeps clusters") {
    val e = emb.cache()
    // fixture occupancy n/16 is under the default target -> zero
    // sub-planes -> exactly semanticDedup at q67's nlist=16
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSeq.sorted
    val auto = ids(SimilaritySearch.semanticDedupAuto(e, threshold = 0.4))
    assert(auto.nonEmpty &&
      auto == ids(SimilaritySearch.semanticDedup(e, 0.4, nlist = 16)))
    // force the sub-split regime: targetCell=1 makes want = occ, so
    // sub-planes > 0 and cells split. The split only REMOVES candidate
    // pairs, so the kept set can only grow (drops are a subset)...
    val split = ids(SimilaritySearch.semanticDedupAuto(e, threshold = 0.4,
      targetCell = 1))
    assert(auto.toSet.subsetOf(split.toSet),
      "sub-split must never drop a vector the unsplit run kept")
    // ...and exact-duplicate clusters (identical vectors -> identical
    // sign bits at ANY width) still dedup: every id the unsplit run
    // dropped because of an IDENTICAL smaller-id twin stays dropped.
    val spark0 = spark
    import spark0.implicits._
    val byVec = e.select(col("vec_id"),
        md5(to_json(struct(col("embedding")))).as("h"))
      .as[(Long, String)].collect().groupBy(_._2).values
      .filter(_.length > 1).toSeq
    val dupNonMin = byVec.flatMap(g => g.map(_._1).sorted.drop(1)).toSet
    if (dupNonMin.nonEmpty)
      assert(dupNonMin.forall(id => !split.contains(id)),
        "an exact duplicate survived the sub-split run")
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("knnJoinLsh bucketCap: no-op when above occupancy, bounds candidates " +
      "when binding, deterministic, exact scores preserved") {
    val e = emb.cache()
    // a cap far above any fixture bucket is byte-identical to uncapped
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sorted
    val uncapped = canon(SimilaritySearch.knnJoinLsh(e, k = 5))
    assert(canon(SimilaritySearch.knnJoinLsh(e, k = 5,
      bucketCap = 1 << 20)) == uncapped)
    // 1 plane x 1 table = 2 giant buckets (~250 rows each on the
    // 500-vector fixture): a cap of 40 must bind
    val capped = SimilaritySearch.knnJoinLsh(e, k = 5, nPlanes = 1,
      nTables = 1, bucketCap = 40)
    val rows = canon(capped)
    assert(rows.nonEmpty)
    // every row still queries: with bucket size >> cap >> k, each vector
    // has >= k capped candidates, so all n vectors keep k rows
    assert(rows.map(_._1).distinct.size == e.count())
    // candidate pool per bucket is bounded: across ALL queries of a
    // bucket, at most `cap` distinct candidate ids appear (plus none
    // from outside the bucket); with 2 buckets, <= 2*cap + tolerance
    assert(rows.map(_._2).distinct.size <= 80,
      s"capped candidate pool too large: ${rows.map(_._2).distinct.size}")
    // deterministic across re-evaluation
    assert(canon(SimilaritySearch.knnJoinLsh(e, k = 5, nPlanes = 1,
      nTables = 1, bucketCap = 40)) == rows)
    // scores remain exact cosines (the cap prunes candidates, never
    // perturbs scoring)
    val exact = SimilaritySearch.cosineNearDupPairs(e, threshold = -2.0)
      .collect().flatMap(r =>
        Seq((r.getLong(0), r.getLong(1)) -> r.getDouble(2),
          (r.getLong(1), r.getLong(0)) -> r.getDouble(2))).toMap
    rows.foreach { case (q, c, s, _) => assert(exact((q, c)) == s) }
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("int8 quantization: codes bounded, absmax hits ±127, checksum content-exact") {
    val spark0 = spark
    import spark0.implicits._
    val e = emb.cache()
    val out = SimilaritySearch.quantizeInt8(e).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out.size == e.count())
    val vecs = e.select(col("vec_id"), col("embedding").cast("array<float>"))
      .as[(Long, Array[Float])].collect().toMap
    out.foreach { case (id, (scale, qmin, qmax, qhash)) =>
      val v = vecs(id)
      val absmax = v.map(x => math.abs(x.toDouble)).max
      assert(scale == absmax / 127.0)
      assert(qmin >= -127 && qmax <= 127, s"codes out of int8 range for $id")
      // the absmax component must map to ±127 (the symmetric contract)
      assert(qmax == 127 || qmin == -127, s"no full-scale code for $id")
      // driver-side replay of the same floor-plus-half rule and checksum
      val qs = v.map(x => if (scale == 0) 0L
        else math.floor(x.toDouble / scale + 0.5).toLong)
      assert(qmin == qs.min && qmax == qs.max)
      val h = qs.foldLeft(0L)((h, q) => (h * 31 + (q + 128)) % 1000000007L)
      assert(qhash == h, s"checksum drifted for $id")
    }
    // zero vectors quantize to all-zero codes, not NaN
    val z = Seq((999L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding")
    val zr = SimilaritySearch.quantizeInt8(z).collect().head
    assert(zr.getDouble(1) == 0.0 && zr.getLong(2) == 0L && zr.getLong(3) == 0L)
  }

  test("dequantized int8 cosine stays within 2% of the float cosine") {
    val spark0 = spark
    import spark0.implicits._
    val e = emb.cache()
    val vecs = e.select(col("vec_id"), col("embedding").cast("array<float>"))
      .as[(Long, Array[Float])].collect().take(50)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def deq(v: Array[Float]): Array[Double] = {
      val scale = v.map(x => math.abs(x.toDouble)).max / 127.0
      v.map(x => math.floor(x.toDouble / scale + 0.5) * scale)
    }
    for (Seq((_, a), (_, b)) <- vecs.toSeq.combinations(2).take(200)) {
      val exact = cos(a.map(_.toDouble), b.map(_.toDouble))
      val approx = cos(deq(a), deq(b))
      assert(math.abs(exact - approx) < 0.02,
        f"quantization error ${math.abs(exact - approx)}%.4f too large")
    }
  }

  test("ANN LSH is deterministic for multi-row queries: score = max over query rows") {
    val e = emb.cache()
    val q2 = e.filter(col("vec_id") === 0 || col("vec_id") === 1)
    val runs = (1 to 3).map(_ =>
      SimilaritySearch.annTopKLsh(e, q2, k = 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    assert(runs.distinct.size == 1, "multi-query ANN result varied across runs")
    // each score is the best exact cosine against either query row
    val exact0 = SimilaritySearch.topKCosine(e, e.filter(col("vec_id") === 0),
      k = e.count().toInt).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact1 = SimilaritySearch.topKCosine(e, e.filter(col("vec_id") === 1),
      k = e.count().toInt).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    runs.head.foreach { case (id, score) =>
      assert(score == math.max(exact0(id), exact1(id)))
    }
  }

  test("semanticDedup: within-cell smaller-id near-dups dropped, exists semantics") {
    import spark.implicits._
    // codebook: two axis-aligned centroids; 4-dim vectors
    val codebook = Seq(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f))
    // cell 0 chain: 1 ~ 2 (cos .95+), 2 ~ 3 (cos .95+), but 1 !~ 3 (cos .81)
    // cell 1: 4 kept; 5 its near-dup; 6 lands in cell 1 (cos to c0 is -1)
    // but is no near-dup of anything
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0.95f, 0.312f, 0f, 0f)),
      (3L, Array(0.81f, 0.59f, 0f, 0f)),
      (4L, Array(0f, 1f, 0f, 0f)),
      (5L, Array(0f, 0.9f, 0.05f, 0f)),
      (6L, Array(-1f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val out = SimilaritySearch.semanticDedup(vecs, threshold = 0.9, dim = 4,
      nlist = 2, codebook = Some(codebook)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 2 dropped (near-dup of 1); 3 dropped via EXISTS semantics — its only
    // sub-threshold neighbor is 2, which was itself dropped (sequential
    // greedy would keep 3; this operator pins the exists rule)
    assert(out.keySet == Set(1L, 4L, 6L))
    assert(out(1L) == 0L && out(4L) == 1L && out(6L) == 1L)
  }

  test("embedOutliers: centroid cosine flags the misfiled vector, order-invariant") {
    val spark0 = spark
    import spark0.implicits._
    // group "en" clusters near +x (with one vector pointing -x: the
    // misfiled outlier); group "de" clusters near +y
    val vecs = Seq(
      (1L, "en", Array(1f, 0.1f, 0f, 0f)),
      (2L, "en", Array(0.9f, -0.1f, 0f, 0f)),
      (3L, "en", Array(-1f, 0f, 0f, 0f)),
      (4L, "de", Array(0.05f, 1f, 0f, 0f)),
      (5L, "de", Array(-0.05f, 0.9f, 0f, 0f))
    ).toDF("vec_id", "lang", "embedding")
    val out = SimilaritySearch.embedOutliers(vecs, threshold = 0.0, dim = 4)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out.size == 5)
    assert(out(3L)._2, "the -x vector in the +x group must flag as outlier")
    Seq(1L, 2L, 4L, 5L).foreach(id => assert(!out(id)._2, s"vec $id wrongly flagged"))
    // the centroid is an integer-sum artifact: input order/partitioning
    // cannot move it by even an ulp
    val shuffled = SimilaritySearch.embedOutliers(
      vecs.orderBy(col("vec_id").desc).repartition(5), threshold = 0.0, dim = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    out.foreach { case (id, (c, _)) => assert(shuffled(id) == c) }
  }

  test("centroidDrift: stable group near 1.0, rotated group drifts, order-invariant") {
    val spark0 = spark
    import spark0.implicits._
    // group "a": same +x cluster in both halves -> cosine ~1, no drift;
    // group "b": +y cluster rotated to +z in the new half -> cosine ~0
    val oldH = Seq(
      (1L, "a", Array(1f, 0.1f, 0f, 0f)),
      (2L, "a", Array(0.9f, -0.1f, 0f, 0f)),
      (3L, "b", Array(0f, 1f, 0.05f, 0f)),
      (4L, "b", Array(0f, 0.9f, -0.05f, 0f))).toDF("vec_id", "label", "embedding")
    val newH = Seq(
      (5L, "a", Array(0.95f, 0f, 0f, 0f)),
      (6L, "a", Array(1f, 0.05f, 0f, 0f)),
      (7L, "b", Array(0f, 0.05f, 1f, 0f)),
      (8L, "b", Array(0f, -0.05f, 0.9f, 0f))).toDF("vec_id", "label", "embedding")
    val out = SimilaritySearch.centroidDrift(oldH, newH, groupCol = "label",
      threshold = 0.5, dim = 4).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out("a")._1 == 2L && out("a")._2 == 2L)
    assert(out("a")._3 > 0.99 && !out("a")._4)
    assert(math.abs(out("b")._3) < 0.11 && out("b")._4)
    // integer-sum centroids: partitioning cannot move the cosine an ulp
    val shuffled = SimilaritySearch.centroidDrift(
      oldH.repartition(4), newH.orderBy(col("vec_id").desc), groupCol = "label",
      threshold = 0.5, dim = 4).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    out.foreach { case (g, (_, _, c, _)) => assert(shuffled(g) == c) }
  }

  test("semanticDedup equals brute-force exists-smaller-neighbor within cells") {
    val e = emb.cache()
    val kept = SimilaritySearch.semanticDedup(e, threshold = 0.4).collect()
      .map(_.getLong(0)).toSet
    // brute force: same seed codebook via annTopKIvf's convention
    // (centroids = vec_id < nlist); reuse the operator's own cell output
    // for assignment, then check the drop rule against exact pairs
    val cells = SimilaritySearch.semanticDedup(e, threshold = 2.0) // no drops
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = SimilaritySearch.cosineNearDupPairs(e, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expectedDrops = pairs.collect {
      case (a, b) if cells(a) == cells(b) => b
    }.toSet
    assert(kept == cells.keySet.diff(expectedDrops))
    assert(kept.size < cells.size, "threshold 0.4 must drop something on the fixture")
  }

  test("cross-corpus LSH pairs = the cross-side subset of the self-join LSH pairs") {
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val newSide = e.filter(graft.operators.Sampling.bucket(col("vec_id")) < 50)
    val oldSide = e.filter(graft.operators.Sampling.bucket(col("vec_id")) >= 50)
    val newIds = newSide.select("vec_id").collect().map(_.getLong(0)).toSet
    val cross = SimilaritySearch.crossCorpusNearDupLsh(newSide, oldSide,
        threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(cross.nonEmpty)
    cross.foreach { case (n, o, _) => assert(newIds(n) && !newIds(o)) }
    // the SRP bits depend only on the vector, so the self-join operator
    // restricted to cross-side orientation must agree exactly
    val self = SimilaritySearch.cosineNearDupPairsLsh(e, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, c) => Seq((a, b, c), (b, a, c)) }
      .filter { case (x, y, _) => newIds(x) && !newIds(y) }.toSet
    assert(cross == self)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("randomProject: matches a reference Scala chain on the real vectors") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val vecs = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val out = SimilaritySearch.randomProject(e, outDim = 4).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(i => r.getLong(i))).toMap
    vecs.foreach { case (id, v) =>
      val expected = (0 until 4).map { o =>
        var s = 0.0 // the operator's left-assoc fold, term by term
        (0 until 64).foreach { i =>
          s = s + v(i).toDouble * SimilaritySearch.rpSign(o, i, 64).toDouble
        }
        math.floor(s * 1000000.0 + 0.5).toLong
      }
      assert(out(id) == expected, s"vec $id")
    }
  }

  test("rpSign matrix is balanced enough to be a projection (not constant)") {
    val signs = for (o <- 0 until 16; i <- 0 until 64)
      yield SimilaritySearch.rpSign(o, i, 64)
    val pos = signs.count(_ == 1)
    // a degenerate all-one or all-minus-one matrix would collapse the
    // projection to a scaled sum; bound the imbalance loosely
    assert(pos > signs.size / 4 && pos < 3 * signs.size / 4, s"pos=$pos")
    // rows differ (distinct output dimensions project differently)
    val rows = (0 until 16).map(o => (0 until 64).map(SimilaritySearch.rpSign(o, _, 64)))
    assert(rows.distinct.size == 16)
  }

  test("mutualTop1: reciprocal rank-1 pairs only, min-id side's score") {
    val spark0 = spark
    import spark0.implicits._
    val knn = Seq(
      (1L, 2L, 0.9, 1), (1L, 3L, 0.8, 2),
      (2L, 1L, 0.9, 1), (2L, 3L, 0.7, 2),
      (3L, 1L, 0.95, 1), // 3's best is 1, but 1's best is 2 -> not mutual
      (4L, 5L, 0.5, 1), (5L, 6L, 0.6, 1)) // 4->5 unrequited
      .toDF("query_id", "cand_id", "score", "rank")
    val out = SimilaritySearch.mutualTop1(knn).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 0.9)))
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("mutualTop1 over the LSH kNN graph is symmetric-consistent with the graph") {
    val e = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
    val knn = SimilaritySearch.knnJoinLsh(e, k = 5)
    val top1 = knn.filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = SimilaritySearch.mutualTop1(knn).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.nonEmpty)
    out.foreach { case (a, b) =>
      assert(a < b)
      assert(top1(a) == b && top1(b) == a)
    }
    // and completeness: every reciprocal top-1 pair is reported
    val expected = top1.collect {
      case (a, b) if a < b && top1.get(b).contains(a) => (a, b)
    }.toSet
    assert(out.toSet == expected)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  // --- IVF-PQ ------------------------------------------------------------

  private def l2Ref(a: Array[Float], b: Array[Float], from: Int,
      until: Int): Double = {
    var s = 0.0; var i = from
    while (i < until) { val t = a(i).toDouble - b(i).toDouble; s += t * t; i += 1 }
    s
  }

  private def corpus(dir: String = "sf0.01"): Array[(Long, Array[Float])] = {
    val e = spark.read.parquet(s"${sf(dir)}/embeddings.parquet")
    import spark.implicits._
    e.select(col("vec_id").cast("long"), col("embedding").cast("array<float>"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
  }

  test("PQ encode: every code matches the driver-side argmin recompute") {
    val vecs = corpus()
    val cents = vecs.take(64).map(_._2)
    val e = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
    val out = SimilaritySearch.pqEncode(e, m = 8, ksub = 64).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getInt).toSeq).toMap
    assert(out.size == vecs.length)
    val dsub = 8
    vecs.foreach { case (id, v) =>
      val expect = (0 until 8).map { j =>
        cents.indices.map(c =>
          (l2Ref(v, cents(c), j * dsub, (j + 1) * dsub), c)).min._2
      }
      assert(out(id) == expect, s"codes diverge for vec $id")
    }
  }

  test("IVF-PQ with all cells probed and full rerank == exact L2 top-k") {
    val e = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
    val vecs = corpus()
    val q = vecs(123)._2
    val got = SimilaritySearch.ivfPqTopK(e,
        e.filter(col("vec_id") === 123), k = 10, nlist = 16, nprobe = 16,
        rerank = vecs.length).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = vecs.map { case (id, v) => (l2Ref(v, q, 0, 64), id) }
      .sorted.take(10).map { case (d, id) => (id, d) }.toSeq
    assert(got == exact)
  }

  test("IVF-PQ mean recall@10 over a 20-query panel stays above the pinned floor") {
    // Seed (untrained) codebooks, nlist=16/nprobe=8, ADC + rerank-100:
    // measured mean recall 0.705 (min 0.5) on the fixture. The floor
    // catches quantizer/ADC regressions; training the codebooks is the
    // quality path and only raises this.
    val e = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet").cache()
    val vecs = corpus()
    val cents = vecs.take(64).map(_._2).toSeq
    val cells = vecs.take(16).map(_._2).toSeq
    val recalls = (0 until 500 by 25).map { qid =>
      val q = vecs(qid)._2
      val got = SimilaritySearch.ivfPqTopK(e,
          e.filter(col("vec_id") === qid), k = 10, nprobe = 8,
          rerank = 100, codebook = Some(cents), cellbook = Some(cells))
        .collect().map(_.getLong(0)).toSet
      val exact = vecs.map { case (id, v) => (l2Ref(v, q, 0, 64), id) }
        .sorted.take(10).map(_._2).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    info(f"IVF-PQ mean recall@10 = $mean%.3f over ${recalls.size} queries")
    assert(mean >= 0.6, f"mean recall@10 dropped to $mean%.3f")
  }

  test("exactDupVectors: micro-quantized groups, distinct vectors stay out") {
    val spark0 = spark
    import spark0.implicits._
    val vecs = Seq(
      (1L, Array(0.5f, 0.25f)), (2L, Array(0.5f, 0.25f)), // exact dup
      (3L, Array(0.5f, 0.2500011f)),                      // differs at 1e-6 scale
      (4L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = SimilaritySearch.exactDupVectors(vecs).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 2L && out.head.getLong(2) == 1L)
  }

  test("neighborhoodPurity: bounds hold and totals tie to the kNN graph") {
    val e = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
    val purity = SimilaritySearch.neighborhoodPurity(e, k = 5).collect()
    val knnRows = SimilaritySearch.knnJoinLsh(e, k = 5).count()
    assert(purity.nonEmpty)
    purity.foreach { r =>
      val (n, same, pm) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n >= 1 && n <= 5 && same >= 0 && same <= n)
      assert(pm == same * 1000 / n)
    }
    assert(purity.map(_.getLong(2)).sum == knnRows,
      "every kNN edge must be counted exactly once")
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("labelCentroidMatrix: identical-direction labels hit cosine 1, orthogonal 0") {
    val spark0 = spark
    import spark0.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), 1), (2L, Array(2.0f, 0.0f), 1), // centroid +x
      (3L, Array(3.0f, 0.0f), 2),                             // also +x
      (4L, Array(0.0f, 1.0f), 3))                             // +y
      .toDF("vec_id", "embedding", "label")
    val out = SimilaritySearch.labelCentroidMatrix(vecs, dim = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(4)).toMap
    assert(math.abs(out((1, 2)) - 1.0) < 1e-12)
    assert(math.abs(out((1, 3))) < 1e-12)
    assert(math.abs(out((2, 3))) < 1e-12)
  }

  test("knnHubness: every vector banded once, in-degree mass equals graph size") {
    val e = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
    val bands = SimilaritySearch.knnHubness(e, k = 5).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(bands.map(_._2).sum == e.count())
    val edges = SimilaritySearch.knnJoinLsh(e, k = 5).count()
    // min/max consistent with the band definition
    bands.foreach { case (band, _, lo, hi) =>
      assert(lo <= hi)
      if (band == 0) assert(lo == 0 && hi == 0)
      else assert(java.lang.Long.toBinaryString(lo).length == band &&
        java.lang.Long.toBinaryString(hi).length == band)
    }
    assert(edges > 0)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("ivfCellBalance: every vector lands in exactly one of nlist cells") {
    val e = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
    val out = SimilaritySearch.ivfCellBalance(e, nlist = 16).collect()
    assert(out.length <= 16)
    assert(out.map(_.getLong(1)).sum == e.count())
    val shares = out.map(_.getLong(2))
    assert(shares.sum <= 1000 && shares.sum > 1000 - 16) // floor losses only
  }

  test("dimensionAudit: exact micro-integer mean and variance per coordinate") {
    val spark0 = spark
    import spark0.implicits._
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val out = SimilaritySearch.dimensionAudit(vecs).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(4),
        r.getDouble(5)))).toMap
    assert(out(1) == ((2L, 0.5, 0.25)))
    assert(out(2) == ((2L, 1.0, 1.0)))
  }

  test("dimensionAudit: long and decimal moment paths agree; magnitude injection auto-widens") {
    val spark0 = spark
    import spark0.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).sortBy(_._1).toSeq
    // 1. Width parity where both are exact: identical rows either way
    //    (the q124 contract, made structural for q216).
    val small = Seq((1L, Array(1.5f, 0.25f)), (2L, Array(-2.0f, 0.75f)),
      (3L, Array(0.5f, -0.5f))).toDF("vec_id", "embedding")
    assert(rows(SimilaritySearch.dimensionAuditWith(small, "embedding", "long")) ==
      rows(SimilaritySearch.dimensionAuditWith(small, "embedding", "decimal(19,0)")))
    // 2. Magnitude injection: a 3.3e6 coordinate makes maxMicro ~3.3e12,
    //    so a squared long moment overflows int64 — under ANSI mode the
    //    forced-long path must THROW (the failure the guard prevents)...
    val big = Seq((1L, Array(3300000.0f, 0.25f)), (2L, Array(-3300000.0f, 0.75f)),
      (3L, Array(0.5f, -0.5f))).toDF("vec_id", "embedding")
    val overflow = intercept[Exception] {
      SimilaritySearch.dimensionAuditWith(big, "embedding", "long").collect()
    }
    assert(overflow.getMessage.contains("ARITHMETIC_OVERFLOW"))
    // ...while the guarded public path auto-widens and stays exact.
    val audited = rows(SimilaritySearch.dimensionAudit(big))
    assert(audited == rows(
      SimilaritySearch.dimensionAuditWith(big, "embedding", "decimal(19,0)")))
    assert(audited.find(_._1 == 2).get._5 == (0.25 + 0.75 - 0.5) / 3.0)
  }

  test("pairDistanceHistogram: known cosines land in the right bins; mass conserved") {
    val spark0 = spark
    import spark0.implicits._
    // e1 vs e1-copy: cos 1.0 -> bin 10; e1 vs e2: cos 0 -> bin 0;
    // e1 vs -e1: cos -1 -> bin -10
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = SimilaritySearch.pairDistanceHistogram(vecs, samplePct = 100,
        dim = 2).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out.values.sum == 6L) // all C(4,2) pairs binned exactly once
    assert(out(10) == 1L)        // the identical pair
    assert(out(-10) == 2L)       // (1,4) and (2,4)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("at-scale guard: fixed-width LSH self-joins refuse past the " +
      "occupancy cutoff without an explicit opt-in") {
    // nPlanes=1 halves the corpus into each bucket, so occupancy
    // n >> 1 crosses the cutoff at a spec-sized corpus.
    val n = 2 * SimilaritySearch.FixedWidthOccupancyGuardCutoff + 2
    val big = spark.range(n).select(col("id").as("vec_id"),
      array((col("id") % 7).cast("float"),
        (col("id") % 11).cast("float")).as("embedding"))
    val e1 = intercept[IllegalArgumentException] {
      SimilaritySearch.knnJoinLsh(big, k = 5, dim = 2, nPlanes = 1, nTables = 1)
    }
    assert(e1.getMessage.contains("knnJoinLshAuto"))
    val e2 = intercept[IllegalArgumentException] {
      SimilaritySearch.cosineNearDupPairsLsh(big, 0.9, dim = 2,
        nPlanes = 1, nTables = 1)
    }
    assert(e2.getMessage.contains("cosineNearDupPairsLshAuto"))
    val small = big.limit(4)
    val e3 = intercept[IllegalArgumentException] {
      SimilaritySearch.crossCorpusNearDupLsh(small, big, 0.9, dim = 2,
        nPlanes = 1, nTables = 1)
    }
    assert(e3.getMessage.contains("crossCorpusNearDupLshAuto"))
    // a big NEW side against a small store is the legitimate ingest
    // shape — only store-side occupancy guards
    SimilaritySearch.crossCorpusNearDupLsh(big, small, 0.9, dim = 2,
      nPlanes = 1, nTables = 1)
    // opt-in constructs (guard is the only eager step; joins stay lazy)
    SimilaritySearch.knnJoinLsh(big, k = 5, dim = 2, nPlanes = 1,
      nTables = 1, allowFixedWidth = true)
    SimilaritySearch.cosineNearDupPairsLsh(big, 0.9, dim = 2, nPlanes = 1,
      nTables = 1, allowFixedWidth = true)
    // a bucketCap already linearizes the join: no guard, no opt-in
    SimilaritySearch.knnJoinLsh(big, k = 5, dim = 2, nPlanes = 1,
      nTables = 1, bucketCap = 64)
    // the at-scale faces take the same corpus without ceremony
    SimilaritySearch.knnJoinLshAuto(big, k = 5, dim = 2)
    SimilaritySearch.cosineNearDupPairsLshAuto(big, 0.9, dim = 2)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("at-scale guard: brute-force cosineNearDupPairs refuses past the " +
      "pair-budget cutoff without an explicit opt-in") {
    val n = SimilaritySearch.BruteForcePairGuardCutoff + 1
    val big = spark.range(n).select(col("id").as("vec_id"),
      array((col("id") % 7).cast("float"),
        (col("id") % 11).cast("float")).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      SimilaritySearch.cosineNearDupPairs(big, 0.9, dim = 2)
    }
    assert(e.getMessage.contains("cosineNearDupPairsLshAuto"))
    // nHint feeds the guard without the eager count (and still refuses)
    val e2 = intercept[IllegalArgumentException] {
      SimilaritySearch.cosineNearDupPairs(big, 0.9, dim = 2, nHint = n)
    }
    assert(e2.getMessage.contains("brute-force"))
    // a passing nHint skips the count entirely; opt-in stays fully lazy
    SimilaritySearch.cosineNearDupPairs(big, 0.9, dim = 2,
      nHint = SimilaritySearch.BruteForcePairGuardCutoff)
    SimilaritySearch.cosineNearDupPairs(big, 0.9, dim = 2,
      allowBruteForce = true)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("at-scale guard: fixed-cell semanticDedup refuses past the " +
      "occupancy cutoff without an explicit opt-in") {
    val n = 2 * (SimilaritySearch.FixedWidthOccupancyGuardCutoff + 1)
    val big = spark.range(n).select(col("id").as("vec_id"),
      array((col("id") % 7 + 1).cast("float"),
        (col("id") % 11 + 1).cast("float")).as("embedding"))
    // nlist=2 puts ~n/2 vectors in each cell — over the cutoff
    val e = intercept[IllegalArgumentException] {
      SimilaritySearch.semanticDedup(big, 0.9, dim = 2, nlist = 2)
    }
    assert(e.getMessage.contains("semanticDedupAuto"))
    // nHint feeds the guard without the count; opt-in constructs
    intercept[IllegalArgumentException] {
      SimilaritySearch.semanticDedup(big, 0.9, dim = 2, nlist = 2, nHint = n)
    }
    SimilaritySearch.semanticDedup(big, 0.9, dim = 2, nlist = 2,
      allowFixedCells = true)
    // the auto face takes the same corpus without ceremony
    SimilaritySearch.semanticDedupAuto(big, 0.9, dim = 2, nlist = 2)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("at-scale guard: exact bipartite knnJoin refuses past the " +
      "corpus x batch product budget without an explicit opt-in") {
    val cutoff = SimilaritySearch.BruteForcePairGuardCutoff
    val big = spark.range(2 * cutoff).select(col("id").as("vec_id"),
      array((col("id") % 7).cast("float"),
        (col("id") % 11).cast("float")).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      SimilaritySearch.knnJoin(big, big, k = 3, dim = 2)
    }
    assert(e.getMessage.contains("knnJoinLshBipartiteAuto"))
    // hints feed the guard without counts; a bounded batch passes
    intercept[IllegalArgumentException] {
      SimilaritySearch.knnJoin(big, big, k = 3, dim = 2,
        corpusHint = 2 * cutoff, queryHint = 2 * cutoff)
    }
    SimilaritySearch.knnJoin(big, big.limit(10), k = 3, dim = 2,
      corpusHint = 2 * cutoff, queryHint = 10)
    SimilaritySearch.knnJoin(big, big, k = 3, dim = 2,
      allowBruteForce = true)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("knnJoin guard short-circuit: cheap bounds on BOTH sides pass " +
      "with ZERO jobs; the division-form product check refuses " +
      "overflow-regime hints the old multiply would have wrongly passed") {
    val spark0 = spark
    import spark0.implicits._
    val vecs = (1L to 50L).map(i =>
      (i, Array((i % 7).toFloat, (i % 11).toFloat))).toDF("vec_id", "embedding")
    // LocalRelation bounds on corpus AND queries: guard passes job-free
    assert(countJobs {
      SimilaritySearch.knnJoin(vecs, vecs.limit(5), k = 3, dim = 2)
    } == 0)
    // 4e9 x 4e9 = 1.6e19 wraps a 64-bit product negative — the silent
    // guard-disarm the round-12 overflow fix closed. The division-form
    // check must still refuse.
    val h = 4000000000L
    val e = intercept[IllegalArgumentException] {
      SimilaritySearch.knnJoin(vecs, vecs, k = 3, dim = 2,
        corpusHint = h, queryHint = h)
    }
    assert(e.getMessage.contains("knnJoinLshBipartiteAuto"))
    assert((h * h) < 0L) // the wrap the old `cn * qn <= budget` fell to
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("semanticDedup guard short-circuit: a cheap bound within " +
      "occupancy x nlist passes with ZERO jobs (given a codebook); a " +
      "don't-know plan falls back to the exact count and still passes") {
    val spark0 = spark
    import spark0.implicits._
    val vecs = (1L to 64L).map(i =>
      (i, Array((i % 7 + 1).toFloat, (i % 11 + 1).toFloat)))
      .toDF("vec_id", "embedding")
    val cb = Some(Seq(Array(1f, 0f), Array(0f, 1f)))
    assert(countJobs {
      SimilaritySearch.semanticDedup(vecs, 0.9, dim = 2, nlist = 2,
        codebook = cb)
    } == 0)
    // union is row-growing -> no cheap bound -> the exact count job runs
    // (and passes: 128 vectors over 2 cells is far inside the cutoff)
    assert(countJobs {
      SimilaritySearch.semanticDedup(vecs.union(vecs), 0.9, dim = 2,
        nlist = 2, codebook = cb)
    } >= 1)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("fixed-width LSH guard short-circuit: a cheap bound within " +
      "occupancy << nPlanes passes with ZERO jobs; a don't-know plan " +
      "falls back to the exact count and still passes") {
    val spark0 = spark
    import spark0.implicits._
    val vecs = (1L to 64L).map(i =>
      (i, Array((i % 7).toFloat, (i % 11).toFloat))).toDF("vec_id", "embedding")
    assert(countJobs {
      SimilaritySearch.knnJoinLsh(vecs, k = 3, dim = 2, nPlanes = 1,
        nTables = 1)
    } == 0)
    assert(countJobs {
      SimilaritySearch.knnJoinLsh(vecs.union(vecs), k = 3, dim = 2,
        nPlanes = 1, nTables = 1)
    } >= 1)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("knnJoinLshBipartite: per-query top-k equals the brute-force cut " +
      "restricted to SRP bucket collisions; auto face delegates") {
    val e = emb.filter(col("vec_id") < 60).cache()
    val corpus = e.filter(col("vec_id") >= 10)
    val queries = e.filter(col("vec_id") < 10)
    val k = 3; val nPlanes = 2; val nTables = 3
    val got = SimilaritySearch.knnJoinLshBipartite(corpus, queries, k,
        dim = 64, nPlanes = nPlanes, nTables = nTables,
        allowFixedWidth = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSeq
    // reconstruct expected from the exploded (id, table-key) debug view
    // __tb is the exploded (table, bucket) struct — compare by value string
    val keys = SimilaritySearch.lshKeyedForDebug(e, nPlanes, nTables)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.get(1).toString).toSet }
    val vecs = e.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (0L until 10L).flatMap { q =>
      val cands = (10L until 60L).filter(c =>
        keys(q).intersect(keys(c)).nonEmpty)
      cands.map(c => (q, c, cos(vecs(q), vecs(c))))
        .sortBy { case (_, c, s) => (-s, c) }.take(k).zipWithIndex
        .map { case ((qq, c, s), i) => (qq, c, s, i + 1) }
    }.toSet
    assert(got.toSet == expected)
    // at this corpus size the auto face IS the explicit (4, 8) call
    val auto = SimilaritySearch.knnJoinLshBipartiteAuto(corpus, queries, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = SimilaritySearch.knnJoinLshBipartite(corpus, queries, k,
        nPlanes = 4, nTables = 8, allowFixedWidth = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == fixed)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  // ---- occupancy-measured auto sizing (round 14: the 1000x probe put
  // ~30K vectors in single SRP buckets at the count-sized width —
  // isotropy-assumed sizing under-widens on clustered corpora, and the
  // pair face has no bucketCap by design, so the width itself must
  // answer to MEASURED occupancy) ----

  test("lshWidthLadder: widens 5 planes per step to the 30-plane clamp, " +
      "re-fitting tables into the 63-bit key budget") {
    assert(SimilaritySearch.lshWidthLadder(15, maxTables = 8) ==
      Seq((15, 4), (20, 3), (25, 2), (30, 2)))
    assert(SimilaritySearch.lshWidthLadder(5, maxTables = 8) ==
      Seq((5, 8), (10, 6), (15, 4), (20, 3), (25, 2), (30, 2)))
    assert(SimilaritySearch.lshWidthLadder(30, maxTables = 8) ==
      Seq((30, 2)))
    // p*t never exceeds the 63-bit key budget at any rung
    SimilaritySearch.lshWidthLadder(4, maxTables = 15)
      .foreach { case (p, t) => assert(p * t <= 63 && t >= 1) }
  }

  test("measuredLshCandidatePairs: exact sum of C(m,2) over (table, " +
      "bucket) cells — identical vectors always share a bucket") {
    val spark0 = spark
    import spark0.implicits._
    // 15 copies of one direction: every table holds them in ONE cell,
    // so the measured count is exactly nTables * C(15,2)
    val dup = (1L to 15L).map(i => (i, Array(1.0f, 0.5f, -0.25f, 2.0f)))
      .toDF("vec_id", "embedding")
    assert(SimilaritySearch.measuredLshCandidatePairs(
      dup, "embedding", dim = 4, nPlanes = 4, nTables = 2) == 2L * 105)
    // empty corpus measures zero (null-sum path)
    val none = dup.filter(col("vec_id") < 0)
    assert(SimilaritySearch.measuredLshCandidatePairs(
      none, "embedding", dim = 4, nPlanes = 4, nTables = 2) == 0L)
  }

  test("cosineNearDupPairsLshAuto escalates the width until MEASURED " +
      "candidates fit the budget, and the escalated call runs") {
    val spark0 = spark
    import spark0.implicits._
    // two antipodal clusters of 1024 identical vectors: complementary
    // bits => exactly two cells per table at ANY width, so measured
    // candidates are nTables * 2 * C(1024,2) = nTables * 1,047,552 and
    // only the (25, 2) rung fits budget = 2048 * 1024 = 2,097,152
    // (the (20, 3) rung measures 3,142,656)
    val clustered = (1L to 2048L).map { i =>
      val s = if (i <= 1024) 1.0f else -1.0f
      (i, Array(s, s * 0.5f, s * -0.25f, s * 2.0f))
    }.toDF("vec_id", "embedding")
    assert(SimilaritySearch.cosineNearDupPairsLshAutoWidth(clustered,
      "embedding", dim = 4, targetBucket = 64, maxTables = 8,
      maxCandidatesPerVec = 1024) == (25, 2))
    // and the full operator at that budget produces the cluster pairs
    // (identical vectors share every bucket at every width, so the
    // output count is width-invariant: 2 * C(1024,2))
    val pairs = SimilaritySearch.cosineNearDupPairsLshAuto(clustered,
      threshold = 0.9, dim = 4, maxCandidatesPerVec = 1024)
    assert(pairs.count() == 2L * 1024 * 1023 / 2)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("cosineNearDupPairsLshAuto refuses when even the 30-plane clamp " +
      "leaves measured candidates over budget (genuinely dense corpus), " +
      "naming the measured volume and the opt-in") {
    val spark0 = spark
    import spark0.implicits._
    val dense = (1L to 2048L).map(i => (i, Array(1.0f, 0.5f, -0.25f, 2.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      SimilaritySearch.cosineNearDupPairsLshAuto(dense, threshold = 0.9,
        dim = 4, maxCandidatesPerVec = 16)
    }
    assert(e.getMessage.contains("nPlanes=30"))
    assert(e.getMessage.contains("allowFixedWidth=true"))
    assert(e.getMessage.contains("semanticDedupAuto"))
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("crossCorpusNearDupLshAuto: measured escalation on a hot store, " +
      "refusal when the batch's collisions can't fit any width") {
    val spark0 = spark
    import spark0.implicits._
    val v = Array(1.0f, 0.5f, -0.25f, 2.0f)
    val store = (1L to 2048L).map(i => (i, v)).toDF("vec_id", "embedding")
    val batch = (10001L to 10004L).map(i => (i, v)).toDF("vec_id", "embedding")
    // batch always lands in the store's single hot cell: measured =
    // nTables * 4 * 2048; only the 2-table rungs fit 4 * 4096 = 16384
    assert(SimilaritySearch.crossCorpusNearDupLshAutoWidth(batch, store,
      "embedding", dim = 4, targetBucket = 64, maxTables = 8,
      maxCandidatesPerVec = 4096) == (25, 2))
    val e = intercept[IllegalArgumentException] {
      SimilaritySearch.crossCorpusNearDupLshAuto(batch, store,
        threshold = 0.9, dim = 4, maxCandidatesPerVec = 16)
    }
    assert(e.getMessage.contains("nPlanes=30"))
    assert(e.getMessage.contains("crossCorpusNearDupLsh(nPlanes=30"))
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("occupancy measurement is SKIPPED in the minPlanes regime: the " +
      "width call runs no more jobs than the count it already owes") {
    val spark0 = spark
    import spark0.implicits._
    val tiny = (1L to 100L).map(i =>
      (i, Array((i % 7).toFloat, (i % 11).toFloat, 1.0f, 0.5f)))
      .toDF("vec_id", "embedding").cache()
    tiny.count() // materialize so both measured runs see the same plan
    val countJobsBase = countJobs { tiny.count() }
    val widthJobs = countJobs {
      assert(SimilaritySearch.cosineNearDupPairsLshAutoWidth(tiny,
        "embedding", dim = 4, targetBucket = 64, maxTables = 8,
        maxCandidatesPerVec = 2048) == (4, 8))
    }
    assert(widthJobs == countJobsBase)
    tiny.unpersist()
  }

  // ---- measured within-cell sub-split (round 15: q268 carried the
  // isotropy assumption the round-14 1000x wall disproved — its
  // sub-split sized from UNIFORM expected cell occupancy with a silent
  // 12-plane clamp and no refusal; now the width answers to the
  // measured per-cell histogram, exactly the q265 treatment applied
  // inside the IVF cell) ----

  test("SRP bits are prefix-stable: the low p bits of a wider projection " +
      "ARE lshBucket at p planes — the ladder-replay invariant behind " +
      "every histogram-once escalation") {
    val spark0 = spark
    import spark0.implicits._
    val vecs = (1L to 64L).map(i => (i, Array.tabulate(4)(d =>
      math.sin(i * 31.7 + d * 7.3).toFloat))).toDF("vec_id", "embedding")
    Seq(1, 7, 13, 29).foreach { p =>
      val mask = (1L << p) - 1
      val bad = vecs.select(
        graft.functions.VectorFunctions.lshBucket(col("embedding"), 4, p)
          .as("narrow"),
        graft.functions.VectorFunctions.lshBucket(col("embedding"), 4, 30)
          .bitwiseAND(lit(mask)).as("masked"))
        .filter(col("narrow") =!= col("masked")).count()
      assert(bad == 0L, s"prefix instability at p=$p")
    }
  }

  test("semanticDedupSubPlaneLadder: expectation start, 5-plane steps, " +
      "30-plane clamp") {
    assert(SimilaritySearch.semanticDedupSubPlaneLadder(0) ==
      Seq(0, 5, 10, 15, 20, 25, 30))
    assert(SimilaritySearch.semanticDedupSubPlaneLadder(4) ==
      Seq(4, 9, 14, 19, 24, 29, 30))
    assert(SimilaritySearch.semanticDedupSubPlaneLadder(30) == Seq(30))
  }

  // Driver-side replay of the engine's cell/bucket/cosine math — same
  // ascending-index double accumulation as DotProductF32/SrpBucketF32,
  // so group keys and scores are bit-identical to the executors'.
  private def replayDot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def replayCos(a: Array[Float], b: Array[Float]): Double =
    replayDot(a, b) / (math.sqrt(replayDot(a, a)) * math.sqrt(replayDot(b, b)))
  private def replayBits(v: Array[Float], planes: Int): Long = {
    var b = 0L
    var j = 0
    while (j < planes) {
      var proj = 0.0
      var a = 0
      while (a < v.length) {
        proj += v(a).toDouble *
          graft.functions.VectorFunctions.planeWeight(j, a + 1, v.length).toDouble
        a += 1
      }
      if (proj > 0) b |= 1L << j
      j += 1
    }
    b
  }
  // cellAssign ties to the LOWEST cid at equal cosine (greatest over
  // (cos, -cid) structs), so >= on the lower-cid side mirrors it
  private def replayCell(v: Array[Float],
      cents: Seq[Array[Float]]): Long = {
    var best = 0
    var i = 1
    while (i < cents.size) {
      if (replayCos(v, cents(i)) > replayCos(v, cents(best))) best = i
      i += 1
    }
    best.toLong
  }

  /** A hot-cell corpus: ids 0/1 are antipodal anchors (the seed
    * codebook), ids 2..n-1 a noisy cone around the +anchor — nearly all
    * mass lands in ONE cell, the exact shape the uniform-expectation
    * rule under-sizes on. Deterministic (index-seeded sin noise). */
  private def coneCorpus(n: Int, noise: Float): Seq[(Long, Array[Float])] = {
    val u = Array(1.0f, 0.5f, -0.25f, 2.0f)
    val anchors = Seq(0L -> u, 1L -> u.map(-_))
    val cone = (2 until n).map { i =>
      i.toLong -> Array.tabulate(4)(a =>
        u(a) + noise * math.sin(i * 12.9898 + a * 78.233).toFloat)
    }
    anchors ++ cone
  }

  test("semanticDedupAutoSubPlanes sizes from the MEASURED per-cell " +
      "histogram: a hot-cell corpus escalates past the uniform-" +
      "expectation start, pinned by a driver-side ladder replay") {
    val spark0 = spark
    import spark0.implicits._
    val rows = coneCorpus(4096, noise = 0.45f)
    val df = rows.toDF("vec_id", "embedding")
    val cents = rows.take(2).map { case (i, v) => (i, v) }
    val n = rows.size.toLong
    val maxCand = 500
    val budget = n * maxCand
    // uniform expectation: occ = 4096/2 = 2048, want = 32 -> p0 = 5
    val p0 = 5
    // replay the ladder against a driver-side (cell, bits30) histogram
    val hist = rows.groupBy { case (_, v) =>
      (replayCell(v, cents.map(_._2)), replayBits(v, 30))
    }.map { case (k, vs) => (k, vs.size.toLong) }
    def measured(p: Int): Long = {
      val mask = (1L << p) - 1
      hist.groupBy { case ((cell, b), _) => (cell, b & mask) }
        .values.map(_.map(_._2).sum).map(m => m * (m - 1) / 2).sum
    }
    val ladder = SimilaritySearch.semanticDedupSubPlaneLadder(p0)
    val expected = ladder.find(p => measured(p) <= budget)
    // the fixture must genuinely exercise escalation-then-accept: the
    // expectation rung overflows, a pre-clamp rung fits
    assert(measured(p0) > budget,
      s"fixture too diffuse: measured(p0=$p0)=${measured(p0)} <= $budget")
    assert(expected.exists(p => p > p0 && p < 30),
      s"fixture does not escalate-and-accept: $expected")
    val got = SimilaritySearch.semanticDedupAutoSubPlanes(df, "embedding",
      dim = 4, targetCell = 64, nlist = 2, cents = cents, n = n,
      maxCandidatesPerVec = maxCand)
    assert(got == expected.get)

    // and the full operator at that width matches the keep rule replayed
    // at the SAME (cell, sub-bucket) keys: drop iff a smaller-id
    // neighbor in the group sits at cosine >= threshold
    val threshold = 0.9
    val kept = SimilaritySearch.semanticDedupAuto(df, threshold,
        dim = 4, targetCell = 64, nlist = 2, maxCandidatesPerVec = maxCand)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val mask = (1L << got) - 1
    val expectedKept = rows.groupBy { case (_, v) =>
      (replayCell(v, cents.map(_._2)), replayBits(v, 30) & mask)
    }.values.flatMap { group =>
      val sorted = group.sortBy(_._1)
      sorted.filter { case (id, v) =>
        !sorted.exists { case (id2, v2) =>
          id2 < id && replayCos(v2, v) >= threshold
        }
      }.map(_._1)
    }.toSet
    assert(kept == expectedKept)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  // ---- measured width for the kNN-graph faces (round 15: the 1000x
  // recall probe measured the count-sized width + bucketCap evicting
  // TRUE near-dups on clustered data — cosine>=0.9 band recall 0.42
  // capped vs 0.81 at the measured width uncapped, every band better —
  // so q264/q276 now size by the q265 ladder; the cap survives only as
  // the dense-corpus fallback, sound because a graph's output is
  // bounded by n*k at any width) ----

  test("knnGraphWidth escalates by MEASURED ORDERED volume and stays " +
      "uncapped when a rung fits; knnJoinLshAuto IS the explicit " +
      "uncapped call at that width") {
    val spark0 = spark
    import spark0.implicits._
    // the q265 escalation fixture: two antipodal clusters of 1024
    // identical vectors — ordered volume shrinks only via nTables:
    // (5,8) 16.8M -> (10,6) 12.6M -> (15,4) 8.4M -> (20,3) 6.3M ->
    // (25,2) 4.190M <= budget 2048*2048 = 4.194M
    val clustered = (1L to 2048L).map { i =>
      val s = if (i <= 1024) 1.0f else -1.0f
      (i, Array(s, s * 0.5f, s * -0.25f, s * 2.0f))
    }.toDF("vec_id", "embedding")
    assert(SimilaritySearch.knnGraphWidth(clustered, "embedding", dim = 4,
      targetBucket = 64, maxTables = 8, maxCandidatesPerVec = 2048,
      n = 2048L) == (25, 2, Int.MaxValue))
    val auto = SimilaritySearch.knnJoinLshAuto(clustered, k = 3, dim = 4,
        maxCandidatesPerVec = 2048)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val explicit = SimilaritySearch.knnJoinLsh(clustered, k = 3, dim = 4,
        nPlanes = 25, nTables = 2, allowFixedWidth = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(auto.nonEmpty && auto == explicit)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("knnGraphWidth dense-corpus FALLBACK: when even the 30-plane " +
      "clamp is over budget, the residue is bounded by the LARGEST " +
      "measured cap that fits (floor targetBucket) — never a refusal") {
    val spark0 = spark
    import spark0.implicits._
    // 8192 identical vectors: no width ever splits them — the widest
    // rung's histogram is 2 tables x one 8192-cell
    val dense = (1L to 8192L)
      .map(i => (i, Array(1.0f, 0.5f, -0.25f, 2.0f)))
      .toDF("vec_id", "embedding")
    // budget 8192*600 = 4.915M: cap sums are c=4096 -> 67.1M,
    // c=1024 -> 16.8M, c=256 -> 4.19M <= budget: largest fitting = 256
    assert(SimilaritySearch.knnGraphWidth(dense, "embedding", dim = 4,
      targetBucket = 64, maxTables = 8, maxCandidatesPerVec = 600,
      n = 8192L) == (30, 2, 256))
    // budget 8192*16 = 131K: even c=64 sums to 1.05M — floor binds
    assert(SimilaritySearch.knnGraphWidth(dense, "embedding", dim = 4,
      targetBucket = 64, maxTables = 8, maxCandidatesPerVec = 16,
      n = 8192L) == (30, 2, 64))
    val rows = SimilaritySearch.knnJoinLshAuto(dense, k = 3, dim = 4,
      maxCandidatesPerVec = 16).collect()
    assert(rows.nonEmpty)
    // every query still gets its k neighbors from the capped pool
    assert(rows.groupBy(_.getLong(0)).values.forall(_.length <= 3))
    // bipartite face: cross-ladder fallback shape, budget query-side
    val queries = dense.filter(col("vec_id") <= 4)
    val bp = SimilaritySearch.knnJoinLshBipartiteAuto(dense, queries,
      k = 3, maxCandidatesPerVec = 16).collect()
    assert(bp.groupBy(_.getLong(0)).size == 4)
    assert(bp.groupBy(_.getLong(0)).values.forall(_.length <= 3))
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("knnJoinLshBipartiteAuto escalates by the MEASURED cross ladder " +
      "and IS the explicit uncapped call at the accepted width") {
    val spark0 = spark
    import spark0.implicits._
    // store: the antipodal clusters (never split — collisions shrink
    // only via nTables); queries: 8 vectors in the +cluster, so cross
    // collisions are t*8*1024 ordered: (5,8) 65.5K -> ... -> (25,2)
    // 16.4K <= budget 8*2048 = 16384
    val store = (1L to 2048L).map { i =>
      val s = if (i <= 1024) 1.0f else -1.0f
      (i, Array(s, s * 0.5f, s * -0.25f, s * 2.0f))
    }.toDF("vec_id", "embedding")
    val queries = (10001L to 10008L)
      .map(i => (i, Array(1.0f, 0.5f, -0.25f, 2.0f)))
      .toDF("vec_id", "embedding")
    // the cross width decision is the q266 helper's, re-fit per rung
    assert(SimilaritySearch.crossCorpusNearDupLshAutoWidth(queries, store,
      "embedding", dim = 4, targetBucket = 64, maxTables = 8,
      maxCandidatesPerVec = 2048) == (25, 2))
    val auto = SimilaritySearch.knnJoinLshBipartiteAuto(store, queries,
        k = 3, dim = 4, maxCandidatesPerVec = 2048)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val explicit = SimilaritySearch.knnJoinLshBipartite(store, queries,
        k = 3, dim = 4, nPlanes = 25, nTables = 2,
        allowFixedWidth = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(auto.nonEmpty && auto == explicit)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("semanticDedupAuto REFUSES at the 30-plane clamp, naming the " +
      "measured volume: identical vectors never split, so no width can " +
      "fit a small budget — the silent-clamp hole (VERDICT r14 #1)") {
    val spark0 = spark
    import spark0.implicits._
    val dense = (0L until 2048L)
      .map(i => (i, Array(1.0f, 0.5f, -0.25f, 2.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      SimilaritySearch.semanticDedupAuto(dense, threshold = 0.9, dim = 4,
        nlist = 16, maxCandidatesPerVec = 16)
    }
    assert(e.getMessage.contains("subPlanes=30"))
    assert(e.getMessage.contains((2048L * 2047 / 2).toString))
    assert(e.getMessage.contains("maxCandidatesPerVec"))
    assert(e.getMessage.contains("allowFixedCells=true"))
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("small regime: semanticDedupAuto delegates to q67's exact rule " +
      "(zero sub-planes, no measurement) — same rows as semanticDedup") {
    val e = emb // sf0.01: occupancy ~31/cell, under the 64 target
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids(SimilaritySearch.semanticDedupAuto(e, threshold = 0.4)) ==
      ids(SimilaritySearch.semanticDedup(e, threshold = 0.4)))
    graft.SparkUtil.unpersistTrackedCaches()
  }

  // ---- residual multiprobe for the graph faces (VERDICT r15 #1): a
  // vector alone in its bucket in EVERY table yields no graph rows at
  // the first pass, so kNN-graph consumers see it as isolated for no
  // semantic reason (6/64 probe queries at the r15 1000x width). The
  // second pass anti-joins the empty-yield slice out and re-probes it
  // with query-side 1-bit multiprobe — (nPlanes+1)x on the residual
  // slice only. Fixture: the 2048 antipodal-cluster corpus (measured
  // width (25, 2), uncapped) plus ONE isolated vector
  // (-2, -2, 0, -2), found by scanning a half-integer grid for a
  // vector whose 25-bit table-0 bucket is Hamming-1 from the minus
  // cluster's (and table-1 Hamming-2, so both first-pass buckets are
  // singletons): pass 1 provably yields nothing for it, the table-0
  // 1-bit probe provably reaches the minus cluster (cosine ~0.877). ----

  private def residualFixture = {
    val spark0 = spark
    import spark0.implicits._
    ((1L to 2048L).map { i =>
      val s = if (i <= 1024) 1.0f else -1.0f
      (i, Array(s, s * 0.5f, s * -0.25f, s * 2.0f))
    } :+ ((3000L, Array(-2.0f, -2.0f, 0.0f, -2.0f))))
      .toDF("vec_id", "embedding")
  }

  test("knnJoinLshAuto residual multiprobe: an empty-yield vector gets " +
      "its true cluster neighbors in the second pass; every other " +
      "query's rows are untouched") {
    val corpus = residualFixture
    // n=2049: budget 2049*2048 = 4.196M, ordered volume at (25,2) =
    // 4.190M (the isolated vector contributes zero collisions) — the
    // same accepted rung as the 2048-row ladder spec, uncapped
    assert(SimilaritySearch.knnGraphWidth(corpus, "embedding", dim = 4,
      targetBucket = 64, maxTables = 8, maxCandidatesPerVec = 2048,
      n = 2049L) == (25, 2, Int.MaxValue))
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val explicitRows = rowsOf(SimilaritySearch.knnJoinLsh(corpus, k = 3,
      dim = 4, nPlanes = 25, nTables = 2, allowFixedWidth = true))
    // pass 1 alone: the isolated vector is ABSENT — both its buckets
    // are singletons, so the self-excluding join yields nothing
    assert(!explicitRows.exists(_._1 == 3000L))
    val autoRows = rowsOf(SimilaritySearch.knnJoinLshAuto(corpus, k = 3,
      dim = 4, maxCandidatesPerVec = 2048))
    // the residual pass attaches the isolated vector to the minus
    // cluster (table-0 probe flips the one differing plane): k rows,
    // ranks 1..k, exact cosine to the identical cluster members
    val res = autoRows.filter(_._1 == 3000L).sortBy(_._4)
    assert(res.length == 3)
    assert(res.map(_._4).toSeq == Seq(1, 2, 3))
    assert(res.forall(r => r._2 >= 1025L && r._2 <= 2048L))
    assert(res.forall(r => math.abs(r._3 - 7.0 / math.sqrt(63.75)) < 1e-12))
    // rank ties break cand_id-asc over the residual-cap survivors (the
    // pass-2 candidate side is capped at maxCandidatesPerVec /
    // (nTables·(nPlanes+1)) = 39 mix32-ordered members of the bucket —
    // deterministic, but not the 3 lowest ids of the full cluster)
    assert(res.map(_._2).toSeq == res.map(_._2).toSeq.sorted)
    assert(res.map(_._2).distinct.length == 3)
    // every non-residual query's rows are exactly the first pass's
    assert(autoRows.filterNot(_._1 == 3000L).toSet == explicitRows.toSet)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("knnJoinLshBipartiteAuto residual multiprobe: an empty-yield " +
      "QUERY is re-probed against the store; collided queries are " +
      "untouched (and the minPlanes regime skips the fallback)") {
    val spark0 = spark
    import spark0.implicits._
    val store = (1L to 2048L).map { i =>
      val s = if (i <= 1024) 1.0f else -1.0f
      (i, Array(s, s * 0.5f, s * -0.25f, s * 2.0f))
    }.toDF("vec_id", "embedding")
    val queries = Seq(
      (10001L, Array(1.0f, 0.5f, -0.25f, 2.0f)), // plus-cluster twin
      (10002L, Array(-2.0f, -2.0f, 0.0f, -2.0f)) // the isolated vector
    ).toDF("vec_id", "embedding")
    // budget 2*1024: the twin's cross collisions are 1024*t per rung,
    // so only the (25, 2) rung fits — the width the fixture was built
    // for; Right(...) = cap off, and 25 > minPlanes arms the fallback
    assert(SimilaritySearch.crossCorpusNearDupLshAutoWidth(queries, store,
      "embedding", dim = 4, targetBucket = 64, maxTables = 8,
      maxCandidatesPerVec = 1024) == (25, 2))
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val explicitRows = rowsOf(SimilaritySearch.knnJoinLshBipartite(store,
      queries, k = 3, dim = 4, nPlanes = 25, nTables = 2,
      allowFixedWidth = true))
    assert(!explicitRows.exists(_._1 == 10002L)) // empty yield, pass 1
    assert(explicitRows.count(_._1 == 10001L) == 3)
    val autoRows = rowsOf(SimilaritySearch.knnJoinLshBipartiteAuto(store,
      queries, k = 3, dim = 4, maxCandidatesPerVec = 1024))
    val res = autoRows.filter(_._1 == 10002L).sortBy(_._4)
    assert(res.length == 3)
    assert(res.forall(r => r._2 >= 1025L && r._2 <= 2048L))
    assert(res.forall(r => math.abs(r._3 - 7.0 / math.sqrt(63.75)) < 1e-12))
    assert(autoRows.filterNot(_._1 == 10002L).toSet ==
      explicitRows.filterNot(_._1 == 10002L).toSet)
    // minPlanes regime (the sf0.01 oracle shape): auto == explicit
    // fixed width BY CONSTRUCTION — no residual pass, even though one
    // query yields nothing there too
    val tinyStore = store.filter(col("vec_id") <= 256)
    val tinyAuto = rowsOf(SimilaritySearch.knnJoinLshBipartiteAuto(
      tinyStore, queries, k = 3, dim = 4)).toSet
    val tinyExplicit = rowsOf(SimilaritySearch.knnJoinLshBipartite(
      tinyStore, queries, k = 3, dim = 4, nPlanes = 4, nTables = 8,
      allowFixedWidth = true)).toSet
    assert(tinyAuto == tinyExplicit)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("srpProbeKeys enumerates exactly the Hamming-<=depth buckets per " +
      "table: (1+p) keys at depth 1, (1+p+C(p,2)) at depth 2, all " +
      "distinct, none outside the ball") {
    val spark0 = spark
    import spark0.implicits._
    val (p, t) = (5, 3)
    // a fixed 15-bit pattern: per-table buckets 0b10110, 0b01001, 0b11111
    val bits = ((0b11111L << 10) | (0b01001L << 5) | 0b10110L)
    def keysAt(depth: Int): Seq[(Int, Long)] =
      Seq(bits).toDF("__bits")
        .select(SimilaritySearch.srpProbeKeys(
          col("__bits"), p, t, probeBits = depth).as("k"))
        .select(col("k.t"), col("k.b")).collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSeq
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val exactOf = Map(0 -> 0b10110L, 1 -> 0b01001L, 2 -> 0b11111L)
    Seq(0 -> 1, 1 -> (1 + p), 2 -> (1 + p + p * (p - 1) / 2)).foreach {
      case (depth, perTable) =>
        val ks = keysAt(depth)
        assert(ks.size == t * perTable, s"depth $depth size")
        assert(ks.distinct.size == ks.size, s"depth $depth distinct")
        ks.foreach { case (tb, b) =>
          assert(ham(b, exactOf(tb)) <= depth && b >= 0 && b < (1L << p))
        }
        // the exact bucket is always present
        exactOf.foreach { case (tb, b) => assert(ks.contains((tb, b))) }
    }
    // depth 0 IS srpTableKeys
    val plain = Seq(bits).toDF("__bits")
      .select(SimilaritySearch.srpTableKeys(col("__bits"), p, t).as("k"))
      .select(col("k.t"), col("k.b")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(keysAt(0).sorted == plain.sorted)
  }
}
