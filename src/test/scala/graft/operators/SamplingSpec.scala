package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Tests for deterministic sampling: reproducibility (same input → same
 * rows), stratified rate ordering, split stability and partition (every
 * row in exactly one of train/test).
 */
class SamplingSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")

  test("hashSample is deterministic and roughly proportional") {
    val a = Sampling.hashSample(docs, pct = 30).select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.hashSample(docs, pct = 30).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    val n = docs.count().toDouble
    assert(a.length > n * 0.15 && a.length < n * 0.45) // ~30%, loose bound
  }

  test("hashSample is monotone in pct: smaller sample nests inside larger") {
    val small = Sampling.hashSample(docs, pct = 10).select("doc_id").collect().map(_.getLong(0)).toSet
    val large = Sampling.hashSample(docs, pct = 40).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large))
  }

  test("stratifiedSample applies per-stratum rates") {
    val sampled = Sampling.stratifiedSample(docs, rates = Map("en" -> 0), defaultPct = 100)
    val langs = sampled.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(!langs.contains("en"))
    assert(sampled.count() == docs.filter(col("lang") =!= "en").count())
  }

  test("decontaminate removes exactly the eval-set content, keeps the rest") {
    val eval = Sampling.hashSample(docs, pct = 10)
    val clean = Dedup.decontaminate(docs, eval)
    assert(clean.count() == docs.count() - eval.count()) // corpus texts unique per doc
    val evalIds = eval.select("doc_id").collect().map(_.getLong(0)).toSet
    val cleanIds = clean.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cleanIds.intersect(evalIds).isEmpty)
  }

  test("contentSample: id-free membership is content-determined and rerun-stable") {
    val a = Sampling.contentSample(docs, pct = 30).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    val b = Sampling.contentSample(docs.repartition(7), pct = 30).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b)) // layout-independent
    val n = docs.count().toDouble
    assert(a.length > n * 0.15 && a.length < n * 0.45) // ~30%, loose bound
    // nesting: smaller content sample is a subset of the larger
    val small = Sampling.contentSample(docs, pct = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(a.toSet))
  }

  test("takePerStratum: exact quotas, deterministic membership, hashSample-aligned") {
    val out = Sampling.takePerStratum(docs, n = 20)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.values.forall(_ == 20)) // every fixture language has >= 20 docs
    assert(out.count() == byLang.size * 20)
    // rerun-stable
    val ids1 = out.select("doc_id").collect().map(_.getLong(0)).sorted
    val ids2 = Sampling.takePerStratum(docs, n = 20)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids1.sameElements(ids2))
    // quota larger than the stratum: returns the whole stratum, no crash
    val all = Sampling.takePerStratum(docs, n = 1000000)
    assert(all.count() == docs.count())
  }

  test("temperatureSample: sqrt-scaled rates, smallest stratum kept whole") {
    val spark0 = spark
    import spark0.implicits._
    // counts 400/100/25 → rates floor(100·sqrt(25/c)) = 25 / 50 / 100
    val rows = (0 until 400).map(i => (i.toLong, "a")) ++
      (0 until 100).map(i => (1000L + i, "b")) ++
      (0 until 25).map(i => (2000L + i, "c"))
    val df = rows.toDF("doc_id", "lang")
    val kept = Sampling.temperatureSample(df)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expectedRates = Map("a" -> 25L, "b" -> 50L, "c" -> 100L)
    // membership must be exactly bucket < rate (not just approximate counts)
    val expect = rows.filter { case (id, lang) =>
      ((id % 2147483648L) * 2654435761L % 4294967296L % 100) < expectedRates(lang)
    }.toSet
    assert(kept.toSet == expect)
    // the smallest stratum survives in full
    assert(kept.count(_._2 == "c") == 25)
    // dominant strata actually downsampled toward sqrt scaling
    assert(kept.count(_._2 == "a") < 150)
  }

  test("bucket never overflows 64-bit math, even for ids beyond 2^32") {
    import spark.implicits._
    // Ids at the scale where the unreduced Knuth product would exceed
    // 2^63 (Spark would wrap silently; DuckDB would raise). The mod-2^31
    // fold keeps every intermediate in range and the result in [0, 100).
    val ids = Seq(0L, 1L, 2147483647L, 2147483648L, 3500000000L,
      4294967296L, Long.MaxValue)
    val got = ids.toDF("id").select(Sampling.bucket(col("id")).as("b"))
      .collect().map(_.getLong(0))
    // Reference arithmetic in BigInt (no overflow possible).
    val want = ids.map { id =>
      ((BigInt(id) % BigInt(2147483648L)) * BigInt(2654435761L) %
        BigInt(4294967296L) % 100).toLong
    }
    assert(got.toSeq == want)
    assert(got.forall(b => b >= 0 && b < 100))
    // small ids (the entire fixture range) keep their round-1 buckets:
    // the fold is the identity below 2^31
    assert(got(2) == (BigInt(2147483647L) * 2654435761L % 4294967296L % 100).toLong)
  }

  test("trainTestSplit partitions every row, stable across calls") {
    val s1 = Sampling.trainTestSplit(docs, testPct = 20)
    assert(s1.count() == docs.count())
    val bySplit = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "test")))
    assert(bySplit.getOrElse("test", 0L) > 0 && bySplit.getOrElse("train", 0L) > 0)
    // same ids land in the same split on a rerun (content-addressed)
    val t1 = s1.filter(col("split") === "test").select("doc_id").collect().map(_.getLong(0)).sorted
    val t2 = Sampling.trainTestSplit(docs, testPct = 20)
      .filter(col("split") === "test").select("doc_id").collect().map(_.getLong(0)).sorted
    assert(t1.sameElements(t2))
  }

  test("topShareSelection keeps the minimal best-first prefix covering the share") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, "g", 50L), (2L, "g", 30L), (3L, "g", 20L),
      (4L, "h", 10L)).toDF("doc_id", "lang", "n_chars")
    def kept(p: Int) = Sampling
      .topShareSelection(df, p, "n_chars").collect().map(_.getLong(0)).toSet
    // exclusive-cum rule: doc survives iff mass before it is short of p%
    assert(kept(50) == Set(1L, 4L))        // 50 covers exactly 50%
    assert(kept(51) == Set(1L, 2L, 4L))    // need 30 more to pass 51%
    assert(kept(81) == Set(1L, 2L, 3L, 4L))
    assert(kept(0).isEmpty)
    assert(kept(100) == Set(1L, 2L, 3L, 4L))
    // coverage property on the real corpus: per group, kept mass >= p%
    val d = spark.read.parquet(s"${sf()}/documents.parquet")
    val sel = Sampling.topShareSelection(d, 50, "n_chars")
    val keptMass = sel.groupBy("lang").agg(sum("n_chars").as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totMass = d.groupBy("lang").agg(sum("n_chars").as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totMass.foreach { case (g, tot) =>
      assert(keptMass.getOrElse(g, 0L) * 100 >= 50L * tot, s"group $g under-covered")
    }
  }

  test("leakageSafeSplit: near-dup clusters never straddle the split") {
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.6)
      .select("id_a", "id_b")
    val out = Sampling.leakageSafeSplit(docs, pairs, testPct = 20)
    assert(out.count() == docs.count())
    // every pair's two sides share a component AND a split
    val splitById = out.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val prs = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(prs.nonEmpty)
    prs.foreach { case (a, b) =>
      assert(splitById(a) == splitById(b), s"pair ($a,$b) straddles the split")
    }
    // singletons (no pairs) split exactly like the plain id-hash split
    val paired = prs.flatMap(p => Seq(p._1, p._2)).toSet
    val plain = Sampling.trainTestSplit(docs, testPct = 20).collect()
      .map(r => r.getLong(0) -> r.getString(r.length - 1)).toMap
    splitById.foreach { case (id, (comp, split)) =>
      if (!paired.contains(id)) {
        assert(comp == id)
        assert(split == plain(id), s"singleton $id diverged from plain split")
      }
    }
  }

  test("tokenBudgetSample: full best tiers, rate-sampled boundary, dropped tail") {
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    // three tiers by n_chars: 8-15 (tier 4), 4-7 (tier 3), 2-3 (tier 2);
    // every doc has exactly 10 tokens, 10 docs per tier → 100 tokens/tier
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_chars", LongType, nullable = false),
      StructField("text", StringType, nullable = false)))
    val rows = (0 until 30).map { i =>
      val v = i / 10 match { case 0 => 8L; case 1 => 4L; case _ => 2L }
      R(i.toLong, v, text)
    }
    val df = spark.createDataFrame(rows.asJava, schema)
    // budget 150: tier 4 kept whole (100), tier 3 boundary at rate
    // floor(100*50/100) = 50, tier 2 dropped
    val kept = Sampling.tokenBudgetSample(df, budgetTokens = 150)
      .collect().map(_.getLong(0)).toSet
    val tier4 = (0L until 10L).toSet
    val boundaryExpected = df.filter(col("n_chars") === 4 &&
      Sampling.bucket(col("doc_id")) < 50).collect().map(_.getLong(0)).toSet
    assert(kept == tier4 ++ boundaryExpected)
    assert(boundaryExpected.nonEmpty && boundaryExpected.size < 10)
    // budget covers everything → identity; budget 0 → empty
    assert(Sampling.tokenBudgetSample(df, budgetTokens = 1000).count() == 30)
    assert(Sampling.tokenBudgetSample(df, budgetTokens = 0).count() == 0)
  }

  test("mixToTarget: binding stratum keeps ~all, others downsample by exact rates") {
    val spark0 = spark
    import spark0.implicits._
    // a: 60 rows, b: 40 rows; target 50/50 → achievable scale
    // T = min(60*100/50, 40*100/50) = 80, rate_a = 50*80/60 = 66,
    // rate_b = 50*80/40 = 100 (b is the binding stratum)
    val df = ((0 until 60).map(i => (i.toLong, "a")) ++
      (100 until 140).map(i => (i.toLong, "b")) ++
      (200 until 220).map(i => (i.toLong, "c"))) // not in targets → dropped
      .toDF("doc_id", "lang")
    val out = Sampling.mixToTarget(df, Map("a" -> 50, "b" -> 50))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.forall(_._2 != "c"), "unlisted strata must be dropped")
    // membership replays exactly: bucket(id) < rate per stratum
    val expected = df.filter(
      (col("lang") === "a" && Sampling.bucket(col("doc_id")) < 66) ||
      (col("lang") === "b" && Sampling.bucket(col("doc_id")) < 100))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.sorted.toSeq == expected.sorted.toSeq)
    assert(out.count(_._2 == "b") == 40, "the binding stratum keeps everything")
    // guards: mix must sum to 100, percentages positive
    intercept[IllegalArgumentException](
      Sampling.mixToTarget(df, Map("a" -> 50, "b" -> 40)))
    intercept[IllegalArgumentException](
      Sampling.mixToTarget(df, Map("a" -> 100, "b" -> 0)))
    // no target stratum present in the data → empty, not a crash
    assert(Sampling.mixToTarget(df, Map("x" -> 100)).count() == 0)
  }

  test("epochShuffle: a bijective order per epoch, different across epochs, rerun-stable") {
    val e1 = Sampling.epochShuffle(docs, epoch = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(e1.length == docs.count())
    // every doc appears once; within each bucket positions are 1..size
    assert(e1.map(_._1).distinct.length == e1.length)
    e1.groupBy(_._2).foreach { case (b, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length).toSeq,
        s"bucket $b positions are not a contiguous rank")
    }
    // buckets actually spread (no accidental single-bucket degeneracy)
    assert(e1.map(_._2).distinct.length > 16)
    // a different epoch is a genuinely different permutation
    val e2 = Sampling.epochShuffle(docs, epoch = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val order1 = e1.sortBy(r => (r._2, r._3)).map(_._1).toSeq
    val order2 = e2.sortBy(r => (r._2, r._3)).map(_._1).toSeq
    assert(order1 != order2)
    assert(order1.toSet == order2.toSet)
    // content-addressed: input re-layout changes nothing
    val relaid = Sampling.epochShuffle(docs.repartition(7), epoch = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(relaid.sortBy(_._1).toSeq == e1.sortBy(_._1).toSeq)
  }

  test("weightedSample: smallest-n priority keys, reference formula") {
    val spark0 = spark
    import spark0.implicits._
    val rows = (0L until 50L).map(i => (i, 10L + (i % 7) * 100L))
    val df = rows.toDF("doc_id", "n_chars")
    def key(id: Long, w: Long): Long = {
      val u = ((id % 2147483648L) * 2654435761L) % 4294967296L % 1048576L
      u * 1000000L / math.max(w, 1L)
    }
    val expected = rows.map { case (id, w) => (id, key(id, w)) }
      .sortBy { case (id, k) => (k, id) }.take(12).toMap
    val out = Sampling.weightedSample(df, n = 12).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == expected)
  }

  test("paretoFrontier keeps exactly the non-dominated rows; both-axes ties kept") {
    val spark0 = spark
    import spark0.implicits._
    val pts = Seq((1L, 10L, 5L), (2L, 10L, 5L), (3L, 10L, 4L), (4L, 8L, 7L),
      (5L, 12L, 3L), (6L, 7L, 7L), (7L, 5L, 9L)).toDF("doc_id", "xx", "yy")
    val out = Sampling.paretoFrontier(pts, col("xx"), col("yy"))
      .collect().map(_.getLong(0)).toSet
    // 3 loses to same-x (10,5); 6=(7,7) loses to (8,7); the (10,5) tie
    // pair both survive (no strict dominance between equals)
    assert(out == Set(1L, 2L, 4L, 5L, 7L))
  }

  test("paretoFrontier matches the O(n²) dominance definition on the real corpus") {
    val d = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val y = expr("(size(array_distinct(split(text, ' '))) * CAST(1000000 AS BIGINT)) div size(split(text, ' '))")
    val got = Sampling.paretoFrontier(d, col("n_chars"), y)
      .collect().map(_.getLong(0)).toSet
    val pts = d.select(col("doc_id"), col("n_chars").cast("long"),
      y.cast("long")).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = pts.filter { case (_, x0, y0) =>
      !pts.exists { case (_, x1, y1) =>
        x1 >= x0 && y1 >= y0 && (x1 > x0 || y1 > y0) }
    }.map(_._1).toSet
    assert(got == brute)
  }

  test("weightedSample: weight-0 rows clamp, null/negative rows drop, reruns agree") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, 0L), (2L, -5L), (3L, 100L), (4L, 100L))
      .toDF("doc_id", "n_chars")
      .union(Seq((5L, Option.empty[Long])).toDF("doc_id", "n_chars"))
    val out = Sampling.weightedSample(df, n = 10).collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 3L, 4L)) // 2 (negative) and 5 (null) excluded
    val again = Sampling.weightedSample(df, n = 10).collect().map(_.getLong(0)).toSet
    assert(again == out)
  }

  test("groupHoldout: every row of a group lands on the same side; both sides used") {
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val out = Sampling.groupHoldout(docs, "source", testPct = 30)
      .select("source", "split").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySource = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    bySource.foreach { case (src, sides) =>
      assert(sides.size == 1, s"source $src split across sides")
    }
    val sides = out.map(_._2).toSet
    assert(sides == Set("train", "test"), s"only $sides present")
    // rerun-stable
    val again = Sampling.groupHoldout(docs, "source", testPct = 30)
      .select("source", "split").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(again == out.toSet)
  }
}
