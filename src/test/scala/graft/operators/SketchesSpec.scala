package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Tests for the deterministic HLL sketch: estimate accuracy against exact
 * distinct counts, merge-associativity of register state, and rerun
 * stability (the whole point of public-arithmetic sketching).
 */
class SketchesSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")

  test("register table: bucket in range, rank positive, deterministic across reruns") {
    val regs = Sketches.hllRegisters(docs, Seq("lang"), "text", p = 4)
    val rows = regs.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(rows.forall { case (_, b, r) => b >= 0 && b < 16 && r >= 1 && r <= 57 })
    val again = Sketches.hllRegisters(docs, Seq("lang"), "text", p = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(rows.sorted.sameElements(again.sorted))
  }

  test("estimate tracks exact distinct counts within HLL error bounds") {
    val est = Sketches.approxDistinct(docs, Seq("lang"), "text", p = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val exact = docs.groupBy("lang").agg(countDistinct("text").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (lang, n) =>
      val e = est(lang)
      // raw estimate (no linear-counting correction): generous 2x bound —
      // the oracle pins exact arithmetic; this pins sketch sanity
      assert(e > n / 2.0 && e < n * 2.0, s"$lang: estimate $e vs exact $n")
    }
  }

  test("register merge: sketching halves then merging == sketching the whole") {
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val merged = Sketches.mergeRegisters(
        Sketches.hllRegisters(a, Seq("lang"), "text", p = 4),
        Sketches.hllRegisters(b, Seq("lang"), "text", p = 4), Seq("lang"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
    val whole = Sketches.hllRegisters(docs, Seq("lang"), "text", p = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
    assert(merged.sameElements(whole))
  }

  test("bloom filter: no false negatives, low false-positive rate, words well-formed") {
    val spark0 = spark
    import spark0.implicits._
    val inserted = (0 until 200).map(i => s"value_$i")
    val probes = (0 until 1000).map(i => s"other_$i")
    val insDf = inserted.toDF("v")
    val mBits = 1 << 14
    val words = Sketches.bloomArray(insDf, "v", mBits, k = 5)
    assert(words.length == mBits / Sketches.BloomWordBits + 1)
    assert(words.forall(_ >= 0L)) // 63-bit words: masks never touch the sign bit
    def contained(vals: Seq[String]): Int =
      vals.toDF("v").filter(Sketches.bloomMightContain(col("v"), words, mBits, k = 5))
        .count().toInt
    assert(contained(inserted) == inserted.size) // the defining guarantee
    val fp = contained(probes)
    // 200 keys in 16384 bits at k=5 -> theoretical fp ~ 0.2%; allow slack
    assert(fp < 30, s"false-positive count $fp out of ${probes.size}")
  }

  test("bloom words merge by element-wise OR across partial builds") {
    val spark0 = spark
    import spark0.implicits._
    val all = (0 until 100).map(i => s"v$i")
    val mBits = 1 << 12
    val wholeWords = Sketches.bloomArray(all.toDF("v"), "v", mBits, k = 5)
    val a = Sketches.bloomArray(all.take(50).toDF("v"), "v", mBits, k = 5)
    val b = Sketches.bloomArray(all.drop(50).toDF("v"), "v", mBits, k = 5)
    val merged = a.zip(b).map { case (x, y) => x | y }
    assert(merged.sameElements(wholeWords))
  }

  test("count-min sketch never underestimates; wide grid recovers exact counts") {
    val spark0 = spark
    import spark0.implicits._
    val occ = docs.select(explode(split(col("text"), " ")).as("token")).cache()
    val exact = occ.groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val grid = Sketches.cmsArray(occ, "token")
    val est = occ.distinct()
      .select(col("token"), Sketches.cmsEstimate(col("token"), grid).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (tok, e) => assert(e >= exact(tok), s"$tok underestimated") }
    // ~31 distinct tokens in 4x1024 cells: collisions are essentially
    // impossible, so the sketch should be exact here
    assert(est == exact)
    // grids merge by cell-wise sum
    val evenGrid = Sketches.cmsArray(
      docs.filter(col("doc_id") % 2 === 0).select(explode(split(col("text"), " ")).as("token")), "token")
    val oddGrid = Sketches.cmsArray(
      docs.filter(col("doc_id") % 2 === 1).select(explode(split(col("text"), " ")).as("token")), "token")
    val merged = evenGrid.zip(oddGrid).map { case (x, y) => x + y }
    assert(merged.sameElements(grid))
  }

  test("histogram quantiles: one row per (key, pct), estimates within bucket bounds") {
    val est = Sketches.histogramQuantiles(docs, Seq("lang"), "n_chars")
    val rows = est.collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    assert(rows.size == langs.length * 3) // exactly one straddling bucket each
    // log-bucket guarantee: estimate within a factor of 2 of the exact value
    val exact = TextAnalysis.percentiles(docs).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    langs.foreach { lang =>
      val (p50, p90, p99) = exact(lang)
      Seq(50 -> p50, 90 -> p90, 99 -> p99).foreach { case (p, ex) =>
        val e = rows((lang, p))
        assert(e > ex / 2 && e < ex * 2, s"$lang p$p: sketch $e vs exact $ex")
      }
    }
    // deterministic across reruns
    val again = Sketches.histogramQuantiles(docs, Seq("lang"), "n_chars")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(again == rows)
  }

  test("hash60 parses the md5 prefix as the oracle does") {
    val spark0 = spark
    import spark0.implicits._
    val got = Seq("a").toDF("v").select(Sketches.hash60(col("v"))).head.getLong(0)
    // md5("a") = 0cc175b9c0f1b6a8..., first 15 hex chars as integer
    assert(got == java.lang.Long.parseLong("0cc175b9c0f1b6a", 16))
  }

  test("phrase overlap via HLL inclusion-exclusion tracks the exact set sizes") {
    val r = graft.SparkEntry.queries("q91_vocab_overlap")(spark, sf()).collect().head
    val (ea, eb, eu, eo) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    // exact shingle sets per side via the exact (non-sketch) pipeline
    def shingles(pred: org.apache.spark.sql.Column) = docs.filter(pred)
      .select(explode(graft.functions.TextFunctions
        .shingleHashes(col("text"), 3)).as("h"))
      .distinct().collect().map(_.getLong(0)).toSet
    val va = shingles(graft.operators.Sampling.bucket(col("doc_id")) < 50)
    val vb = shingles(graft.operators.Sampling.bucket(col("doc_id")) >= 50)
    def relErr(est: Double, exact: Int) = math.abs(est - exact) / exact
    info(f"est_a=$ea%.1f (exact ${va.size}), est_b=$eb%.1f (exact ${vb.size}), " +
      f"est_union=$eu%.1f (exact ${va.union(vb).size}), " +
      f"est_overlap=$eo%.1f (exact ${va.intersect(vb).size})")
    // p=6: sigma ~ 13%; pin 3-sigma-ish ceilings on the direct estimates
    assert(relErr(ea, va.size) <= 0.3)
    assert(relErr(eb, vb.size) <= 0.3)
    assert(relErr(eu, va.union(vb).size) <= 0.3)
    // the intersection compounds three errors — pin a looser ceiling
    assert(relErr(eo, va.intersect(vb).size) <= 0.5)
  }

  test("heavyHittersExact == brute force on a skewed head + long tail") {
    val spark0 = spark
    import spark0.implicits._
    // 3 head values (1200/900/600) over a 500-value tail (3 each)
    val data = Seq.fill(1200)("hot_a") ++ Seq.fill(900)("hot_b") ++
      Seq.fill(600)("hot_c") ++
      (0 until 500).flatMap(i => Seq.fill(3)(s"tail_$i"))
    val df = data.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v").repartition(16)
    for (cap <- Seq(4, 9, 19)) {
      val got = Sketches.heavyHittersExact(df, col("v"), cap)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val counts = data.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
      val want = counts.filter(_._2 * (cap + 1) > data.size)
      assert(got == want, s"capacity=$cap")
    }
  }

  test("heavyHittersExact: empty result when nothing crosses the threshold") {
    val spark0 = spark
    import spark0.implicits._
    val df = (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    assert(Sketches.heavyHittersExact(df, col("v"), 4).isEmpty)
  }

  test("heavyHittersExact ignores nulls and keeps exact counts") {
    val spark0 = spark
    import spark0.implicits._
    val df = (Seq.fill(8)(Some("x")) ++ Seq(None, None, Some("y")))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = Sketches.heavyHittersExact(df, col("v"), 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 9 non-null values; threshold n/3 = 3: only x (8) qualifies
    assert(got == Map("x" -> 8L))
  }

  test("bucket-count sketches merged by SUM equal the whole-corpus sketch") {
    val d = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val half = graft.operators.Sampling.bucket(col("doc_id")) < 50
    val merged = Sketches.quantilesFromBucketCounts(
      Sketches.mergeBucketCounts(
        Sketches.bucketCounts(d.filter(half), Seq("lang"), "n_chars"),
        Sketches.bucketCounts(d.filter(!half), Seq("lang"), "n_chars"),
        Seq("lang")),
      Seq("lang")).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val whole = Sketches.histogramQuantiles(d, Seq("lang"), "n_chars")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    assert(merged == whole)
  }

  test("Bloom word tables merged by OR equal the whole-corpus filter") {
    val d = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val half = graft.operators.Sampling.bucket(col("doc_id")) < 50
    val merged = Sketches.mergeBloomWords(
        Sketches.bloomWords(d.filter(half), "text"),
        Sketches.bloomWords(d.filter(!half), "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val whole = Sketches.bloomWords(d, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == whole)
  }

  test("CMS grids merged by cell-wise SUM equal the whole-corpus grid") {
    val d = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val half = graft.operators.Sampling.bucket(col("doc_id")) < 50
    val merged = Sketches.mergeCmsTables(
        Sketches.cmsTable(d.filter(half), "token"),
        Sketches.cmsTable(d.filter(!half), "token"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = Sketches.cmsTable(d, "token")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }
}
