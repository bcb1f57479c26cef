package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/**
 * Unit tests for the dedup family over hand-built fixtures with known
 * duplicate structure, plus invariants over the real `documents` table
 * (SURVEY.md §2.3 Tier B: exact dedup, n-gram Jaccard, MinHash+LSH,
 * SimHash).
 */
class DedupSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(rows.map { case (i, t) => Row(i, t) }.asJava, docSchema)

  test("exact dedup keeps the min-order row per key with all columns intact") {
    val df = docs(3L -> "b b b", 1L -> "a a a", 2L -> "a a a", 4L -> "b b b")
    val out = Dedup.exact(df, Seq("text"), "doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(out.toSeq == Seq((1L, "a a a"), (3L, "b b b")))
  }

  test("ngram Jaccard finds an identical pair at jaccard 1.0 and ignores disjoint docs") {
    val df = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy dog",
      3L -> "completely different words entirely here now folks")
    val out = Dedup.ngramJaccardPairs(df, threshold = 0.5).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    assert(r.getDouble(2) == 1.0)
  }

  test("ngram Jaccard scores a partial overlap correctly") {
    // shingles(a): {1 2 3, 2 3 4, 3 4 5}; shingles(b): {2 3 4, 3 4 5, 4 5 6}
    // inter=2, union=4 → jaccard=0.5
    val df = docs(1L -> "w1 w2 w3 w4 w5", 2L -> "w2 w3 w4 w5 w6")
    val out = Dedup.ngramJaccardPairs(df, threshold = 0.4).collect()
    assert(out.length == 1 && out.head.getDouble(2) == 0.5)
  }

  test("docs shorter than n tokens are dropped, not crashed on") {
    val df = docs(1L -> "only two", 2L -> "x", 3L -> "a b c d")
    assert(Dedup.ngramJaccardPairs(df, threshold = 0.1).collect().isEmpty)
  }

  test("fuzzy decontamination drops embedded/edited eval leakage, keeps the rest") {
    val evalDoc = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = docs(
      1L -> evalDoc,                                         // exact copy
      2L -> ("prefix words here " + evalDoc + " suffix words there"), // embedded
      3L -> "completely unrelated text about spark catalyst optimizer rules",
      4L -> "the quick brown fox sat still") // shares a few shingles, below 80%
    val eval = docs(100L -> evalDoc)
    val kept = Dedup.decontaminateFuzzy(corpus, eval, containPct = 80)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L))
  }

  test("bloom-prefiltered decontamination equals the exact broadcast version") {
    val d = spark.read.parquet(s"${sf()}/documents.parquet")
    val eval = Sampling.hashSample(d, pct = 10)
    val exact = Dedup.decontaminate(d, eval)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val bloom = Dedup.decontaminateBloom(d, eval)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(bloom.sameElements(exact))
    // the candidate pre-filter is a pure per-row literal probe: no join,
    // no shuffle before the verify
    val words = Sketches.bloomArray(eval, "text")
    val p = d.filter(Sketches.bloomMightContain(
        org.apache.spark.sql.functions.col("text"), words, 1 << 16))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"), p)
  }

  test("fuzzy decontamination with an empty eval set keeps everything") {
    val corpus = docs(1L -> "a b c d e", 2L -> "f g h i j")
    val kept = Dedup.decontaminateFuzzy(corpus, corpus.filter(col("doc_id") < 0))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
  }

  test("cross-corpus pairs = the between-sides subset of the self-join pairs") {
    val d = spark.read.parquet(s"${sf()}/documents.parquet")
    val newSide = d.filter(Sampling.bucket(col("doc_id")) < 50)
    val oldSide = d.filter(Sampling.bucket(col("doc_id")) >= 50)
    val newIds = newSide.select("doc_id").collect().map(_.getLong(0)).toSet
    val cross = Dedup.crossCorpusPairs(newSide, oldSide).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(cross.nonEmpty)
    cross.foreach { case (n, o, _) => assert(newIds(n) && !newIds(o)) }
    // agreement with the self-join operator on the same pair space
    val self = Dedup.ngramJaccardPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, j) => Seq((a, b, j), (b, a, j)) }
      .filter { case (x, y, _) => newIds(x) && !newIds(y) }.toSet
    assert(cross == self)
  }

  test("prefix-filtered Jaccard equals the plain inverted-index operator exactly") {
    val d = spark.read.parquet(s"${sf()}/documents.parquet")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = canon(Dedup.ngramJaccardPairs(d))
    val prefix = canon(Dedup.ngramJaccardPairsPrefix(d))
    assert(prefix == plain)
    assert(plain.nonEmpty)
    // also at a lower threshold, where prefixes are longer
    assert(canon(Dedup.ngramJaccardPairsPrefix(d, threshold = 0.3)) ==
      canon(Dedup.ngramJaccardPairs(d, threshold = 0.3)))
  }

  test("minhash LSH agrees with exact ngram Jaccard on the documents table") {
    val d = spark.read.parquet(s"${sf()}/documents.parquet")
    val exact = Dedup.ngramJaccardPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.minhashLshPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact == lsh)
    assert(exact.nonEmpty) // the synthetic corpus plants near-dups
  }

  test("simhash pairs include every identical-text pair and respect the hamming cap") {
    val df = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta",
      3L -> "one two three four five six seven eight")
    val out = Dedup.simhashPairs(df, maxHamming = 3).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(out.head.getInt(2) == 0) // identical text → identical simhash
  }

  test("simhash pigeonhole blocking loses no pair vs brute force on documents") {
    val d = spark.read.parquet(s"${sf()}/documents.parquet").limit(100).cache()
    val blocked = Dedup.simhashPairs(d, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the same simhashes
    val hs = d.select(col("doc_id"),
      graft.functions.TextFunctions.simhash(split(col("text"), " ")).as("sh"))
    val brute = hs.as("x").join(hs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).as("h"))
      .filter(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute)
  }

  test("boilerplateSpans: shared spans flagged, unique spans not, short docs ratio 0") {
    val df = docs(
      (1L, "a b c d e"),   // spans: "a b c","b c d","c d e"
      (2L, "z z a b c"),   // shares exactly "a b c" with doc 1
      (3L, "p q"),         // < n tokens: no spans at all
      (4L, "m n o p"),     // exact dup of doc 5: both spans boilerplate
      (5L, "m n o p"))
    val out = Dedup.boilerplateSpans(df, n = 3, minDocs = 2).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3, 1L, 1.0 / 3)))
    assert(out(2L) == ((3, 1L, 1.0 / 3)))
    assert(out(3L) == ((0, 0L, 0.0)))
    assert(out(4L) == ((2, 2L, 1.0)))
    assert(out(5L) == ((2, 2L, 1.0)))
  }

  test("boilerplateSpans counts DISTINCT spans: an in-doc repeat is one span") {
    // "a b a b a b": distinct 2-gram spans are "a b" and "b a" — both
    // appear once in the df count even though they repeat inside the doc,
    // so a single doc never makes its own spans boilerplate
    val df = docs((1L, "a b a b a b"), (2L, "x y"))
    val out = Dedup.boilerplateSpans(df, n = 2, minDocs = 2).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(out(1L) == ((2, 0L)))
    assert(out(2L) == ((1, 0L)))
  }

  test("q71 curated corpus == intersection of its three ingredient filters") {
    val d = spark.read.parquet(s"${sf()}/documents.parquet").cache()
    val curated = graft.SparkEntry.queries("q71_curated_corpus")(
      spark, sf()).collect().map(_.getLong(0)).toSet
    val quality = TextAnalysis.qualityFilter(d).filter(col("keep"))
      .collect().map(_.getLong(0)).toSet
    val lowBoiler = Dedup.boilerplateSpans(d)
      .filter(col("boiler_ratio") < 0.5).collect().map(_.getLong(0)).toSet
    val reps = Dedup.exact(d.select(col("doc_id"), md5(col("text")).as("s")),
      Seq("s"), "doc_id").collect().map(_.getLong(0)).toSet
    assert(curated == quality.intersect(lowBoiler).intersect(reps))
    assert(curated.nonEmpty && curated.size < d.count(),
      "curation must keep some docs and drop some docs")
  }
}
