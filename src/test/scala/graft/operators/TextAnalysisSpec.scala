package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.functions.TextFunctions

/**
 * Tests for text-analysis operators on hand-built fixtures with known
 * counts (SURVEY.md §2.3 Tier B Q12: stats, quality, language-ID,
 * fingerprints).
 */
class TextAnalysisSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private def docs(rows: (Long, String, String)*) =
    spark.createDataFrame(rows.map { case (i, l, t) => Row(i, l, t) }.asJava, schema)

  test("stats aggregates exact integer sums and derived averages") {
    val df = docs((1L, "en", "a b c"), (2L, "en", "d e"), (3L, "de", "f"))
    val out = TextAnalysis.stats(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val en = out("en")
    assert(en.getLong(1) == 2)        // n_docs
    assert(en.getLong(2) == 5 + 3)    // sum_chars: "a b c"=5, "d e"=3
    assert(en.getLong(3) == 3 + 2)    // sum_tokens
    assert(en.getDouble(4) == 4.0)    // avg_chars
    assert(en.getDouble(5) == 2.5)    // avg_tokens
  }

  test("quality computes token counts, TTR, stopword ratio, mean token length") {
    val df = docs((1L, "en", "the cat the cat"))
    val r = TextAnalysis.quality(df).collect().head
    assert(r.getInt(1) == 4)                    // n_tokens
    assert(r.getInt(2) == 2)                    // n_uniq_tokens
    assert(r.getInt(3) == 4)                    // n_bpe_tokens (4 alpha runs)
    assert(r.getDouble(4) == 0.5)               // ttr
    assert(r.getDouble(5) == 0.5)               // stop_ratio ("the" twice)
    assert(r.getDouble(6) == 3.0)               // mean token length
    assert(!r.getBoolean(7))                    // fails n_tokens >= 10 gate
  }

  test("langId votes by marker lists with deterministic tiebreak") {
    val df = docs(
      (1L, "?", "the cat and the dog"),          // en markers
      (2L, "?", "der hund und die katze ist"),   // de markers
      (3L, "?", "xyzzy plugh quux"))             // no markers → und
    val out = TextAnalysis.languageId(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en" && out(2L) == "de" && out(3L) == "und")
  }

  test("langId labels Han-script text zh via the character-class branch") {
    val df = docs(
      (1L, "?", "机器学习模型训练数据"),           // pure Han → zh, not und
      (2L, "?", "数据 data 处理 pipeline"),        // mixed: Han wins over en markers
      (3L, "?", "the quick brown fox of and to")) // no Han → marker vote (en)
    val out = TextAnalysis.languageId(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "zh" && out(2L) == "zh" && out(3L) == "en")
  }

  test("redact replaces emails then digit runs, counts match, clean text untouched") {
    val df = docs(
      (1L, "en", "mail bob.smith+x@corp.example.org and jo@ex.co today"),
      (2L, "en", "call 5551234567 or 12345678901 now"),
      (3L, "en", "digits 123456 stay short"), // 6 digits: below the run floor
      (4L, "en", "email inside num bob5551234567@ex.com kept whole"))
    val out = TextAnalysis.redact(df).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(out(1L) == ((2, 0, "mail <EMAIL> and <EMAIL> today")))
    assert(out(2L) == ((0, 2, "call <NUM> or <NUM> now")))
    assert(out(3L) == ((0, 0, "digits 123456 stay short")))
    // email-first ordering: the digits inside the address never leak as a run
    assert(out(4L) == ((1, 1, "email inside num <EMAIL> kept whole")))
  }

  test("q53 Han injection flips exactly the sampled slice to zh") {
    // the declared q53 query must actually exercise the zh branch: every
    // doc in the injected 20% slice votes zh, every other doc keeps its
    // q11 prediction (the suffix only touches sampled rows)
    val corpus = spark.read.parquet(s"${sf()}/documents.parquet")
    val q53 = graft.SparkEntry.queries("q53_langid_zh")(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val q11 = TextAnalysis.languageId(corpus)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sampled = corpus.select("doc_id").collect().map(_.getLong(0))
      .filter { id => ((id % 2147483648L) * 2654435761L % 4294967296L % 100) < 20 }
      .toSet
    assert(sampled.nonEmpty, "fixture slice is empty — q53 would be vacuous")
    q53.foreach { case (id, lang) =>
      if (sampled(id)) assert(lang == "zh", s"doc $id in the Han slice predicted $lang")
      else assert(lang == q11(id), s"doc $id outside the slice drifted from q11")
    }
  }

  test("vocabulary: frequency-ranked top-k with doc frequency, deterministic cut") {
    val df = docs(
      (1L, "en", "spark spark spark hash join"),
      (2L, "en", "spark hash scan"),
      (3L, "en", "zzz"))
    val out = TextAnalysis.vocabulary(df, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // spark: tf=4 in 2 docs; hash: tf=2 in 2 docs; then join < scan < zzz at tf=1
    assert(out.toSeq == Seq(("spark", 4L, 2L), ("hash", 2L, 2L), ("join", 1L, 1L)))
  }

  test("repetition: top-token share and duplicate-2-gram fraction") {
    val df = docs(
      (1L, "en", "spam spam spam spam ham"),   // top=4/5, 2grams: s-s x3 (dup), s-h
      (2L, "en", "all tokens here are unique"))
    val out = TextAnalysis.repetition(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) == 5 && r1.getLong(2) == 4)       // n_tokens, top_tok_count
    assert(r1.getDouble(3) == 4.0 / 5.0)                   // top_tok_ratio
    assert(r1.getLong(4) == 4 && r1.getLong(5) == 2)       // n_2grams, uniq ("spam spam","spam ham")
    assert(r1.getDouble(6) == 2.0 / 4.0)                   // dup_2gram_ratio
    assert(!r1.getBoolean(7))                              // repetitive -> fails gate
    val r2 = out(2L)
    assert(r2.getLong(2) == 1 && r2.getDouble(6) == 0.0)
    assert(r2.getBoolean(7))
  }

  test("fingerprints: md5 matches a known digest, rolling hash is order-sensitive") {
    val df = docs((1L, "en", "ab"), (2L, "en", "ba"))
    val out = TextAnalysis.fingerprint(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    // rolling hash "ab" = 97*31 + 98 = 3105; "ba" = 98*31 + 97 = 3135
    assert(out(1L).getLong(2) == 3105L)
    assert(out(2L).getLong(2) == 3135L)
    assert(out(1L).getString(1) == "187ef4436122d1cc2f40dc2b92f0eba0") // md5("ab")
  }

  test("percentiles interpolate linearly per group") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, "en", 10L), (2L, "en", 20L), (3L, "en", 30L), (4L, "en", 40L))
      .toDF("doc_id", "lang", "n_chars")
    val r = TextAnalysis.percentiles(df).collect().head
    assert(r.getDouble(1) == 25.0)                     // p50 of 10,20,30,40
    assert(math.abs(r.getDouble(2) - 37.0) < 1e-9)     // p90 = 30 + 0.7*10
  }

  test("topKPerGroup keeps exactly k rows per group with deterministic tie-break") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, "en", 5L), (2L, "en", 5L), (3L, "en", 9L), (4L, "de", 1L))
      .toDF("doc_id", "lang", "n_chars")
    val out = TextAnalysis.topKPerGroup(df, k = 2).collect()
      .map(r => (r.getString(1), r.getInt(3)) -> r.getLong(0)).toMap
    assert(out(("en", 1)) == 3L) // longest
    assert(out(("en", 2)) == 1L) // tie at 5 broken by doc_id asc
    assert(out(("de", 1)) == 4L)
  }

  test("rollupStats emits pair, per-dim subtotal, and grand-total rows") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, "en", "s1", "abc"), (2L, "en", "s2", "de"), (3L, "de", "s1", "f"))
      .toDF("doc_id", "lang", "source", "text")
    val rows = TextAnalysis.rollupStats(df).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows((Some("en"), Some("s1"))) == ((1L, 3L)))
    assert(rows((Some("en"), None)) == ((2L, 5L)))     // lang subtotal
    assert(rows((None, None)) == ((3L, 6L)))           // grand total
  }

  test("normalize lowercases, strips punctuation, collapses spaces, trims") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, "  Hello,   WORLD!! x1  ")).toDF("doc_id", "text")
    val r = TextAnalysis.normalize(df).collect().head
    assert(r.getString(1) == "hello world x1")
  }

  test("qualityBuckets: balanced per-group ntile, best rows in bucket 1") {
    val df = docs((1L, "en", "a"), (2L, "en", "a b"), (3L, "en", "a b c"),
      (4L, "en", "a b c d"), (5L, "fr", "x"), (6L, "fr", "x y"))
    val out = TextAnalysis.qualityBuckets(df, nBuckets = 2, rankCol = "doc_id")
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    // en ranked desc by doc_id: 4,3 -> bucket 1; 2,1 -> bucket 2
    assert(out(4L) == 1 && out(3L) == 1 && out(2L) == 2 && out(1L) == 2)
    assert(out(6L) == 1 && out(5L) == 2)
  }

  test("packSequences: contiguous layout, budget respected, straddling allowed") {
    // budget 5: doc1 (3 toks) [seq 0 off 0], doc2 (3 toks) [starts at 3 →
    // seq 0 off 3, straddles], doc3 (2 toks) [starts at 6 → seq 1 off 1]
    val df = docs((1L, "en", "a b c"), (2L, "en", "d e f"), (3L, "en", "g h"),
      (4L, "fr", "u v w x y z")) // other group restarts at offset 0
    val out = TextAnalysis.packSequences(df, budgetTokens = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == ((0L, 0L)))
    assert(out(2L) == ((0L, 3L)))
    assert(out(3L) == ((1L, 1L)))
    assert(out(4L) == ((0L, 0L)))
  }

  test("simhash of identical token multisets is identical; permutations too (order-free)") {
    import org.apache.spark.sql.functions._
    val df = docs((1L, "en", "x y z"), (2L, "en", "z y x"), (3L, "en", "p q r"))
    val out = df.select(TextFunctions.simhash(split(col("text"), " ")).as("s"))
      .collect().map(_.getLong(0))
    assert(out(0) == out(1)) // simhash is a bag-of-tokens function
  }

  test("qualityFilter: each rule fails exactly the doc built to fail it") {
    val df = docs(
      (1L, "en", "the big cat sat here"),      // passes all rules
      (2L, "en", "a b"),                       // fails minTokens AND minMeanTokLen
      (3L, "en", "the the the cat mat"),       // fails maxTopTokRatio (3/5)
      (4L, "en", "the cat likes lorem ipsum today yes"), // fails blacklist
      (5L, "en", "big cats run far away"))     // fails minStopwords
    val out = TextAnalysis.qualityFilter(df, minTokens = 3, maxTokens = 10,
      minMeanTokLen = 2.0, maxMeanTokLen = 5.0, maxTopTokRatio = 0.5,
      minStopwords = 1).collect()
      .map(r => r.getLong(0) -> r).toMap
    def rules(r: org.apache.spark.sql.Row) =
      (r.getBoolean(5), r.getBoolean(6), r.getBoolean(7), r.getBoolean(8), r.getBoolean(9))
    assert(rules(out(1L)) == ((true, true, true, true, true)) && out(1L).getBoolean(11))
    assert(rules(out(2L)) == ((false, false, true, true, true)) && out(2L).getInt(10) == 2)
    assert(rules(out(3L)) == ((true, true, false, true, true)) && !out(3L).getBoolean(11))
    assert(rules(out(4L)) == ((true, true, true, true, false)))
    assert(rules(out(5L)) == ((true, true, true, false, true)))
  }

  test("chunk: overlapping windows cover the doc, truncated tail, exact hashes") {
    import org.apache.spark.sql.functions._
    val text = (0 until 10).map(i => s"t$i").mkString(" ")
    val out = TextAnalysis.chunk(docs((1L, "en", text)), chunkTokens = 4,
      stride = 3).collect().sortBy(_.getLong(1))
    // starts 0,3,6,9: three full chunks + a 1-token tail
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(out.map(_.getInt(2)).toSeq == Seq(0, 3, 6, 9))
    assert(out.map(_.getInt(3)).toSeq == Seq(4, 4, 4, 1))
    val expected = Seq("t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9", "t9")
      .map(s => spark.range(1)
        .select(TextFunctions.rollingHash(lit(s))).head().getLong(0))
    assert(out.map(_.getLong(4)).toSeq == expected)
  }

  test("chunk: dense chunk ids, 48-token starts, lengths shrink only at the tail") {
    val df = spark.read.parquet(s"${sf()}/documents.parquet")
    val out = TextAnalysis.chunk(df, chunkTokens = 64, stride = 48)
    // layout invariants: ids dense from 0, start = id * stride, and
    // n_chunk_tokens = min(64, n - start) is non-increasing in the chunk
    // id (a full prefix, then a shrinking overlapped tail)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("chunk_id"))
    val bad = out
      .withColumn("prev_len", lag(col("n_chunk_tokens"), 1).over(w))
      .withColumn("prev_id", lag(col("chunk_id"), 1).over(w))
      .filter(
        col("chunk_start") =!= col("chunk_id") * 48 ||
        (col("prev_id").isNull && col("chunk_id") =!= 0) ||
        (col("prev_id").isNotNull && col("chunk_id") =!= col("prev_id") + 1) ||
        (col("prev_len").isNotNull && col("n_chunk_tokens") > col("prev_len")))
    assert(bad.isEmpty,
      "chunk ids must be dense, starts stride-aligned, lengths non-increasing")
  }

  test("featureHash: l1 equals token count, checksum replays the public arithmetic") {
    val out = TextAnalysis.featureHash(docs((1L, "en", "a a b")), d = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    val p = TextFunctions.HashPrime
    def dim(tok: String): Int = {
      val rh = tok.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + b) % p)
      ((rh * TextFunctions.Mix) % TextFunctions.TwoPow32 % 8).toInt
    }
    val pow31 = Seq.iterate(1L, 8)(x => x * 31 % p)
    val counts = Map(dim("a") -> 2L, dim("b") -> 1L) // a,b land on distinct dims of 8
    val checksum = counts.map { case (d0, c) => c * pow31(d0) % p }.sum % p
    val r = out(1L)
    assert(r.getLong(1) == counts.size)  // nnz
    assert(r.getLong(2) == 3L)           // l1 = token occurrences
    assert(r.getLong(3) == checksum)
  }

  test("keywords: integer TF-IDF ordering, corpus-common tokens lose, WindowGroupLimit cut") {
    val df = docs(
      (1L, "en", "apple apple banana the the the"), // tf: apple 2, banana 1, the 3
      (2L, "en", "the cherry"),
      (3L, "en", "the plum"))
    // df: apple 1, banana 1, the 3, cherry 1, plum 1
    val out = TextAnalysis.keywords(df, k = 2)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getInt(4)) -> r.getString(1)).toMap
    // doc 1: "the" wins rank 1 on tf=3; apple (tf 2) beats banana on tf
    assert(rows((1L, 1)) == "the" && rows((1L, 2)) == "apple")
    // doc 2: tf ties at 1 — cherry (df 1) beats the (df 3)
    assert(rows((2L, 1)) == "cherry" && rows((2L, 2)) == "the")
    assert(rows((3L, 1)) == "plum")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-doc keyword cut should plan as WindowGroupLimit:\n$plan")
  }

  test("robustScale: median/IQR per group, collapsed IQR scales to zero") {
    val schema2 = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("lang", StringType, nullable = false),
      StructField("n_chars", LongType, nullable = false)))
    val df = spark.createDataFrame(Seq(
      Row(1L, "en", 10L), Row(2L, "en", 20L), Row(3L, "en", 30L),
      Row(4L, "en", 40L), Row(5L, "en", 50L),
      Row(6L, "de", 7L), Row(7L, "de", 7L)).asJava, schema2)
    val out = TextAnalysis.robustScale(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // en: q1=20, med=30, q3=40 → IQR 20; 10 → -1.0, 30 → 0.0, 50 → 1.0
    assert(out(1L) == -1.0 && out(3L) == 0.0 && out(5L) == 1.0)
    // de: all equal → IQR 0 → scaled 0 by the guard
    assert(out(6L) == 0.0 && out(7L) == 0.0)
  }

  test("rareTokenScore: df threshold picks exactly the corpus-rare occurrences") {
    val df = docs((1L, "en", "x y z"), (2L, "en", "x y q"), (3L, "en", "x w w"))
    // doc frequencies: x=3, y=2, z=1, q=1, w=1
    val byDoc = TextAnalysis.rareTokenScore(df, rareMaxDf = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byDoc(1L) == ((3L, 1L))) // z
    assert(byDoc(2L) == ((3L, 1L))) // q
    assert(byDoc(3L) == ((3L, 2L))) // w twice — occurrences, not distinct tokens
    val byDoc2 = TextAnalysis.rareTokenScore(df, rareMaxDf = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byDoc2(1L) == 2L) // y joins the rare set at df <= 2
  }

  test("bigramLm: counts, context totals, top-k cut, and the min-count gate") {
    // context "the": the->cat x3, the->dog x2, the->ant x1 (ctx_n = 6);
    // every other context stays below the min-count gate
    val df = docs(
      (1L, "en", "the cat the cat the cat"),
      (2L, "en", "the dog the dog"),
      (3L, "en", "the ant a b"))
    val out = TextAnalysis.bigramLm(df, k = 2, minContextCount = 4).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(out.forall(_._1 == "the"))
    assert(out.toSet == Set(("the", "cat", 3L, 6L, 1), ("the", "dog", 2L, 6L, 2)))
  }

  test("bigramLm tie-break: equal pair counts rank by next token ascending") {
    val df = docs((1L, "en", "x a x b x a x b"))
    // x->a x2, x->b x2 (tie broken by token), ctx_n("x") = 4
    val out = TextAnalysis.bigramLm(df, k = 2, minContextCount = 4).collect()
      .map(r => (r.getString(1), r.getInt(4))).sortBy(_._2)
    assert(out.toSeq == Seq(("a", 1), ("b", 2)))
  }

  test("bigramNovelty: clones share all bigrams, unique docs none, short docs drop") {
    val df = docs(
      (1L, "en", "the quick brown fox"),
      (2L, "en", "the quick brown fox"),
      (3L, "en", "completely different words here"),
      (4L, "en", "solo"))
    val out = TextAnalysis.bigramNovelty(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 3L, 1.0)))
    assert(out(2L) == ((3L, 3L, 1.0)))
    assert(out(3L) == ((3L, 0L, 0.0)))
    assert(!out.contains(4L), "a 1-token doc has no bigrams and must drop out")
  }

  test("bigramNovelty counts DISTINCT bigrams: in-doc repetition is not shared phrasing") {
    // "a b a b a b": distinct bigrams {a b, b a}; no other doc has them
    val df = docs((1L, "en", "a b a b a b"), (2L, "en", "x y z"))
    val out = TextAnalysis.bigramNovelty(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((2L, 0L)))
  }

  test("language profiles: learned trigrams separate langs, classification is argmax") {
    // two "languages" with disjoint character content
    val df = docs(
      (1L, "aa", "abcabcabcabc"), (2L, "aa", "abcabc abcab"),
      (3L, "zz", "xyzxyzxyzxyz"), (4L, "zz", "xyzxy zxyzxy"))
    val prof = TextAnalysis.trainLangProfiles(df, m = 3)
    val rows = prof.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(rows.count(_._1 == "aa") == 3 && rows.count(_._1 == "zz") == 3)
    // profiles rank by (count desc, trigram asc) — a total order
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(r => (-r._3, r._2)).toSeq ==
        sorted.map(r => (-r._3, r._2)).sorted.toSeq)
    }
    val pred = TextAnalysis.classifyByProfile(df, prof).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred == Map(1L -> "aa", 2L -> "aa", 3L -> "zz", 4L -> "zz"))
    // a doc with no profile overlap drops out (no evidence, no verdict)
    val stranger = docs((9L, "aa", "qqq"))
    assert(TextAnalysis.classifyByProfile(stranger, prof).count() == 0)
  }

  test("q88 lang profiles recover the injected labels above the pinned floor") {
    // The raw fixture's lang labels carry no content signal (one shared
    // word pool), so q88 injects per-lang marker suffixes — this gate
    // pins that the TRAINED profiles actually recover those labels,
    // which a profile-ranking or scoring regression would break even
    // while the oracle (which replays the same regression) stays green.
    val pred = graft.SparkEntry.queries("q88_lang_profile")(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val truth = spark.read.parquet(s"${sf()}/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    val hits = truth.count { case (id, l) => pred.get(id).contains(l) }
    val acc = hits.toDouble / truth.size
    info(f"profile-classifier accuracy on the injected corpus = $acc%.3f")
    assert(acc >= 0.95, f"accuracy collapsed to $acc%.3f")
  }

  test("linearScore: hand-computed features, score, and threshold flag") {
    val df = docs(
      (1L, "en", "the cat is A1 99 Big deal"),  // n_tok=7 stop=2 digit=1 upper=2
      (2L, "en", "tiny"))                        // n_tok=1, everything else 0
    val out = TextAnalysis.linearScore(df,
      weights = Map("n_tok" -> 2L, "n_stop" -> 5L, "n_digit" -> -3L, "n_upper" -> -1L),
      threshold = 19L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))))
      .toMap
    // "A1" starts uppercase but is not all-digits; "99" is all-digits;
    // "Big" starts uppercase; stopword hits: the, is
    assert(out(1L) == ((7L, 2L, 1L, 2L, 2 * 7 + 5 * 2 - 3 * 1 - 1 * 2, true)))
    assert(out(2L) == ((1L, 0L, 0L, 0L, 2L, false)))
  }

  test("corpusDrift: identical halves score exactly zero, a shifted token dominates") {
    import org.apache.spark.sql.functions.{col, concat_ws, lit}
    val d = spark.read.parquet(s"${sf()}/documents.parquet")
    // identical sides: every expected count equals the observed count, so
    // every chi2 contribution is exactly 0.0 (rational arithmetic, no eps)
    val same = TextAnalysis.corpusDrift(d, d, k = 10).collect()
    assert(same.length == 10)
    same.foreach { r =>
      assert(r.getDouble(5) == 0.0, s"chi2 must be exactly 0: $r")
      assert(r.getDouble(3) == r.getDouble(4), "shares must match")
    }
    graft.SparkUtil.unpersistTrackedCaches()
    // inject a token burst into side B only: that token must rank top-1
    // by chi2 among the pooled top-k
    val burst = d.select(col("doc_id"),
      concat_ws(" ", col("text"),
        lit(Seq.fill(20)("graftburst").mkString(" "))).as("text"))
    val drift = TextAnalysis.corpusDrift(d, burst, k = 10).collect()
      .sortBy(-_.getDouble(5))
    assert(drift.head.getString(0) == "graftburst", s"got ${drift.head}")
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("rankBlend: percentile ranks per signal, arithmetic-mean blend, singleton 0") {
    import org.apache.spark.sql.functions.{col, length, size}
    // group "a": chars order 3,2,1 ; tokens order reversed -> every doc
    // blends to 0.5; group "b" is a singleton -> rank 0 everywhere
    val df = docs(
      (1L, "a", "aaaaaaaaa x"), (2L, "a", "aaaa x y z"), (3L, "a", "a w x y z q"),
      (4L, "b", "solo"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_tokens",
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long"))
    val out = TextAnalysis.rankBlend(df, Seq("n_chars", "n_tokens"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(4L) == ((0.0, 0.0, 0.0)))
    // chars rank: 1 (11ch) < 2 (10ch) < 3 (11? recount) — assert blend sym
    Seq(1L, 2L, 3L).foreach { id =>
      val (rc, rt, b) = out(id)
      assert(b == (rc + rt) / 2.0)
      assert(rc >= 0.0 && rc <= 1.0 && rt >= 0.0 && rt <= 1.0)
    }
    // the two signals disagree by construction: token-poorest doc is
    // char-richest, so SOME doc has different per-signal ranks
    assert(Seq(1L, 2L, 3L).exists(id => out(id)._1 != out(id)._2))
  }

  test("backoffCoverage: per-position backoff level counts, hand-computed") {
    val df = docs(
      (1L, "en", "a b c a b c"), // trigram positions: abc, bca, cab, abc
      (2L, "en", "a b c x"),     // positions: abc, bcx
      (3L, "en", "z z"))         // no trigram positions; feeds bi/uni counts
    val out = TextAnalysis.backoffCoverage(df, minCount = 2).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // corpus counts >= 2: trigram {abc:3}; bigrams {ab:3, bc:3}; unigrams
    // {a:3, b:3, c:3, z:2}. d1: abc->tri, bca->uni(a), cab->bi(ab),
    // abc->tri. d2: abc->tri, bcx->oov (cx bigram 1, x unigram 1).
    assert(out(1L) == ((4L, 2L, 1L, 1L, 0L)))
    assert(out(2L) == ((2L, 1L, 0L, 0L, 1L)))
    assert(!out.contains(3L)) // sub-3-token docs have no positions
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("phraseMatch: non-overlapping replace-count arithmetic, zero rows pruned") {
    val df = docs(
      (1L, "en", "x table table table y"), // one non-overlapping hit
      (2L, "en", "ab ab ab ab"),           // two "ab ab" hits
      (3L, "en", "nothing here"))
    val out = TextAnalysis.phraseMatch(df, Seq("table table", "ab ab"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (1L, "table table") -> 1L,
      (2L, "ab ab") -> 2L))
    intercept[IllegalArgumentException] {
      TextAnalysis.phraseMatch(df, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.phraseMatch(df, Seq("ok", ""))
    }
  }

  test("sourceSimilarityMatrix: identical mixes at 1.0, disjoint at absent, partial in between") {
    // s1 and s2 carry the same token mix; s3 is disjoint (no shared
    // token -> no candidate row); s4 half-overlaps s1/s2
    val df = docs(
      (1L, "s1", "a b c"), (2L, "s1", "a b"),
      (3L, "s2", "a b c"), (4L, "s2", "a b"),
      (5L, "s3", "x y z"),
      (6L, "s4", "a q"))
    val out = TextAnalysis.sourceSimilarityMatrix(df, groupCol = "lang")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(out(("s1", "s2")) - 1.0) < 1e-12)
    assert(!out.contains(("s1", "s3")) && !out.contains(("s2", "s3")) &&
      !out.contains(("s3", "s4")))
    // s1·s4 over tokens a(2·1): dot=2, |s1|²=2²+2²+1=9, |s4|²=2 → 2/(3·√2)
    assert(math.abs(out(("s1", "s4")) - 2.0 / (3.0 * math.sqrt(2.0))) < 1e-12)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("cooccurrencePairs: exact support/confidence/lift, repeats deduped") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (1L, "a b c"),
      (2L, "a a b"), // repeated token counts once per doc
      (3L, "a c d"),
      (4L, "b c a")).toDF("doc_id", "text")
    val out = TextAnalysis.cooccurrencePairs(docs, minSupport = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    // dfs: a=4 b=3 c=3 d=1; pairs >= 2: ab=3, ac=3, bc=2
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(out(("a", "b")) == ((3L, 4L, 3L, 3.0 / 4.0, 12.0 / 12.0)))
    assert(out(("a", "c")) == ((3L, 4L, 3L, 3.0 / 4.0, 12.0 / 12.0)))
    assert(out(("b", "c")) == ((2L, 3L, 3L, 2.0 / 3.0, 8.0 / 9.0)))
  }

  test("cooccurrencePairs: df prune is lossless (== unpruned brute force)") {
    val docs = graft.Tables.load(spark, sf("sf0.01"), "documents").limit(120)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").distinct.toSet)
    val minSup = 40
    val pairCounts = scala.collection.mutable.HashMap
      .empty[(String, String), Long]
    for ((_, ta) <- texts; x <- ta; y <- ta if x < y)
      pairCounts((x, y)) = pairCounts.getOrElse((x, y), 0L) + 1
    val want = pairCounts.filter(_._2 >= minSup).toMap
    val got = TextAnalysis.cooccurrencePairs(docs, minSupport = minSup)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == want)
  }

  test("ruleCofailureMatrix: 10 pairs, bounds hold, overlap within fails") {
    val d = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val rows = TextAnalysis.ruleCofailureMatrix(d).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (fa, fb, both) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(both <= math.min(fa, fb))
      if (fa + fb - both > 0)
        assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
    // at least one rule actually fails on the raw fixture
    assert(rows.map(_.getLong(2)).max > 0)
  }

  test("corpus summary ties to its component reports") {
    val d = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val r = graft.SparkEntry.queries("q250_corpus_summary")(
      spark, sf("sf0.01")).collect().head
    assert(r.getLong(0) == d.count())
    val keeps = TextAnalysis.qualityFilter(d)
      .filter(org.apache.spark.sql.functions.col("keep")).count()
    assert(r.getLong(6) == keeps)
    assert(r.getLong(4) >= 0 && r.getLong(5) >= 0)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("score calibration composition: mass conserved, both verdicts represented") {
    val d = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val rows = graft.SparkEntry.queries("q232_score_calibration")(
      spark, sf("sf0.01")).collect()
    assert(rows.map(_.getLong(1)).sum == d.count())
    rows.foreach { r =>
      val (n, keep, pm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(keep >= 0 && keep <= n && pm == keep * 1000 / n)
    }
    val keeps = rows.map(_.getLong(2)).sum
    assert(keeps > 0 && keeps < d.count(), "both verdict branches must fire")
  }

  test("zipfCheckpoints: exact rank-frequency rows under the total order") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq((1L, "a a a b b c"), (2L, "a a b")).toDF("doc_id", "text")
    val out = TextAnalysis.zipfCheckpoints(docs, ranks = Seq(1, 2)).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out == Map(1L -> (("a", 5L, 5L)), 2L -> (("b", 3L, 6L))))
  }

  test("markupDensity: tag counts, markup chars, per-mille share, verdicts") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (1L, "<div><p>hi there</p></div>"), // 4 tags, 18 markup chars of 26
      (2L, "plain words only"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.markupDensity(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    assert(out(1L) == ((4L, 18L, 26L, 692L, false)))
    assert(out(2L) == ((0L, 0L, 16L, 0L, true)))
    assert(out(3L) == ((0L, 0L, 0L, 0L, true))) // empty text: guarded div
  }

  test("bm25TopK: hand-computed integer score; stop-terms (df >= N/2) dropped") {
    val spark0 = spark
    import spark0.implicits._
    // N=8 docs, T=20 tokens. "rare": df=1 -> num=15, den=3, L=2,
    // 3<<2=12 <= 15 -> idf=2. "common": df=4 -> num=9=den -> DROPPED.
    // d1: dl=4, tf(rare)=1 -> tfn = (22*20*1*1e6) div (200+60+288)
    // = 440000000 div 548 = 802919; score = 2*802919 = 1605838.
    val docs = Seq(
      (1L, "rare common x1 x2"), (2L, "common y1 y2"), (3L, "common z1"),
      (4L, "common w1 w2 w3"), (5L, "a1 a2"), (6L, "b1"), (7L, "c1 c2"),
      (8L, "d1 d2")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, Seq("rare", "common"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // docs matching ONLY the dropped stop term emit no row at all
    assert(out.toSeq == Seq((1L, 1L, 1605838L)))
  }

  test("bm25TopK: higher tf ranks higher at equal dl; k cuts; ties break by id") {
    val spark0 = spark
    import spark0.implicits._
    // df=3 of N=16: num=27, den=7, L=2, 7<<2=28 > 27 -> idf = 1
    val docs = (Seq(
      (10L, "term term pad1 pad2"), (11L, "term pad3 pad4 pad5"),
      (12L, "term pad6 pad7 pad8")) ++ // same (tf, dl) as 11 -> score tie
      (13L to 25L).map(i => (i, s"pad${i}a pad${i}b pad${i}c pad${i}d")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, Seq("term"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.length == 2)
    assert(out(0)._1 == 10L)                    // tf=2 wins
    assert(out(1)._1 == 11L)                    // tie with 12 -> id asc
    assert(out(0)._2 > out(1)._2)
  }

  test("bm25Decontaminate: verdicts split exactly at the threshold") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (1L, "leak leak leak pad"), (2L, "leak pad pad pad"),
      (3L, "pad pad"), (4L, "x1"), (5L, "x2"), (6L, "x3"), (7L, "x4"),
      (8L, "x5")).toDF("doc_id", "text")
    val scores = TextAnalysis.bm25Decontaminate(docs, Seq("leak"),
        minScoreMicro = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scores.keySet == Set(1L, 2L)) // only matching docs emit rows
    assert(scores(1L) > scores(2L))
    val tau = scores(1L) // threshold exactly at the top score
    val verdicts = TextAnalysis.bm25Decontaminate(docs, Seq("leak"),
        minScoreMicro = tau).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(verdicts == Map(1L -> true, 2L -> false))
  }

  test("bm25TopKBatch: per-query results equal bm25TopK; nulls dropped; " +
      "all-stop-term query emits no rows") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (1L, "rare common x1 x2"), (2L, "rare rare y1"), (3L, "common z1"),
      (4L, "common w1 w2 w3"), (5L, "other a2"), (6L, "b1"), (7L, "c1 c2"),
      (8L, "d1 d2")).toDF("doc_id", "text")
    val qs = Seq(
      (java.lang.Long.valueOf(1L), "rare"),
      (java.lang.Long.valueOf(1L), "common"),
      (java.lang.Long.valueOf(2L), "other"),
      (java.lang.Long.valueOf(2L), "rare"),
      (java.lang.Long.valueOf(3L), "common"),
      (java.lang.Long.valueOf(3L), "z1"),       // df=1 term limited to doc 3
      (java.lang.Long.valueOf(4L), null),       // null term: dropped, q4 emits nothing
      (null.asInstanceOf[java.lang.Long], "rare") // null query id: dropped
    ).toDF("query_id", "term")
    val batch = TextAnalysis.bm25TopKBatch(docs, qs, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
      .groupBy(_._1)
    // Oracle per query: the single-query operator on the same corpus.
    def single(terms: Seq[String]) = TextAnalysis.bm25TopK(docs, terms, k = 5)
      .collect().zipWithIndex
      .map { case (r, i) => (r.getLong(0), r.getLong(1), r.getLong(2), i + 1) }
      .toSeq
    // batch == per-query single runs, including ranks — proving the
    // shared one-pass term stats (tf/df/idf computed once over the
    // union vocabulary) reproduce the isolated per-query statistics.
    for ((qid, terms) <- Seq(1L -> Seq("common", "rare"),
        2L -> Seq("other", "rare"), 3L -> Seq("common", "z1"))) {
      val got = batch.getOrElse(qid, Array.empty).toSeq.sortBy(_._5)
        .map(t => (t._2, t._3, t._4, t._5))
      assert(got == single(terms), s"query $qid")
    }
    assert(!batch.contains(4L)) // its only term row was null
  }

  test("bm25TopKBatch: all-null query table is rejected") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val qs = Seq((java.lang.Long.valueOf(1L), null.asInstanceOf[String]))
      .toDF("query_id", "term")
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25TopKBatch(docs, qs, k = 5)
    }
  }

  test("bm25LongSafe guard boundary; long and decimal paths produce " +
      "identical scores (q124/q216 structural-widening pattern)") {
    // Guard boundary: a laptop-scale corpus is long-safe; a corpus with
    // T·maxDl past ~2·10^11 is not (22e6 · T · maxDl ≥ 2^62).
    assert(TextAnalysis.bm25LongSafe(1000000L, 1000L))
    assert(!TextAnalysis.bm25LongSafe(400000000000L, 1000000L))
    assert(!TextAnalysis.bm25LongSafe(Long.MaxValue, Long.MaxValue))
    val spark0 = spark
    import spark0.implicits._
    // Magnitude-injected fixture: tf up to 64 on a doc of dl 70 pushes
    // the saturation numerator to ~10^11 — far into the long range but
    // exercising multi-word carries in the decimal path.
    val big = ("rare " * 64) + ("pad " * 5) + "end"
    val docs = (Seq((1L, big.trim), (2L, "rare common x"),
      (3L, "common y")) ++ (4L to 9L).map(i => (i, s"f$i g$i")))
      .toDF("doc_id", "text")
    def run(wide: Boolean) = TextAnalysis
      .bm25TermScoresWith(docs, Seq("rare", "common"), "doc_id", "text",
        wide = wide)
      .select("__id", "__term", "__idf", "__tfn")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq.sorted
    val longPath = run(wide = false)
    val decimalPath = run(wide = true)
    assert(longPath.nonEmpty && longPath == decimalPath)
  }

  test("sentenceStats: explode rollup with exact counts and means") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (1L, "en", "one two. three four five. six"), // 3 sentences: 2,3,1 tokens
      (2L, "en", "just one sentence")              // 1 sentence: 3 tokens
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.sentenceStats(docs).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "en" && r.getLong(1) == 2L && r.getLong(2) == 4L)
    assert(r.getLong(3) == 3L)            // longest sentence
    assert(r.getDouble(4) == 2.0)         // 4 sentences / 2 docs
    assert(r.getDouble(5) == 9.0 / 4.0)   // 9 tokens / 4 sentences
  }
}
