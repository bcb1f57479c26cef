package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.functions.TextFunctions

/**
 * Property-based tests for the round's text/sampling operators, seeded
 * ScalaCheck per repo convention: each operator is replayed brute-force
 * in plain Scala over random corpora (small shared vocab so spans,
 * rare tokens, and keyword ties actually occur) and must agree exactly.
 */
class TextPropertySpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val vocab = Vector("alpha", "bet", "gam", "delta", "eps", "zeta", "eta", "theta")
  private val docGen: Gen[Seq[String]] =
    Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
  private val corpusGen: Gen[Seq[Seq[String]]] =
    Gen.chooseNum(5, 15).flatMap(n => Gen.listOfN(n, docGen))

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private def toDf(corpus: Seq[Seq[String]]) =
    spark.createDataFrame(corpus.zipWithIndex.map { case (toks, i) =>
      Row(i.toLong, toks.mkString(" "))
    }.asJava, schema)

  /** Scala replay of TextFunctions.rollingHash (UTF-8 bytes, base 31 mod p). */
  private def rh(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % TextFunctions.HashPrime)

  test("featureHash replays exactly: l1, nnz, and checksum vs brute force") {
    val p = TextFunctions.HashPrime
    val d = 16
    val pow31 = Seq.iterate(1L, d)(x => x * 31 % p)
    samples(corpusGen, 5).foreach { corpus =>
      val out = TextAnalysis.featureHash(toDf(corpus), d = d).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      corpus.zipWithIndex.foreach { case (toks, i) =>
        val counts = toks.groupBy(t =>
            (rh(t) * TextFunctions.Mix % TextFunctions.TwoPow32 % d).toInt)
          .map { case (dim, ts) => dim -> ts.size.toLong }
        val checksum = counts.map { case (dim, c) => c % p * pow31(dim) % p }.sum % p
        assert(out(i.toLong) == ((counts.size.toLong, toks.size.toLong, checksum)),
          s"doc $i: ${out(i.toLong)} vs brute force")
      }
    }
  }

  test("rareTokenScore replays exactly vs brute-force document frequencies") {
    samples(corpusGen, 5).foreach { corpus =>
      val docFreq = corpus.flatMap(_.distinct).groupBy(identity).map { case (t, ts) => t -> ts.size }
      val rareMaxDf = 2
      val out = TextAnalysis.rareTokenScore(toDf(corpus), rareMaxDf = rareMaxDf)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      graft.SparkUtil.unpersistTrackedCaches()
      corpus.zipWithIndex.foreach { case (toks, i) =>
        val nRare = toks.count(t => docFreq(t) <= rareMaxDf).toLong
        assert(out(i.toLong) == ((toks.size.toLong, nRare)), s"doc $i mismatch")
      }
    }
  }

  test("keywords replays the (tf desc, df asc, token asc) cut exactly") {
    samples(corpusGen, 5).foreach { corpus =>
      val docFreq = corpus.flatMap(_.distinct).groupBy(identity).map { case (t, ts) => t -> ts.size }
      val k = 3
      val out = TextAnalysis.keywords(toDf(corpus), k = k).collect()
        .map(r => (r.getLong(0), r.getInt(4)) -> r.getString(1)).toMap
      graft.SparkUtil.unpersistTrackedCaches()
      corpus.zipWithIndex.foreach { case (toks, i) =>
        val expected = toks.groupBy(identity).map { case (t, ts) => (t, ts.size) }
          .toSeq.sortBy { case (t, tf) => (-tf, docFreq(t), t) }.take(k).map(_._1)
        expected.zipWithIndex.foreach { case (tok, r) =>
          assert(out((i.toLong, r + 1)) == tok,
            s"doc $i rank ${r + 1}: got ${out((i.toLong, r + 1))}, want $tok")
        }
      }
    }
  }

  test("boilerplateSpans replays exactly vs brute-force span sets") {
    val n = 3
    val minDocs = 2
    samples(corpusGen, 5).foreach { corpus =>
      def spans(toks: Seq[String]): Set[String] =
        if (toks.size < n) Set.empty
        else toks.sliding(n).map(_.mkString(" ")).toSet
      val spanDocs = corpus.flatMap(t => spans(t)).groupBy(identity)
        .map { case (s, ss) => s -> ss.size }
      val out = Dedup.boilerplateSpans(toDf(corpus), n = n, minDocs = minDocs)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
      graft.SparkUtil.unpersistTrackedCaches()
      corpus.zipWithIndex.foreach { case (toks, i) =>
        val sp = spans(toks)
        val boiler = sp.count(s => spanDocs(s) >= minDocs).toLong
        assert(out(i.toLong) == ((sp.size, boiler)), s"doc $i mismatch")
      }
    }
  }

  test("chunk covers every token exactly with the expected lengths") {
    val caseGen = for {
      n <- Gen.chooseNum(1, 120)
      chunk <- Gen.chooseNum(2, 20)
      stride <- Gen.chooseNum(1, chunk)
    } yield (n, chunk, stride)
    samples(caseGen, 10).foreach { case (n, chunk, stride) =>
      val toks = (0 until n).map(i => s"t$i")
      val df = spark.createDataFrame(
        Seq(Row(1L, toks.mkString(" "))).asJava, schema)
      val rows = TextAnalysis.chunk(df, chunkTokens = chunk, stride = stride)
        .collect().sortBy(_.getLong(1))
      val starts = 0 until n by stride
      assert(rows.map(_.getInt(2)).toSeq == starts, s"starts for n=$n s=$stride")
      rows.foreach { r =>
        assert(r.getInt(3) == math.min(chunk, n - r.getInt(2)))
      }
      // coverage: every token index falls in at least one chunk
      val covered = rows.flatMap(r => r.getInt(2) until (r.getInt(2) + r.getInt(3))).toSet
      assert(covered == (0 until n).toSet, s"coverage hole at n=$n c=$chunk s=$stride")
    }
  }

  test("tokenBudgetSample nests: membership is monotone in the budget") {
    val corpusWithLen = corpusGen.map(_.zipWithIndex.map { case (toks, i) =>
      (i.toLong, toks, (toks.mkString(" ").length).toLong)
    })
    val schema2 = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_chars", LongType, nullable = false),
      StructField("text", StringType, nullable = false)))
    samples(corpusWithLen, 5).foreach { corpus =>
      val df = spark.createDataFrame(corpus.map { case (i, toks, nc) =>
        Row(i, nc, toks.mkString(" "))
      }.asJava, schema2)
      val total = corpus.map(_._2.size.toLong).sum
      def kept(b: Long) = Sampling.tokenBudgetSample(df, budgetTokens = b)
        .collect().map(_.getLong(0)).toSet
      val budgets = Seq(0L, total / 4, total / 2, total)
      val chain = budgets.map(kept)
      chain.sliding(2).foreach { case Seq(small, large) =>
        assert(small.subsetOf(large), "smaller budget must nest inside larger")
      }
      assert(kept(0) == Set.empty[Long])
      assert(kept(total + 1) == corpus.map(_._1).toSet)
    }
  }

  test("pigeonhole blocks are lossless for any <=3-bit flip at every " +
      "depth and both widths (random-hash property)") {
    import org.apache.spark.sql.functions._
    // random base hashes + random flip masks of 0..3 bits within the
    // width; the blocking contract says the pair must share >= 1
    // (block_id, block_val) key at EVERY depth — the invariant the
    // whole SimHash/pHash candidate family stands on
    val rnd = new scala.util.Random(7)
    def cases(width: Int): Seq[(Long, Long)] = (0 until 300).map { _ =>
      val h = if (width == 64) rnd.nextLong()
        else rnd.nextLong() & 0xFFFFFFFFL
      val k = rnd.nextInt(4) // 0..3 flips
      val flipped = (0 until k).foldLeft(h)((v, _) =>
        v ^ (1L << rnd.nextInt(width)))
      (h, flipped)
    }
    val pairSchema = StructType(Seq(
      StructField("x", LongType, nullable = false),
      StructField("y", LongType, nullable = false)))
    for (width <- Seq(32, 64); depth <- 0 to 2) {
      val blocksOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        c => if (width == 64) TextFunctions.simhash64BlocksAt(c, depth)
             else TextFunctions.simhashBlocksAt(c, depth)
      val df = spark.createDataFrame(
        cases(width).map { case (a, b) => Row(a, b) }.asJava, pairSchema)
      val misses = df.select(
          arrays_overlap(blocksOf(col("x")), blocksOf(col("y"))).as("hit"),
          col("x"), col("y"))
        .filter(!col("hit")).collect()
      assert(misses.isEmpty,
        s"width=$width depth=$depth lost ${misses.length} pairs, e.g. ${misses.take(2).mkString}")
      // packing sanity: every block value must be non-negative (sign
      // bits masked, never %'d) even when the hash is a negative Long
      val neg = df.select(explode(blocksOf(col("x"))).as("b"))
        .filter(col("b.block_val") < 0).count()
      assert(neg == 0, s"width=$width depth=$depth emitted negative block values")
    }
  }
}
