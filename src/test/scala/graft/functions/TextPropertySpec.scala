package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/**
 * Property-based tests for the deterministic text primitives: hash range
 * bounds, SimHash permutation invariance, and Jaccard bounds. ScalaCheck
 * generators sampled with fixed seeds for reproducibility.
 */
class TextPropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(8))
  private val textGen = Gen.listOfN(12, wordGen).map(_.mkString(" "))

  test("rolling hash lands in [0, p) across random corpora") {
    val spark0 = spark
    import spark0.implicits._
    val texts = samples(textGen, 50)
    val out = texts.toDF("text")
      .select(TextFunctions.rollingHash(col("text")).as("h"))
      .collect().map(_.getLong(0))
    assert(out.length == texts.length)
    assert(out.forall(h => h >= 0 && h < TextFunctions.HashPrime))
  }

  test("simhash is invariant under token permutation (bag-of-tokens function)") {
    val spark0 = spark
    import spark0.implicits._
    samples(Gen.listOfN(10, wordGen), 10).foreach { words =>
      val shuffled = new scala.util.Random(42).shuffle(words)
      val hashes = Seq(words, shuffled).map(_.mkString(" ")).toDF("text")
        .select(TextFunctions.simhash(split(col("text"), " ")).as("s"))
        .collect().map(_.getLong(0))
      assert(hashes(0) == hashes(1))
    }
  }

  test("ngram Jaccard of any pair is within [0, 1]; identical text pairs score 1") {
    val spark0 = spark
    import spark0.implicits._
    samples(Gen.zip(textGen, textGen), 5).foreach { case (a, b) =>
      val df = Seq((1L, a), (2L, b), (3L, a)).toDF("doc_id", "text")
      val pairs = graft.operators.Dedup.ngramJaccardPairs(df, threshold = 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      pairs.values.foreach(j => assert(j >= 0.0 && j <= 1.0))
      if (a.split(" ").length >= 3) assert(pairs((1L, 3L)) == 1.0)
    }
  }
}
