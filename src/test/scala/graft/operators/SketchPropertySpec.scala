package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/**
 * Property-based tests for the sketch family, seeded ScalaCheck per repo
 * convention: HLL set semantics (duplication/permutation invariance),
 * Bloom's no-false-negative guarantee, CMS's never-underestimate
 * guarantee, and histogram-quantile bucket bounds — each over random
 * inputs, not just the fixture corpus.
 */
class SketchPropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(10))

  test("HLL registers are a pure set function: duplication and order invariant") {
    val spark0 = spark
    import spark0.implicits._
    samples(Gen.nonEmptyListOf(wordGen), 8).foreach { values =>
      val base = values.distinct
      val noisy = new scala.util.Random(7).shuffle(base ++ base ++ base.take(2))
      def regs(vs: Seq[String]) =
        Sketches.hllRegisters(vs.toDF("v"), Nil, "v", p = 4)
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(regs(base) == regs(noisy))
    }
  }

  test("Bloom never yields a false negative on random value sets") {
    val spark0 = spark
    import spark0.implicits._
    samples(Gen.nonEmptyListOf(wordGen), 6).foreach { values =>
      val df = values.distinct.toDF("v")
      val words = Sketches.bloomArray(df, "v", mBits = 1 << 12, k = 5)
      val kept = df.filter(
        Sketches.bloomMightContain(col("v"), words, 1 << 12, k = 5)).count()
      assert(kept == values.distinct.size)
    }
  }

  test("CMS never underestimates on random multisets") {
    val spark0 = spark
    import spark0.implicits._
    samples(Gen.listOfN(60, wordGen), 6).foreach { values =>
      val df = values.toDF("v")
      val grid = Sketches.cmsArray(df, "v", width = 256, depth = 4)
      val exact = values.groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
      val est = df.distinct()
        .select(col("v"), Sketches.cmsEstimate(col("v"), grid, 256, 4).as("e"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (v, n) => assert(est(v) >= n, s"$v underestimated") }
    }
  }

  test("histogram quantile estimates stay inside the straddling power-of-two bucket") {
    val spark0 = spark
    import spark0.implicits._
    samples(Gen.nonEmptyListOf(Gen.chooseNum(1L, 100000L)), 8).foreach { vals =>
      val est = Sketches.histogramQuantiles(vals.toDF("v"), Nil, "v", Seq(50, 90))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      est.values.foreach { e =>
        // every estimate lies within the data's overall power-of-two range
        assert(e >= 1.0 && e <= 2.0 * vals.max, s"estimate $e out of range")
      }
      assert(est.keySet == Set(50, 90))
    }
  }
}
