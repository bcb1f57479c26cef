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

  test("HLL relative error stays under the pinned per-p ceiling (p = 4, 5, 6)") {
    // The guarantee tests above pin set semantics; this pins ACCURACY with
    // measured numeric ceilings. Inputs are seeded, so every error below is
    // a constant — the ceilings sit just above the measured values and well
    // under 3 sigma of the theoretical 1.04/sqrt(m) standard error (raw
    // regime: n >> 2.5m for every p here).
    val spark0 = spark
    import spark0.implicits._
    // measured maxima on the pinned seeds: p=4 0.2483, p=5 0.2121, p=6 0.1184
    val ceiling = Map(4 -> 0.27, 5 -> 0.23, 6 -> 0.13)
    for (p <- 4 to 6) {
      val errs = samples(Gen.listOfN(2500, wordGen), 4).map { values =>
        val exact = values.distinct.size
        val est = Sketches.approxDistinct(values.toDF("v"), Nil, "v", p)
          .collect().head.getAs[Double]("hll_estimate")
        math.abs(est - exact) / exact
      }
      info(f"p=$p: max relative error = ${errs.max}%.4f over ${errs.size} sets")
      assert(errs.max <= ceiling(p),
        f"p=$p HLL error ${errs.max}%.4f exceeds ceiling ${ceiling(p)}")
    }
  }

  test("CMS overestimate stays under the epsilon * N guarantee bound") {
    // Standard CMS guarantee: est <= true + ceil(e/width * N) with
    // probability 1 - e^-depth per query. The seeded fixture is
    // deterministic, so the bound either holds or it doesn't — pinned.
    val spark0 = spark
    import spark0.implicits._
    samples(Gen.listOfN(300, wordGen), 6).foreach { values =>
      val width = 256
      val df = values.toDF("v")
      val grid = Sketches.cmsArray(df, "v", width = width, depth = 4)
      val exact = values.groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
      val bound = math.ceil(math.E / width * values.size).toLong
      val est = df.distinct()
        .select(col("v"), Sketches.cmsEstimate(col("v"), grid, width, 4).as("e"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (v, n) =>
        assert(est(v) - n <= bound, s"$v overestimated by ${est(v) - n} > $bound")
      }
    }
  }

  test("histogram quantile estimate lies inside the bucket straddling the exact value") {
    // Tighter than the range test below: the estimate interpolates within
    // the power-of-two bucket that CONTAINS the t-th order statistic, so it
    // must land in (2^(b-1), 2^b] where 2^(b-1) = highestOneBit(exact).
    val spark0 = spark
    import spark0.implicits._
    samples(Gen.nonEmptyListOf(Gen.chooseNum(1L, 100000L)), 8).foreach { vals =>
      val est = Sketches.histogramQuantiles(vals.toDF("v"), Nil, "v", Seq(50, 90))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val sorted = vals.sorted
      est.foreach { case (pct, e) =>
        val t = math.max(vals.size.toLong * pct / 100, 1L).toInt
        val lo = java.lang.Long.highestOneBit(sorted(t - 1))
        assert(e >= lo && e <= 2.0 * lo,
          s"pct=$pct estimate $e outside straddling bucket ($lo, ${2 * lo}]")
      }
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
