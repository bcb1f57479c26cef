package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * The measured-occupancy guards' volume aggregates past the Long wrap
 * point (VERDICT r15 "what's wrong" #1): a LongType Σ m·(m−1) wraps
 * negative once a single bucket/cell holds ≳3×10⁹ rows, and with ANSI
 * off the wrap is silent — `last <= budget` would then ACCEPT a width
 * whose true candidate volume is catastrophically over budget, i.e.
 * the guard built to stop quadratic blowups fails OPEN exactly in the
 * 100 TB regime it exists for. These specs feed synthetic histograms
 * (the guards' own input shape — reachable only at ≳10⁹-row corpora,
 * so the unit seam is the histogram, not the data) past the wrap point
 * and assert the decimal(38,0) sums stay exact, then saturate at
 * Long.MaxValue instead of wrapping.
 */
class GuardVolumeSpec extends SparkSpec {

  // m = 4×10⁹: m·(m−1) ≈ 1.6×10¹⁹ > Long.MaxValue ≈ 9.2×10¹⁸ — one
  // bucket past the wrap point. Long math would give a NEGATIVE sum.
  private val M = 4000000000L
  private val TruePairs = (BigInt(M) * BigInt(M - 1) / 2).toLong

  test("pairVolumeFromHist: exact past the Long wrap of m·(m−1); " +
      "saturates at Long.MaxValue instead of going negative") {
    val spark0 = spark
    import spark0.implicits._
    // single wrapped bucket: true Σ m·(m−1) = 1.6e19, /2 still fits Long
    assert(TruePairs > 0 && BigInt(M) * BigInt(M - 1) > BigInt(Long.MaxValue))
    assert(SimilaritySearch.pairVolumeFromHist(Seq(M).toDF("m")) == TruePairs)
    // two wrapped buckets: Σ/2 = 1.6e19 exceeds Long — saturate, never wrap
    assert(SimilaritySearch.pairVolumeFromHist(Seq(M, M).toDF("m"))
      == Long.MaxValue)
    // small histograms stay exact (the pre-fix regime)
    assert(SimilaritySearch.pairVolumeFromHist(Seq(3L, 2L).toDF("m"))
      == 3L * 2 / 2 + 2L * 1 / 2)
    assert(SimilaritySearch.pairVolumeFromHist(
      Seq.empty[Long].toDF("m")) == 0L)
  }

  test("measuredWithinCellPairs (q268's sub-split sizer): a wrapped hot " +
      "cell reports its true volume so the ladder escalates/refuses " +
      "instead of accepting") {
    val spark0 = spark
    import spark0.implicits._
    // one cell whose clamp-width bits all mask to the same sub-bucket
    val hist = Seq((0L, 0L, M)).toDF("cell", "__b", "m")
    val got = SimilaritySearch.measuredWithinCellPairs(hist, subPlanes = 3)
    assert(got == TruePairs)
    // sub-bucket masking still splits what it can: two bits differing
    // in the low 3 planes land in different sub-buckets → zero pairs
    val split = Seq((0L, 0L, 1L), (0L, 1L, 1L)).toDF("cell", "__b", "m")
    assert(SimilaritySearch.measuredWithinCellPairs(split, subPlanes = 3) == 0L)
    // ...and merge above the mask width: same sub-bucket at subPlanes=0
    assert(SimilaritySearch.measuredWithinCellPairs(split, subPlanes = 0) == 1L)
  }

  test("crossVolumeFromHists (q266/q276 sizer): Σ m_new·m_old past the " +
      "Long wrap saturates instead of wrapping") {
    val spark0 = spark
    import spark0.implicits._
    val nh = Seq(("t0", M)).toDF("tb", "m")
    val oh = Seq(("t0", M)).toDF("tb", "m")
    // true volume 1.6e19 > Long.MaxValue
    assert(SimilaritySearch.crossVolumeFromHists(nh, oh) == Long.MaxValue)
    // disjoint buckets → no collisions
    val oh2 = Seq(("t1", M)).toDF("tb", "m")
    assert(SimilaritySearch.crossVolumeFromHists(nh, oh2) == 0L)
    // small exact case
    assert(SimilaritySearch.crossVolumeFromHists(
      Seq(("a", 3L), ("b", 5L)).toDF("tb", "m"),
      Seq(("a", 7L)).toDF("tb", "m")) == 21L)
  }

  test("cappedVolumesFromHist (q264's dense fallback): Σ m·min(m,c) " +
      "past the wrap saturates; small caps stay exact") {
    val spark0 = spark
    import spark0.implicits._
    val hist = Seq(M).toDF("m")
    val got = SimilaritySearch.cappedVolumesFromHist(hist,
      Seq(8000000000L, 1000L))
    // cap above m: m·m = 1.6e19 → saturate; cap 1000: 4e9·1000 = 4e12 exact
    assert(got == Seq(Long.MaxValue, 4000000000000L))
    assert(SimilaritySearch.cappedVolumesFromHist(
      Seq(10L, 2L).toDF("m"), Seq(4L)) == Seq(10L * 4 + 2L * 2))
  }

  test("satLongOfDecimal: null → 0, in-range exact, ≥ Long.MaxValue " +
      "saturates") {
    import java.math.BigDecimal
    assert(SimilaritySearch.satLongOfDecimal(null) == 0L)
    assert(SimilaritySearch.satLongOfDecimal(BigDecimal.valueOf(42L)) == 42L)
    assert(SimilaritySearch.satLongOfDecimal(
      BigDecimal.valueOf(Long.MaxValue)) == Long.MaxValue)
    assert(SimilaritySearch.satLongOfDecimal(
      new BigDecimal("99999999999999999999999999")) == Long.MaxValue)
  }
}
