package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FuzzyMatchSpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("deleteKeys: exactly the ≤d-deletion neighborhood, distinct") {
    val spark0 = spark
    import spark0.implicits._
    val out = Seq("abc").toDF("s")
      .select(expr(FuzzyMatch.deleteKeys("s", 1)))
      .collect()(0).getSeq[String](0).toSet
    assert(out == Set("abc", "bc", "ac", "ab"))
    val out2 = Seq("abc").toDF("s")
      .select(expr(FuzzyMatch.deleteKeys("s", 2)))
      .collect()(0).getSeq[String](0).toSet
    assert(out2 == Set("abc", "bc", "ac", "ab", "a", "b", "c"))
  }

  test("pairs == all-pairs brute force (blocking is lossless), d=1 and d=2") {
    val spark0 = spark
    import spark0.implicits._
    // adversarial dictionary: substitutions, inserts, deletes, transposes,
    // length outliers, an empty-adjacent short string
    val names = Seq("red bolt", "old bolt", "old belt", "red bolts",
      "rd bolt", "blue gear", "blue gears", "bluegear", "x", "xy",
      "totally different", "red bolt")
    val df = names.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "name")
    for (d <- Seq(1, 2)) {
      val got = FuzzyMatch.pairs(df, "id", "name", d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        i <- names.indices; j <- names.indices if i < j
        dist = lev(names(i), names(j)) if dist <= d
      } yield (i.toLong, j.toLong, dist)).toSet
      assert(got == want, s"d=$d")
    }
  }

  test("resolveEntities: transitive chains cluster; isolated names self-label") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq("red bolt", "old bolt", "old belt", "zzz unrelated")
      .toDF("name")
    // chain: red bolt ~1~ old bolt (r->o, e->o? lev=2) — use d=2 chain
    val out = FuzzyMatch.resolveEntities(df, "name", maxDist = 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // lev(red bolt, old bolt)=2, lev(old bolt, old belt)=1,
    // lev(red bolt, old belt)=3 > 2 — joined only transitively
    assert(out("red bolt") == "old belt")
    assert(out("old bolt") == "old belt")
    assert(out("old belt") == "old belt")
    assert(out("zzz unrelated") == "zzz unrelated")
  }

  test("fuzzy pairs at-scale guard: refuses duplicate-heavy input past " +
      "the candidate budget; opt-in, passing budget, and the " +
      "dictionary-level face all construct") {
    val spark0 = spark
    import spark0.implicits._
    // 30 copies of one name: every copy shares every delete key ->
    // >= 30*29 ordered collisions on the identity key alone
    val dupes = (1L to 30L).map(i => (i, "acme corp")).toDF("id", "name")
    val e = intercept[IllegalArgumentException] {
      FuzzyMatch.pairs(dupes, "id", "name", maxDist = 1,
        candidateBudget = 500L)
    }
    assert(e.getMessage.contains("resolveEntities"))
    // opt-in emits the full (legitimate) pair set
    assert(FuzzyMatch.pairs(dupes, "id", "name", maxDist = 1,
      candidateBudget = 500L, allowLargeOutput = true)
      .count() == 30L * 29 / 2)
    // a budget that fits is silent
    FuzzyMatch.pairs(dupes, "id", "name", maxDist = 1,
      candidateBudget = 500000L)
    // the documented contract passes naturally: distinct values first
    val resolved = FuzzyMatch.resolveEntities(dupes, "name", maxDist = 1)
      .collect()
    assert(resolved.length == 1 && resolved.head.getString(1) == "acme corp")
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("fuzzy pairs guard short-circuit: tier-1 pessimistic-Lmax cheap " +
      "pass runs ZERO jobs at its exact boundary; one under, the narrow " +
      "agg (tier-2) still passes; refusal is never short-circuited") {
    val spark0 = spark
    import spark0.implicits._
    // 10 distinct strings, Lmax=8, maxDist=1: K(64)=65 pessimistic keys,
    // so tier-1's bound is n(n-1)*K(64) = 10*9*65 = 5850 exactly.
    val dict = Seq("red bolt", "old bolt", "old belt", "rd bolt",
      "bluegear", "gear", "belt", "bolt", "x", "xy")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "name")
    // at the boundary the LocalRelation count bound passes with NO jobs
    assert(countJobs {
      FuzzyMatch.pairs(dict, "id", "name", maxDist = 1,
        candidateBudget = 5850L)
    } == 0)
    // one under: tier-1 fails (90 > 5849/65), tier-2's narrow count+max
    // agg runs (>= 1 job) and passes with the TRUE Lmax (90*9 = 810)
    assert(countJobs {
      FuzzyMatch.pairs(dict, "id", "name", maxDist = 1,
        candidateBudget = 5849L)
    } >= 1)
    // the cheap bounds are sound-to-PASS only: a duplicate-heavy input
    // whose row count is equally cheaply known still reaches the exact
    // per-key aggregation and refuses
    val dupes = (1L to 30L).map(i => (i, "acme corp")).toDF("id", "name")
    val e = intercept[IllegalArgumentException] {
      FuzzyMatch.pairs(dupes, "id", "name", maxDist = 1,
        candidateBudget = 500L)
    }
    assert(e.getMessage.contains("resolveEntities"))
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("connected components over string ids converges exactly (ER path)") {
    val spark0 = spark
    import spark0.implicits._
    // a 5-chain needs several propagation rounds — exercises the
    // changed-row convergence probe, not just one-shot graphs
    val edges = Seq(("b", "a"), ("c", "b"), ("d", "c"), ("e", "d"))
      .toDF("x", "y")
    val out = ConnectedComponents(edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "e" -> "a"))
  }
}
