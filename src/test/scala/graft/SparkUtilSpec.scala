package graft

import org.apache.spark.sql.functions._

/** [[SparkUtil.cheapRowCountUpperBound]] — the round-12 guard
  * short-circuit. The contract under test: the bound is a SOUND upper
  * bound (exact for plain parquet scans, conservative through
  * row-nonincreasing operators) and UNKNOWN (None) for any plan that can
  * grow rows — because a guard that short-circuits on an under-count
  * would silently disarm an at-scale refusal. */
class SparkUtilSpec extends SparkSpec {

  test("cheapRowCountUpperBound: exact for a plain parquet scan, stable " +
      "through project/filter/limit/distinct, without running a job") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val exact = docs.count()
    assert(SparkUtil.cheapRowCountUpperBound(docs).contains(exact))
    // row-nonincreasing wrappers keep the scan's (upper-bound) count
    assert(SparkUtil.cheapRowCountUpperBound(
      docs.select("doc_id").filter(col("doc_id") > 100)).contains(exact))
    assert(SparkUtil.cheapRowCountUpperBound(
      docs.repartition(8).orderBy("doc_id")).contains(exact))
    assert(SparkUtil.cheapCountAtMost(docs, exact))
    assert(!SparkUtil.cheapCountAtMost(docs, exact - 1))
  }

  test("cheapRowCountUpperBound: a literal limit CAPS the bound at " +
      "min(limit, child) — a tiny limit over a huge scan must not force " +
      "the exact-count fallback (ADVICE r13)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val exact = docs.count()
    assert(exact > 5)
    // limit below the scan count: the limit wins
    assert(SparkUtil.cheapRowCountUpperBound(docs.limit(5)).contains(5L))
    assert(SparkUtil.cheapRowCountUpperBound(docs.limit(5).distinct()).contains(5L))
    assert(SparkUtil.cheapCountAtMost(docs.limit(5), 5L))
    // limit above the scan count: the child's bound wins
    assert(SparkUtil.cheapRowCountUpperBound(
      docs.limit(Int.MaxValue)).contains(exact))
    // a limit whose CHILD is unbounded (join) is still bounded by the limit
    val joined = docs.as("a").join(docs.as("b"), col("a.lang") === col("b.lang"))
    assert(SparkUtil.cheapRowCountUpperBound(joined.limit(7)).contains(7L))
  }

  test("cheapRowCountUpperBound: a BARE LocalLimit caps rows per " +
      "PARTITION, not globally — its literal must not bound the total " +
      "(ADVICE r14); only the GlobalLimit pairing makes it a row cap") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit}
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val exact = docs.count()
    assert(exact > 5)
    val child = docs.queryExecution.analyzed
    // bare LocalLimit(5): on a 32-partition scan the real row count can
    // be up to 5 * partitions — the walk must fall through to the child
    assert(SparkUtil.cheapRowCountUpperBoundPlan(
      LocalLimit(Literal(5), child), spark).contains(exact))
    // the analyzer's GlobalLimit(LocalLimit(child)) pairing still caps
    assert(SparkUtil.cheapRowCountUpperBoundPlan(
      GlobalLimit(Literal(5), LocalLimit(Literal(5), child)),
      spark).contains(5L))
  }

  test("cheapRowCountUpperBound: None for row-growing plans (join, " +
      "explode, union, aggregate keyed differently)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    assert(SparkUtil.cheapRowCountUpperBound(
      docs.as("a").join(docs.as("b"), col("a.lang") === col("b.lang"))).isEmpty)
    assert(SparkUtil.cheapRowCountUpperBound(
      docs.select(explode(split(col("text"), " ")))).isEmpty)
    assert(SparkUtil.cheapRowCountUpperBound(docs.union(docs)).isEmpty)
    // a guard must never short-circuit on "don't know"
    assert(!SparkUtil.cheapCountAtMost(docs.union(docs), Long.MaxValue))
  }

  test("cheapRowCountUpperBound: sample WITHOUT replacement keeps the " +
      "bound; WITH replacement (Poisson — can grow rows at ANY fraction) " +
      "returns None") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val exact = docs.count()
    assert(SparkUtil.cheapRowCountUpperBound(
      docs.sample(withReplacement = false, 0.5, seed = 7)).contains(exact))
    assert(SparkUtil.cheapRowCountUpperBound(
      docs.sample(withReplacement = true, 2.0, seed = 7)).isEmpty)
    // fraction <= 1 is NOT a safe with-replacement shape: PoissonSampler
    // draws a per-row replication count, so the output can exceed the
    // child even at small fractions
    assert(SparkUtil.cheapRowCountUpperBound(
      docs.sample(withReplacement = true, 0.5, seed = 7)).isEmpty)
    // ...and therefore a guard can never short-circuit through it
    assert(!SparkUtil.cheapCountAtMost(
      docs.sample(withReplacement = true, 2.0, seed = 7), Long.MaxValue))
  }

  test("cheapRowCountUpperBound: LocalRelation rows are counted " +
      "driver-side (spec fixtures hit the same short-circuit)") {
    val spark0 = spark
    import spark0.implicits._
    val local = (1L to 37L).map(i => (i, s"v$i")).toDF("id", "v")
    assert(SparkUtil.cheapRowCountUpperBound(local).contains(37L))
    assert(SparkUtil.cheapRowCountUpperBound(
      local.filter(col("id") > 30)).contains(37L))
  }

  test("cheapAbsMaxUpperBound: footer max|x| is a sound upper bound for " +
      "plain numeric parquet scans, survives rename/filter, and refuses " +
      "computed projections and string columns (r16 guard short-circuit)") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val exact = li.agg(
      max(abs(col("l_extendedprice"))), max(abs(col("l_quantity")))).head()
    val Some(Seq(bPrice, bQty)) =
      SparkUtil.cheapAbsMaxUpperBound(li, Seq("l_extendedprice", "l_quantity"))
    // sound: bound >= true max|x| (footer stats are exact here, so equal)
    assert(bPrice >= exact.getDouble(0) && bQty >= exact.getDouble(1))
    // a filter can only SHRINK the value set — the unfiltered bound holds
    assert(SparkUtil.cheapAbsMaxUpperBound(
      li.filter(col("l_quantity") > 49), Seq("l_extendedprice"))
      .exists(_.head >= exact.getDouble(0)))
    // a pure rename projection still resolves to the scan attribute
    assert(SparkUtil.cheapAbsMaxUpperBound(
      li.select(col("l_extendedprice").as("price")), Seq("price"))
      .contains(Seq(bPrice)))
    // a COMPUTED projection must refuse (the footer knows nothing of it)
    assert(SparkUtil.cheapAbsMaxUpperBound(
      li.select((col("l_extendedprice") * 2).as("price")), Seq("price")).isEmpty)
    // non-plain-numeric columns (BYTE_ARRAY) must refuse, not misread
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    assert(SparkUtil.cheapAbsMaxUpperBound(docs, Seq("text")).isEmpty)
    // joins can invent no bound either (walk stops at row-growing ops)
    assert(SparkUtil.cheapAbsMaxUpperBound(
      li.as("a").join(li.as("b"), Seq("l_orderkey")),
      Seq("l_extendedprice")).isEmpty)
  }

  test("globalCumSum: matches the single-task global window exactly — " +
      "including tie peers (RANGE frame) — and loses no rows to the " +
      "offset join under AQE-coalesced layouts") {
    import org.apache.spark.sql.expressions.Window
    val spark0 = spark
    import spark0.implicits._
    // 10k rows over 997 keys with ties (every key appears ~10 times)
    val df = spark.range(10000)
      .select((col("id") % 997).cast("long").as("v"), lit(1L).as("c"))
      .repartition(7)
    val viaHelper = SparkUtil.globalCumSum(df, "v", "c", "cs")
      .groupBy("v").agg(max(col("cs")).as("cs"), count(lit(1)).as("n"))
    val viaWindow = df
      .withColumn("cs", sum(col("c")).over(Window.orderBy(col("v"))))
      .groupBy("v").agg(max(col("cs")).as("cs"), count(lit(1)).as("n"))
    val a = viaHelper.orderBy("v").collect().toSeq
    val b = viaWindow.orderBy("v").collect().toSeq
    assert(a.map(_.getLong(2)).sum == 10000L, "row loss in the offset join")
    assert(a == b)
    SparkUtil.unpersistTrackedCaches()
  }

  test("groupedCumSum: matches the per-group ROWS window exactly and " +
      "loses no rows across group/partition boundaries") {
    import org.apache.spark.sql.expressions.Window
    val spark0 = spark
    import spark0.implicits._
    // 3 skewed groups over unique ids (the packSequences shape): group 0
    // holds ~80% of rows so it must span several range partitions
    val df = spark.range(20000)
      .select(col("id"),
        when(col("id") % 10 < 8, lit("g0"))
          .when(col("id") % 10 === 8, lit("g1"))
          .otherwise(lit("g2")).as("g"),
        (col("id") % 7 + 1).as("w"))
      .repartition(11)
    val w = Window.partitionBy(col("g")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val a = SparkUtil.groupedCumSum(df, "g", "id", "w", "cs")
      .orderBy("g", "id").collect().toSeq
    val b = df.withColumn("cs", sum(col("w")).over(w))
      .orderBy("g", "id").collect().toSeq
    assert(a.size == 20000, "row loss in the offset join")
    assert(a == b)
    SparkUtil.unpersistTrackedCaches()
  }

  test("cheapAbsMaxUpperBound: negative minima count toward |x| (a column " +
      "of large negatives must not look small to an overflow guard)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_absmax").toFile
    dir.deleteOnExit()
    val spark0 = spark
    import spark0.implicits._
    val path = s"${dir.getAbsolutePath}/neg.parquet"
    Seq(-9e8, -2e8, 3.0).toDF("x").repartition(1).write
      .mode("overwrite").parquet(path)
    val back = spark.read.parquet(path)
    assert(SparkUtil.cheapAbsMaxUpperBound(back, Seq("x"))
      .exists(_.head >= 9e8))
  }
}
