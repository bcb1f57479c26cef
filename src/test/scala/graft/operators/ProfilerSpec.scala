package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("profile counts rows, nulls, distincts and casts min/max to string") {
    val df = spark.createDataFrame(
      Seq(Row(1L, "a"), Row(2L, null), Row(2L, "b"), Row(null, "a")).asJava,
      StructType(Seq(
        StructField("k", LongType, nullable = true),
        StructField("v", StringType, nullable = true))))
    val out = Profiler.profile(df, Seq("k", "v")).collect()
      .map(r => r.getString(0) -> r).toMap
    val k = out("k")
    assert(k.getLong(1) == 4L && k.getLong(2) == 1L && k.getLong(3) == 2L)
    assert(k.getString(4) == "1" && k.getString(5) == "2")
    val v = out("v")
    assert(v.getLong(2) == 1L && v.getLong(3) == 2L)
    assert(v.getString(4) == "a" && v.getString(5) == "b")
  }

  test("profile plans one single-column pruned scan per branch, no join, no Expand") {
    val d = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val plan = Profiler.profile(d, Seq("l_orderkey", "l_quantity"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected no join:\n$plan")
    // one branch per column, each scanning ONLY its column — and no
    // multi-distinct Expand (whose partial agg would key on the full
    // column tuple and blow up on high-cardinality columns)
    assert(!plan.contains("Expand"), s"expected no Expand:\n$plan")
    assert("FileScan".r.findAllIn(plan).size == 2, s"expected 2 scans:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint>"), s"$plan")
    assert(plan.contains("ReadSchema: struct<l_quantity:double>"), s"$plan")
  }

  test("corpusDiff classifies added/removed/changed/unchanged by content hash") {
    val mk = (rows: Seq[(Long, String)]) => {
      import spark.implicits._
      rows.toDF("doc_id", "text")
    }
    val oldSnap = mk(Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    val newSnap = mk(Seq(2L -> "b", 3L -> "c2", 4L -> "d"))
    val out = Profiler.corpusDiff(oldSnap, newSnap).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("corpusDiff text columns never survive past the scan-side projection") {
    val d = spark.read.parquet(s"${sf()}/documents.parquet")
    val plan = Profiler.corpusDiff(d, d.withColumn("text", concat(col("text"), lit("x"))))
      .queryExecution.executedPlan.toString
    // the join operates on (id, md5) projections only — one SortMergeJoin
    // or shuffled hash join on the id, no text column in the join schema
    assert(plan.contains("FullOuter"), s"expected full outer join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"expected equi-join:\n$plan")
  }

  test("corpusDiff partition law on the real corpus: statuses cover both id sets exactly") {
    import org.apache.spark.sql.functions.when
    val d = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val oldSnap = d.filter(graft.operators.Sampling.bucket(col("doc_id")) < 70)
    val newSnap = d.filter(graft.operators.Sampling.bucket(col("doc_id")) >= 30)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
    val diff = Profiler.corpusDiff(oldSnap, newSnap).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val oldIds = oldSnap.select("doc_id").collect().map(_.getLong(0)).toSet
    val newIds = newSnap.select("doc_id").collect().map(_.getLong(0)).toSet
    // the verdict table covers exactly old ∪ new; verdicts partition it
    assert(diff.keySet == (oldIds ++ newIds))
    diff.foreach { case (id, st) =>
      val expected =
        if (!newIds.contains(id)) "removed"
        else if (!oldIds.contains(id)) "added"
        else if (id % 7 == 0) "changed" else "unchanged"
      assert(st == expected, s"doc $id: $st != $expected")
    }
    assert(diff.values.toSet == Set("added", "removed", "changed", "unchanged"))
  }

  test("profileDiff reports deltas and min/max movement, null-safe") {
    val mk = (rows: Seq[(Option[Long], String)]) => {
      import spark.implicits._
      rows.map { case (k, v) => (k, v) }.toDF("k", "v")
    }
    val oldDf = mk(Seq(Some(1L) -> "a", Some(2L) -> "b", None -> "c"))
    val newDf = mk(Seq(Some(1L) -> "a", Some(5L) -> "a", Some(1L) -> "z"))
    val out = Profiler.profileDiff(oldDf, newDf, Seq("k", "v")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(5), r.getLong(6), r.getBoolean(7))))
      .toMap
    // k: 3 rows -> 3; distinct 2 -> 2 (delta 0); nulls 1 -> 0 (delta -1);
    // max moved 2 -> 5
    assert(out("k") == ((3L, 3L, 0L, -1L, true)))
    // v: distinct 3 -> 2 (delta -1); no nulls; min stays "a", max c -> z
    assert(out("v") == ((3L, 3L, -1L, 0L, true)))
  }

  test("histogram: clamped equi-width buckets, zero-filled, mass conserved") {
    import spark.implicits._
    val df = Seq(0.0, 1.0, 2.5, 9.9, 10.0).toDF("v")
    val out = Profiler.histogram(df, "v", nBuckets = 10).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(out.size == 10)
    // x = max lands in the LAST bucket (clamped), not a phantom 11th
    assert(out(9)._3 == 2L) // 9.9 and 10.0
    assert(out(0)._3 == 1L && out(1)._3 == 1L && out(2)._3 == 1L)
    assert(out.values.map(_._3).sum == 5L)
    assert(out(0)._1 == 0.0 && out(9)._2 == 10.0)
    // degenerate: constant column -> all mass in bucket 0
    val const = Profiler.histogram(Seq(7.0, 7.0).toDF("v"), "v", 10).collect()
      .map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(const(0) == 2L && const.values.sum == 2L)
  }

  test("keySkewReport surfaces the hot key with share and skew ratio") {
    import spark.implicits._
    // key "hot" 6x, keys a..d 1x each -> median 1, total 10
    val df = (Seq.fill(6)("hot") ++ Seq("a", "b", "c", "d")).toDF("k")
    val out = Profiler.keySkewReport(df, "k", topK = 3).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
    assert(out.head._1 == "hot")
    assert(out.head._2 == ((6L, 0.6, 6.0)))
    // remaining top rows tie at n=1 and cut by key order
    assert(out.map(_._1).toSeq == Seq("hot", "a", "b"))
  }

  test("refIntegrityAudit counts orphan rows and keys; intact FK reports zero") {
    import spark.implicits._
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(9L), None)
      .toDF("fk")
    val r = Profiler.refIntegrityAudit(child, parent, "fk", "pk", "c->p")
      .collect().head
    // 6 child rows; the two fk=9 rows orphan (1 distinct key); null fk
    // is not an orphan (unknown, not broken)
    assert(r.getString(0) == "c->p" && r.getLong(1) == 6L &&
      r.getLong(2) == 2L && r.getLong(3) == 1L)
    assert(math.abs(r.getDouble(4) - 2.0 / 6.0) < 1e-15)
    val ok = Profiler.refIntegrityAudit(
      Seq(1L, 2L).toDF("fk"), parent, "fk", "pk", "ok").collect().head
    assert(ok.getLong(2) == 0L && ok.getLong(3) == 0L && ok.getDouble(4) == 0.0)
  }

  test("joinSizeEstimate predicts the exact join cardinality and hot-key term") {
    import spark.implicits._
    val l = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")
    val r = Seq(1L, 1L, 2L, 4L).toDF("k")
    val est = Profiler.joinSizeEstimate(l, r, "k", "k", "l x r").collect().head
    // shared keys {1, 2}: 3*2 + 1*1 = 7 predicted rows, hot key term 6
    assert(est.getLong(1) == 2L)
    assert(est.getDecimal(2).longValueExact() == 7L)
    assert(est.getLong(3) == 6L)
    // the prediction IS the join size
    assert(l.join(r, "k").count() == 7L)
  }

  test("correlationMatrix: exact r for constructed correlations, tracks built-in corr") {
    import spark.implicits._
    // y = 2x (r = 1), z = -x (r = -1)
    val df = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0),
      (4.0, 8.0, -4.0)).toDF("x", "y", "z")
    val out = Profiler.correlationMatrix(df, Seq("x", "y", "z")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(out(("x", "y")) - 1.0) < 1e-12)
    assert(math.abs(out(("x", "z")) + 1.0) < 1e-12)
    assert(math.abs(out(("y", "z")) + 1.0) < 1e-12)
    // on real data the micro-scaled exact moments agree with Spark's
    // float-path corr to well past the float-drift scale
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val mine = Profiler.correlationMatrix(li,
      Seq("l_quantity", "l_extendedprice")).collect().head.getDouble(2)
    val ref = li.stat.corr("l_quantity", "l_extendedprice")
    assert(math.abs(mine - ref) < 1e-6, s"$mine vs $ref")
    // order-invariance: repartitioned input yields the bit-identical matrix
    val again = Profiler.correlationMatrix(li.repartition(17),
      Seq("l_quantity", "l_extendedprice")).collect().head.getDouble(2)
    assert(again == mine)
  }

  test("anonymityAudit flags classes under k with exact shares") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("b", 1), ("b", 2))
      .toDF("seg", "nat")
    val out = Profiler.anonymityAudit(df, Seq("seg", "nat"), k = 2).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(("a", 1)) == ((3L, 0.6, false)))
    assert(out(("b", 1)) == ((1L, 0.2, true)))
    assert(out(("b", 2)) == ((1L, 0.2, true)))
  }

  test("equidepthHistogram: NTILE remainder rule, hand-computed") {
    val spark0 = spark
    import spark0.implicits._
    // n=10, k=3: first bin takes the remainder row -> sizes 4,3,3
    val df = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = Profiler.equidepthHistogram(df, "v", nBins = 3).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out == Map(
      1 -> ((4L, 1.0, 4.0)), 2 -> ((3L, 5.0, 7.0)), 3 -> ((3L, 8.0, 10.0))))
  }

  test("equidepthHistogram: duplicate values split across bins by rank") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(1.0, 1.0, 1.0, 2.0, 2.0, 3.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = Profiler.equidepthHistogram(df, "v", nBins = 2).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    // ranks 1-3 are the three 1.0s; ranks 4-6 are 2.0, 2.0, 3.0
    assert(out == Map(1 -> ((3L, 1.0, 1.0)), 2 -> ((3L, 2.0, 3.0))))
  }

  test("equidepthHistogram equals Spark's own NTILE window on a real table") {
    import org.apache.spark.sql.expressions.Window
    val li = spark.read.parquet(s"${sf("sf0.001")}/lineitem.parquet")
    val ours = Profiler.equidepthHistogram(li, "l_extendedprice", nBins = 7)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val ref = li.filter(col("l_extendedprice").isNotNull)
      .select(col("l_extendedprice").as("v"))
      .withColumn("bin", ntile(7).over(Window.orderBy(col("v").asc)))
      .groupBy("bin").agg(count(lit(1)).as("n"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(ours == ref)
  }

  private def canonState(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.toString()).toSeq

  test("aggState merge: any partial-state split folds to the full rescan") {
    val li = graft.Tables.load(spark, sf("sf0.01"), "lineitem")
    val keys = Seq("l_returnflag", "l_linestatus")
    val full = Profiler.mergeAggStates(
      Profiler.aggState(li.where(lit(false)), keys, "l_quantity"),
      Profiler.aggState(li, keys, "l_quantity"), keys)
    // 3-way daily split folded as a left-deep tree
    val parts = (0 until 3).map(i =>
      Profiler.aggState(li.where(expr(s"l_orderkey % 3 = $i")), keys,
        "l_quantity"))
    val folded = parts.reduce(Profiler.mergeAggStates(_, _, keys))
    assert(canonState(folded) == canonState(full))
  }

  test("aggState: null values count rows but not value stats") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(("a", Some(3L)), ("a", None), ("b", None))
      .toDF("k", "v")
    val out = Profiler.mergeAggStates(
        Profiler.aggState(df, Seq("k"), "v"),
        Profiler.aggState(df.where(lit(false)), Seq("k"), "v"), Seq("k"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3)),
          Option(r.get(4))))).toMap
    assert(out("a") == ((2L, Some(3L), Some(3L), Some(3L))))
    assert(out("b") == ((1L, None, None, None)))
  }

  test("pivotCounts: declared columns exact, off-list values only in total") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(("s1", "en"), ("s1", "en"), ("s1", "de"), ("s1", "xx"),
      ("s2", "de")).toDF("source", "lang")
    val out = Profiler.pivotCounts(df, "source", "lang", Seq("en", "de"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out("s1") == ((2L, 1L, 4L))) // xx is in total, no column
    assert(out("s2") == ((0L, 1L, 1L)))
  }

  test("dqReport: one pass, null predicate counts as violation, exact rates") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(Some(5L), Some(60L), None, Some(10L)).toDF("q")
    val out = Profiler.dqReport(df,
        Seq("q_range" -> "q BETWEEN 1 AND 50", "q_notnull" -> "q IS NOT NULL"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // q_range: 60 fails, null fails (three-valued logic) -> 2 of 4
    assert(out("q_range") == ((2L, 4L, 0.5)))
    assert(out("q_notnull") == ((1L, 4L, 0.25)))
  }

  test("cascadeDeletePlan: zero-fills roots without descendants, exact counts") {
    val spark0 = spark
    import spark0.implicits._
    val roots = Seq(1L, 2L, 3L).toDF("rid")
    val children = Seq((10L, 1L), (11L, 1L), (12L, 2L), (99L, 7L))
      .toDF("cid", "fk") // 99 belongs to an unselected root
    val grand = Seq((10L, "x"), (10L, "y"), (12L, "z"), (99L, "w"))
      .toDF("gfk", "payload")
    val out = Profiler.cascadeDeletePlan(roots, "rid",
        children, "fk", "cid", grand, "gfk")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out == Map(1L -> ((2L, 2L)), 2L -> ((1L, 1L)), 3L -> ((0L, 0L))))
  }

  test("massMedian: half-mass pick on a heavy tail where the row median lies") {
    val spark0 = spark
    import spark0.implicits._
    // sizes 1,1,1,1,100: row median 1, but the mass median is 100
    // (the giant doc carries 100 of 104 total)
    val df = Seq((1L, "en", 1L), (2L, "en", 1L), (3L, "en", 1L),
      (4L, "en", 1L), (5L, "en", 100L)).toDF("doc_id", "lang", "n_chars")
    val out = Profiler.massMedian(df, "lang", "n_chars", "doc_id")
      .collect().head
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) ==
      ((5L, 104L, 100L)))
  }

  test("topValuesProfile: deterministic top-k value ranks per column") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(("x", 1), ("x", 2), ("y", 2), ("z", 2)).toDF("a", "b")
    val out = Profiler.topValuesProfile(df, Seq("a", "b"), k = 2).collect()
      .map(r => (r.getString(0), r.getLong(3)) -> ((r.getString(1),
        r.getLong(2)))).toMap
    assert(out(("a", 1L)) == (("x", 2L)))
    assert(out(("a", 2L)) == (("y", 1L))) // tie with z broken by value asc
    assert(out(("b", 1L)) == (("2", 3L)))
    assert(out(("b", 2L)) == (("1", 1L)))
  }

  test("featureParity: long-form per-group feature stats, exact means") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(("train", 10L, 2L), ("train", 20L, 4L), ("test", 30L, 6L))
      .toDF("split", "f1", "f2")
    val out = Profiler.featureParity(df, "split", Seq("f1", "f2")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out(("train", "f1")) == ((2L, 10L, 20L, 15.0)))
    assert(out(("test", "f2")) == ((1L, 6L, 6L, 6.0)))
  }

  test("stringLengthProfile: null/empty accounting and exact length stats") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(("abc", "x"), ("", "y"), (null, "zz"))
      .toDF("a", "b")
    val out = Profiler.stringLengthProfile(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))).toMap
    assert(out("a") == ((3L, 1L, 1L, 0L, 3L, 3L, 1.5)))
    assert(out("b") == ((3L, 0L, 0L, 1L, 2L, 4L, 4.0 / 3.0)))
  }

  test("benfordAudit: leading digits, per-mille shares, sub-1 values out of scope") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(1.5, 19.0, 199.99, 2.0, 0.5).toDF("v") // 0.5 excluded
    val out = Profiler.benfordAudit(df, "v").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // digit 1: n=3 of 4 -> 750 per-mille, expected 301, dev 449
    assert(out == Map(1 -> ((3L, 750L, 301L, 449L)),
      2 -> ((1L, 250L, 176L, 74L))))
  }

  test("candidateKeyAudit: single and composite combos, both verdicts") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("a", "b")
    val out = Profiler.candidateKeyAudit(df, Seq(Seq("a"), Seq("a", "b")))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(out == Map("a" -> ((3L, 2L, false)), "a,b" -> ((3L, 3L, true))))
  }

  test("functionalDependencyAudit: held and violated rules with exact fan-outs") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, "x", "p"), (1L, "x", "q"), (2L, "y", "p"))
      .toDF("k", "d1", "d2")
    val out = Profiler.functionalDependencyAudit(df,
        Seq("k" -> "d1", "k" -> "d2")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(out == Map("k->d1" -> ((2L, 0L, 1L, true)),
      "k->d2" -> ((2L, 1L, 2L, false))))
  }

  test("concentrationCurve: exact Lorenz checkpoints under the total order") {
    val spark0 = spark
    import spark0.implicits._
    // users with 4, 3, 2, 1 events (total 10)
    val events = Seq.tabulate(4)(i => (i + 1).toLong)
      .flatMap(u => Seq.fill(5 - u.toInt)(u)).toDF("user_id")
    val out = Profiler.concentrationCurve(events, "user_id",
        checkpoints = Seq(25, 50, 100)).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(3), r.getLong(5))))
      .toMap
    // top 25% of 4 users = rank 1 (user 1, 4 events) -> 400 per-mille
    assert(out == Map(25 -> ((1L, 4L, 400L)), 50 -> ((2L, 7L, 700L)),
      100 -> ((4L, 10L, 1000L))))
  }
}
