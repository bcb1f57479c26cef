package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  test("mortonKey interleaves bits exactly (x even, y odd)") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((5L, 3L)).toDF("x", "y") // x=101b, y=011b
    val z = df.select(Layout.mortonKey(col("x"), col("y"), bits = 3))
      .collect()(0).getLong(0)
    // x bits 0,2 -> z bits 0,4; y bits 0,1 -> z bits 1,3
    assert(z == (1L | 2L | 8L | 16L), s"z=$z")
  }

  test("mortonKey round-trips against a reference Scala interleave") {
    val spark0 = spark
    import spark0.implicits._
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val rows = for (x <- 0L to 16L; y <- 0L to 16L) yield (x, y)
    val out = rows.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.mortonKey(col("x"), col("y"), bits = 5).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (x, y) =>
      assert(out((x, y)) == ref(x, y, 5), s"($x, $y)")
    }
  }

  test("zorderBuckets: bucket ranges nest inside the Morton key space") {
    val events = graft.Tables.loadEvents(spark, sf("sf0.01"))
    val out = Layout.zorderBuckets(events, bits = 8, bucketShift = 10)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    assert(out.map(_._2).sum == events.count())
    out.foreach { case (bucket, n, zMin, zMax, nKeys) =>
      assert(zMin >= 0L && zMax < (1L << 16))
      assert(zMin <= zMax)
      // every z in the bucket shares the top bits: z >> 10 == bucket
      assert((zMin >> 10) == bucket && (zMax >> 10) == bucket)
      assert(nKeys >= 1L && nKeys <= n)
    }
  }

  test("zorderBuckets agrees with a brute-force per-row computation") {
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:30:00")),
      (1L, Timestamp.valueOf("2024-01-01 05:30:00")),
      (258L, Timestamp.valueOf("2024-01-01 00:45:00")), // 258 & 255 = 2
      (513L, Timestamp.valueOf("2024-01-02 00:00:00"))) // 513 & 255 = 1
    val df = rows.toDF("user_id", "ts")
    def ref(u: Long, t: Timestamp): Long = {
      val x = u & 255L
      val y = (t.getTime / 1000 / 3600) & 255L
      (0 until 8).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    }
    val expected = rows.map { case (u, t) => ref(u, t) }
      .groupBy(_ >> 10)
      .map { case (b, zs) => b -> ((zs.size.toLong, zs.min, zs.max)) }
    val out = Layout.zorderBuckets(df, bits = 8, bucketShift = 10)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == expected)
  }

  test("zorderBuckets rejects out-of-range bucketShift") {
    val events = graft.Tables.loadEvents(spark, sf())
    intercept[IllegalArgumentException] {
      Layout.zorderBuckets(events, bits = 8, bucketShift = 16)
    }
  }

  test("zoneMapSkipReport: pruning is safe (unscanned shards hold zero matches)") {
    val li = graft.Tables.load(spark, sf("sf0.01"), "lineitem")
    val out = Layout.zoneMapSkipReport(li,
        expr("l_orderkey div 1024"), expr("unix_date(cast(l_shipdate as date))"),
        lit(9131), lit(9251)) // 1995-01-01 .. 1995-05-01 in epoch days
      .collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("n")).sum == li.count())
    out.foreach { r =>
      val (n, nMatch, scanned) = (r.getAs[Long]("n"),
        r.getAs[Long]("n_match"), r.getAs[Boolean]("scanned"))
      assert(nMatch <= n)
      // the zone-map contract: a shard the footer stats prune away can
      // never contain a matching row
      if (!scanned) assert(nMatch == 0L, s"pruned shard with $nMatch matches")
      assert(r.getAs[Int]("v_min") <= r.getAs[Int]("v_max"))
    }
  }

  test("clusteringDepth: sweep closes at zero, peak depth bounded by shard count") {
    val li = graft.Tables.load(spark, sf("sf0.01"), "lineitem")
    val shards = Layout.zoneMapSkipReport(li,
      expr("l_orderkey div 1024"), expr("unix_date(cast(l_shipdate as date))"),
      lit(Int.MinValue), lit(Int.MinValue))
    val nShards = shards.count()
    val prof = Layout.clusteringDepth(shards, col("v_min"), col("v_max"))
      .orderBy(col("pos")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(prof.nonEmpty)
    // depth after the final boundary (max+1 of the last interval) is 0:
    // every +1 has been matched by its -1
    assert(prof.last._2 == 0L, s"open intervals left: depth=${prof.last._2}")
    assert(prof.map(_._2).max <= nShards)
    assert(prof.forall(_._2 >= 0L))
  }

  test("balancedAssignment: totals conserved, keys dealt evenly, top keys separated") {
    val spark0 = spark
    import spark0.implicits._
    // one hot key (1000), a warm band, and a long tail
    val rows = Seq.fill(1000)(0L) ++
      (1 to 6).flatMap(k => Seq.fill(100 * k)(k.toLong)) ++
      (10L to 40L).flatMap(k => Seq.fill(3)(k))
    val df = rows.toDF("k")
    val p = 4
    val out = Layout.balancedAssignment(df, "k", p).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet == (0 until p).toSet)
    assert(out.values.map(_._1).sum == rows.size)
    val keyCount = rows.groupBy(identity).size
    assert(out.values.map(_._2).sum == keyCount)
    // keys dealt round-robin: per-partition key counts differ by <= 1
    assert(out.values.map(_._2).max - out.values.map(_._2).min <= 1)
    // the top-p keys land on distinct partitions: each partition's
    // heaviest key is exactly the (part+1)-th ranked key
    val ranked = rows.groupBy(identity).toSeq
      .map { case (k, g) => (k, g.size.toLong) }
      .sortBy { case (k, n) => (-n, k) }
    (0 until p).foreach { part =>
      assert(out(part)._3 == ranked(part)._2, s"partition $part")
    }
  }

  test("clusteringDepth matches a brute-force stab count on hand intervals") {
    val spark0 = spark
    import spark0.implicits._
    val iv = Seq((0L, 9L), (5L, 14L), (20L, 24L), (5L, 9L))
    val df = iv.toDF("lo", "hi")
    val prof = Layout.clusteringDepth(df, col("lo"), col("hi"))
      .orderBy(col("pos")).collect().map(r => (r.getLong(0), r.getLong(1)))
    // depth holding at each boundary must equal the brute-force count of
    // intervals covering that position
    prof.foreach { case (pos, depth) =>
      val stab = iv.count { case (l, h) => l <= pos && pos <= h }
      assert(depth == stab, s"pos=$pos depth=$depth stab=$stab")
    }
    // boundaries are exactly the distinct lo / hi+1 positions
    assert(prof.map(_._1).toSet == iv.flatMap(p => Seq(p._1, p._2 + 1)).toSet)
  }
}
