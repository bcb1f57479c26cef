package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.config.ValidationException

/** Tests for the source/sink contract layer: CDAP-schema-validated reads,
  * partitioned writes with pruning, bucketed tables, and the salted join. */
class IOSpec extends SparkSpec {

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("read with a CDAP schema contract: csv takes the schema, projection ordered") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp("graft_csv")
    Seq((1, "a"), (2, "b")).toDF("id", "name").write.mode("overwrite")
      .option("header", "true").csv(dir)
    val cdap =
      """{"type":"record","name":"t","fields":[
        |{"name":"id","type":"int"},{"name":"name","type":"string"}]}""".stripMargin
    val df = IO.read(spark, "csv", dir, Some(cdap), Map("header" -> "true"))
    assert(df.schema.fieldNames.toSeq == Seq("id", "name"))
    assert(df.count() == 2)
  }

  test("orc round-trips through the contract read like parquet (columnar path)") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp("graft_orc")
    Seq((1L, "a"), (2L, "b")).toDF("id", "name").write.mode("overwrite").orc(dir)
    val cdap =
      """{"type":"record","name":"t","fields":[
        |{"name":"id","type":"long"},{"name":"name","type":"string"}]}""".stripMargin
    val df = IO.read(spark, "orc", dir, Some(cdap))
    assert(df.schema.fieldNames.toSeq == Seq("id", "name"))
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // contract violation still accumulates on the columnar path
    val bad =
      """{"type":"record","name":"t","fields":[{"name":"missing","type":"int"}]}""".stripMargin
    intercept[graft.config.ValidationException](IO.read(spark, "orc", dir, Some(bad)))
  }

  test("contract violations accumulate: missing field AND incompatible type in one throw") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp("graft_pq")
    Seq((1, "a")).toDF("id", "name").write.mode("overwrite").parquet(dir)
    val cdap =
      """{"type":"record","name":"t","fields":[
        |{"name":"id","type":"string"},{"name":"missing","type":"int"}]}""".stripMargin
    val ex = intercept[ValidationException](IO.read(spark, "parquet", dir, Some(cdap)))
    assert(ex.failures.size == 2)
  }

  test("partitioned write prunes partitions on filtered read") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp("graft_part")
    val df = Seq((1, "en"), (2, "de"), (3, "en")).toDF("id", "lang")
    val back = IO.writePartitioned(df, dir, Seq("lang"))
    assert(back.count() == 3)
    val plan = spark.read.parquet(dir).filter(col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || !plan.contains("lang=de"))
    assert(spark.read.parquet(dir).filter(col("lang") === "en").count() == 2)
  }

  test("partitioned write spreads work: many tasks, <= filesPerPartition files per dir") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp("graft_part_par")
    // 2 directory partitions x 200 rows; request up to 3 files per dir
    val df = (1 to 400).map(i => (i.toLong, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    IO.writePartitioned(df, dir, Seq("lang"), filesPerPartition = 3)
    def parquets(p: String) = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val perDir = Seq("en", "de").map(l => parquets(s"$dir/lang=$l").length)
    // the salt must actually fan out (round-1 bug: ONE task wrote
    // everything) and must respect the per-directory cap
    assert(perDir.forall(n => n >= 2 && n <= 3), s"files per dir: $perDir")
    assert(spark.read.parquet(dir).count() == 400)
  }

  test("bucketed table join on bucket keys plans without a shuffle of the big side") {
    val spark0 = spark
    import spark0.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1 to 100).map(i => (i.toLong, s"a$i")).toDF("k", "va")
      val b = (1 to 100).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
      val ta = IO.writeBucketed(a, "graft_bucket_a", Seq("k"), 4, Seq("k"))
      val tb = IO.writeBucketed(b, "graft_bucket_b", Seq("k"), 4, Seq("k"))
      val joined = ta.join(tb, "k")
      val exchanges = joined.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange"))
      assert(exchanges == 0) // bucketing co-locates both sides
      assert(joined.count() == 100)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("shard write: exactly nShards files, lossless, stable membership across reruns") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val out1 = java.nio.file.Files.createTempDirectory("graft_shards1").toString
    val out2 = java.nio.file.Files.createTempDirectory("graft_shards2").toString
    val r1 = IO.writeShards(docs, out1, nShards = 4, idCol = "doc_id")
    assert(r1.count() == docs.count())
    def files(p: String) = new java.io.File(p).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files(out1).length == 4)
    // deterministic membership: rerun (different input partitioning) puts
    // every doc_id in the same shard file index
    IO.writeShards(docs.repartition(7), out2, nShards = 4, idCol = "doc_id")
    def membership(p: String) = files(p).zipWithIndex.flatMap { case (f, i) =>
      spark.read.parquet(f.getPath).select("doc_id").collect().map(_.getLong(0) -> i)
    }.toMap
    assert(membership(out1) == membership(out2))
  }

  test("token-balanced shards: exactly nShards files, token ratio <= 1.1, rerun-stable") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .withColumn("n_tok", size(split(col("text"), " ")))
    val out1 = java.nio.file.Files.createTempDirectory("graft_tokshards1").toString
    val out2 = java.nio.file.Files.createTempDirectory("graft_tokshards2").toString
    val r1 = IO.writeShardsByTokens(docs, out1, nShards = 8, tokenCol = "n_tok")
    assert(r1.count() == docs.count())
    def files(p: String) = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files(out1).length == 8)
    // the contract: per-FILE token mass is near-equal (row counts may not be)
    val masses = files(out1).map(f =>
      spark.read.parquet(f.getPath).agg(sum("n_tok")).collect().head.getLong(0))
    info(s"shard token masses: ${masses.mkString(", ")} " +
      f"(ratio ${masses.max.toDouble / masses.min}%.3f)")
    assert(masses.max.toDouble / masses.min <= 1.1,
      s"token imbalance ${masses.max}/${masses.min}")
    // content-addressed: a rerun from a different input layout yields the
    // same doc -> shard-file-index membership
    IO.writeShardsByTokens(docs.repartition(7), out2, nShards = 8, tokenCol = "n_tok")
    def membership(p: String) = files(p).zipWithIndex.flatMap { case (f, i) =>
      spark.read.parquet(f.getPath).select("doc_id").collect().map(_.getLong(0) -> i)
    }.toMap
    assert(membership(out1) == membership(out2))
    // null/negative token counts are dropped, not crashed on or mis-tiered
    val dirty = docs.unionByName(docs.limit(2)
      .withColumn("n_tok", lit(null).cast("int")))
    val out3 = java.nio.file.Files.createTempDirectory("graft_tokshards3").toString
    assert(IO.writeShardsByTokens(dirty, out3, nShards = 4, tokenCol = "n_tok")
      .count() == docs.count())
  }

  test("salted join == plain join on a skewed dataset (all four join types)") {
    val spark0 = spark
    import spark0.implicits._
    // key 7 is hot: 5000 rows; others sparse; null keys on both sides
    // (must never match, and must survive the outer variants null-padded)
    val left = (((1 to 5000).map(_ => 7L) ++ Seq(1L, 2L, 99L)).map(Option(_))
      ++ Seq(None)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val right = Seq((Option(7L), "hot"), (Some(1L), "one"), (Some(3L), "three"),
      (None, "nullkey")).toDF("rk", "v")
    for (jt <- Seq("inner", "left", "right", "full")) {
      val plain = left.join(right, left("k") === right("rk"), jt)
        .collect().map(_.toSeq).sortBy(_.toString)
      val salted = graft.SparkUtil.saltedJoin(left, right, "k", "rk", salt = 8, joinType = jt)
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(plain.toSeq == salted.toSeq, s"joinType=$jt diverged from plain join")
    }
  }

  test("shard manifest is invariant to row order and layout, sensitive to content") {
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet(s"${sf()}/documents.parquet")
    val h = graft.functions.TextFunctions.rollingHash(col("text"))
    def manifest(df: org.apache.spark.sql.DataFrame) =
      IO.shardManifest(df, nShards = 4, h).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
    val base = manifest(d)
    assert(base.size == 4)
    // reorder + repartition → identical manifest
    assert(manifest(d.orderBy(col("n_chars")).repartition(13)) == base)
    // a single corrupted row flips exactly its shard's checksum
    val corrupted = manifest(d.withColumn("text",
      when(col("doc_id") === 0, lit("corrupted payload")).otherwise(col("text"))))
    val changed = base.keySet.filter(k => base(k) != corrupted(k))
    assert(changed.size == 1)
  }

  test("readQuarantine routes malformed lines verbatim to bad, parses the rest") {
    val dir = tmp("graft_quarantine")
    val file = java.nio.file.Paths.get(dir, "part.json")
    java.nio.file.Files.write(file,
      """{"id": 1, "name": "ok"}
        |{"id": "NOT_A_NUMBER", "name": "bad-type"}
        |{{{ totally broken
        |{"id": 3, "name": "fine"}
        |""".stripMargin.getBytes("UTF-8"))
    val cdap =
      """{"type":"record","name":"t","fields":[
        |{"name":"id","type":"long"},{"name":"name","type":"string"}]}""".stripMargin
    val (good, bad) = IO.readQuarantine(spark, "json", dir, cdap)
    val g = good.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(g == Map(1L -> "ok", 3L -> "fine"))
    assert(good.schema.fieldNames.toSeq == Seq("id", "name"))
    val b = bad.collect().map(_.getString(0))
    assert(b.length == 2)
    // malformed lines survive byte-for-byte for replay after a fix
    assert(b.exists(_.contains("NOT_A_NUMBER")))
    assert(b.exists(_.contains("{{{ totally broken")))
    // conservation: every input line is in exactly one side
    assert(good.count() + bad.count() == 4)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("compactionPlan: fractional next-fit bins, overflow bounded by one file") {
    val spark0 = spark
    import spark0.implicits._
    import org.apache.spark.sql.functions._
    // sizes 60,70,30,90,10 at target 100: cumsum-before 0,60,130,160,250
    // -> bins 0,0,1,1,2
    val m = Seq((0L, 60L), (1L, 70L), (2L, 30L), (3L, 90L), (4L, 10L))
      .toDF("shard_id", "n_rows")
    val out = IO.compactionPlan(m, targetSize = 100).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    // property on the real manifest: each bin's load minus its last file
    // stays under target (next-fit's overflow bound), no bin skipped
    val d = spark.read.parquet(s"${sf()}/documents.parquet")
    val mf = IO.shardManifest(d, nShards = 8,
      graft.functions.TextFunctions.rollingHash(col("text")))
    val plan = IO.compactionPlan(mf, targetSize = 150).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val byBin = plan.groupBy(_._3)
    byBin.values.foreach { files =>
      val load = files.map(_._2).sum
      val last = files.maxBy(_._1)._2
      assert(load - last < 150, s"bin overflows beyond its last file: $files")
    }
    val bins = byBin.keySet
    assert(bins == (0L until bins.size).toSet, s"bins not contiguous: $bins")
  }
}
