package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.config.FailureCollector
import graft.operators.LookupTransform
import graft.schema.CdapSchema

/**
 * Source/sink surface. The reference delegates all I/O to host-platform
 * plugins (SURVEY.md §2.2: tests use MockSource/MockSink) whose contract
 * is "produce/consume structured records matching a declared CDAP schema".
 * In Spark the formats come free (`spark.read`/`write`); what this module
 * adds is the *contract*: schema-validated reads (error-accumulating, like
 * the reference's config validation) and layout-aware writes.
 *
 * Scale notes (100 TB posture):
 *   - `read` never infers schemas on big data when a contract is supplied —
 *     inference is a full extra scan for CSV/JSON.
 *   - `writePartitioned` encodes the two physical-layout levers that matter
 *     at scale: directory partitioning (partition pruning on read) and a
 *     target file-size repartition (avoids the many-small-files problem
 *     that kills object-store listings).
 *   - `writeBucketed` persists a co-location contract (`bucketBy` +
 *     `sortBy`) so later equi-joins/aggs on the bucket keys skip their
 *     shuffle entirely — the standard answer to repeated 100 TB joins.
 */
object IO {

  /** Read `format` data at `path`. With a CDAP-JSON schema contract the
    * schema is parsed (graft.schema translator, `Lookup.java:396` dialect)
    * and enforced; mismatches are reported accumulated, like reference
    * validation. */
  def read(spark: SparkSession, format: String, path: String,
      cdapSchemaJson: Option[String] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    val reader = spark.read.format(format).options(options)
    cdapSchemaJson match {
      case None => reader.load(path)
      case Some(json) =>
        val expected = CdapSchema.parse(json)
        val df = format match {
          // Text formats take the contract as the read schema (no inference
          // scan); columnar formats keep their embedded schema and are
          // checked against the contract.
          case "csv" | "json" => reader.schema(expected).load(path)
          case _ => reader.load(path)
        }
        assertCompatible(df.schema, expected)
        df.select(expected.fieldNames.toSeq.map(org.apache.spark.sql.functions.col): _*)
    }
  }

  /** Error-accumulating structural check: every contract field must exist
    * with a compatible (widening) type — same relation as lookup keys. */
  private def assertCompatible(actual: StructType, expected: StructType): Unit = {
    val collector = new FailureCollector
    val byName = actual.fields.map(f => f.name -> f).toMap
    expected.fields.foreach { ef =>
      byName.get(ef.name) match {
        case None =>
          collector.addFailure(s"Field '${ef.name}' declared in the schema contract is missing from the source.",
            property = "schema")
        case Some(af) if !LookupTransform.compatibleKeys(af.dataType, ef.dataType) =>
          collector.addFailure(
            s"Field '${ef.name}' has type ${af.dataType.simpleString} incompatible with declared ${ef.dataType.simpleString}.",
            property = "schema")
        case _ =>
      }
    }
    collector.getOrThrow()
  }

  /** Quarantine read for semi-structured text sources (csv/json): rows
    * that parse under the contract go to `good`, malformed lines land in
    * `bad` VERBATIM (one string column) for replay after a parser fix —
    * the standard ingestion posture at scale, where FAILFAST kills a
    * 100 TB job on one bad line and silent DROPMALFORMED loses data
    * unaccountably. Implemented with Spark's PERMISSIVE corrupt-record
    * channel: one read, the split is a narrow null-check on the capture
    * column (two passes over the same cached parse, not two parses).
    *
    * The contract schema must not itself contain the capture column; the
    * capture column is appended internally and stripped from `good`. */
  def readQuarantine(spark: SparkSession, format: String, path: String,
      cdapSchemaJson: String,
      options: Map[String, String] = Map.empty): (DataFrame, DataFrame) = {
    require(format == "csv" || format == "json",
      s"quarantine read is for text formats, got '$format'")
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{StringType, StructField}
    val corrupt = "__corrupt_record"
    val expected = CdapSchema.parse(cdapSchemaJson)
    require(!expected.fieldNames.contains(corrupt),
      s"schema contract must not declare '$corrupt'")
    val withCapture = StructType(expected.fields :+
      StructField(corrupt, StringType, nullable = true))
    val parsed = graft.SparkUtil.trackCache(
      spark.read.format(format)
        .options(options)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
        .schema(withCapture)
        .load(path))
    val good = parsed.filter(col(corrupt).isNull)
      .select(expected.fieldNames.toSeq.map(col): _*)
    val bad = parsed.filter(col(corrupt).isNotNull)
      .select(col(corrupt).as("raw_record"))
    (good, bad)
  }

  /** Directory-partitioned write with a file-count target per partition.
    * `overwrite` uses dynamic partition overwrite semantics so re-runs
    * replace only the partitions they produce.
    *
    * The shuffle key is `(partitionCols..., salt)` with
    * `salt = hash(dataCols) mod filesPerPartition` — so each directory
    * partition is written by up to `filesPerPartition` tasks (≤ that many
    * files per directory) while the job keeps one task per
    * (partition, salt) combination. Repartitioning by
    * `(filesPerPartition, partitionCols)` instead — the obvious spelling —
    * would make `filesPerPartition` partitions TOTAL, collapsing a
    * 100 TB write onto (by default) a single task. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      format: String = "parquet", mode: String = "overwrite",
      filesPerPartition: Int = 1): DataFrame = {
    import org.apache.spark.sql.functions.{col, hash, pmod, lit, spark_partition_id}
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val dataCols = df.columns.filterNot(partitionCols.contains)
    // Every column a partition column → zero-arg hash() would fail at
    // analysis; rows then carry no data beyond their directory, so any
    // spread preserves results — salt by input partition id instead.
    val salt =
      if (dataCols.isEmpty) pmod(spark_partition_id(), lit(filesPerPartition))
      else pmod(hash(dataCols.toSeq.map(col): _*), lit(filesPerPartition))
    // Explicit partition count: with a bare `repartition(exprs)` AQE is
    // free to coalesce the whole shuffle into one partition on small
    // inputs, silently re-creating the single-writer bottleneck this salt
    // exists to avoid.
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartition(n, partitionCols.map(col) :+ salt: _*)
      .write.format(format).mode(mode)
      .partitionBy(partitionCols: _*)
      .save(path)
    df.sparkSession.read.format(format).load(path)
  }

  /** Balanced training-shard write: exactly `nShards` output files with
    * near-equal row counts, rows assigned by a deterministic hash of
    * `idCol` (NOT round-robin, which depends on input partition order — a
    * rerun or a different source layout would scramble shard membership).
    * `repartition(n, expr)` hash-shuffles once; each shard is one task →
    * one file, so downstream loaders stream shards independently. */
  def writeShards(df: DataFrame, path: String, nShards: Int,
      idCol: String, format: String = "parquet",
      mode: String = "overwrite"): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.repartition(nShards, col(idCol))
      .write.format(format).mode(mode).save(path)
    df.sparkSession.read.format(format).load(path)
  }

  /** The partition-id function Spark's `repartition(n, expr)` applies to an
    * INT column — `pmod(murmur3(value, seed=42), n)` (Catalyst
    * `HashPartitioning.partitionIdExpression`) — replayed driver-side so
    * [[writeShardsByTokens]] can choose labels that land each shard in its
    * own partition. */
  private def partitionIdOfInt(label: Int, n: Int): Int = {
    val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(label, 42)
    ((h % n) + n) % n
  }

  /** Smallest non-negative INT labels l_0..l_{n-1} with
    * `partitionIdOfInt(l_i, n) == i` — a bijection from shard ids onto
    * shuffle partitions, so `repartition(n, label)` yields EXACTLY one
    * output partition (hence one file) per shard. */
  private def shardLabels(n: Int): Array[Int] = {
    val labels = new Array[Int](n)
    val found = new Array[Boolean](n)
    var remaining = n
    var candidate = 0
    while (remaining > 0) {
      val p = partitionIdOfInt(candidate, n)
      if (!found(p)) { found(p) = true; labels(p) = candidate; remaining -= 1 }
      candidate += 1
    }
    labels
  }

  /** Token-balanced training-shard write: exactly `nShards` files whose
    * TOKEN sums (not row counts — [[writeShards]]' contract) are
    * near-equal, so downstream data loaders doing one-file-per-worker see
    * balanced work. Training shards with equal row counts can be wildly
    * token-skewed when document lengths are heavy-tailed.
    *
    * Mechanics (all deterministic, rerun-stable, content-addressed):
    *   1. rows map to cells `(tier, bucket)` — the power-of-two tier of
    *      `tokenCol` (q72's tier machinery) × the Knuth id-bucket — at
    *      most 63·100 cells regardless of input size;
    *   2. per-cell token sums collect driver-side (the bounded codebook
    *      pattern) and LPT greedy packing assigns cells to shards,
    *      heaviest cell first onto the lightest shard (≤ 4/3·OPT
    *      makespan, near-perfect with many small cells);
    *   3. each shard id is mapped to a label whose murmur3 partition id
    *      IS that shard ([[shardLabels]]), so the single
    *      `repartition(nShards, label)` shuffle routes every cell to its
    *      own output partition/file — no range sampling, no second pass.
    *
    * Rows with a null or negative `tokenCol` are dropped up front (same
    * contract as `tokenBudgetSample`: a doc with no usable token count
    * cannot be tiered). */
  def writeShardsByTokens(df: DataFrame, path: String, nShards: Int,
      tokenCol: String, idCol: String = "doc_id", format: String = "parquet",
      mode: String = "overwrite"): DataFrame = {
    import org.apache.spark.sql.functions.{bin, col, element_at, length, sum, typedLit}
    require(nShards >= 1, s"nShards=$nShards must be >= 1")
    val spark = df.sparkSession
    val clean = df.filter(col(tokenCol).isNotNull && col(tokenCol) >= 0)
    val cell = (length(bin(col(tokenCol))) * 100 +
      graft.operators.Sampling.bucket(col(idCol))).cast("int")
    val sums = clean.select(cell.as("__cell"), col(tokenCol).cast("long").as("__t"))
      .groupBy(col("__cell")).agg(sum(col("__t")).as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
    val load = new Array[Long](nShards)
    val labels = shardLabels(nShards)
    val cellToLabel = sums.sortBy { case (c, s) => (-s, c) }.map { case (c, s) =>
      var best = 0
      var i = 1
      while (i < nShards) { if (load(i) < load(best)) best = i; i += 1 }
      load(best) += s
      c -> labels(best)
    }.toMap
    clean.withColumn("__label", element_at(typedLit(cellToLabel), cell))
      .repartition(nShards, col("__label"))
      .drop("__label")
      .write.format(format).mode(mode).save(path)
    spark.read.format(format).load(path)
  }

  /** Bucketed + sorted managed table: equi-joins/aggregations on
    * `bucketCols` between tables with matching bucketing read without a
    * shuffle (and merge without a sort when `sortCols` match). */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int, sortCols: Seq[String] = Nil,
      format: String = "parquet", mode: String = "overwrite"): DataFrame = {
    val w = df.write.format(format).mode(mode)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
    df.sparkSession.table(table)
  }

  /** Deterministic shard manifest — the exactly-once export-validation
    * artifact: per content-addressed shard (shared hash bucket of
    * `idCol`, mod `nShards`), the row count, id range, and an
    * order-insensitive content checksum (bit-XOR of a caller-supplied
    * per-row hash). Recompute after any copy/import and diff against the
    * stored manifest to prove integrity without caring about row order
    * or file layout. ONE hash agg with map-side partials — the shuffle
    * is `nShards` scalar rows. */
  def shardManifest(df: DataFrame, nShards: Int,
      contentHash: org.apache.spark.sql.Column,
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.functions._
    require(nShards >= 1, s"nShards=$nShards must be >= 1")
    df.select((graft.operators.Sampling.bucket(col(idCol)) % nShards)
          .as("shard_id"),
        col(idCol).as("__id"), contentHash.as("__h"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_rows"), min(col("__id")).as("min_id"),
        max(col("__id")).as("max_id"), expr("bit_xor(__h)").as("checksum"))
  }

  /** Small-file compaction plan: files (any manifest with a size column,
    * e.g. [[shardManifest]]'s) assigned to target-capacity bins by
    * FRACTIONAL NEXT-FIT — file f goes to bin `floor(cumsum_before(f) /
    * target)` in `fileCol` order. The policy is deterministic and
    * SQL-replayable (one cumulative window of exact integers), keeps
    * every bin's pre-overflow load under `target`, and never splits a
    * file; a bin overflows by at most its last file (the bound the spec
    * pins). Runs over FILE METADATA (100 TB ≈ 10⁵ files at 1 GB), so the
    * single cumulative window is a bounded driver-scale step, not a data
    * pass — the same size regime as the q72 tier table. */
  def compactionPlan(manifest: DataFrame, targetSize: Long,
      fileCol: String = "shard_id", sizeCol: String = "n_rows"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    require(targetSize >= 1, s"targetSize=$targetSize must be >= 1")
    val w = Window.orderBy(col(fileCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    manifest.select(col(fileCol), col(sizeCol).cast("long").as("size"))
      .withColumn("__before", sum(col("size")).over(w) - col("size"))
      .select(col(fileCol), col("size"),
        expr(s"__before div $targetSize").as("bin_id"))
  }
}
