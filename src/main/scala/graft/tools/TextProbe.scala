package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: per-stage wall time of the q27 normalize chain (scan,
  * lower, each regexp_replace, trim) over a given table dir, so a
  * non-absorbing layout-probe residual can be attributed to a stage
  * instead of guessed (the Q99Probe treatment for per-row text ops).
  * Usage: runMain graft.tools.TextProbe <sfDir> [maxPartitionBytes]
  */
object TextProbe {
  private val taskMs =
    new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()

  private def timed(name: String, n: Long)(f: => Unit): Unit = {
    for (i <- 1 to 3) {
      taskMs.clear()
      val t0 = System.nanoTime(); f
      val wall = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val ts = taskMs.asScala.toSeq.map(_._2).sorted
      val stat = if (ts.isEmpty) "" else
        f"tasks ${ts.size} sum ${ts.sum / 1e3}%.2f max ${ts.max / 1e3}%.2f s"
      println(f"$name%-34s run$i $wall%6.2f s  (rows $n)  $stat")
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    if (args.length > 1) {
      b.config("spark.sql.files.maxPartitionBytes", args(1))
      b.config("spark.sql.files.openCostInBytes", (args(1).toLong / 16).toString)
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          taskMs.add((e.stageId, e.taskInfo.duration))
      })
    val docs = spark.read.parquet(s"${args(0)}/documents.parquet")
    println(s"scan partitions: ${docs.rdd.getNumPartitions}")
    // Row count ONCE, outside the timed region: timing noop-write +
    // count ran two jobs per sample, so per-stage walls carried an
    // extra count job and the task-listener stats mixed both jobs'
    // tasks (ADVICE r10). Every probe below is a row-wise projection
    // of `docs`, so one count serves them all.
    val nRows = docs.count()

    def run(name: String, df: DataFrame): Unit =
      timed(name, nRows) { df.write.format("noop").mode("overwrite").save() }

    run("scan+count only", docs.select(col("doc_id"), length(col("text")).as("l")))
    run("lower only", docs.select(col("doc_id"), lower(col("text")).as("t")))
    run("lower+replace1 [^a-z0-9 ]", docs.select(col("doc_id"),
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", "").as("t")))
    run("lower+replace1+replace2 ' +'", docs.select(col("doc_id"),
      regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
        " +", " ").as("t")))
    run("full normalize (q27)",
      graft.operators.TextAnalysis.normalize(docs))
    spark.stop()
  }
}
