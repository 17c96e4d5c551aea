package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Each query is materialized through the `noop` sink — a full
  * end-to-end execution (scan → transform → row production) with no
  * output I/O. `count()` would let Catalyst prune every projection and
  * under-measure expression-heavy queries.
  *
  * Methodology (stability over single-shot): each query gets its own
  * warm-up run (JIT + codegen cache + shuffle-file page cache for ITS
  * plan), then `SPARK_GRAFT_REPS` (default 3) timed runs, and the
  * reported number is the MEDIAN — first-run JIT and GC outliers no
  * longer swing round-over-round comparisons 2×. A query that throws
  * is recorded in `"failed"` with its error, NOT silently timed as a
  * fast no-op; total covers the successful medians only.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      // native functions + TopKPerGroup strategy + row_number rewrite
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // Optional comma-separated query filter for targeted diagnosis runs:
    //   SPARK_GRAFT_ONLY=monthly_order_stats,hourly_counts sbt "runMain graft.Bench"
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        runOnce(fn) // per-query warm-up: JIT + codegen for THIS plan
        val runs = Seq.fill(math.max(1, reps))(runOnce(fn)).sorted
        timings(name) = runs(runs.length / 2) // median
      } catch {
        case e: Throwable =>
          failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(1).mkString.take(200)
      }
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = timings
      .map { case (k, v) => jstr(k) + ":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val fs = failed
      .map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val total = timings.values.sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$fs,"reps":$reps,"sf":${jstr(sfDir)}}""")
    if (failed.nonEmpty) {
      failed.foreach { case (k, v) => System.err.println(s"[bench] FAILED $k: $v") }
    }
    spark.stop()
  }
}
