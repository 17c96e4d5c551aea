package graft

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for every `SparkEntry.queries` entry to
  * one file per query — the plan evidence the optimization rounds cite
  * (plans/r17/<query>_before.txt / _after.txt).
  *
  *   sbt "runMain graft.DumpPlans /root/testdata/sf0.1 /tmp/plans"
  *
  * Optional third arg: comma-separated query-name filter. The session
  * mirrors Bench's exactly (extensions, shuffle partitions = cpus, AQE
  * on) so the dumped plans are the ones the bench actually runs —
  * modulo AQE's runtime re-optimization, which `explain` cannot show
  * before execution (the initial plan still carries join strategies,
  * Exchange placement, and PushedFilters).
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/plans")
    val only = args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"$name.txt"),
            txt.getBytes("UTF-8"))
        } catch {
          case e: Throwable =>
            System.err.println(s"[plans] FAILED $name: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
