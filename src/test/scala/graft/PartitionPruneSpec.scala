package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.sources.Lake

/** Partitioned-lake posture: a day filter over a `day=`-partitioned
  * layout must prune at the FILE LISTING level (PartitionFilters on
  * the scan node), not post-scan — the difference between reading one
  * partition and reading 100 TB. */
class PartitionPruneSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")

  test("day filter becomes a PartitionFilter and scans only that partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lake").toString
    val df = Seq(
      (1L, ts(1, 9), 10.0), (2L, ts(1, 17), 20.0),
      (3L, ts(2, 9), 30.0), (4L, ts(3, 9), 40.0),
    ).toDF("event_id", "ts", "value")
    Lake.writePartitionedByDay(df, "ts", dir)

    val pruned = Lake.read(spark, dir).filter($"day" === "2024-01-01")
    assert(pruned.select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))

    val scan = pruned.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    // the predicate landed in partitionFilters (planning-time listing
    // prune), and only day=2024-01-01's files survive
    assert(scan.partitionFilters.exists(_.toString.contains("2024-01-01")),
      scan.partitionFilters.toString)
    val files = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters)
    val paths = files.flatMap(_.files.map(_.getPath.toString))
    assert(paths.nonEmpty && paths.forall(_.contains("day=2024-01-01")), paths)
  }

  test("one file per day partition (no small-files explosion)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lake2").toString
    val df = (1 to 100).map(i => (i.toLong, ts(1 + i % 3, 9), i.toDouble))
      .toDF("event_id", "ts", "value")
    Lake.writePartitionedByDay(df, "ts", dir)
    val root = new java.io.File(dir)
    val perDay = root.listFiles().filter(_.getName.startsWith("day=")).map { d =>
      d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))
    }.toMap
    assert(perDay.keySet == Set("day=2024-01-01", "day=2024-01-02", "day=2024-01-03"))
    assert(perDay.values.forall(_ == 1), perDay.toString)
  }
}
