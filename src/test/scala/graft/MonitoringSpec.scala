package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{Monitoring, Replay, StreamJob}

class MonitoringSpec extends SparkSpec {
  import spark.implicits._

  test("ProgressRecorder captures per-batch input rows") {
    val recorder = Monitoring.attach(spark)
    val input = MemoryStream[String](spark)
    val q = input.toDF().writeStream
      .outputMode("append").format("memory").queryName("mon_out").start()
    try {
      input.addData("a", "b", "c")
      q.processAllAvailable()
      input.addData("d")
      q.processAllAvailable()
      spark.streams.awaitAnyTermination(1) // let listener bus drain
      Thread.sleep(500)
      val rows = recorder.batches.filter(_.queryName == "mon_out")
        .map(_.numInputRows).filter(_ > 0)
      assert(rows.contains(3L) && rows.contains(1L),
        s"got ${recorder.batches}")
      assert(Monitoring.statusLine(q).startsWith("active=true"))
    } finally {
      q.stop()
      Monitoring.detach(spark, recorder)
    }
  }

  test("observe() quality metrics ride the batch job into progress") {
    val recorder = Monitoring.attach(spark)
    val input = MemoryStream[(String, String)](spark)
    val observed = Monitoring.withQualityMetrics(
      input.toDF().toDF("username", "text"))
    val q = observed.writeStream
      .outputMode("append").format("memory").queryName("obs_out").start()
    try {
      input.addData(("u1", "hello"), ("u2", "  "), ("u3", null))
      q.processAllAvailable()
      spark.streams.awaitAnyTermination(1)
      Thread.sleep(500)
      val metric = recorder.observed
        .collectFirst { case (_, "graft_quality", row) => row }
      assert(metric.isDefined, s"no observed metrics: ${recorder.observed}")
      val m = metric.get
      assert(m.getAs[Long]("rows") == 3L)
      assert(m.getAs[Long]("blank_text") == 2L)
      assert(m.getAs[Long]("approx_users") == 3L)
    } finally {
      q.stop()
      Monitoring.detach(spark, recorder)
    }
  }

  test("Replay streams a file in deterministic fixed-size batches") {
    val tmp = java.nio.file.Files.createTempFile("replay", ".jsonl")
    java.nio.file.Files.writeString(tmp,
      (1 to 10).map(i => s"""{"n": $i}""").mkString("\n"))
    val stream = Replay.jsonLines(spark, tmp.toString, rowsPerBatch = 4)
    val q = stream.writeStream
      .outputMode("append").format("memory").queryName("replay_out").start()
    try {
      // rate sources never drain, so processAllAvailable() would block
      // forever — poll until the three covering micro-batches (4+4+2)
      // have delivered all 10 lines.
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (spark.table("replay_out").count() < 10 &&
          System.nanoTime() < deadline) {
        Thread.sleep(250)
      }
      val got = spark.table("replay_out").as[String].collect().toSeq
      assert(got.length == 10, s"only ${got.length} rows arrived")
      assert(got.toSet == (1 to 10).map(i => s"""{"n": $i}""").toSet)
    } finally q.stop()
  }
}
