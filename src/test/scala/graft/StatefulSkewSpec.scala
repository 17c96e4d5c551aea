package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.SkewOps
import graft.streaming.StatefulOps

class StatefulSkewSpec extends SparkSpec {
  import spark.implicits._

  test("dedupStream emits each id once across micro-batches") {
    val input = MemoryStream[(Long, String)](spark)
    val deduped = StatefulOps.dedupStream[Long, (Long, String)](
      input.toDS(), _._1)
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      input.addData((1L, "a"), (1L, "a-dup-same-batch"), (2L, "b"))
      q.processAllAvailable()
      input.addData((1L, "a-dup-next-batch"), (3L, "c"))
      q.processAllAvailable()
      val got = spark.table("dedup_out").as[(Long, String)]
        .collect().toMap
      assert(got.keySet == Set(1L, 2L, 3L))
      assert(got(1L) == "a") // the FIRST occurrence won
    } finally q.stop()
  }

  test("runningCounts accumulates per key across batches") {
    val input = MemoryStream[(String, Int)](spark)
    val counts = StatefulOps.runningCounts[String, (String, Int)](
      input.toDS(), _._1)
    val q = counts.writeStream.outputMode("update")
      .format("memory").queryName("running_out").start()
    try {
      input.addData(("leo", 1), ("leo", 1), ("demo", 1))
      q.processAllAvailable()
      input.addData(("leo", 1))
      q.processAllAvailable()
      val rows = spark.table("running_out").as[(String, Long)].collect()
      // update mode: (leo,2),(demo,1) from batch0 then (leo,3) from batch1
      assert(rows.contains(("leo", 2L)) && rows.contains(("leo", 3L)))
      assert(rows.contains(("demo", 1L)))
    } finally q.stop()
  }

  test("dedupWithinWatermark drops in-horizon duplicates natively") {
    val input = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 10:$m%02d:00")
    val deduped = StatefulOps.dedupWithinWatermark(
      input.toDF().toDF("id", "ts", "payload"), Seq("id"), "ts", "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("wm_dedup_out").start()
    try {
      input.addData((1L, ts(0), "a"), (1L, ts(1), "a-dup"), (2L, ts(2), "b"))
      q.processAllAvailable()
      input.addData((1L, ts(3), "a-dup-next-batch"), (3L, ts(4), "c"))
      q.processAllAvailable()
      val got = spark.table("wm_dedup_out")
        .select("id").as[Long].collect().toSeq.sorted
      assert(got == Seq(1L, 2L, 3L), s"got $got")
    } finally q.stop()
  }

  test("enrichWithStatic joins each micro-batch against the broadcast dim") {
    val input = MemoryStream[(Long, String)](spark)
    val dim = Seq(("en", "English"), ("fr", "French"))
      .toDF("lang", "lang_name")
    val enriched = StatefulOps.enrichWithStatic(
      input.toDF().toDF("id", "lang"), dim, Seq("lang"))
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    try {
      input.addData((1L, "en"), (2L, "xx"))
      q.processAllAvailable()
      input.addData((3L, "fr"))
      q.processAllAvailable()
      val got = spark.table("enrich_out")
        .select("id", "lang_name").as[(Long, Option[String])]
        .collect().toMap
      assert(got == Map(1L -> Some("English"), 2L -> None,
        3L -> Some("French")), got.toString)
    } finally q.stop()
  }

  test("transformWithState running totals accumulate across batches") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(String, Double)](spark)
      val totals = StatefulOps.runningTotals[String](input.toDS())
      val q = totals.writeStream.outputMode("update")
        .format("memory").queryName("tws_out").start()
      try {
        input.addData(("leo", 2.0), ("leo", 3.0), ("demo", 1.0))
        q.processAllAvailable()
        input.addData(("leo", 5.0))
        q.processAllAvailable()
        val rows = spark.table("tws_out")
          .as[(String, Long, Double)].collect().toSet
        assert(rows.contains(("leo", 2L, 5.0)) && rows.contains(("leo", 3L, 10.0)),
          s"got $rows")
        assert(rows.contains(("demo", 1L, 1.0)))
      } finally q.stop()
    } finally old match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("saltedJoin equals the plain join on skewed data") {
    // 90% of fact rows share one hot key
    val fact = (1 to 1000).map(i =>
      (i.toLong, if (i <= 900) 1L else (i % 10).toLong))
      .toDF("row_id", "k")
    val dim = (0L to 9L).map(k => (k, s"dim_$k")).toDF("k", "payload")
    val plain = fact.join(dim, Seq("k"))
      .select("row_id", "k", "payload")
    val salted = SkewOps.saltedJoin(fact, dim, "k", "row_id", n = 8)
      .select("row_id", "k", "payload")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("keyHistogram surfaces the hot key") {
    val fact = (1 to 100).map(i => (i, if (i <= 90) "hot" else s"k$i"))
      .toDF("id", "k")
    val top = SkewOps.keyHistogram(fact, "k", 1)
      .as[(String, Long)].head()
    assert(top == ("hot", 90L))
  }
}
