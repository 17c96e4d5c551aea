package graft

import org.apache.spark.sql.functions._
import graft.ops.TootOps
import graft.streaming.StreamJob
import graft.testkit.FakeKafka

/** S1/S2 executed end-to-end against the registered `kafka` contract
  * double (graft.testkit.FakeKafka — no Kafka artifacts exist in this
  * zero-egress container, see its scaladoc): source resolution by short
  * name, option pass-through, the connector's exact output schema, the
  * binary-value parse chain, and engine-managed offset tracking with
  * CHECKPOINT RESUME across a stop/restart.
  */
class KafkaContractSpec extends SparkSpec {

  private def toot(id: Long, user: String, text: String): String =
    s"""{"id":$id,"created_at":"2024-03-01T10:0$id:00.000Z","language":"en",""" +
      s""""text":"$text","hashtags":["spark"],"user_id":${id * 10},""" +
      s""""username":"$user","display_name":"$user","favourites":1,""" +
      s""""reblogs":0,"replies":0,"url":"https://x/$id"}"""

  test("kafkaBatchSource replays earliest->latest with the kafka schema") {
    FakeKafka.reset()
    (1L to 3L).foreach(i => FakeKafka.produce("toots-batch", toot(i, s"u$i", s"t$i")))
    val df = StreamJob.kafkaBatchSource(spark, "fake:9092", "toots-batch")
    assert(df.schema.fieldNames.toSeq == Seq("key", "value", "topic",
      "partition", "offset", "timestamp", "timestampType"))
    assert(df.count() == 3)
    // the reference's options reached the source (keys are
    // case-insensitive-lowered by the DataSource layer)
    assert(FakeKafka.lastOptions("kafka.bootstrap.servers") == "fake:9092")
    assert(FakeKafka.lastOptions("startingoffsets") == "earliest")
    assert(FakeKafka.lastOptions("endingoffsets") == "latest")
    // P1-P3: binary value -> string -> from_json -> flatten
    val parsed = TootOps.parseKafkaValue(df)
    assert(parsed.select("username").as[String](
      org.apache.spark.sql.Encoders.STRING).collect().toSet ==
      Set("u1", "u2", "u3"))
  }

  test("kafkaSource streams, tracks offsets, and resumes from checkpoint") {
    FakeKafka.reset()
    val topic = "toots-stream"
    (1L to 2L).foreach(i => FakeKafka.produce(topic, toot(i, s"u$i", s"hello $i")))

    val ckpt = java.nio.file.Files
      .createTempDirectory("kafka-contract-ckpt").toString
    val sunk = scala.collection.mutable.ArrayBuffer.empty[String]
    val appender: StreamJob.Appender = (table, df) =>
      if (table == "mastodon_posts") sunk.synchronized {
        sunk ++= df.select("username").collect().map(_.getString(0))
      }

    def runOnce(): Unit = {
      val src = StreamJob.kafkaSource(spark, "fake:9092", topic,
        startingOffsets = "earliest")
      val prepared = StreamJob.prepare(TootOps.parseKafkaValue(src))
      val q = StreamJob.start(prepared, appender, ckpt)
      try q.processAllAvailable() finally q.stop()
      // createSource runs at query start — assert the reference's
      // options made it through the DataSource layer
      assert(FakeKafka.lastOptions("failondataloss") == "false")
      assert(FakeKafka.lastOptions("kafka.bootstrap.servers") == "fake:9092")
    }

    runOnce()
    assert(sunk.sorted == Seq("u1", "u2"), s"got $sunk")

    // two more records arrive while the query is DOWN; the restarted
    // query must resume from the checkpointed offset — replaying from
    // `earliest` would double u1/u2
    (3L to 4L).foreach(i => FakeKafka.produce(topic, toot(i, s"u$i", s"hi $i")))
    runOnce()
    assert(sunk.sorted == Seq("u1", "u2", "u3", "u4"), s"got $sunk")
  }
}
