package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Locks the schema-adaptive event-time contract: the driver's
  * events.parquet has shipped `ts` both as TIMESTAMP(NANOS) (read as
  * epoch-nanos long under `nanosAsLong`) and as timestamp[us]
  * (TIMESTAMP_NTZ) — [[Tables.eventTs]]/[[Tables.eventTsMicros]] must
  * produce the same instants from either generation (sessions run UTC).
  */
class TablesSpec extends SparkTestBase {

  import spark.implicits._

  // one event: 2021-06-01 12:34:56.789012 UTC
  private val micros = 1622550896789012L

  test("eventTs agrees across the nanos-long and timestamp[us] generations") {
    val asLong = Seq(micros * 1000L).toDF("ts") // epoch nanos as int64
    // integer `div`, not `/`: double division of an epoch-nanos long loses
    // sub-microsecond exactness past 2^53
    val asNtz = Seq(micros * 1000L).toDF("ts")
      .select(timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType).as("ts"))
    asLong.schema("ts").dataType shouldBe LongType
    asNtz.schema("ts").dataType shouldBe TimestampNTZType

    val fromLong = asLong.select(Tables.eventTs(asLong).as("t"))
    val fromNtz = asNtz.select(Tables.eventTs(asNtz).as("t"))
    // both paths land on a session-zoned TimestampType with the same instant
    fromLong.schema("t").dataType shouldBe TimestampType
    fromNtz.schema("t").dataType shouldBe TimestampType
    fromLong.collect() shouldBe fromNtz.collect()

    val microsLong = asLong.select(Tables.eventTsMicros(asLong).as("m")).head().getLong(0)
    val microsNtz = asNtz.select(Tables.eventTsMicros(asNtz).as("m")).head().getLong(0)
    microsLong shouldBe micros
    microsNtz shouldBe micros
  }

  test("eventTs passes a plain TimestampType column through") {
    val asTz = Seq(micros * 1000L).toDF("ts")
      .select(timestamp_micros(expr("ts div 1000")).as("ts"))
    asTz.schema("ts").dataType shouldBe TimestampType
    asTz.select(Tables.eventTs(asTz).as("t")).head().getTimestamp(0).getTime shouldBe micros / 1000
    asTz.select(Tables.eventTsMicros(asTz).as("m")).head().getLong(0) shouldBe micros
  }
}
