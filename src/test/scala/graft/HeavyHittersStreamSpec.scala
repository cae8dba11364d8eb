package graft

import java.nio.file.Files

import graft.streaming.HeavyHittersStream
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

class HeavyHittersStreamSpec extends SparkSpec {
  import spark.implicits._

  test("batch mode: exact below k, MG survival guarantee above k") {
    // window of 60s starting at epoch 600000s; key 'hot' 12 of 20 rows
    val base = 600000000L
    val rows = (1 to 20).map { i =>
      val key = if (i <= 12) "hot" else s"cold$i"
      (new java.sql.Timestamp(base + i * 1000), key)
    }
    val df = rows.toDF("ts", "key")
    // k larger than distinct keys: exact counts
    val exact = HeavyHittersStream.windowedHeavyHitters(df, "ts", "key",
        windowSec = 60, k = 16)
      .collect().map(h => h.key -> h.minCount).toMap
    assert(exact("hot") == 12L && exact.size == 9)
    // k = 2: the >n/(k+1) key MUST survive with a lower-bound count
    val mg = HeavyHittersStream.windowedHeavyHitters(df, "ts", "key",
        windowSec = 60, k = 2)
      .collect().map(h => h.key -> h.minCount).toMap
    assert(mg.contains("hot"), s"MG guarantee violated: $mg")
    assert(mg("hot") <= 12L && mg("hot") >= 12L - 8L) // ≥ true − decrements
  }

  test("streaming: window flushes when the watermark passes its end") {
    val dir = Files.createTempDirectory("graft_hh").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    def land(rows: Seq[(java.sql.Timestamp, String)], name: String): Unit = {
      val tmp = s"$dir/tmp_$name"
      rows.toDF("ts", "key").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(in, s"$name.parquet"))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.StringType)))
    def start() = {
      val src = spark.readStream.schema(schema).parquet(in)
      HeavyHittersStream.windowedHeavyHitters(src, "ts", "key",
          windowSec = 60, k = 4)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    val w1 = 600000000L // window [w1, w1+60s)
    land((1 to 9).map(i => (new java.sql.Timestamp(w1 + i * 1000),
      if (i <= 6) "hot" else s"c$i")), "b1")
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    // window 1 still open (watermark at its max event time < window end)
    assert(!new java.io.File(out).exists() ||
      spark.read.parquet(out).isEmpty, "open window must not emit")
    // an event two windows later pushes the watermark past window 1's end
    land(Seq((new java.sql.Timestamp(w1 + 130 * 1000), "later")), "b2")
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val hits = spark.read.parquet(out)
      .as[HeavyHittersStream.Hit](Encoders.product[HeavyHittersStream.Hit])
      .collect().toSeq
    assert(hits.exists(h => h.key == "hot" && h.minCount == 6L
        && h.windowStart == (w1 / 60000) * 60000),
      s"window-1 heavy hitter must flush after the watermark passes: $hits")
    assert(!hits.exists(_.key == "later"), "window 2 is still open")
  }
}
