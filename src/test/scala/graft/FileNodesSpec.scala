package graft

import graft.api.{Channel, Nodes}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class FileNodesSpec extends SparkSpec {
  import spark.implicits._

  test("FileReader → FileWriter → FileMover → FileCleaner per-row pipeline") {
    val dir = Files.createTempDirectory("graft_files")
    Files.writeString(dir.resolve("a.txt"), "alpha")
    Files.writeString(dir.resolve("b.txt"), "beta")

    val paths = Seq(s"$dir/a.txt", s"$dir/b.txt").toDF("filepath")

    // read per-row files into payload
    val read = Nodes.FileReader()(paths)
    assert(read.select("payload").as[String].collect().sorted.toSeq == Seq("alpha", "beta"))

    // transform + write to new per-row destinations (safe-file + .ok)
    val outDf = read
      .withColumn("payload", upper(col("payload")))
      .withColumn("filepath",
        regexp_replace(col("filepath"), "\\.txt$", ".out.txt"))
    Nodes.FileWriter(createValidFile = true)(outDf).count()
    assert(Files.readString(dir.resolve("a.out.txt")) == "ALPHA")
    assert(Files.exists(dir.resolve("a.out.ok")))
    assert(!Files.exists(dir.resolve("a.out.txt.tmp")))

    // move originals to an archive dir
    val arch = dir.resolve("archive").toString
    val moved = Nodes.FileMover(arch)(paths)
    assert(moved.select("filepath").as[String].collect().forall(_.startsWith(arch)))
    assert(!Files.exists(dir.resolve("a.txt")) && Files.exists(Paths.get(arch, "a.txt")))

    // clean written outputs + their .ok files
    val outs = Seq(s"$dir/a.out.txt", s"$dir/b.out.txt").toDF("filepath")
    Nodes.FileCleaner(Seq(".ok"))(outs).count()
    assert(!Files.exists(dir.resolve("a.out.txt")) && !Files.exists(dir.resolve("a.out.ok")))
  }

  test("Save node persists the stream to a MessageStore and passes through") {
    val dir = Files.createTempDirectory("graft_savenode").toString
    val store = new graft.store.MessageStore(spark, s"$dir/msgs")
    val msgs = Seq(("u1", "2024-02-02 00:00:00", "body"))
      .toDF("uuid", "ts0", "payload")
      .withColumn("ts", col("ts0").cast("timestamp")).drop("ts0")
    val out = Channel("save").add(Nodes.Save(store)).runMain(msgs)
    assert(out.count() == 1)
    assert(store.total() == 1)
  }
}
