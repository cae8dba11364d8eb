package graft

import graft.api.{Channel, Node}
import org.apache.spark.sql.functions._

class ChannelSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq((1, "a", 10.0), (2, "b", 50.0), (3, "c", 90.0), (4, "d", 5.0))
    .toDF("id", "name", "value")

  test("add chains nodes in order") {
    val out = Channel("t")
      .add(
        Node("f")(_.filter(col("value") > 6)),
        Node.mapColumn("u", "name")(upper))
      .runMain(df)
      .orderBy("id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("A", "B", "C"))
  }

  test("passthrough node's effect is discarded") {
    val out = Channel("t2")
      .add(Node("corrupt", _.withColumn("id", lit(-1)), passthrough = true))
      .runMain(df)
    assert(out.select("id").as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4))
  }

  test("dropWhen routes matching rows to drops") {
    val r = Channel("t3").dropWhen(col("value") < 10).run(df)
    assert(r.main.count() == 3)
    assert(r.dropped.get.select("id").as[Int].collect().toSeq == Seq(4))
  }

  test("rejectWhen routes matching rows to rejects") {
    val r = Channel("t4").rejectWhen(col("name") === "b").run(df)
    assert(r.main.count() == 3)
    assert(r.rejected.get.select("id").as[Int].collect().toSeq == Seq(2))
  }

  test("when applies sub-pipeline only to matching rows") {
    val out = Channel("t5")
      .when(col("value") > 40)(_.add(Node.mapColumn("u", "name")(upper)))
      .runMain(df)
      .orderBy("id").select("name").as[String].collect().toSeq
    assert(out == Seq("a", "B", "C", "d"))
  }

  test("caseOf is first-true-wins and keeps unmatched rows") {
    val out = Channel("t6")
      .caseOf(
        (col("value") < 25, (c: Channel) => c.add(Node.mapColumn("m", "name")(_ => lit("low")))),
        (col("value") < 75, (c: Channel) => c.add(Node.mapColumn("m", "name")(_ => lit("mid")))))
      .runMain(df)
      .orderBy("id").select("name").as[String].collect().toSeq
    // 10→low (matches both, first wins), 50→mid, 90→unmatched, 5→low
    assert(out == Seq("low", "mid", "c", "low"))
  }

  test("fork sees the stream state at fork point; main continues") {
    val r = Channel("t7")
      .add(Node("f")(_.filter(col("value") > 6)))
      .fork("side")(_.add(Node("cnt")(_.select(col("id")))))
      .add(Node("g")(_.filter(col("value") > 40)))
      .run(df)
    assert(r.forks("side").count() == 3) // post-first-filter snapshot
    assert(r.main.count() == 2)
  }

  test("end-node hooks: init/join/drop/final applied to the right streams") {
    val r = Channel("t8")
      .addInitNodes(Node("init")(_.withColumn("seen", lit("init"))))
      .dropWhen(col("value") < 10)
      .addJoinNodes(Node("join")(_.withColumn("seen", lit("join"))))
      .addDropNodes(Node("drop")(_.withColumn("seen", lit("drop"))))
      .addFinalNodes(Node("final")(_.withColumn("final", lit(true))))
      .run(df)
    assert(r.main.select("seen").distinct().as[String].collect().toSeq == Seq("join"))
    assert(r.dropped.get.select("seen").as[String].collect().toSeq == Seq("drop"))
    assert(r.main.select("final").distinct().as[Boolean].head())
    assert(r.dropped.get.select("final").distinct().as[Boolean].head())
  }

  test("merge unions by name") {
    val a = df.select("id", "name")
    val b = df.select(col("name"), col("id")) // shuffled column order
    assert(Channel.merge(a, b).count() == 8)
  }

  test("graphDot emits the reference's dot edge list (channels.py:921)") {
    val ch = Channel("main")
      .add(Node("n1")(identity))
      .fork("side")(_.add(Node("s1")(identity)))
      .when(lit(true))(_.add(Node("w1")(identity)))
      .add(Node("n2")(identity))
    val dot = ch.graphDot
    assert(dot.head == "#---")
    assert(dot.contains(""""main"->"n1";"""))
    assert(dot.contains(""""n1"->"main.side";"""))           // fork edge
    assert(dot.contains(""""n1"->"main.when" [style=dotted];""")) // conditional
    assert(dot.contains(""""n2"->"main";"""))                // rejoin to end
    assert(dot.contains(""""main.side"->"s1";"""))           // sub-channel recursed
    assert(dot.contains(""""w1"->"main";"""))                // when rejoins at end
  }
}
