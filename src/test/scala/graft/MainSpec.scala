package graft

import graft.api.{Channels, GraftProject, Settings}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** A sample deployable project (the pjt_templates project.py shape): one
  * channel, one durable store seeded with a message on first boot. */
final class SampleProject extends GraftProject {
  def configure(spark: SparkSession, settings: Settings): Map[String, graft.store.MessageStore] = {
    import spark.implicits._
    Channels.clear()
    val chan = Channels.register(
      api.Channel("sample").add(ops.CoreOps.mapPayload("up")(upper)))
    val path = settings.storePath.getOrElse(sys.error("STORE_PATH required"))
    val store = new graft.store.MessageStore(spark, path)
    if (!new java.io.File(path).exists()) // seed once
      store.save(Seq(("m1", "hello cli")).toDF("uuid", "payload")
        .withColumn("ts", lit("2024-03-01 09:00:00").cast("timestamp"))
        .withColumn("meta", map().cast("map<string,string>"))
        .withColumn("ctx", map().cast(model.Msg.ctxType)))
    Map(chan.name -> store)
  }
}

/** CLI + settings bootstrap parity (commands.py:225-419, conf.py). */
class MainSpec extends SparkSpec {

  private def freshSettings(): Settings = Settings(
    projectModule = classOf[SampleProject].getName,
    remoteAdminHost = "127.0.0.1",
    remoteAdminPort = 0, // ephemeral for tests
    storePath = Some(Files.createTempDirectory("graft_main").toString + "/msgs"))

  test("Settings.load: defaults <- properties file <- env overrides (conf.py layering)") {
    val props = Files.createTempFile("graft_settings", ".properties")
    Files.write(props,
      """DEBUG=true
        |PROJECT_MODULE=com.example.Proj
        |REMOTE_ADMIN_PORT=9999
        |CUSTOM_FLAG=on
        |""".stripMargin.getBytes("UTF-8"))
    val s = Settings.load(Some(props.toString),
      env = Map("GRAFT_REMOTE_ADMIN_PORT" -> "7777", "GRAFT_TESTING" -> "1"))
    assert(s.debug) // from file
    assert(s.projectModule == "com.example.Proj") // from file
    assert(s.remoteAdminPort == 7777) // env beats file
    assert(s.testing) // env beats default
    assert(s.httpEndpointPort == 8080) // default survives
    assert(s.extra == Map("CUSTOM_FLAG" -> "on")) // unknown keys pass through
  }

  test("Settings.load: missing settings file fails like the reference ConfigError") {
    intercept[IllegalArgumentException] {
      Settings.load(Some("/nonexistent/settings.properties"), env = Map.empty)
    }
  }

  test("printsettings: sorted NAME = value lines (commands.py:326)") {
    val lines = Main.run(Seq("printsettings"), freshSettings(), () => spark)
      .getOrElse(fail("printsettings failed"))
    assert(lines.exists(_.startsWith("PROJECT_MODULE = graft.SampleProject")))
    assert(lines == lines.sorted)
  }

  test("STATE_STORE setting: parsed and validated, shown by printsettings, wired to the session by startApp") {
    // env override parses; invalid values fail loudly
    assert(Settings.load(None,
      env = Map("GRAFT_STATE_STORE" -> "rocksdb")).stateStore == "rocksdb")
    assert(Settings.load(None, env = Map.empty).stateStore == "default")
    intercept[IllegalArgumentException] {
      Settings.load(None, env = Map("GRAFT_STATE_STORE" -> "leveldb"))
    }
    // printsettings surfaces the key
    val lines = Main.run(Seq("printsettings"), freshSettings(), () => spark)
      .getOrElse(fail("printsettings failed"))
    assert(lines.contains("STATE_STORE = default"))
    // startApp with rocksdb sets the provider conf BEFORE channels start
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    val app = Main.startApp(freshSettings().copy(stateStore = "rocksdb"), spark)
    try assert(spark.conf.get(key) == GraftSession.RocksDBStateProvider)
    finally {
      app.stop()
      GraftSession.restoreStateStore(spark, prev)
    }
    // and the default leaves the conf untouched
    val app2 = Main.startApp(freshSettings(), spark)
    try assert(spark.conf.getOption(key) == prev)
    finally app2.stop()
  }

  test("graph / graph --dot: channel topology from the loaded project") {
    val text = Main.run(Seq("graph"), freshSettings(), () => spark).toOption.get
    assert(text.head == "sample:")
    assert(text.exists(_.contains("|- up")))
    val dot = Main.run(Seq("graph", "--dot"), freshSettings(), () => spark).toOption.get
    assert(dot.head == "digraph testgraph{" && dot.last == "}")
    assert(dot.exists(_.contains("\"sample\"->\"up\";")))
  }

  test("start: boots project, serves admin RPC live, pidfile controls stop") {
    val settings = freshSettings()
    val app = Main.startApp(settings, spark)
    try {
      assert(Files.exists(app.pidFile))
      val client = new api.RemoteAdminClient(app.adminUrl)
      // channel registered, started (WAITING), store bound and searchable
      val chans = client.channels()
      assert(chans.size() == 1)
      assert(chans.get(0).get("name").asText() == "sample")
      assert(chans.get(0).get("status").asText() == "WAITING")
      val msgs = client.listMsgs("sample")
      assert(msgs.get("total").asLong() == 1L)
      assert(msgs.get("messages").get(0).get("id").asText() == "m1")
      // replay over the live socket reaches the durable store
      val replayed = client.replayMsg("sample", "m1")
      assert(replayed.get("payload").asText() == "HELLO CLI")
      // `stop` clears the pidfile (same-process: no self-destroy)
      assert(Main.run(Seq("stop"), settings, () => spark).isRight)
      assert(!Files.exists(app.pidFile))
    } finally app.stop()
  }

  test("startproject scaffolds settings + project + test stubs (pjt_templates parity)") {
    val dir = Files.createTempDirectory("graft_pjt").toString + "/newpjt"
    val created = Main.startProject(dir)
    assert(created.size == 3)
    created.foreach(p => assert(Files.exists(java.nio.file.Paths.get(p))))
    val proj = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "Project.scala")), "UTF-8")
    assert(proj.contains("extends GraftProject"))
    val props = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "settings.properties")), "UTF-8")
    assert(props.contains("PROJECT_MODULE"))
  }

  test("unknown command is a usage error") {
    assert(Main.run(Seq("bogus"), freshSettings(), () => spark).isLeft)
  }

  test("stop handles stale and corrupt pidfiles without lying") {
    val pidFile = java.nio.file.Paths.get("graft.pid")
    try {
      // stale: a pid that cannot exist → file removed, honest message
      Files.write(pidFile, "999999999".getBytes("UTF-8"))
      val stale = Main.run(Seq("stop"), freshSettings(), () => spark)
      assert(stale.toOption.get.head.contains("not running"))
      assert(!Files.exists(pidFile))
      // corrupt: parse failure is an error, not a stack trace
      Files.write(pidFile, "not-a-pid".getBytes("UTF-8"))
      val corrupt = Main.run(Seq("stop"), freshSettings(), () => spark)
      assert(corrupt.isLeft && corrupt.swap.toOption.get.contains("corrupt"))
      assert(Files.exists(pidFile)) // retained for manual inspection
    } finally Files.deleteIfExists(pidFile)
  }
}
