package graft

import graft.api.{Channels, GraftProject, RemoteAdmin, Settings}
import org.apache.spark.sql.SparkSession

/** The deployable CLI — the reference's `pypeman` command group
  * (commands.py:225-419): `start` boots the project's channels and serves
  * the remote-admin RPC on a live socket, `stop` terminates a started
  * instance via its pidfile (mk_daemon, commands.py:208), `graph` prints
  * the channel topology, `printsettings` dumps resolved settings,
  * `startproject` scaffolds a new project (pjt_templates.py:4-40).
  *
  * `start` here is foreground-with-pidfile rather than a double-fork
  * daemon: cluster deploys run under a supervisor (spark-submit,
  * Kubernetes, systemd) that owns daemonization — a self-forking JVM
  * would fight it. The pidfile keeps `stop` parity for bare-metal use. */
object Main {

  final case class RunningApp(
      settings: Settings,
      admin: RemoteAdmin,
      endpoint: graft.net.HttpEndpoint,
      pidFile: java.nio.file.Path,
      pluginMgr: graft.api.PluginManager) {
    /** ws://host:port analog — the admin RPC URL a client connects to. */
    def adminUrl: String = endpoint.url("/rpc")
    def stop(): Unit = {
      pluginMgr.stopPlugins() // before the loop stops, like main()'s teardown
      endpoint.stop()
      java.nio.file.Files.deleteIfExists(pidFile)
    }
  }

  def main(args: Array[String]): Unit = {
    val out = run(args.toSeq, Settings.load(), () => GraftSession.local())
    out match {
      case Right(lines) => lines.foreach(println)
      case Left(err) => System.err.println(err); sys.exit(1)
    }
  }

  /** Dispatch one CLI invocation. Injectable settings/session for specs;
    * `start` blocks until the endpoint is externally stopped (SIGTERM via
    * `stop`, or supervisor kill), every other command returns its output
    * lines. */
  def run(
      args: Seq[String],
      settings: Settings,
      session: () => SparkSession): Either[String, Seq[String]] =
    args match {
      case Seq("start", rest @ _*) =>
        val app = startApp(settings, session())
        if (!rest.contains("--no-wait")) awaitStopped(app)
        Right(Seq(s"started; admin rpc at ${app.adminUrl}"))
      case Seq("stop") => stopByPidFile()
      case Seq("graph", rest @ _*) =>
        Right(graphLines(settings, session(), dot = rest.contains("--dot")))
      case Seq("printsettings") => Right(settings.printLines)
      case Seq("startproject", dirname) => Right(startProject(dirname))
      case Seq("viewstore", storePath, rest @ _*) =>
        toolRun(rest)(f => viewStore(session(), storePath, f))
      case Seq("sendfromstore", storePath, rest @ _*) =>
        toolRun(rest)(f => sendFromStore(session(), storePath, f,
          optArg(rest, "--destination", "-d").getOrElse("http://localhost:8000")))
      case other =>
        Left(s"unknown command '${other.mkString(" ")}'; " +
          "expected start|stop|graph|printsettings|startproject|viewstore|sendfromstore")
    }

  // ---- pypeman-tools commands (tool_commands.py, pypeman/tools/) ---------

  /** Repeated `--filter`/`-f name=value` payload-field equality filters
    * (tools/view_store.py:12 Filter: match payload[name] == literal).
    * Values may be shell-quoted ('x' or "x") like the reference's
    * literal_eval forms; scalars compare against the JSON text. */
  private def toolFilters(rest: Seq[String]): Seq[(String, String)] = {
    // a trailing flag has no sliding-2 window and would be silently
    // dropped; malformed input must produce the usage error instead
    if (rest.lastOption.exists(k => k == "--filter" || k == "-f"))
      throw new IllegalArgumentException(
        s"dangling '${rest.last}'; expected name=value")
    rest.sliding(2).collect {
      case Seq(k, kv) if k == "--filter" || k == "-f" =>
        kv.split("=", 2) match {
          case Array(name, raw) =>
            val v = raw.trim
            val unq = if ((v.startsWith("'") && v.endsWith("'") && v.length >= 2) ||
              (v.startsWith("\"") && v.endsWith("\"") && v.length >= 2))
              v.substring(1, v.length - 1) else v
            name -> unq
          case _ => throw new IllegalArgumentException(
            s"bad --filter '$kv'; expected name=value")
        }
    }.toSeq
  }

  /** Parse the tool filters and run `body`; malformed arguments become a
    * usage Left instead of a stack trace. */
  private def toolRun(rest: Seq[String])(
      body: Seq[(String, String)] => Seq[String]): Either[String, Seq[String]] =
    try Right(body(toolFilters(rest)))
    catch { case e: IllegalArgumentException => Left(e.getMessage) }

  private def optArg(rest: Seq[String], keys: String*): Option[String] =
    rest.sliding(2).collectFirst { case Seq(k, v) if keys.contains(k) => v }

  private def filteredStore(
      spark: SparkSession, storePath: String,
      filters: Seq[(String, String)]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, get_json_object, lit}
    val base = new graft.store.MessageStore(spark, storePath).all()
    filters.foldLeft(base) { case (df, (name, v)) =>
      df.filter(get_json_object(col("payload"), "$." + name) === lit(v))
    }
  }

  /** `pypeman-tools view_store` (tools/view_store.py): print `id payload`
    * for each store entry passing the filters, in store order. The filter
    * runs as a pushed-down columnar scan; the print is the CLI's terminal
    * step (operator-bounded, like the admin views). */
  def viewStore(
      spark: SparkSession, storePath: String,
      filters: Seq[(String, String)]): Seq[String] = {
    import org.apache.spark.sql.functions.col
    filteredStore(spark, storePath, filters)
      .orderBy(col("ts"), col("uuid"))
      .select(col("uuid"), col("payload"))
      .collect().toSeq.map(r => s"${r.getString(0)} ${r.getString(1)}")
  }

  /** `pypeman-tools send_from_store` (tools/send_from_store.py): POST each
    * matching entry's payload to `destination`, partition-parallel over the
    * store scan via the HttpRequest node's transport seam. Returns the
    * reference's `send <id> to <url>` line per message plus the response
    * status. */
  def sendFromStore(
      spark: SparkSession, storePath: String,
      filters: Seq[(String, String)], destination: String,
      transport: graft.net.HttpTransport = graft.net.JdkHttpTransport): Seq[String] = {
    import org.apache.spark.sql.functions.{col, element_at}
    val sent = graft.net.Http
      .request(transport, url = destination, method = "post")
      .fn(filteredStore(spark, storePath, filters))
    // NO orderBy on the side-effecting frame: a range sort samples its
    // child first, which would execute the POST stage twice. Collect the
    // slim (id, status) projection and sort the report lines driver-side.
    sent.select(col("uuid"), element_at(col("meta"), "status_code"))
      .collect().toSeq.sortBy(_.getString(0))
      .map(r => s"send ${r.getString(0)} to $destination [${r.getString(1)}]")
  }

  /** commands.py:265 start → main (commands.py:81): load the project,
    * start its channels, mount the remote admin on a live socket, record
    * the pid. Returns the running handle (specs drive it; `run` blocks on
    * it like the reference's event loop). */
  def startApp(settings: Settings, spark: SparkSession): RunningApp = {
    // production state backend, settings-selected (STATE_STORE=rocksdb /
    // GRAFT_STATE_STORE=rocksdb): must be set BEFORE any channel starts —
    // the provider conf is read per streaming query at .start(), and the
    // checkpoint pins the choice afterwards (GraftSession scaladoc)
    if (settings.stateStore == "rocksdb")
      graft.GraftSession.useRocksDBStateStore(spark)
    val project = GraftProject.load(settings.projectModule)
    val stores = project.configure(spark, settings)
    // plugin lifecycle mirrors commands.py main(): import/init, ready after
    // the graph is configured, start before channels serve
    val pluginMgr = new graft.api.PluginManager
    pluginMgr.importPlugins(settings)
    pluginMgr.initPlugins(graft.api.Plugin.Context(spark, settings))
    val admin = new RemoteAdmin(spark)
    stores.foreach { case (chan, store) => admin.bind(chan, store) }
    val endpoint = new graft.net.HttpEndpoint(
      spark, settings.remoteAdminHost, settings.remoteAdminPort)
    try {
      pluginMgr.readyPlugins()
      admin.serve(endpoint)
      endpoint.start()
      pluginMgr.startPlugins()
      // reference main() starts every registered channel (commands.py:116)
      Channels.all.foreach(c => admin.startChannel(c.name))
      val pidFile = java.nio.file.Paths.get("graft.pid")
      java.nio.file.Files.write(pidFile,
        String.valueOf(ProcessHandle.current().pid()).getBytes("UTF-8"))
      RunningApp(settings, admin, endpoint, pidFile, pluginMgr)
    } catch {
      // a failed boot must not leak a bound port serving RPC with no
      // handle and no pidfile to stop it with — and every plugin gets its
      // stop/destroy hooks for whatever ready()/start() acquired
      case e: Throwable =>
        try endpoint.stop() catch { case _: Exception => () }
        pluginMgr.teardownPlugins()
        throw e
    }
  }

  private def awaitStopped(app: RunningApp): Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => app.stop()))
    while (java.nio.file.Files.exists(app.pidFile)) Thread.sleep(500)
    app.stop()
  }

  /** commands.py:318 stop: signal the instance recorded in the pidfile.
    * Removing the pidfile also stops a foreground `start` loop, so stop
    * works for both deployment shapes. */
  private def stopByPidFile(): Either[String, Seq[String]] = {
    val pidFile = java.nio.file.Paths.get("graft.pid")
    if (!java.nio.file.Files.exists(pidFile)) Left("no graft.pid — not running?")
    else {
      val raw = new String(java.nio.file.Files.readAllBytes(pidFile), "UTF-8").trim
      raw.toLongOption match {
        case None => Left(s"graft.pid is corrupt ('$raw') — remove it manually")
        case Some(pid) if pid == ProcessHandle.current().pid() =>
          // our own pid: removing the file stops the foreground wait loop
          java.nio.file.Files.deleteIfExists(pidFile)
          Right(Seq(s"stopped pid $pid"))
        case Some(pid) =>
          // signal FIRST and check the result — the pidfile is only
          // removed once the termination request was actually accepted
          val h = ProcessHandle.of(pid)
          if (!h.isPresent) {
            java.nio.file.Files.deleteIfExists(pidFile)
            Right(Seq(s"pid $pid not running; removed stale graft.pid"))
          } else if (h.get.destroy()) {
            java.nio.file.Files.deleteIfExists(pidFile)
            Right(Seq(s"stopped pid $pid"))
          } else {
            Left(s"could not signal pid $pid — graft.pid retained")
          }
      }
    }
  }

  /** commands.py:313 graph / --dot: print each channel's topology. */
  def graphLines(settings: Settings, spark: SparkSession, dot: Boolean): Seq[String] = {
    GraftProject.load(settings.projectModule).configure(spark, settings)
    if (dot)
      Seq("digraph testgraph{") ++
        Channels.all.flatMap(_.graphDot) ++ Seq("}")
    else Channels.all.flatMap(c => s"${c.name}:" +: c.graph().linesIterator.toSeq)
  }

  /** startproject (pjt_templates.py:4-40): scaffold settings + project +
    * test stubs into `dirname`. Returns the created paths. */
  def startProject(dirname: String): Seq[String] = {
    val dir = java.nio.file.Paths.get(dirname)
    java.nio.file.Files.createDirectories(dir)
    def write(name: String, content: String): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p, content.getBytes("UTF-8"))
      p.toString
    }
    Seq(
      write("settings.properties",
        """# graft project settings (see graft.api.Settings for keys)
          |DEBUG = false
          |PROJECT_MODULE = project.Project
          |REMOTE_ADMIN_HOST = localhost
          |REMOTE_ADMIN_PORT = 8091
          |""".stripMargin),
      write("Project.scala",
        """package project
          |
          |import graft.api.{Channel, Channels, GraftProject, Settings}
          |import graft.ops.CoreOps
          |import graft.store.MessageStore
          |import org.apache.spark.sql.SparkSession
          |
          |/** Example project: one channel with a durable message store. */
          |final class Project extends GraftProject {
          |  def configure(spark: SparkSession, settings: Settings): Map[String, MessageStore] = {
          |    val chan = Channels.register(
          |      Channel("example").add(CoreOps.mapPayload("upper")(org.apache.spark.sql.functions.upper)))
          |    val store = new MessageStore(spark, settings.storePath.getOrElse("./store/example"))
          |    Map(chan.name -> store)
          |  }
          |}
          |""".stripMargin),
      write("ProjectSpec.scala",
        """package project
          |
          |// Test stub (pjt_templates tests.py analog): drive the channel
          |// through Channel.run and assert on the main output.
          |""".stripMargin))
  }
}
