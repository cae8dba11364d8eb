package graft

import graft.api.{Plugin, PluginManager, Settings}

/** A recording plugin: every lifecycle hook appends to a shared journal
  * (static, because the manager instantiates the class reflectively). */
final class JournalPlugin extends Plugin {
  override def ready(): Unit = JournalPlugin.log("ready")
  override def start(): Unit = {
    assert(context != null && context.spark != null) // hooks see the session
    JournalPlugin.log("start")
  }
  override def stop(): Unit = JournalPlugin.log("stop")
  override def destroy(): Unit = JournalPlugin.log("destroy")
}

object JournalPlugin {
  private val journal = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def log(e: String): Unit = journal.add(e)
  def events: Seq[String] = { import scala.jdk.CollectionConverters._; journal.asScala.toSeq }
  def clear(): Unit = journal.clear()
}

final class ExplodingPlugin extends Plugin {
  override def start(): Unit = sys.error("boom")
}

/** Plugin lifecycle parity (pypeman/plugins/base.py state machine,
  * plugin_mgr.py manager flow). */
class PluginSpec extends SparkSpec {

  private def settingsWith(plugins: String*): Settings = Settings(
    projectModule = classOf[SampleProject].getName,
    remoteAdminHost = "127.0.0.1",
    remoteAdminPort = 0,
    storePath = Some(java.nio.file.Files.createTempDirectory("graft_plg").toString + "/msgs"),
    plugins = plugins)

  test("manager drives the full lifecycle in order with state transitions") {
    JournalPlugin.clear()
    val mgr = new PluginManager
    mgr.importPlugins(settingsWith(classOf[JournalPlugin].getName))
    mgr.initPlugins(Plugin.Context(spark, settingsWith()))
    val p = mgr.plugins.head
    assert(p.status == Plugin.Initialized)
    mgr.readyPlugins()
    assert(p.status == Plugin.Ready)
    mgr.startPlugins()
    assert(p.status == Plugin.Started)
    mgr.stopPlugins()
    assert(p.status == Plugin.Stopped)
    mgr.destroyPlugins()
    assert(p.status == Plugin.Destroyed)
    assert(JournalPlugin.events == Seq("ready", "start", "stop", "destroy"))
  }

  test("state machine rejects out-of-order transitions (base.py asserts)") {
    val p = new Plugin {} // bare plugin: no context needed off-manager
    intercept[IllegalArgumentException](p.doStart()) // must be READY first
    p.doReady()
    intercept[IllegalArgumentException](p.doReady()) // no double ready
    p.doStart()
    intercept[IllegalArgumentException](p.doDestroy()) // must stop first
    p.doStop()
    p.doStop() // idempotent, like the reference's INITIALIZED no-op branch
    p.doDestroy()
  }

  test("init_plugins replaces a previous generation after stopping it") {
    JournalPlugin.clear()
    val mgr = new PluginManager
    mgr.importPlugins(settingsWith(classOf[JournalPlugin].getName))
    val ctx = Plugin.Context(spark, settingsWith())
    mgr.initPlugins(ctx)
    mgr.readyPlugins(); mgr.startPlugins()
    val gen1 = mgr.plugins.head
    mgr.initPlugins(ctx) // stops + destroys gen1, makes a fresh instance
    assert(gen1.status == Plugin.Destroyed)
    assert(mgr.plugins.head ne gen1)
    assert(mgr.plugins.head.status == Plugin.Initialized)
  }

  test("re-init destroys a generation that only reached READY (failed boot)") {
    JournalPlugin.clear()
    val mgr = new PluginManager
    mgr.importPlugins(settingsWith(classOf[JournalPlugin].getName))
    val ctx = Plugin.Context(spark, settingsWith())
    mgr.initPlugins(ctx)
    mgr.readyPlugins() // boot dies between ready and start
    val gen1 = mgr.plugins.head
    mgr.initPlugins(ctx)
    assert(gen1.status == Plugin.Destroyed, "READY gen must still be destroyed")
    assert(JournalPlugin.events == Seq("ready", "destroy"))
  }

  test("settings PLUGINS key: comma-separated FQCNs reach Main.startApp") {
    JournalPlugin.clear()
    val app = Main.startApp(
      settingsWith(classOf[JournalPlugin].getName), spark)
    try {
      assert(JournalPlugin.events == Seq("ready", "start"))
      assert(app.pluginMgr.plugins.head.status == Plugin.Started)
    } finally app.stop()
    assert(JournalPlugin.events == Seq("ready", "start", "stop"))
  }

  test("RemoteAdminPlugin serves the admin RPC as a plugin (reference plugin.py parity)") {
    import graft.api.RemoteAdminPlugin
    val settings = settingsWith(classOf[RemoteAdminPlugin].getName)
    val app = Main.startApp(settings, spark)
    try {
      val plugin = app.pluginMgr.plugins.collectFirst { case p: RemoteAdminPlugin => p }.get
      assert(plugin.status == Plugin.Started)
      // the plugin's OWN socket (distinct from the app's main admin port)
      val client = new graft.api.RemoteAdminClient(plugin.adminUrl)
      val chans = client.channels()
      assert(chans.size() == 1 && chans.get(0).get("name").asText() == "sample")
      // push_msg drives the channel end-to-end over the plugin socket
      val pushed = client.pushMsg("sample", "via plugin")
      assert(pushed.get("payload").asText() == "VIA PLUGIN")
    } finally app.stop()
  }

  test("a plugin that fails to start surfaces the error (nothing swallowed)") {
    val mgr = new PluginManager
    mgr.importPlugins(settingsWith(classOf[ExplodingPlugin].getName))
    mgr.initPlugins(Plugin.Context(spark, settingsWith()))
    mgr.readyPlugins()
    intercept[RuntimeException](mgr.startPlugins())
    // the failed plugin is stuck in STARTING; re-init must still replace
    // it (STARTING is destroyable — the boot died inside start())
    val gen1 = mgr.plugins.head
    assert(gen1.status == Plugin.Starting)
    mgr.initPlugins(Plugin.Context(spark, settingsWith()))
    assert(gen1.status == Plugin.Destroyed)
    assert(mgr.plugins.head.status == Plugin.Initialized)
  }
}
