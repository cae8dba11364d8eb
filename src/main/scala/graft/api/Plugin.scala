package graft.api

import org.apache.spark.sql.SparkSession

/** Plugin surface — the reference's plugin system (pypeman/plugins/base.py
  * BasePlugin, pypeman/plugin_mgr.py PluginManager): sidecar code that
  * rides along the app for monitoring/debugging without being part of the
  * channel graph. Same lifecycle and state machine, minus asyncio:
  *
  *   INITIALIZED → READY → STARTING → STARTED → STOPPED → DESTROYED
  *
  * `ready()` runs after the whole project graph is configured and before
  * anything starts (plugins/base.py:36-44); `start()` after the app's
  * serving machinery exists (do_start, :62); `stop()` before shutdown
  * (:106); `destroy()` after every plugin has stopped (:122). Hooks see
  * the live session and settings via `context`. */
abstract class Plugin {
  import Plugin._

  @volatile var status: State = Initialized
  /** set by the manager before any hook runs (the reference's set_loop). */
  @volatile var context: Context = null

  def ready(): Unit = ()
  def start(): Unit = ()
  def stop(): Unit = ()
  def destroy(): Unit = ()

  /** do_ready (plugins/base.py:36): INITIALIZED → READY. */
  final def doReady(): Unit = {
    require(status == Initialized, s"ready() from $status")
    ready()
    status = Ready
  }

  /** do_start (plugins/base.py:62): READY → STARTING → STARTED. */
  final def doStart(): Unit = {
    require(status == Ready, s"start() from $status")
    status = Starting
    start()
    status = Started
  }

  /** do_stop (plugins/base.py:106): STARTED → STOPPED; stopping a plugin
    * that never started is a no-op, like the reference's INITIALIZED
    * branch. */
  final def doStop(): Unit =
    if (status == Started) {
      stop()
      status = Stopped
    }

  /** do_destroy (plugins/base.py:122): any non-running state → DESTROYED.
    * READY and STARTING are destroyable because a boot can fail between
    * ready and started — those plugins still own whatever ready()/start()
    * acquired so far and must get their destroy() hook. Only a STARTED
    * plugin must be stopped first, and double-destroy is rejected. */
  final def doDestroy(): Unit = {
    require(status != Started && status != Destroyed, s"destroy() from $status")
    destroy()
    status = Destroyed
  }
}

object Plugin {
  sealed abstract class State(val name: String) { override def toString: String = name }
  case object Initialized extends State("INITIALIZED")
  case object Ready extends State("READY")
  case object Starting extends State("STARTING")
  case object Started extends State("STARTED")
  case object Stopped extends State("STOPPED")
  case object Destroyed extends State("DESTROYED")

  final case class Context(spark: SparkSession, settings: Settings)
}

/** The remote admin as a plugin — plugins/remoteadmin/plugin.py
  * RemoteAdminPlugin, the reference's own packaging of its admin server
  * (issue #149 moved it out of main() into the plugin system): the HTTP
  * app is assembled at ready() (urls.init_urls analog), the socket binds
  * at start(), and stop() tears it down. Channel→store bindings mirror
  * the reference views' global-registry lookup: every channel registered
  * in [[Channels]] gets a durable store under the settings' STORE_PATH.
  * Configure host/port via REMOTE_ADMIN_HOST/PORT. */
final class RemoteAdminPlugin extends Plugin {
  private var endpoint: graft.net.HttpEndpoint = null
  private var _admin: RemoteAdmin = null

  def admin: RemoteAdmin = _admin
  def adminUrl: String = endpoint.url("/rpc")

  override def ready(): Unit = {
    val s = context.settings
    _admin = new RemoteAdmin(context.spark)
    s.storePath.foreach { base =>
      Channels.all.foreach { c =>
        _admin.bind(c.name, new graft.store.MessageStore(context.spark, s"$base/${c.name}"))
      }
    }
    endpoint = new graft.net.HttpEndpoint(
      context.spark, s.remoteAdminHost, s.remoteAdminPort)
    _admin.serve(endpoint)
  }

  override def start(): Unit = endpoint.start()
  override def stop(): Unit = endpoint.stop()
}

/** plugin_mgr.py PluginManager: resolves the settings' PLUGINS class list,
  * instantiates, and drives every plugin through the shared lifecycle.
  * Instantiation is by reflective FQCN — the analog of the reference's
  * `import_module` + getattr (plugin_mgr.py:38-43). */
final class PluginManager {

  private var pluginClasses = Vector.empty[Class[_]]
  private var _plugins = Vector.empty[Plugin]

  def plugins: Seq[Plugin] = _plugins

  /** import_plugins (plugin_mgr.py:33): resolve classes once. */
  def importPlugins(settings: Settings): Unit =
    if (pluginClasses.isEmpty)
      pluginClasses = settings.plugins.map(Class.forName).toVector

  /** init_plugins (plugin_mgr.py:45): stop+destroy any previous
    * generation — EVERY member, whatever state its boot reached — then
    * instantiate fresh. */
  def initPlugins(ctx: Plugin.Context): Unit = {
    _plugins.foreach(_.doStop())
    _plugins.filterNot(_.status == Plugin.Destroyed).foreach(_.doDestroy())
    _plugins = pluginClasses.map { c =>
      val p = c.getDeclaredConstructor().newInstance().asInstanceOf[Plugin]
      p.context = ctx
      p
    }
  }

  def readyPlugins(): Unit = _plugins.foreach(_.doReady())
  def startPlugins(): Unit = _plugins.foreach(_.doStart())
  def stopPlugins(): Unit = _plugins.foreach(_.doStop())
  def destroyPlugins(): Unit = _plugins.foreach(_.doDestroy())

  /** Best-effort full teardown for a FAILED boot: stop whatever started,
    * destroy every plugin whatever state its boot reached — so resources
    * acquired in ready()/start() get their cleanup hooks even when the
    * manager is about to be discarded. */
  def teardownPlugins(): Unit = {
    _plugins.foreach(p => try p.doStop() catch { case _: Exception => () })
    _plugins.filterNot(_.status == Plugin.Destroyed)
      .foreach(p => try p.doDestroy() catch { case _: Exception => () })
  }
}
