package graft.api

import org.apache.spark.sql.SparkSession

/** Project settings — the reference's conf.py `Settings` +
  * default_settings.py, re-expressed as layered key resolution instead of
  * a Python module import: defaults ← properties file (path named by the
  * `GRAFT_SETTINGS` env var or passed explicitly) ← `GRAFT_*` environment
  * overrides. The reference resolves its settings the same way, with
  * `PYPEMAN_SETTINGS_MODULE` naming a module whose UPPERCASE attributes
  * override default_settings (conf.py:40-64); env vars like PYPEMAN_DEBUG
  * override both (default_settings.py:6-7). Key names are kept. */
final case class Settings(
    debug: Boolean = false,
    testing: Boolean = false,
    /** FQCN of a [[GraftProject]] — the reference's PROJECT_MODULE
      * (default_settings.py:9), an import path there, a class name here. */
    projectModule: String = "project.Project",
    remoteAdminHost: String = "localhost",
    remoteAdminPort: Int = 8091,
    httpEndpointHost: String = "0.0.0.0",
    httpEndpointPort: Int = 8080,
    retryStorePath: Option[String] = None,
    storePath: Option[String] = None,
    /** FQCNs of [[Plugin]] classes — the reference's PLUGINS list
      * (default_settings.py:31), comma-separated in properties/env. */
    plugins: Seq[String] = Seq.empty,
    /** Streaming state-store backend: "default" (Spark's HDFS-backed
      * heap provider) or "rocksdb" (the production backend —
      * [[graft.GraftSession.useRocksDBStateStore]]; disk-bounded LSM
      * state instead of every key on executor heap). A deployed
      * `graft.Main start` app flips it via `GRAFT_STATE_STORE=rocksdb`
      * or `STATE_STORE=rocksdb` in the settings file — the reference's
      * deployed watcher channels (channels.py:1306) pick their
      * persistence the same settings-level way. */
    stateStore: String = "default",
    /** unrecognized keys pass through untouched, like extra UPPERCASE
      * attributes on a reference settings module. */
    extra: Map[String, String] = Map.empty) {

  /** printsettings lines (commands.py:326-334): `NAME = value`, sorted. */
  def printLines: Seq[String] = {
    val kv = Map(
      "DEBUG" -> debug.toString,
      "TESTING" -> testing.toString,
      "PROJECT_MODULE" -> projectModule,
      "REMOTE_ADMIN_HOST" -> remoteAdminHost,
      "REMOTE_ADMIN_PORT" -> remoteAdminPort.toString,
      "HTTP_ENDPOINT_HOST" -> httpEndpointHost,
      "HTTP_ENDPOINT_PORT" -> httpEndpointPort.toString,
      "RETRY_STORE_PATH" -> retryStorePath.getOrElse("None"),
      "STORE_PATH" -> storePath.getOrElse("None"),
      "STATE_STORE" -> stateStore,
      "PLUGINS" -> plugins.mkString("[", ", ", "]")) ++ extra
    kv.toSeq.sortBy(_._1).map { case (k, v) => s"$k = $v" }
  }
}

object Settings {

  private val known = Set(
    "DEBUG", "TESTING", "PROJECT_MODULE", "REMOTE_ADMIN_HOST",
    "REMOTE_ADMIN_PORT", "HTTP_ENDPOINT_HOST", "HTTP_ENDPOINT_PORT",
    "RETRY_STORE_PATH", "STORE_PATH", "STATE_STORE", "PLUGINS")

  /** Layered load. `env` is injectable for tests; the real CLI passes
    * sys.env. Missing file → ConfigError, like the reference's
    * "Can't import settings module" (conf.py:47-51). */
  def load(
      propsPath: Option[String] = sys.env.get("GRAFT_SETTINGS"),
      env: Map[String, String] = sys.env.toMap): Settings = {
    val props = new java.util.Properties()
    propsPath.foreach { p =>
      val f = new java.io.File(p)
      if (!f.exists())
        throw new IllegalArgumentException(s"Can't load settings file '$p'!")
      val in = new java.io.FileInputStream(f)
      try props.load(in) finally in.close()
    }
    def get(key: String): Option[String] =
      env.get("GRAFT_" + key).orElse(Option(props.getProperty(key)))
    def bool(key: String, dflt: Boolean): Boolean =
      get(key).map(v => v == "1" || v.equalsIgnoreCase("true")).getOrElse(dflt)
    val d = Settings()
    import scala.jdk.CollectionConverters._
    Settings(
      debug = bool("DEBUG", d.debug),
      testing = bool("TESTING", d.testing),
      projectModule = get("PROJECT_MODULE").getOrElse(d.projectModule),
      remoteAdminHost = get("REMOTE_ADMIN_HOST").getOrElse(d.remoteAdminHost),
      remoteAdminPort = get("REMOTE_ADMIN_PORT").map(_.toInt).getOrElse(d.remoteAdminPort),
      httpEndpointHost = get("HTTP_ENDPOINT_HOST").getOrElse(d.httpEndpointHost),
      httpEndpointPort = get("HTTP_ENDPOINT_PORT").map(_.toInt).getOrElse(d.httpEndpointPort),
      retryStorePath = get("RETRY_STORE_PATH"),
      storePath = get("STORE_PATH"),
      stateStore = get("STATE_STORE").map(_.trim.toLowerCase) match {
        case Some(v @ ("default" | "rocksdb")) => v
        case Some(other) => throw new IllegalArgumentException(
          s"STATE_STORE must be 'default' or 'rocksdb', got '$other'")
        case None => d.stateStore
      },
      plugins = get("PLUGINS").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
      extra = props.stringPropertyNames().asScala.toSeq
        .filterNot(known).map(k => k -> props.getProperty(k)).toMap)
  }
}

/** A deployable graft project — the reference's project.py module body
  * (pjt_templates.py:18-33), which instantiates channels against the
  * settings. `configure` registers channels into [[Channels]] and returns
  * the channel-name → message-store bindings the admin surface serves. */
trait GraftProject {
  def configure(spark: SparkSession, settings: Settings): Map[String, graft.store.MessageStore]
}

object GraftProject {
  /** Reflective load of the settings-named project class — the analog of
    * `importlib.import_module(PROJECT_MODULE)` (commands.py load_project /
    * conf.py:45). */
  def load(fqcn: String): GraftProject =
    Class.forName(fqcn).getDeclaredConstructor().newInstance() match {
      case p: GraftProject => p
      case other => throw new IllegalArgumentException(
        s"$fqcn is not a GraftProject (got ${other.getClass.getName})")
    }
}
