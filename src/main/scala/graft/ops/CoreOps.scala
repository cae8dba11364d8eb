package graft.ops

import graft.api.Node
import graft.model.Msg
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Field-mapping rule — pypeman `MapItem` (reference: pypeman/map_item.py:6).
  * Dotted paths address nested struct fields. `transform` is a Column
  * rewrite, `default` fills when the source is null/missing — all of it
  * compiles into a single `select`, so Catalyst still prunes columns and
  * pushes the surviving references down to the scan.
  */
final case class MapItem(
    old: String = null,
    newName: String = null,
    default: Any = null,
    transform: Column => Column = identity) {

  def dest: String = if (newName != null) newName else old

  def value(df: DataFrame): Column = {
    val base =
      if (old == null) lit(null)
      else transform(old.split('.').foldLeft(null: Column) {
        case (null, p) => col(p)
        case (c, p) => c.getField(p)
      })
    if (default != null) coalesce(base, lit(default)) else base
  }
}

/** JoinMapItem (map_item.py:37): concat several source fields. */
final case class JoinMapItem(olds: Seq[String], newName: String, sep: String = "")

/** Node-equivalent transforms (pypeman/nodes.py + contrib/ctx.py), all
  * expression-level — no UDFs, no driver loops. */
object CoreOps {

  // ---- ctx family (nodes.py:114 store_input_as/store_output_as,
  //      nodes.py:396 SetCtx, contrib/ctx.py) ------------------------------

  /** Snapshot current payload+meta under `name` in the ctx map
    * (store_output_as / store_input_as). */
  def setCtx(name: String): Node = Node(s"setCtx($name)") { df =>
    df.withColumn("ctx",
      map_concat(col("ctx"),
        map(lit(name), struct(col("payload").as("payload"), col("meta").as("meta")))))
  }

  /** SetCtx node (nodes.py:396): restore payload+meta from ctx entry. */
  def useCtx(name: String): Node = Node(s"useCtx($name)") { df =>
    df.withColumn("payload", col("ctx")(name).getField("payload"))
      .withColumn("meta", col("ctx")(name).getField("meta"))
  }

  /** UseMetaFromCtx (contrib/ctx.py:65). */
  def useMetaFromCtx(name: String): Node = Node(s"useMetaFromCtx($name)") { df =>
    df.withColumn("meta", col("ctx")(name).getField("meta"))
  }

  /** EmptyMeta (contrib/ctx.py:79). */
  val emptyMeta: Node = Node("emptyMeta") { df =>
    df.withColumn("meta", map().cast(df.schema("meta").dataType))
  }

  /** CombineCtx (contrib/ctx.py:10): payload = JSON object combining the
    * named ctx payloads; meta taken from `metaFrom` (defaults to first). */
  def combineCtx(ctxNames: Map[String, String], metaFrom: String = null): Node = {
    require(ctxNames.size >= 2, "must have at least two contexts for combining")
    val mf = if (metaFrom != null) metaFrom else ctxNames.head._1
    Node(s"combineCtx(${ctxNames.keys.mkString(",")})") { df =>
      val fields = ctxNames.map { case (ctxName, dst) =>
        col("ctx")(ctxName).getField("payload").as(dst)
      }.toIndexedSeq
      df.withColumn("payload", to_json(struct(fields: _*)))
        .withColumn("meta", col("ctx")(mf).getField("meta"))
    }
  }

  // ---- payload transforms ------------------------------------------------

  /** FuncNode (nodes.py:976): column rewrite of the payload. */
  def mapPayload(name: String)(f: Column => Column): Node =
    Node.mapColumn(name, "payload")(f)

  /** Empty node (nodes.py:390): blank message, meta/ctx cleared. */
  val empty: Node = Node("empty") { df =>
    df.withColumn("payload", lit(null).cast("string"))
      .withColumn("meta", map().cast(df.schema("meta").dataType))
  }

  /** Map node (nodes.py:752): apply MapItems to top-level columns of a
    * domain DataFrame. `recopy` keeps unmapped source columns too. */
  def mapFields(items: Seq[MapItem], joins: Seq[JoinMapItem] = Nil, recopy: Boolean = false): Node =
    Node(s"mapFields") { df =>
      val mapped = items.map(i => i.value(df).as(i.dest)) ++
        joins.map(j => concat_ws(j.sep, j.olds.map(col): _*).as(j.newName))
      val extra =
        if (recopy) {
          val used = items.map(_.dest).toSet ++ joins.map(_.newName)
          df.columns.filterNot(used).map(col).toIndexedSeq
        } else Seq.empty
      df.select(mapped ++ extra: _*)
    }

  /** ToOrderedDict (nodes.py:805): ordered projection with defaults. */
  def project(keys: Seq[String], defaults: Map[String, Any] = Map.empty): Node =
    Node(s"project(${keys.mkString(",")})") { df =>
      val cols = keys.map { k =>
        val base = if (df.columns.contains(k)) col(k) else lit(null)
        defaults.get(k).map(d => coalesce(base, lit(d)).as(k)).getOrElse(base.as(k))
      }
      df.select(cols: _*)
    }

  /** YielderNode (nodes.py:914): explode an array payload into N messages,
    * meta and identity preserved. */
  def yielder(arrayCol: Column, as: String): Node = Node("yielder") { df =>
    df.withColumn(as, explode(arrayCol))
  }

  // ---- state machine -----------------------------------------------------

  def markState(state: String): Node =
    Node(s"markState($state)")(_.withColumn("state", lit(state)))

  def worstStatePerKey(keyCols: Seq[String]): Node =
    Node("worstState") { df =>
      df.groupBy(keyCols.map(col): _*)
        .agg(Msg.worstState(col("state")).as("state"))
    }
}
