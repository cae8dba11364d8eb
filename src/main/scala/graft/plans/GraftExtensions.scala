package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's native expressions as SQL
  * functions, so `spark.sql("SELECT vec_cosine(a, b) …")` works alongside
  * the Column API:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  *   // or: spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", name)

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => DotProduct(es(0), es(1))),
    "vec_cosine" -> (es => CosineSimilarity(es(0), es(1))),
    "vec_l2sq" -> (es => L2SquaredDistance(es(0), es(1))),
    "nearest_centroid" -> (es => NearestCentroid(es(0), es(1), es(2))),
    "nearest_centroids" -> (es => NearestCentroids(es(0), es(1), es(2),
      es(3).eval().asInstanceOf[Int])),
    "word_shingles" -> (es => WordShingles(es(0),
      es(1).eval().asInstanceOf[Int])),
    "minhash_sig" -> (es => MinHashSig(es(0), es(1).eval().asInstanceOf[Int])),
    "simhash64" -> (es => SimHash64(es(0))),
    "repetition_profile" -> (es => RepetitionProfile(es(0),
      es(1).eval().asInstanceOf[Int])),
    "jpeg_meta" -> (es => JpegMeta(es(0))),
    "mp4_meta" -> (es => Mp4Meta(es(0))),
    "greedy_pieces" -> (es => GreedyPieces(es(0),
      GraftExtensions.stringArrayLiteral(es(1)))),
    "merge_pair" -> (es => MergePair(es(0),
      GraftExtensions.stringLiteral(es(1)), GraftExtensions.stringLiteral(es(2)))),
    "vec_mean" -> (es => VecMean(es(0))),
    "mg_sketch" -> (es => MgSketch(es(0), es(1).eval().asInstanceOf[Int])),
    "lcp_at" -> (es => LcpAt(es(0), es(1), es(2))),
    "jaro_winkler" -> (es => JaroWinkler(es(0), es(1))),
    "lcp_pair" -> (es => LcpPair(es(0), es(1))),
    "winnow_fps" -> (es => WinnowFingerprints(es(0),
      es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int],
      es(3).eval().asInstanceOf[Int])))

  override def apply(e: SparkSessionExtensions): Unit = {
    fns.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name), info(name, name), builder))
    }
    // interval-join binning rewrite (active only when
    // spark.graft.rangeJoin.binWidth is set — see RangeJoinRule)
    e.injectOptimizerRule(_ => RangeJoinRule())
    // physical planning for the native as-of join node (AsOfJoin.scala)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.unsafe.types.UTF8String

  /** Fold a foldable string argument (SQL literal) to a Scala String. */
  private[plans] def stringLiteral(e: Expression): String =
    e.eval().asInstanceOf[UTF8String].toString

  /** Fold a foldable array<string> argument to Seq[String]. */
  private[plans] def stringArrayLiteral(e: Expression): Seq[String] = {
    val a = e.eval().asInstanceOf[ArrayData]
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }
}
