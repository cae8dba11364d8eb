package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math.
  *
  * The composable route (`zip_with` + `aggregate`) evaluates higher-order
  * lambdas interpretively per element — fine for occasional use, too slow
  * for 10^11-row similarity scans. These expressions generate a tight Java
  * loop (whole-stage codegen), accumulate in double, and accept float or
  * double array inputs without a materialized cast pass.
  *
  * Fold order is left-to-right, identical to the `aggregate`-based
  * formulation, so results are bit-for-bit unchanged (oracle parity).
  * Arrays are assumed non-null-element (embedding columns).
  */
abstract class VectorBinaryExpression extends BinaryExpression {

  override def dataType: DataType = DoubleType

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, " +
          s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  @inline protected final def get(a: ArrayData, t: DataType, i: Int): Double =
    t match {
      case DoubleType => a.getDouble(i)
      case FloatType => a.getFloat(i).toDouble
      case _ => throw new IllegalStateException("unreachable")
    }

  /** Java accessor snippet for codegen. */
  protected final def getter(arr: String, t: DataType, i: String): String =
    t match {
      case DoubleType => s"$arr.getDouble($i)"
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => throw new IllegalStateException("unreachable")
    }
}

/** dot(a, b) = Σ a_i·b_i */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += get(a, ta, i) * get(b, tb, i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ${getter(a, elemType(left), i)} * ${getter(b, elemType(right), i)};
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (‖a‖·‖b‖), one fused pass. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, ta, i); val y = get(b, tb, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${getter(a, elemType(left), i)};
         |  double $y = ${getter(b, elemType(right), i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Squared L2 distance = Σ (a_i−b_i)². */
case class L2SquaredDistance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_l2sq"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { val d = get(a, ta, i) - get(b, tb, i); acc += d * d; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${getter(a, elemType(left), i)} - ${getter(b, elemType(right), i)};
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** argmin_cid ‖vec − centroids[i]‖² — nearest-centroid assignment against a
  * constant centroid matrix, as ONE expression with a codegen'd double loop.
  *
  * This replaces the `least(struct(vec_l2sq(v, lit...), cid)...)` argmin
  * (round-2 Ann.assignTo), which inlined O(nlist × dims) literal expression
  * nodes into the projection: ideal at nlist=16, but past a few hundred
  * lists the generated method blows the JVM/Janino 64KB limit and Catalyst
  * analysis cost grows with plan size. Here the matrix is ONE 2-D array
  * literal (a codegen *reference*, not inline code), so plan size and
  * generated-code size are constant in nlist — nlist=10⁴⁺ (the 100 TB IVF
  * regime, nlist ~ √n) compiles to the same tight loop as nlist=16.
  *
  * Semantics are bit-identical to the old argmin: per-centroid L2² is the
  * same left-to-right double accumulation as [[L2SquaredDistance]]; the
  * scan takes the FIRST strict minimum, and `cids` is sorted ascending, so
  * distance ties resolve to the smallest cid — exactly the
  * `least(struct(dist, cid))` lexicographic order (oracle parity for
  * q_ann_ivf).
  *
  * @param vec       array<float|double> row vector
  * @param centroids array<array<double>> literal, row i = centroid i
  * @param cids      array<long> literal, sorted ascending, cid of row i
  */
case class NearestCentroid(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  def vec: Expression = first
  def centroids: Expression = second
  def cids: Expression = third

  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = LongType

  private def vecElemType: DataType =
    first.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val okVec = first.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val okCents = second.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    val okCids = third.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (okVec && okCents && okCids)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, array<array<double>>, array<long>), " +
          s"got (${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
          s"${third.dataType.simpleString})")
  }

  override def nullSafeEval(v: Any, cs: Any, ids: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val cents = cs.asInstanceOf[ArrayData]
    val cids = ids.asInstanceOf[ArrayData]
    val t = vecElemType
    var best = 0
    var bestD = Double.PositiveInfinity
    var ci = 0
    while (ci < cents.numElements()) {
      val cv = cents.getArray(ci)
      val n = math.min(vec.numElements(), cv.numElements())
      var acc = 0.0
      var j = 0
      while (j < n) {
        val d = (t match {
          case DoubleType => vec.getDouble(j)
          case _ => vec.getFloat(j).toDouble
        }) - cv.getDouble(j)
        acc += d * d
        j += 1
      }
      if (acc < bestD) { bestD = acc; best = ci }
      ci += 1
    }
    cids.getLong(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs, ids) => {
      val ci = ctx.freshName("ci")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val cv = ctx.freshName("cv")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val getV = vecElemType match {
        case DoubleType => s"$v.getDouble($j)"
        case _ => s"(double) $v.getFloat($j)"
      }
      s"""
         |int $best = 0;
         |double $bestD = Double.POSITIVE_INFINITY;
         |for (int $ci = 0; $ci < $cs.numElements(); $ci++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $cs.getArray($ci);
         |  int $n = java.lang.Math.min($v.numElements(), $cv.numElements());
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    double $d = $getV - $cv.getDouble($j);
         |    $acc += $d * $d;
         |  }
         |  if ($acc < $bestD) { $bestD = $acc; $best = $ci; }
         |}
         |${ev.value} = $ids.getLong($best);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** The `nprobe` nearest centroids (ascending distance, ties → smaller cid)
  * against a constant centroid matrix — the multi-probe companion of
  * [[NearestCentroid]], used to explode IVF probes to their candidate cells
  * without a per-centroid literal blow-up. Same constant-plan-size contract:
  * the matrix is ONE 2-D literal, the selection is a codegen'd insertion
  * sort over an nprobe-slot buffer (nprobe ≪ nlist, typically ≤ 32).
  *
  * Per-centroid L2² is the same left-to-right accumulation as
  * [[L2SquaredDistance]]; insertion uses strict `<` and `cids` is sorted
  * ascending, so distance ties keep the smaller cid at the better rank —
  * the exact order of `ORDER BY dist, cid LIMIT nprobe` (oracle parity).
  *
  * @param nprobe number of cells to return, capped at the centroid count
  */
case class NearestCentroids(
    first: Expression, second: Expression, third: Expression, nprobe: Int)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  require(nprobe > 0, "nprobe must be positive")

  def vec: Expression = first
  def centroids: Expression = second
  def cids: Expression = third

  override def prettyName: String = "nearest_centroids"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def vecElemType: DataType =
    first.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val okVec = first.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val okCents = second.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    val okCids = third.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (okVec && okCents && okCids)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, array<array<double>>, array<long>), " +
          s"got (${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
          s"${third.dataType.simpleString})")
  }

  override def nullSafeEval(v: Any, cs: Any, ids: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val cents = cs.asInstanceOf[ArrayData]
    val cids = ids.asInstanceOf[ArrayData]
    val t = vecElemType
    val np = nprobe
    val bd = Array.fill(np)(Double.PositiveInfinity)
    val bi = new Array[Long](np)
    var ci = 0
    while (ci < cents.numElements()) {
      val cv = cents.getArray(ci)
      val n = math.min(vec.numElements(), cv.numElements())
      var acc = 0.0
      var j = 0
      while (j < n) {
        val d = (t match {
          case DoubleType => vec.getDouble(j)
          case _ => vec.getFloat(j).toDouble
        }) - cv.getDouble(j)
        acc += d * d
        j += 1
      }
      if (acc < bd(np - 1)) {
        var pos = np - 1
        while (pos > 0 && acc < bd(pos - 1)) {
          bd(pos) = bd(pos - 1); bi(pos) = bi(pos - 1); pos -= 1
        }
        bd(pos) = acc; bi(pos) = cids.getLong(ci)
      }
      ci += 1
    }
    val filled = math.min(np, cents.numElements())
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(bi, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs, ids) => {
      val ci = ctx.freshName("ci")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val cv = ctx.freshName("cv")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val bd = ctx.freshName("bd")
      val bi = ctx.freshName("bi")
      val pos = ctx.freshName("pos")
      val filled = ctx.freshName("filled")
      val getV = vecElemType match {
        case DoubleType => s"$v.getDouble($j)"
        case _ => s"(double) $v.getFloat($j)"
      }
      s"""
         |double[] $bd = new double[$nprobe];
         |long[] $bi = new long[$nprobe];
         |java.util.Arrays.fill($bd, Double.POSITIVE_INFINITY);
         |for (int $ci = 0; $ci < $cs.numElements(); $ci++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $cs.getArray($ci);
         |  int $n = java.lang.Math.min($v.numElements(), $cv.numElements());
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    double $d = $getV - $cv.getDouble($j);
         |    $acc += $d * $d;
         |  }
         |  if ($acc < $bd[$nprobe - 1]) {
         |    int $pos = $nprobe - 1;
         |    while ($pos > 0 && $acc < $bd[$pos - 1]) {
         |      $bd[$pos] = $bd[$pos - 1]; $bi[$pos] = $bi[$pos - 1]; $pos--;
         |    }
         |    $bd[$pos] = $acc; $bi[$pos] = $ids.getLong($ci);
         |  }
         |}
         |int $filled = java.lang.Math.min($nprobe, $cs.numElements());
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($bi, $filled));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Column-level API for the native vector expressions. */
object VectorFunctions {
  import ColumnBridge.{column => c, expression => e}

  def vecDot(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))

  def vecCosine(a: Column, b: Column): Column = c(CosineSimilarity(e(a), e(b)))

  def vecL2Sq(a: Column, b: Column): Column = c(L2SquaredDistance(e(a), e(b)))

  /** Nearest-centroid assignment against a constant centroid table
    * (cid-sorted). One expression, constant plan size in nlist. */
  def nearestCentroid(vec: Column, centroids: Seq[(Long, Seq[Double])]): Column = {
    require(centroids.nonEmpty, "nearestCentroid needs at least one centroid")
    val sorted = centroids.sortBy(_._1)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
    val cents = Literal.create(sorted.map(_._2), ArrayType(ArrayType(DoubleType)))
    val cids = Literal.create(sorted.map(_._1), ArrayType(LongType))
    c(NearestCentroid(e(vec), cents, cids))
  }

  /** TWO-STAGE nearest-centroid assignment against a GROUPED constant
    * centroid table — the past-n^1.5 IVF lever (hierarchical coarse
    * quantization, the IVF-HNSW/IMI family's standard move): stage 1
    * picks the nearest of the `groups.size` supercentroids (one
    * [[NearestCentroid]] over the super table), stage 2 `element_at`s
    * that group's member matrix out of one nested literal and argmins
    * only its members (a second [[NearestCentroid]] whose centroid input
    * is per-row — the expression never required a literal). Per-row cost
    * drops from nlist·dims to (nsuper + maxGroupSize)·dims ≈ 2·√nlist·
    * dims; with nlist = √n the assign stage falls from n^1.5 to n^1.25.
    * Composed from existing expressions, so plan size stays constant in
    * nlist and both stages ride whole-stage codegen (the duplicated
    * stage-1 subtree is eliminated by ProjectExec subexpression
    * elimination).
    *
    * EXACTNESS TRADE (why the registry keeps flat assign): a vector near
    * a supercell boundary resolves within the wrong group — the returned
    * cid is the nearest member of ITS supercell, not always the global
    * argmin. `wprobe` is the standard remedy (multi-probe coarse stage,
    * the IMI convention): stage 1 keeps the `wprobe` nearest supercells
    * ([[NearestCentroids]]) and stage 2 argmins across their UNION,
    * comparing candidates by exact L2² against a cid→centroid map
    * literal with the flat tie-break ((dist, cid) struct least = first
    * strict min in cid order). Measured at sf1/nlist=448/nprobe=4:
    * wprobe=1 reads recall@10 0.69 vs flat 0.95; wprobe=2 recovers most
    * of the boundary loss for one extra group scan per row (IvfSizing
    * artifact, PLANS.md IVF section). */
  def nearestCentroidHier(
      vec: Column,
      groups: Seq[(Seq[Double], Seq[(Long, Seq[Double])])],
      wprobe: Int = 1): Column = {
    require(groups.nonEmpty && groups.forall(_._2.nonEmpty),
      "nearestCentroidHier needs non-empty groups")
    require(wprobe >= 1, s"wprobe must be >= 1, got $wprobe")
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.functions.{element_at, least, struct}
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, MapType}
    val superCents =
      Literal.create(groups.map(_._1), ArrayType(ArrayType(DoubleType)))
    val superIdx =
      Literal.create(groups.indices.map(_.toLong), ArrayType(LongType))
    val memberMats = c(Literal.create(groups.map(_._2.map(_._2)),
      ArrayType(ArrayType(ArrayType(DoubleType)))))
    val memberCids = c(Literal.create(groups.map(_._2.map(_._1)),
      ArrayType(ArrayType(LongType))))
    def cidInGroup(gIdx: Column): Column =
      c(NearestCentroid(e(vec),
        e(element_at(memberMats, gIdx)),
        e(element_at(memberCids, gIdx))))
    val w = math.min(wprobe, groups.size)
    if (w == 1) {
      // stage 1 returns the 0-based group index; +1 for element_at's
      // 1-based contract
      cidInGroup((c(NearestCentroid(e(vec), superCents, superIdx)) + 1)
        .cast("int"))
    } else {
      // rank-ordered stage-1 probes, then an exact-L2² argmin across the
      // w per-group winners (cid → centroid map literal; sequential
      // left-to-right L2 loops both sides, so distances are
      // bit-identical to the flat scan's)
      val probes = c(NearestCentroids(e(vec), superCents, superIdx, w))
      val centMap = c(Literal.create(
        groups.flatMap(_._2).map { case (cid, cv) => cid -> cv }.toMap,
        MapType(LongType, ArrayType(DoubleType))))
      val cands = (0 until w).map { r =>
        val cid = cidInGroup(
          (element_at(probes, r + 1) + 1).cast("int"))
        struct(vecL2Sq(vec, element_at(centMap, cid)).as("d"),
          cid.as("cid"))
      }
      least(cands: _*).getField("cid")
    }
  }

  /** The nprobe nearest centroids (rank order) against a constant centroid
    * table (cid-sorted). One expression, constant plan size in nlist. */
  def nearestCentroids(
      vec: Column, centroids: Seq[(Long, Seq[Double])], nprobe: Int): Column = {
    require(centroids.nonEmpty, "nearestCentroids needs at least one centroid")
    val sorted = centroids.sortBy(_._1)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
    val cents = Literal.create(sorted.map(_._2), ArrayType(ArrayType(DoubleType)))
    val cids = Literal.create(sorted.map(_._1), ArrayType(LongType))
    c(NearestCentroids(e(vec), cents, cids, nprobe))
  }
}
