package graft

/** Pins the JVM log lane the HyperBall local kernel must use: Spark's
  * `log` expression vs StrictMath.log vs Math.log over every argument
  * the 256-register linear-counting branch can produce (256.0/zeros,
  * zeros ∈ 1..255). If this ever fails, LocalSolve.hyperBallLocal's
  * `estimate` must switch lanes to stay bit-identical. */
class LogLaneSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("spark log == StrictMath.log on the linear-counting argument set") {
    val args = (1 to 255).map(z => 256.0 / z)
    val sparkLog = args.toDF("x").select(log($"x")).collect().map(_.getDouble(0))
    val strict = args.map(StrictMath.log)
    val mathL = args.map(math.log)
    assert(sparkLog.toSeq == strict.toSeq,
      "Spark log diverges from StrictMath.log — hyperBallLocal must change lanes")
    // informational: whether Math.log happens to agree on this JVM
    info(s"Math.log agrees with Spark on all 255 args: ${sparkLog.toSeq == mathL.toSeq}")
  }
}
