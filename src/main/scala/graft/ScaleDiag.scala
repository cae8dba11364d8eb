package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Unit-of-work census for the sf1 8-11x slope tier (round 13) — measures
  * WHY each of those queries scales the way it does, per query, so the
  * PLANS.md tier table carries a measured cause instead of a plausible
  * one. For each query the census counts the quantity the dominant stage
  * is linear in; comparing the census at sf0.1 vs sf1 shows whether the
  * unit of work itself grew ~10x (slope ≈ data ratio at fixed local[32]
  * parallelism = linear-by-construction) or superlinearly (a real scale
  * bug hiding under an innocent-looking wall ratio).
  *
  *  - q_srp_lsh: candidate pairs = Σ over (band,sig) buckets of C(n,2) —
  *    the verify-join input. At FIXED bitsPerBand buckets grow with the
  *    corpus (pairs ∝ n²/2^bits); production sizing scales bitsPerBand
  *    with log₂(corpus) to hold expected bucket size constant. The
  *    optional `--time` mode times nearDups at the given bits so the
  *    sizing claim is measurable, IVF-nlist style.
  *  - q_winnow_pairs: post-cap fingerprint-bucket census — the cap bounds
  *    per-bucket pairs at C(64,2), so Σ pairs must grow ∝ buckets ∝ data.
  *  - q_perplexity: bigram occurrences + distinct bigrams — the LM count
  *    tables and the probability join are keyed on these.
  *  - q_cdc_chunks / q_boilerplate / q_line_dedup: total text bytes and
  *    total lines — pure scan-stage quantities.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.ScaleDiag [bitsPerBand] [--time]
  */
object ScaleDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val bits = args.filter(_ != "--time").headOption.map(_.toInt).getOrElse(8)
    val doTime = args.contains("--time")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    GraftSession.install(spark)
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables(spark, sfDir).embeddings
    val docs = Tables(spark, sfDir).documents

    def pairCensus(buckets: org.apache.spark.sql.DataFrame) =
      buckets.agg(
        count(lit(1)).as("n_buckets"),
        max(col("n")).as("max_bucket"),
        sum(col("n") * (col("n") - 1) / 2).cast("long").as("pairs"))
        .head()

    // q_srp_lsh: banded signature buckets at the given bits
    val srp = pairCensus(
      graft.sim.Srp.signatures(emb, "vec_id", "embedding",
          dims = 64, nBands = 2, bitsPerBand = bits)
        .groupBy(col("band"), col("sig")).agg(count(lit(1)).as("n")))

    val srpTime: Option[Double] =
      if (!doTime) None
      else {
        def once(): Double = {
          val t0 = System.nanoTime()
          graft.sim.Srp.nearDups(emb, "vec_id", "embedding",
            dims = 64, nBands = 2, bitsPerBand = bits, minCosine = 0.2).count()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          (System.nanoTime() - t0) / 1e9
        }
        once() // warm
        Some((1 to 3).map(_ => once()).sorted.apply(1))
      }

    // q_winnow_pairs: post-cap fingerprint buckets (registry params)
    val fps = graft.ops.Winnow.fingerprints(docs, "doc_id", "text", k = 8, w = 16)
    val winnow = pairCensus(
      fps.groupBy(col("fp")).agg(count(lit(1)).as("n"))
        .filter(col("n") <= 64))

    // q_perplexity: bigram stream + LM table cardinalities
    val toks = docs.select(split(trim(col("text")), "\\s+").as("t"))
      .filter(size(col("t")) >= 2)
    val big = toks.select(
      (size(col("t")) - 1).cast("long").as("n_bigrams"))
      .agg(sum(col("n_bigrams"))).head().getLong(0)
    val distinctBigrams = toks
      .select(posexplode(col("t")).as(Seq("p", "w")))
      .count() // occurrences of tokens — proxy denominator
    val distinctBg = docs.select(explode(
        expr("transform(sequence(1, size(split(trim(text), '\\\\s+')) - 1), " +
          "i -> concat(split(trim(text), '\\\\s+')[i - 1], ' ', split(trim(text), '\\\\s+')[i]))"))
        .as("bg"))
      .agg(countDistinct(col("bg"))).head().getLong(0)

    // scan tier: bytes and lines
    val scan = docs.agg(
      sum(length(col("text"))).cast("long").as("bytes"),
      sum(size(split(col("text"), "\n"))).cast("long").as("lines")).head()

    def j(name: String, r: org.apache.spark.sql.Row) =
      s""""$name":{"n_buckets":${r.getLong(0)},"max_bucket":${r.getLong(1)},"pairs":${r.getLong(2)}}"""
    val timePart = srpTime
      .map(t => s""","srp_neardups_s":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(t))}""")
      .getOrElse("")
    println(
      s"""{"metric":"scale_diag","sf_dir":"$sfDir","srp_bits":$bits,${j("srp", srp)}$timePart,${j("winnow_capped", winnow)},"bigram_occurrences":$big,"token_occurrences":$distinctBigrams,"distinct_bigrams":$distinctBg,"doc_bytes":${scan.getLong(0)},"doc_lines":${scan.getLong(1)}}""")
    spark.stop()
  }
}
