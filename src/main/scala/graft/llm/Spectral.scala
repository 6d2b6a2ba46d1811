package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spectral audit of an embedding corpus — the dominant-direction /
  * anisotropy numbers a pipeline reads before deciding to whiten or
  * mean-center (embedding spaces are notoriously anisotropic: one rogue
  * direction carrying most of the variance degrades cosine retrieval; the
  * "all-but-the-top" post-processing family exists for exactly this).
  *
  * Two stages, both corpus-scale-safe:
  *  - [[covariance]]: the uncentered d×d second-moment matrix in ONE corpus
  *    scan — double-posexplode to (d1, d2, x1·x2) terms, partial-agg'd to
  *    d² rows. The n·d² term stream is the honest cost of a covariance;
  *    nothing else scales with n.
  *  - [[powerIteration]]: top eigenpair by power iteration ON THE d²-row
  *    frame — each iteration joins the in-plan weight literals against the
  *    tiny covariance frame and collects d rows (the kmeansLloyd driver
  *    economics; corpus is never rescanned).
  *
  * Determinism contract (DuckDB-oracle-checked): covariance entries round
  * to 9 decimals; the matrix-vector product z stays UNROUNDED and only the
  * normalized w = round(z/‖z‖, 9) snaps each iteration. Rounding z itself
  * is a trap this module measured: with w0 = 1/8 exactly, the products
  * c·w0 sit on the 1e-9/8 grid, so z-sums land EXACTLY on 9-decimal
  * rounding midpoints with high probability (5/64 components at sf0.01)
  * and each engine's last-ulp accumulation order decides the flip.
  * Dividing by the irrational norm first destroys the grid alignment, so
  * the w snap's midpoint risk is measure-zero like every other pinned
  * trajectory here. Norms and Rayleigh quotients fold in INDEX ORDER on
  * the driver, mirrored by `list_sum(list(x ORDER BY d))` in the oracle.
  */
object Spectral {

  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Uncentered covariance (second-moment) matrix as a (d1, d2, c) frame:
    * c = round(Σ x_d1·x_d2 / n, 9). One corpus scan; the only shuffle is
    * the d²-key partial aggregation. */
  def covariance(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.select(v.as("v"), posexplode(v).as(Seq("d1", "x1")))
      .select(col("d1"), col("x1"), posexplode(col("v")).as(Seq("d2", "x2")))
      .groupBy("d1", "d2")
      .agg(round(sum(col("x1") * col("x2")) / count(lit(1)), 9).as("c"))
  }

  /** Top eigenpair of a (d1, d2, c) covariance frame by `iters` rounds of
    * power iteration with the pinned trajectory described in the module
    * note. Returns (eigenvector, lambda1, trace). w0 = 1/√dim per
    * component — exact on the 9-decimal grid when dim is a power of 4
    * (0.125 for dim 64), rounded otherwise. */
  def powerIteration(cov: DataFrame, dim: Int, iters: Int): (Array[Double], Double, Double) = {
    // The d²-row frame drives every iteration — cache for the fit, release
    // after (kmeansLloyd economics; recomputing would rescan the corpus
    // per iteration).
    val c = cov.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var w = Array.fill(dim)(r9(1.0 / math.sqrt(dim)))
      for (_ <- 1 to iters) {
        val wv = array(w.map(lit): _*)
        // z UNROUNDED — see the module note on grid-aligned midpoints.
        val z = c.groupBy("d1")
          .agg(sum(col("c") * element_at(wv, col("d2") + 1)).as("z"))
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
          .toSeq.sortBy(_._1).map(_._2).toArray
        // Index-order fold — matches list_sum(list(z² ORDER BY d)).
        val norm = math.sqrt(z.map(x => x * x).foldLeft(0.0)(_ + _))
        w = z.map(x => r9(x / norm))
      }
      // Rayleigh quotient λ = wᵀ(Cw) with one more matrix-vector pass.
      val wv = array(w.map(lit): _*)
      val zf = c.groupBy("d1")
        .agg(sum(col("c") * element_at(wv, col("d2") + 1)).as("z"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val lambda1 = r9((0 until dim).foldLeft(0.0)((a, d) => a + w(d) * zf(d)))
      val trace = r9(c.filter(col("d1") === col("d2"))
        .collect().map(r => r.getInt(0) -> r.getDouble(2)).toSeq
        .sortBy(_._1).map(_._2).foldLeft(0.0)(_ + _))
      (w, lambda1, trace)
    } finally { c.unpersist(blocking = false); () }
  }

  /** The declared audit frame: one row of corpus-level spectral facts —
    * top eigenvalue, trace (total second moment), and the anisotropy ratio
    * λ1/trace (≈1/dim for isotropic vectors; near 1 when one direction
    * dominates — the "whiten before you trust cosine" signal). */
  def spectralAudit(spark: SparkSession, df: DataFrame, vecCol: String,
                    iters: Int = 4): DataFrame = {
    import spark.implicits._
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    val (_, lambda1, trace) = powerIteration(covariance(df, vecCol), dim, iters)
    Seq((lambda1, trace,
        BigDecimal(lambda1 / trace).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("lambda1", "trace", "anisotropy")
  }
}
