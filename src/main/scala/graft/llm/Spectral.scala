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
  *    scan — double-posexplode to upper-triangle (d1, d2, x1·x2) terms,
  *    partial-agg'd to d(d+1)/2 rows and mirrored. The n·d(d+1)/2 term
  *    stream is the honest cost of a symmetric covariance; nothing else
  *    scales with n.
  *  - [[powerIteration]]: top eigenpair by power iteration over the d²-row
  *    frame collected ONCE to the driver (model-sized — the bounded-collect
  *    family); every iteration is driver arithmetic, the corpus is never
  *    rescanned and no per-iteration Spark job is launched.
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
    * the d²-key partial aggregation.
    *
    * Round 17: only the UPPER TRIANGLE (d2 ≥ d1) is generated — the matrix
    * is symmetric and c(d1,d2) sums the same products as c(d2,d1), so the
    * second posexplode runs over slice(v, d1+1, d−d1) and the term stream
    * shrinks from n·d² to n·d(d+1)/2. The lower triangle mirrors by a
    * union over the already-aggregated d(d+1)/2-row frame (ReuseExchange
    * shares the one exchange; each mirrored cell reads the identical
    * rounded value, so the output frame is value-identical to the full
    * double-explode). */
  def covariance(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val half = df.select(v.as("v"), posexplode(v).as(Seq("d1", "x1")))
      .select(col("d1"), col("x1"),
        posexplode(slice(col("v"), col("d1") + 1, size(col("v")) - col("d1")))
          .as(Seq("i", "x2")))
      .groupBy(col("d1"), (col("d1") + col("i")).as("d2"))
      .agg(round(sum(col("x1") * col("x2")) / count(lit(1)), 9).as("c"))
    half.unionAll(half.filter(col("d1") =!= col("d2"))
      .select(col("d2").as("d1"), col("d1").as("d2"), col("c")))
  }

  /** Top eigenpair of a (d1, d2, c) covariance frame by `iters` rounds of
    * power iteration with the pinned trajectory described in the module
    * note. Returns (eigenvector, lambda1, trace). w0 = 1/√dim per
    * component — exact on the 9-decimal grid when dim is a power of 4
    * (0.125 for dim 64), rounded otherwise. */
  def powerIteration(cov: DataFrame, dim: Int, iters: Int): (Array[Double], Double, Double) = {
    // The covariance frame is MODEL-sized (d² narrow rows — 4096 at
    // dim 64), so collect it ONCE and run every iteration as driver
    // arithmetic (round 17; the bounded-collect family: model/panel/gate).
    // The old loop persisted the frame and launched one Spark job per
    // matvec — 4 iterations + Rayleigh + trace = 6 scheduled stages over
    // 4096 rows, pure fixed cost at any scale, since nothing after the
    // covariance aggregation touches the corpus. Same pinned trajectory:
    // z UNROUNDED (see the module note on grid-aligned midpoints), only
    // w = r9(z/norm) snaps; norm/Rayleigh/trace fold in INDEX ORDER,
    // matching the oracle's list_sum(list(x ORDER BY d)).
    val m = Array.ofDim[Double](dim, dim)
    cov.collect().foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    def matvec(w: Array[Double]): Array[Double] =
      Array.tabulate(dim) { d1 =>
        var acc = 0.0
        var d2 = 0
        while (d2 < dim) { acc += m(d1)(d2) * w(d2); d2 += 1 }
        acc
      }
    var w = Array.fill(dim)(r9(1.0 / math.sqrt(dim)))
    for (_ <- 1 to iters) {
      val z = matvec(w)
      val norm = math.sqrt(z.map(x => x * x).foldLeft(0.0)(_ + _))
      w = z.map(x => r9(x / norm))
    }
    // Rayleigh quotient λ = wᵀ(Cw) with one more matrix-vector pass.
    val zf = matvec(w)
    val lambda1 = r9((0 until dim).foldLeft(0.0)((a, d) => a + w(d) * zf(d)))
    val trace = r9((0 until dim).foldLeft(0.0)((a, d) => a + m(d)(d)))
    (w, lambda1, trace)
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
