package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-embedding column math over `array<float>` / `array<double>`
  * columns using Spark higher-order functions (zip_with / aggregate) —
  * no UDFs, so the expressions stay inside codegen and are
  * deterministic for oracle checks.
  */
object VectorFunctions {

  /** Elementwise dot product in double precision — the codegen'd
    * [[DotProduct]] kernel (bit-identical to [[dotHof]], ~10x cheaper on
    * pairwise verify stages where it runs once per candidate pair). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(DotProduct(
      org.apache.spark.sql.graft.ColumnShim.expression(a),
      org.apache.spark.sql.graft.ColumnShim.expression(b)))

  /** Higher-order-function formulation of [[dot]]; kept as the
    * independent semantics anchor for the bit-identity test. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Euclidean norm. */
  def norm2(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity (0 when either vector is all-zero). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm2(a)
    val nb = norm2(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** L2-normalized copy of the vector (zero vector stays zero). */
  def normalize(a: Column): Column = {
    val n = norm2(a)
    when(n === 0.0, a.cast("array<double>"))
      .otherwise(transform(a, v => v.cast("double") / n))
  }

  /** Sign-bit LSH bucket from `nBits` fixed random hyperplanes.
    *
    * Hyperplane components are generated on the driver from `seed`
    * (deterministic) and inlined as literals, so the whole expression
    * is still pure Catalyst. Collision probability follows the
    * random-hyperplane LSH bound: P[same bit] = 1 - angle/pi.
    */
  def hyperplaneBucket(a: Column, dim: Int, nBits: Int, seed: Long): Column = {
    val bits = hyperplanes(dim, nBits, seed).zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit(_)): _*)
      when(dot(a, planeCol) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** The deterministic hyperplane family behind [[hyperplaneBucket]],
    * exposed so an external oracle (e.g. DuckDB SQL with the planes
    * inlined as array literals) can reproduce the exact buckets. */
  def hyperplanes(dim: Int, nBits: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rng.nextGaussian()))
  }
}
