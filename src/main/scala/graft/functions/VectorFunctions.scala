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

  /** Euclidean norm — the codegen'd [[VecNorm2]] kernel (bit-identical
    * to [[norm2Hof]]; the HOF form evaluated interpreted AND pulled its
    * whole projection out of codegen). */
  def norm2(a: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(VecNorm2(
      org.apache.spark.sql.graft.ColumnShim.expression(a)))

  /** Higher-order-function formulation of [[norm2]]; kept as the
    * independent semantics anchor for the bit-identity test. */
  private[graft] def norm2Hof(a: Column): Column =
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

  /** L2-normalized copy of the vector (zero vector stays zero) — the
    * codegen'd [[VecNormalize]] kernel. Bit-identical to
    * [[normalizeHof]] including the null-element and zero-norm corner
    * cases; the HOF form's lambda CAPTURED the norm2 aggregate,
    * re-evaluating an O(dim) interpreted fold per element (O(dim²)
    * boxed evals per row — 26 s of task CPU on q_embedding_dup's
    * banding stage at sf0.1, profiled r16). */
  def normalize(a: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(VecNormalize(
      org.apache.spark.sql.graft.ColumnShim.expression(a)))

  /** Higher-order-function formulation of [[normalize]]; kept as the
    * independent semantics anchor for the bit-identity test. */
  private[graft] def normalizeHof(a: Column): Column = {
    val n = norm2Hof(a)
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
  def hyperplaneBucket(a: Column, dim: Int, nBits: Int, seed: Long): Column =
    element_at(hyperplaneBuckets(a, dim, nBits, bands = 1, seed), 1)

  /** All `bands` sign-bit LSH buckets of a vector in ONE pass — band b
    * uses the plane family `hyperplanes(dim, nBits, seed + b)`; output
    * is `array<long>` indexed by band. The codegen'd
    * [[HyperplaneBuckets]] kernel (bit-identical to the per-band
    * when/dot expression chain it replaces — see its scaladoc and the
    * OperatorsSpec anchor test). */
  def hyperplaneBuckets(a: Column, dim: Int, nBits: Int, bands: Int,
                        seed: Long): Column =
    org.apache.spark.sql.graft.ColumnShim.column(HyperplaneBuckets(
      org.apache.spark.sql.graft.ColumnShim.expression(a),
      dim, nBits, bands, seed))

  /** Expression formulation of one band's bucket; kept as the
    * independent semantics anchor for the bit-identity test. */
  private[graft] def hyperplaneBucketExpr(a: Column, dim: Int, nBits: Int,
                                          seed: Long): Column = {
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
