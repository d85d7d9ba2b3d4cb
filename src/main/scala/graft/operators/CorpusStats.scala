package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus distribution analytics over discrete statistics (token
  * counts, char lengths): exact quantiles the scalable way.
  *
  * Spark's exact `percentile` buffers every value of a group in one
  * aggregation buffer — fine for small groups, a memory wall for a
  * 100-TB source. Token lengths are a small DISCRETE domain, so the
  * exact quantile reduces to a histogram: groupBy (group, value)
  * count, cumulative count over the per-group histogram (a window over
  * ≤ |distinct values| rows per group, never over documents), then
  * the type-1 quantile q(p) = min value whose cumulative count
  * reaches ceil(p·n). Integer-only logic — the same formula replays
  * identically in any engine, which is what makes the oracle exact. */
object CorpusStats {

  /** Per-`groupCol` exact token-length quantiles at `probs`
    * (type-1/lower order statistic). Output: groupCol, n_docs, and one
    * `p{percent}` long column per requested probability. `tokenCount`
    * picks the tokenizer (whitespace default; pass
    * [[graft.functions.Subword.subwordTokenCount]] for subword
    * lengths — the count a sequence-length planner actually needs). */
  def lengthQuantiles(docs: DataFrame, groupCol: String, textCol: String,
                      probs: Seq[Double],
                      tokenCount: org.apache.spark.sql.Column =>
                        org.apache.spark.sql.Column =
                        TextFunctions.wsTokenCount): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1))
    val names = probs.map(p => "p" + math.round(p * 100))
    require(names.distinct.size == names.size,
      s"quantile probs round to duplicate column names: ${names.mkString(",")}")
    val hist = docs
      .select(col(groupCol),
        tokenCount(col(textCol)).cast("long").as("len"))
      .groupBy(groupCol, "len").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(groupCol).orderBy("len")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(Window.partitionBy(groupCol)))
    val qCols = probs.map { p =>
      val name = "p" + math.round(p * 100)
      min(when(col("cum") >= ceil(lit(p) * col("n")), col("len"))).as(name)
    }
    cum.groupBy(groupCol)
      .agg(max(col("n")).as("n_docs"), qCols: _*)
  }
}
