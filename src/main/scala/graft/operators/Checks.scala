package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit (the "expectations" gate a corpus
  * pipeline runs before training): each check is a row-level predicate
  * that should hold; the audit reports how often it doesn't.
  *
  * 100-TB shape: ALL checks evaluate in ONE aggregate pass over ONE
  * scan (a conditional-sum per check, map-side combined) — adding a
  * check adds a column to the aggregate, never a job. The output is
  * |checks| rows, so gating logic (`fail if any rate > threshold`)
  * is driver-trivial. */
object Checks {

  final case class Check(name: String, predicate: Column)

  /** One row per check: rows scanned, violations (predicate false OR
    * null — a null comparison means the value could not vouch for the
    * rule, which an audit must count, not skip), violation rate. */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    val agg = checks.map(c =>
      sum(when(coalesce(c.predicate, lit(false)), 0L).otherwise(1L))
        .as(c.name))
    val one = df.agg(count(lit(1)).as("__n"), agg: _*).head
    val n = one.getAs[Long]("__n")
    val spark = df.sparkSession
    import spark.implicits._
    checks.map { c =>
      val v = one.getAs[Long](c.name)
      (c.name, n, v, if (n == 0) 0.0 else v.toDouble / n)
    }.toDF("check", "n_rows", "n_violations", "violation_rate")
  }
}
