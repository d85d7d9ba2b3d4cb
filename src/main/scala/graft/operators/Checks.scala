package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    * rule, which an audit must count, not skip), violation rate.
    *
    * Fully LAZY: one aggregate pass (conditional sums, map-side
    * combined) whose single row is pivoted to |checks| rows with an
    * `inline` over a literal struct array — no action inside the
    * operator, so audits compose into larger pipelines like every
    * other operator here. */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be distinct")
    require(!checks.exists(_.name == "__n"), "check name '__n' is reserved")
    val agg = checks.map(c =>
      coalesce(sum(when(coalesce(c.predicate, lit(false)), 0L).otherwise(1L)),
        lit(0L)).as(c.name))
    val one = df.agg(count(lit(1)).as("__n"), agg: _*)
    val rows = array(checks.map(c =>
      struct(lit(c.name).as("check"), col(c.name).as("n_violations"))): _*)
    one.select(col("__n").as("n_rows"), explode(rows).as("kv"))
      .select(col("kv.check").as("check"), col("n_rows"),
        col("kv.n_violations").as("n_violations"),
        when(col("n_rows") === 0, 0.0)
          .otherwise(col("kv.n_violations").cast("double") / col("n_rows"))
          .as("violation_rate"))
  }

  /** Corpus snapshot diff — the dataset-versioning review step ("what
    * changed between v1 and v2 of the corpus before we retrain").
    * One row per id present in either snapshot, with a status:
    * `added` (only in new), `removed` (only in old), `changed` (both,
    * different content fingerprint), `unchanged`. Content identity is
    * the normalized-text fingerprint, so whitespace/punctuation-only
    * edits read as unchanged — the same identity every dedup operator
    * uses.
    *
    * 100-TB shape: one full outer join hash-partitioned on the id —
    * both sides shuffle once, no driver state; downstream summaries
    * (counts per status/source) are ordinary map-side-combined
    * aggregates over the diff frame. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    def fp(df: DataFrame) = df.select(
      col(idCol).as("id"),
      graft.functions.TextFunctions.fingerprint(col(textCol)).as("fp"))
    val o = fp(oldDf).withColumnRenamed("fp", "old_fp")
    val n = fp(newDf).withColumnRenamed("fp", "new_fp")
    o.join(n, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") =!= col("new_fp"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** CDC-style snapshot merge (the write side of [[snapshotDiff]]'s
    * read side): apply a change batch of `upsert` / `delete` operations
    * to a snapshot, producing the next snapshot — the MERGE INTO of
    * corpus versioning, as a pure declarative plan.
    *
    * `changes` must carry the snapshot's columns plus `opCol`
    * (`"upsert"` inserts-or-replaces by id, `"delete"` removes). When
    * `versionCol` is given, the LATEST version per id within the batch
    * wins (supply unique versions per id for full determinism);
    * without it, ids must already be unique in the batch — a documented
    * precondition, with the version path as the safe general form.
    *
    * 100-TB shape: one id-keyed left-anti join (snapshot survivors) +
    * the batch's upserts appended — both sides hash-partition on id
    * once; the change batch is typically a tiny fraction of the
    * snapshot and broadcasts. No driver state, no full rewrite of
    * unchanged partitions beyond the one shuffle. */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, idCol: String,
                   opCol: String,
                   versionCol: Option[String] = None): DataFrame = {
    val resolved = versionCol match {
      case Some(v) =>
        val w = Window.partitionBy(idCol).orderBy(col(v).desc)
        changes.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn", v)
      case None => changes
    }
    val kept = snapshot.join(
      resolved.select(col(idCol)), Seq(idCol), "left_anti")
    kept.unionByName(resolved.filter(col(opCol) === "upsert").drop(opCol))
  }

  /** Snapshot at version k = base + change batches 1..k, compacted in
    * ONE pass: the base rows enter as batch-0 upserts, every batch
    * unions in with its batch number, and `max_by(row, batch)` per id
    * picks the LAST state — absent ids keep base, a final delete drops
    * the id, a final upsert wins with its own row. Provably equal to
    * folding [[applyChanges]] k times (VersionedSpec asserts it on
    * every prefix), but the fold is k anti-joins with k-deep lineage
    * while this is ONE corpus-sized exchange regardless of k — the
    * log-compaction read every table format (Delta/Iceberg/Hudi) does.
    * Precondition (inherited from applyChanges): ids unique within a
    * batch, so max_by never ties (__batch differs across batches). */
  def snapshotAt(base: DataFrame, batches: Seq[DataFrame], idCol: String,
                 opCol: String): DataFrame = {
    // reserved names: withColumn would silently REPLACE an existing
    // __batch (tagging rows with data values instead of batch numbers)
    // or opCol on the base (breaking the batch-side select) — fail
    // loud, the dropExactDuplicates __kfp/__kid contract
    require(!base.columns.contains("__batch") &&
      batches.forall(!_.columns.contains("__batch")),
      "snapshotAt: inputs must not contain reserved column '__batch'")
    require(!base.columns.contains(opCol),
      s"snapshotAt: base snapshot must not already carry opCol '$opCol'")
    if (batches.isEmpty) return base
    val dataCols = base.columns.toSeq
    val rest = dataCols.filterNot(_ == idCol)
    val tagged = base.withColumn(opCol, lit("upsert"))
      .withColumn("__batch", lit(0)) +:
      batches.zipWithIndex.map { case (b, i) =>
        b.select((dataCols :+ opCol).map(col): _*)
          .withColumn("__batch", lit(i + 1))
      }
    tagged.reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(max_by(struct((rest :+ opCol).map(col): _*), col("__batch"))
        .as("__last"))
      .filter(col(s"__last.$opCol") === "upsert")
      // re-select in base.columns ORDER (not id-first): the output
      // schema must equal the input's and the applyChanges fold's
      // positionally, not just by name (r11 ADVICE)
      .select(dataCols.map(c =>
        if (c == idCol) col(c) else col(s"__last.$c").as(c)): _*)
  }
}
