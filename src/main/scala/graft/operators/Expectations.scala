package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality expectations over lake tables — the constraint layer a
  * production lakehouse runs before promoting a batch (Delta Live
  * Tables' `EXPECT`, Great Expectations' suites): each check reduces a
  * table to ONE `(constraint, violations)` row, and a report is the
  * union of checks. A gate then pins `violations = 0` (or the exact
  * known count) against the same aggregation in the oracle engine.
  *
  * Scale shape per check:
  *  - `notNull` / `inRange` / `satisfies`: one map-side-combined
  *    aggregate — a single scan, no shuffle beyond the 1-row combine;
  *  - `unique`: one hash shuffle on the key columns (the minimal cost
  *    of a distributed uniqueness proof), counting groups with
  *    multiplicity > 1;
  *  - `refIntegrity`: a left-anti join child→parent on the key — AQE
  *    broadcasts the parent side when it fits, the classic
  *    dimension-table shape; violations are orphan child rows.
  *
  * Checks compose with `unionByName`, so one report runs as one job
  * with shared scans where Spark can reuse them.
  */
object Expectations {

  private def row(name: String, violations: org.apache.spark.sql.Column,
                  df: DataFrame): DataFrame =
    df.agg(violations.cast("long").as("violations"))
      .select(lit(name).as("constraint"), col("violations"))

  /** Rows where any of `cols` is NULL. */
  def notNull(df: DataFrame, cols: Seq[String]): DataFrame =
    row(s"not_null(${cols.mkString(",")})",
      count(when(cols.map(c => col(c).isNull).reduce(_ || _), 1)), df)

  /** Rows participating in a duplicated key group (0 = key is unique).
    * Counts the EXCESS rows — the number that would have to be dropped
    * to make the key unique — so the number is actionable, not just a
    * flag.
    */
  def unique(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(col("n") - 1), lit(0L)).cast("long").as("violations"))
      .select(lit(s"unique(${keyCols.mkString(",")})").as("constraint"),
        col("violations"))

  /** Child rows whose key has no match in the parent (orphans). */
  def refIntegrity(child: DataFrame, childKeys: Seq[String],
                   parent: DataFrame, parentKeys: Seq[String],
                   name: String): DataFrame = {
    val p = parent.select(parentKeys.zip(childKeys).map {
      case (pk, ck) => col(pk).as(ck)
    }: _*)
    child.select(childKeys.map(col): _*)
      .join(p, childKeys, "left_anti")
      .agg(count(lit(1)).cast("long").as("violations"))
      .select(lit(name).as("constraint"), col("violations"))
  }

  /** Non-null rows outside [lo, hi] (inclusive). */
  def inRange(df: DataFrame, c: String, lo: Double, hi: Double): DataFrame =
    row(s"range($c,$lo,$hi)",
      count(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1)), df)

  /** Rows violating an arbitrary SQL predicate (nulls count as
    * violations — an expectation must hold affirmatively).
    */
  def satisfies(df: DataFrame, name: String, predicateSql: String): DataFrame =
    row(name, count(when(not(coalesce(expr(predicateSql), lit(false))), 1)), df)

  /** One report from many checks. */
  def report(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
}
