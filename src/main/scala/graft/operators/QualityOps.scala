package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality audit suite — the dbt-test / Great-Expectations shape
  * re-expressed as Spark plans: each check is a DataFrame of VIOLATING
  * rows (empty = healthy), and [[auditReport]] folds any number of checks
  * into one (check, n_violations) report.
  *
  * Reference behavior: the reference pipeline trusts its inputs after the
  * row-level cleanses (etl.py's dropna/validity filters); at 100 TB the
  * missing piece is the relational contract — orphaned FKs, duplicate
  * PKs, and null-rate regressions arrive silently from upstream loaders.
  * These checks make the contract executable.
  *
  * Scale posture: every check is a single anti-join or combinable
  * aggregate over the audited table — no collect, no cross join. The
  * report unions per-check 1-row COUNTS, so the driver materializes
  * O(checks) rows regardless of table size. Dimension-sized parents
  * (`region`, `nation`) broadcast; fact-sized parents (`orders` under
  * `lineitem`) shuffle on the key — exactly the plans the equivalent
  * manual queries would pick.
  */
object QualityOps {

  /** Rows of `child` whose `fk` has no match in `parent.pk` — referential
    * integrity violations. Null FKs are NOT orphans (SQL FK semantics:
    * null references are vacuously valid; flag them with [[nullRows]] if
    * the column is also NOT NULL). */
  def fkOrphans(child: DataFrame, fk: Column,
                parent: DataFrame, pk: Column): DataFrame =
    child.filter(fk.isNotNull)
      .join(parent.select(pk.as("__pk")), fk === col("__pk"), "left_anti")

  /** Key groups appearing more than once — primary-key/uniqueness
    * violations. One combinable count shuffle; output is one row per
    * DUPLICATED key (with its multiplicity), not per duplicate row. */
  def dupKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** Rows where `c` is null — NOT NULL violations. */
  def nullRows(df: DataFrame, c: Column): DataFrame = df.filter(c.isNull)

  /** Rows failing an arbitrary row-level expectation (range, regex,
    * cross-column). The predicate states what a HEALTHY row satisfies;
    * violations are rows where it is false OR null (SQL three-valued
    * logic would otherwise let null-valued rows slip through an audit —
    * a null price is not evidence the price is non-negative). */
  def expectViolations(df: DataFrame, healthy: Column): DataFrame =
    df.filter(!coalesce(healthy, lit(false)))

  /** Fold named violation frames into one (check, n_violations) report,
    * ordered by check name. Each frame collapses to a 1-row count before
    * the union, so the union is O(checks) rows; Spark runs the underlying
    * scans as independent stages of ONE job (shared scan subtrees are
    * reused by the exchange/subquery reuse rules). */
  def auditReport(checks: Seq[(String, DataFrame)]): DataFrame = {
    require(checks.nonEmpty, "auditReport needs at least one check")
    checks.map { case (name, bad) =>
      bad.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check"), col("n_violations"))
    }.reduce(_.unionByName(_)).orderBy(col("check"))
  }
}
