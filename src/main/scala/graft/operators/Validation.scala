package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation: the reference's CHECK / NOT
  * NULL / UNIQUE / FOREIGN KEY constraints (`schema.sql:9-71` —
  * `sale_price >= 0`, `land_sqft >= 0`, composite PKs, FK references)
  * generalized into a rule suite an ingestion pipeline runs BEFORE
  * landing a batch, where PostgreSQL would have enforced them row by
  * row at insert time. At 100 TB, enforcement-by-rejection is the
  * wrong shape — you want one cheap report over the batch, then a
  * routing decision (land / quarantine / alert) — so the output is a
  * small report frame, not an exception.
  *
  * Relation to [[Profiling.checkConstraints]]: that is the raw tool —
  * arbitrary Column predicates counted in one pass; this is the
  * declarative face a pipeline configures and a SQL caller can reach
  * (`graft_validate`), adding the rules a predicate-counter cannot
  * express (Unique needs its own groupBy, FkExists an anti-join) and
  * pinning CHECK null semantics per rule type.
  *
  * Cost shape is the point: every scalar rule (not-null, range, set
  * membership, regex) compiles into ONE aggregate pass over the data —
  * adding a tenth rule adds a counter to the same pass, never a scan.
  * Uniqueness shuffles only its key columns; referential checks are an
  * anti-join that broadcasts the dim when small. All counting uses
  * SQL CHECK-constraint null semantics: a NULL value never violates a
  * range/set/regex rule (add `NotNull` to demand presence), and NULL
  * foreign keys pass (SQL's MATCH SIMPLE).
  */
object Validation {

  /** One declarative constraint. `name` keys the report row. */
  sealed trait Rule { def name: String; def target: String }

  /** The column must never be NULL. */
  final case class NotNull(col: String) extends Rule {
    def name = "not_null"; def target = col
  }

  /** Non-null values must lie in [lo, hi] (inclusive, like the
    * reference's `CHECK (sale_price >= 0)` family). */
  final case class InRange(col: String, lo: Column, hi: Column)
      extends Rule {
    def name = "in_range"; def target = col
  }

  /** Non-null values must be one of `values` (the reference's status
    * vocabulary checks). */
  final case class InSet(col: String, values: Seq[String]) extends Rule {
    def name = "in_set"; def target = col
  }

  /** Non-null values must contain a match of `regex` (partial-match,
    * `rlike` semantics — anchor with ^$ for full-match). */
  final case class Matches(col: String, regex: String) extends Rule {
    def name = "matches"; def target = col
  }

  /** The column tuple must be unique across the frame (composite PK).
    * Violations count every row in an over-populated key group, so one
    * duplicated pair reports 2. NULL keys group together (GROUP BY
    * semantics, in both this engine and any SQL oracle). */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name = "unique"; def target = cols.mkString(",")
  }

  /** Every non-null value must exist in `dim.dimCol` (FK reference).
    * `dim` should be the smaller side; it is broadcast-hinted. */
  final case class FkExists(col: String, dim: DataFrame, dimCol: String)
      extends Rule {
    def name = "fk_exists"; def target = col
  }

  private def violation(r: Rule): Column = r match {
    case NotNull(c)         => col(c).isNull
    case InRange(c, lo, hi) => col(c).isNotNull && !col(c).between(lo, hi)
    case InSet(c, vs)       => col(c).isNotNull && !col(c).isin(vs: _*)
    case Matches(c, re)     => col(c).isNotNull && !col(c).rlike(re)
    case r => throw new IllegalArgumentException(
      s"${r.name} is not a scalar rule") // Unique/FkExists handled apart
  }

  /** Run the suite; returns the report frame
    * `(rule, target, violations, total, pass)` ordered by (rule,
    * target). `total` is the frame's row count on every row (the
    * denominator a completeness ratio needs). One aggregate pass for
    * all scalar rules together; one key-column shuffle per [[Unique]];
    * one anti-join per [[FkExists]].
    */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "validation needs at least one rule")
    val ids = rules.zipWithIndex
    val scalar = ids.filter(_._1 match {
      case _: Unique | _: FkExists => false
      case _                       => true
    })
    val spark = df.sparkSession
    import spark.implicits._

    // ONE aggregate job carries every scalar counter AND the row count;
    // its single output row is metadata-sized, so collecting it is the
    // honest way to fan it back out as report rows (a per-rule plan
    // would re-scan per rule). sum over an EMPTY frame is NULL — zero
    // rows hold zero violations.
    val (total: Long, scalarRows: Seq[(String, String, Long)]) =
      if (scalar.isEmpty) (df.count(), Seq.empty[(String, String, Long)])
      else {
        val aggs = scalar.zipWithIndex.map { case ((r, _), j) =>
          sum(when(violation(r), 1L).otherwise(0L)).as(s"__v$j")
        } :+ count(lit(1)).as("__total")
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        (row.getLong(scalar.size),
          scalar.zipWithIndex.map { case ((r, _), j) =>
            (r.name, r.target, if (row.isNullAt(j)) 0L else row.getLong(j))
          })
      }
    val scalarReport: Option[DataFrame] =
      if (scalarRows.isEmpty) None
      else Some(scalarRows.toDF("rule", "target", "violations"))

    val grouped: Seq[DataFrame] = ids.collect {
      case (u @ Unique(cols), _) =>
        // groupBy() over ZERO columns is one whole-frame group — an
        // empty rule (an empty config list upstream) would report
        // every row of any multi-row frame as a violation
        require(cols.nonEmpty,
          "Unique() needs at least one column — an empty column list " +
            "would flag every row of the frame")
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1L)
          .agg(coalesce(sum(col("__n")), lit(0L)).as("violations"))
          .select(lit(u.name).as("rule"), lit(u.target).as("target"),
            col("violations"))
      case (f @ FkExists(c, dim, dimCol), _) =>
        df.filter(col(c).isNotNull)
          .join(broadcast(dim.select(col(dimCol).as(c)).distinct()),
            Seq(c), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(f.name).as("rule"), lit(f.target).as("target"),
            col("violations"))
    }

    (scalarReport.toSeq ++ grouped)
      .reduce(_.unionByName(_))
      .withColumn("total", lit(total))
      .withColumn("pass", col("violations") === 0L)
      .orderBy(col("rule"), col("target"))
  }

  /** `report` distilled to a gate: true iff every rule passes — the
    * land/quarantine routing bit. */
  def passes(df: DataFrame, rules: Seq[Rule]): Boolean =
    report(df, rules).filter(!col("pass")).limit(1).head(1).isEmpty
}
