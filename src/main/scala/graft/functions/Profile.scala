package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass table profiler — the "what is in this 100 TB table" first
  * question of any ingestion pipeline. ONE global aggregation computes,
  * per requested column: row count, null count, and approximate distinct
  * cardinality from an [[HllAggregator]] sketch (fixed 2^p-byte registers,
  * so profiling a thousand columns holds 1000·2^p bytes of state total,
  * never per-value state). The wide 1-row aggregate is then unpivoted to
  * one row per column with `stack` — entirely inside the plan, no driver
  * action.
  *
  * Every emitted number is integer-exact cross-engine (counts, register
  * sums) except the final HLL estimate (one double division + optional
  * linear-counting ln, rounded to 4dp) — so the whole profile is
  * oracle-verifiable per column, sketch state included.
  */
object Profile {

  /** Both [[profileTable]] and [[oracleSql]] interpolate column names into
    * generated expressions (`stack(...)` literals, quoted SQL
    * identifiers); a name carrying a quote, backtick, comma, or double
    * quote would produce a malformed or injected expression, so such
    * names are rejected up front instead of failing obscurely mid-plan. */
  private def requireSafeNames(cols: Seq[String]): Unit = {
    val bad = cols.filter(c => c.isEmpty || c.exists("'`\",".contains(_)))
    require(bad.isEmpty,
      s"column names must be non-empty and free of quote/backtick/comma " +
        s"characters (they are interpolated into stack()/SQL literals); " +
        s"rejected: ${bad.mkString("[", ", ", "]")}")
  }

  /** Profile `cols` of `df` in one scan: `column_name, n_rows, n_nulls,
    * approx_distinct, s_scaled, zero_buckets`, one row per column, ordered
    * by column name. */
  def profileTable(df: DataFrame, cols: Seq[String], p: Int = 10): DataFrame = {
    require(cols.nonEmpty, "profileTable needs at least one column")
    requireSafeNames(cols)
    val hll = udaf(new HllAggregator(p))
    def nullSafeHash(c: Column): Column =
      coalesce(HllAggregator.md5Hash60(c), lit(-1L)) // -1 = skip sentinel

    val aggs: Seq[Column] =
      count(lit(1)).as("__n_rows") +:
        cols.flatMap { c =>
          Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
            hll(nullSafeHash(col(c))).as(s"__hll_$c"))
        }
    val wide = df.agg(aggs.head, aggs.tail: _*)

    // stack(k, name1, nulls1, hll1, ...) -> long format, still one plan.
    val stackArgs = cols.map { c =>
      s"'$c', `__nulls_$c`, `__hll_$c`.approx_distinct, `__hll_$c`.s_scaled, `__hll_$c`.zero_buckets"
    }.mkString(", ")
    wide.selectExpr("__n_rows",
        s"stack(${cols.size}, $stackArgs) AS (column_name, n_nulls, approx_distinct, s_scaled, zero_buckets)")
      .select(col("column_name"), col("__n_rows").as("n_rows"),
        col("n_nulls"), col("approx_distinct"), col("s_scaled"), col("zero_buckets"))
      .orderBy("column_name")
  }

  /** DuckDB mirror of [[profileTable]] for one table: UNION ALL of one
    * register-exact HLL block per column. Lives next to the operator so the
    * SQL and the Scala can't drift. */
  def oracleSql(table: String, cols: Seq[String]): String = {
    requireSafeNames(cols)
    val blocks = cols.map { c =>
      s"""(WITH h AS (
         |  SELECT ('0x' || substr(md5(CAST("$c" AS VARCHAR)), 1, 15))::UBIGINT AS hv
         |  FROM $table WHERE "$c" IS NOT NULL),
         |b AS (
         |  SELECT CAST(hv // 1125899906842624 AS BIGINT) AS bucket,
         |         CAST(hv % 1125899906842624 AS BIGINT) AS w
         |  FROM h),
         |r AS (
         |  SELECT bucket,
         |         max(CASE WHEN w = 0 THEN 51 ELSE 51 - length(bin(w)) END) AS rho
         |  FROM b GROUP BY 1),
         |agg AS (
         |  SELECT coalesce(CAST(sum(CAST(1 AS BIGINT) << (51 - rho)) AS BIGINT), 0)
         |           + (1024 - count(*)) * (CAST(1 AS BIGINT) << 51) AS s_scaled,
         |         1024 - count(*) + coalesce(CAST(sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT), 0) AS zero_buckets
         |  FROM r),
         |est AS (
         |  SELECT s_scaled, zero_buckets,
         |         (0.7213 / (1 + 1.079 / 1024.0)) * 1024.0 * 1024.0 * 2251799813685248.0
         |           / CAST(s_scaled AS DOUBLE) AS raw_est
         |  FROM agg)
         |SELECT '$c' AS column_name,
         |       (SELECT CAST(count(*) AS BIGINT) FROM $table) AS n_rows,
         |       (SELECT CAST(count(*) - count("$c") AS BIGINT) FROM $table) AS n_nulls,
         |       round(CASE WHEN raw_est <= 2.5 * 1024.0 AND zero_buckets > 0
         |                  THEN 1024.0 * ln(1024.0 / CAST(zero_buckets AS DOUBLE))
         |                  ELSE raw_est END, 4) AS approx_distinct,
         |       s_scaled, zero_buckets
         |FROM est)""".stripMargin
    }
    blocks.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }
}
