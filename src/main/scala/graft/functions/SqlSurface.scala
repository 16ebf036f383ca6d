package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-string API surface (SURVEY.md §3.1 — the reference's
  * `tableEnv.sqlQuery(...)` entry point, StreamingFlinkSQL.java:35-39).
  *
  * The engine's tables are exposed as temp views and queried with
  * `spark.sql` — the same Catalyst plans as the DSL forms (Spark parses
  * SQL and DSL into one logical algebra), demonstrated by `sql_agg`
  * sharing agg_basic's oracle verbatim.
  */
object SqlSurface {

  val tableNames = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register only the named views — each registration costs a file
    * listing + parquet footer read, so registering all 10 tables per query
    * added ~0.7 s of pure metadata overhead at bench time. */
  def registerViews(spark: SparkSession, dir: String,
      tables: Seq[String] = tableNames): Unit = {
    tables.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case t => Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
  }

  /** TPC-H Q1-shaped aggregate through the SQL parser — ANSI SQL accepted
    * by both Spark and DuckDB, so the oracle is THIS string. */
  val aggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       SUM(l_quantity) AS sum_qty,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |       SUM(l_quantity) / COUNT(*) AS avg_qty,
      |       COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def sqlAgg(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir, Seq("lineitem"))
    spark.sql(aggSql)
  }

  /** Correlated scalar subquery — Catalyst decorrelates it into a left
    * outer join + aggregate (RewriteCorrelatedScalarSubquery), which is
    * the scale-safe plan; the SQL text runs unchanged in DuckDB. */
  val subquerySql: String =
    """SELECT c_custkey, c_name,
      |       (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_price,
      |       (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
      |FROM customer ORDER BY c_custkey""".stripMargin

  def sqlSubquery(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir, Seq("customer", "orders"))
    spark.sql(subquerySql)
  }
}
