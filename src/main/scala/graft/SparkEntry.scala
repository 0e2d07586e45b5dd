package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Operator implementations live in the module objects; this object is the
  * registry the driver's Verify/Bench harness consumes.
  */
object SparkEntry {
  private def modules: Seq[OpModule] = Seq(
    ops.RelationalOps,
    ops.AggWindowOps,
    ops.ScalarFnOps,
    ops.GraphOps,
    ops.DedupOps,
    ops.SimOps,
    ops.TextOps,
    ops.CustomExprOps,
    ops.StatsOps,
    ops.PipelineOps,
    ops.ExtraOps,
    ops.QualityOps,
    ops.OlapOps,
    streaming.StreamOps)

  lazy val allOps: Seq[Op] = {
    val all = modules.flatMap(_.ops)
    require(all.map(_.key).distinct.size == all.size, "duplicate op keys")
    all
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    allOps.map(o => o.key -> o.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    allOps.flatMap(o => o.oracle.map(sql => o.key -> sql)).toMap
}
