package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{SynActions, Tables}
import graft.operators.SpadlOps
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All registered operators. Each Q pairs the Spark implementation with a
    * value-golden DuckDB oracle (or rows-only when not SQL-expressible). */
  def all: Seq[Q] =
    SpadlQueries.all ++ RepairQueries.all ++ RelationalQueries.all ++ ConverterQueries.all ++ VaepQueries.all ++
      XtQueries.all ++ AtomicQueries.all ++ TextQueries.all ++
      AtomicVaepQueries.all ++ DedupQueries.all ++ SimilarityQueries.all ++ MultimodalQueries.all ++
      MlQueries.all ++ XgQueries.all ++ StreamingQueries.all ++ StatsBombQueries.all ++ OptaQueries.all ++
      WyscoutQueries.all ++ KloppyQueries.all ++ TokenQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full SPADL normalizer chain (clearance repair, direction fix,
    * dribble synthesis, resequencing) over the synthetic action stream. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val actions = SynActions.fromEvents(Tables.events(spark, dir))
    SpadlOps.addDribbles(
      SpadlOps.fixDirectionOfPlay(
        SpadlOps.fixClearances(actions), SynActions.homeTeamId))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
