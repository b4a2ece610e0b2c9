package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tier C — LLM-data-pipeline operators (dedup, similarity, text analysis,
  * multimodal, sessionization). Populated incrementally; see SURVEY.md §2
  * tier C.
  */
object Pipeline {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracleSql: Map[String, String] = Map()
}
