package graft.tools
object CountQ {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size} oracles_without_query=${(o -- q).mkString(",")}")
    println(s"no_oracle=${(q -- o).toList.sorted.mkString(",")}")
  }
}
