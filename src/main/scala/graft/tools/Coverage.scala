package graft.tools

import graft.SparkEntry

/** Ground-truth registry counts for COVERAGE.md's generated totals header
  * (see tools/update_coverage.sh). Constructing the query map runs no
  * Spark — entries are closures — so this is instant and exact; a
  * hand-typed header drifted twice (r9, r10) and is banned. */
object Coverage {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.size
    val o = SparkEntry.oracleSql.size
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    println(s"COVERAGE queries=$q oracles=$o rows_only=${rowsOnly.size}" +
      (if (rowsOnly.nonEmpty) rowsOnly.mkString(" [", ",", "]") else ""))
  }
}
