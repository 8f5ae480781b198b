package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge

/** SQL-name registration for the engine's native expressions, so
  * `spark.sql("SELECT json_get(props, 'k') ...")` works alongside the
  * Column API. Session-scoped (temp functions). */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "json_get", {
      case Seq(json, key) =>
        val k = key match {
          case l: org.apache.spark.sql.catalyst.expressions.Literal =>
            l.value.toString
          case other =>
            throw new IllegalArgumentException(
              s"json_get key must be a string literal, got $other")
        }
        JsonGetScalar(json, k)
    })
    Bridge.registerFunction(spark, "cosine", {
      case Seq(a, b) => CosineSimilarity(a, b)
    })
  }
}
