package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge

/** SQL-name registration for the engine's native expressions, so
  * `spark.sql("SELECT json_get(props, 'k') ...")` works alongside the
  * Column API. Session-scoped (temp functions). */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "json_get", { args =>
      args match {
        case Seq(json, key) =>
          key match {
            case l: org.apache.spark.sql.catalyst.expressions.Literal
                if l.value != null =>
              JsonGetScalar(json, l.value.toString)
            case other =>
              throw new IllegalArgumentException(
                s"json_get key must be a non-null string literal, got $other")
          }
        case _ =>
          throw new IllegalArgumentException(
            s"json_get expects (json, key), got ${args.length} argument(s)")
      }
    })
    Bridge.registerFunction(spark, "cosine", { args =>
      args match {
        case Seq(a, b) => CosineSimilarity(a, b)
        case _ =>
          throw new IllegalArgumentException(
            s"cosine expects (array, array), got ${args.length} argument(s)")
      }
    })
  }
}
