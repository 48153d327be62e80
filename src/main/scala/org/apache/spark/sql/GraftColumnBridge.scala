package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column <-> Catalyst Expression
  * converters (`org.apache.spark.sql.classic.ExpressionUtils`).
  *
  * Graft builds custom codegen'd `Expression`s (dot product, SimHash,
  * rolling hash, point-in-polygon, shingle generator) and exposes them as
  * `Column`s. Constructing the Column directly from the expression — as
  * opposed to `createOrReplaceTempFunction` + `call_function` — keeps the
  * Column builders free of session side effects: no mutation of whichever
  * session happens to be `SparkSession.active`, no races under concurrent
  * sessions (SQL-text access still goes through `GraftExtensions`'
  * injected functions). The package placement is the established pattern
  * for Spark-native libraries that need this internal seam.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
