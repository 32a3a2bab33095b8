package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway a whole-operator extension needs:
  * wrap a custom [[LogicalPlan]] node as a DataFrame. Spark offers no
  * public equivalent (SparkSessionExtensions injects rules and
  * strategies but not plan CONSTRUCTION), so extension libraries ship
  * exactly this shim in the `org.apache.spark.sql` package — nothing
  * else from the internal surface is touched.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
