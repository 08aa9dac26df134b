package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** The one `private[sql]` doorway a custom logical operator needs: wrap a
  * [[LogicalPlan]] back into a user-facing DataFrame. Spark keeps
  * `Dataset.ofRows` package-private; every extension library that ships
  * its own logical nodes re-exposes it from inside the `sql` package tree
  * exactly like this. Nothing else from the internals is re-exported.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
