package graft.functions

import org.apache.spark.sql.SparkSessionExtensions

/** Spark extensions entry point: configure
  * `spark.sql.extensions=graft.functions.GraftExtensions` to get the graft
  * function family registered at session build time (the cluster-deploy
  * path; [[GraftFunctions.register]] is the equivalent imperative path for
  * sessions we don't build). Both paths iterate
  * [[GraftFunctions.builders]], so they cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach(ext.injectFunction(_))
}
