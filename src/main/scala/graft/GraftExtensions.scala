package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{SipHash64, VecDot}

/** Spark session extensions for the graft engine: registers the custom
  * Catalyst expressions (`siphash64`, `vec_dot`) into the SQL function
  * registry. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((SipHash64.functionIdentifier, SipHash64.expressionInfo, SipHash64.builder))
    ext.injectFunction((VecDot.functionIdentifier, VecDot.expressionInfo, VecDot.builder))
  }
}
