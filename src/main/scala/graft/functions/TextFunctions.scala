package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column-level wrappers for the one-pass text kernels. */
object TextFunctions {

  /** `struct<n_tokens, n_distinct_tokens, sum_token_len>` in one pass
    * (see [[TokenStats]]).
    */
  def tokenStats(text: Column): Column =
    ColumnBridge.column(TokenStats(ColumnBridge.expression(text)))

  /** Frequency-weighted 64-bit SimHash in one pass (see [[SimHash64]]). */
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))
}
