package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `Fields.UNKNOWN` escape hatch — dynamic-arity tuples resolved to a fixed
  * schema at plan time.
  *
  * The reference supports unknown-arity tuples end-to-end with a dedicated
  * serializer (`types/tuple/TupleTypeInfo.java:66-76`,
  * `UnknownTupleSerializer`); a Catalyst plan needs a fixed schema, so this
  * engine confines dynamic arity to the text entry points (SURVEY.md §1.3):
  * rows carry an `ArrayType(StringType)` token column, and `resolve` pins
  * the arity with ONE O(rows) max-size probe — a plan-construction action of
  * the same class as the scan-buffer stats barrier — then projects
  * positional fields `f0..f(n-1)`, null-padded where a row is shorter
  * (Cascading gives trailing-position misses the same null treatment via
  * `Tuple.get` bounds semantics). Downstream of `resolve` the flow is an
  * ordinary fixed-schema DataFrame: full pushdown/codegen, no Kryo rows.
  */
object DynamicArity {
  /** Pin `tokCol` (array&lt;string&gt;) to its observed maximum arity and
    * project positional columns `<prefix>0 .. <prefix>(n-1)`. */
  def resolve(df: DataFrame, tokCol: String, prefix: String = "f"): DataFrame = {
    val probed = df.agg(max(size(col(tokCol)))).head()
    val n = if (probed.isNullAt(0)) 0 else probed.getInt(0)
    require(n > 0, s"dynamic-arity resolve: no rows or empty $tokCol")
    // try_element_at: a row shorter than the resolved arity null-pads its
    // trailing positions instead of failing the flow
    df.select((0 until n).map(i =>
      try_element_at(col(tokCol), lit(i + 1)).as(s"$prefix$i")): _*)
  }
}
