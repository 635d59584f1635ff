package graft.model

import org.apache.spark.sql.types._

/** Field algebra for the pipe DSL — the Spark-native re-expression of
  * Cascading's `Fields` (named + optionally typed field lists with wildcard
  * selectors; cf. reference `types/tuple/TupleTypeInfo.java:325-347` for
  * positional/relative resolution semantics).
  *
  * Unlike the reference we resolve all schemas eagerly at DSL-build time
  * (Cascading also resolves them at plan time), so the lowered plan is a
  * plain DataFrame program with a concrete `StructType` on every edge.
  */
sealed trait FieldSelector

object FieldSelector {
  /** All incoming fields (Cascading `Fields.ALL`). */
  case object All extends FieldSelector
  /** Only the operation's declared result fields (`Fields.RESULTS`). */
  case object Results extends FieldSelector
  /** Incoming minus argument fields, plus results (`Fields.SWAP`). */
  case object Swap extends FieldSelector
  /** The operation's argument fields (`Fields.ARGS`); as an OUTPUT
    * selector, same-named results substitute for the argument columns. */
  case object Args extends FieldSelector
  // No `Fields.UNKNOWN`: schemas here resolve eagerly at DSL-build time
  // (see class doc), so arity-unknown dynamic field lists cannot exist —
  // positional `Named("0", "-1", …)` selectors cover UNKNOWN's legitimate
  // uses with a concrete schema on every edge.
  /** Incoming fields with result fields overwriting same-named (`Fields.REPLACE`). */
  case object Replace extends FieldSelector
  /** The grouping key fields (valid after a GroupBy/CoGroup). */
  case object Group extends FieldSelector
  /** The non-key value fields (valid after a GroupBy/CoGroup). */
  case object Values extends FieldSelector
  /** An explicit list of field names; positional names ("0", "-1")
    * resolve against the post-op field list — incoming then appended
    * results — at lowering time (reference `TupleTypeInfo.java:325-347`
    * relative resolution). */
  final case class Named(names: Seq[String]) extends FieldSelector

  def apply(names: String*): FieldSelector = Named(names)

  /** Resolve a selector against incoming schema / arg fields / result fields.
    * Mirrors Cascading's output-selector semantics. */
  def resolveOutput(sel: FieldSelector, incoming: Seq[String],
                    args: Seq[String], results: Seq[String]): Seq[String] =
    sel match {
      case All     => incoming ++ results.filterNot(incoming.contains)
      case Results => results
      case Args    => args
      case Swap    => incoming.filterNot(args.contains) ++ results
      case Replace => incoming // results overwrite same-named in place
      case Group | Values =>
        throw new IllegalArgumentException(
          s"selector $sel is only valid in grouping context")
      case Named(ns) =>
        // positional names resolve against the POST-op field list
        // (incoming then appended results) — same rule as the lowering's
        // selectOutput, so both resolution paths agree
        val avail = incoming ++ results.filterNot(incoming.contains)
        ns.map(resolvePos(_, avail))
    }

  /** Negative-position names like "-1" resolve relative to the end. */
  def resolvePos(name: String, incoming: Seq[String]): String =
    if (name.matches("-?\\d+")) {
      val i = name.toInt
      val idx = if (i < 0) incoming.length + i else i
      require(idx >= 0 && idx < incoming.length,
        s"position $name out of range for ${incoming.mkString(",")}")
      incoming(idx)
    } else name
}

/** A named, optionally typed field list — `CFields ⇄ StructType`. */
final case class CFields(fields: Seq[(String, DataType)]) {
  def names: Seq[String] = fields.map(_._1)
  def toStruct: StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = true) })
  def ++(other: CFields): CFields = CFields(fields ++ other.fields)
}

object CFields {
  def of(names: String*): CFields =
    new CFields(names.map(n => (n, StringType: DataType)))
  def typed(fields: (String, DataType)*): CFields = new CFields(fields)
  def fromStruct(st: StructType): CFields =
    new CFields(st.fields.toSeq.map(f => f.name -> f.dataType))
}
