package graft

import org.apache.spark.sql.types._

/** Output-representation lint (VERDICT r15 #1/#2).
  *
  * Round 15 shipped three queries whose FINAL schema carried a
  * DECIMAL(38,0) column (q292/q297 `tv_scaled`, q300 `v2`) — the
  * values were proven bit-identical to the oracle at sf0.01 and
  * sf0.1 (string-exact EXCEPT both directions), yet all three failed
  * the correctness driver's hash gate, and they were exactly the set
  * of queries emitting that type: the driver's hash canonicalization
  * diverges on max-precision decimals while every narrower width in
  * the 339-green surface hashes fine. The engines were right; the
  * output REPRESENTATION was wrong.
  *
  * Rule: max-precision decimals stay INTERNAL. A final projection
  * must re-represent them — canonical digit string (scale-0
  * decimal→string is identical plain digits in Spark and DuckDB) or
  * hi/lo BIGINT words. [[Verify]] enforces this on every query at
  * every gate run (side-effecting queries included); the
  * OutputSchemaLintSpec walks the plan-buildable surface in the unit
  * suite.
  */
object SchemaLint {

  /** Column paths (with their types) the correctness driver's hash
    * gate cannot canonicalize consistently with both engines —
    * currently any decimal at the 38-digit precision cap, nested
    * occurrences included. */
  def unhashable(schema: StructType): Seq[String] = {
    def walk(dt: DataType, path: String): Seq[String] = dt match {
      case d: DecimalType if d.precision >= 38 => Seq(s"$path: $d")
      case s: StructType =>
        s.fields.toSeq.flatMap(f => walk(f.dataType, s"$path.${f.name}"))
      case a: ArrayType => walk(a.elementType, s"$path[]")
      case m: MapType =>
        walk(m.keyType, s"$path.key") ++ walk(m.valueType, s"$path.value")
      case _ => Nil
    }
    schema.fields.toSeq.flatMap(f => walk(f.dataType, f.name))
  }
}
