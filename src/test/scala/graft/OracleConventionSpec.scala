package graft

import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, MapType, StructType}

/** Repo-wide oracle-output conventions (round-9 verdict lesson): the
  * driver's hash canonicalizes parquet DECIMAL differently from DuckDB
  * decimal, so a value-identical DECIMAL output column still
  * hash-mismatches. DECIMAL is an intermediate-exactness tool only —
  * every query's OUTPUT schema must be decimal-free.
  *
  * Batch queries are audited here by building each plan's analyzed
  * schema (construction is cheap at sf0.001; only the bounded
  * driver-solve entries run small jobs). Streaming entries execute a
  * whole micro-batch stream at construction, so they are audited
  * post-Verify by `tools/audit_decimal.py` over the committed parquet
  * outputs instead (which covers the batch half a second time). */
class OracleConventionSpec extends SparkTestBase {

  private def hasDecimal(dt: DataType): Boolean = dt match {
    case _: DecimalType => true
    case s: StructType  => s.fields.exists(f => hasDecimal(f.dataType))
    case a: ArrayType   => hasDecimal(a.elementType)
    case m: MapType     => hasDecimal(m.keyType) || hasDecimal(m.valueType)
    case _              => false
  }

  test("no batch query emits a DECIMAL-typed output column (at any nesting)") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("q_stream_"))
      .flatMap { q =>
        val schema = SparkEntry.queries(q)(spark, sfSmoke).schema
        if (schema.fields.exists(f => hasDecimal(f.dataType)))
          Some(s"$q: ${schema.simpleString}")
        else None
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
