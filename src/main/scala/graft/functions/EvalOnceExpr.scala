package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.DataType

/** Optimizer barrier: the IDENTITY on `child` at runtime, but marked
  * non-deterministic so Catalyst will not substitute the child
  * expression into predicates pushed below the projection that names
  * it (the spark_optimization_guide §4.4 duplicate-evaluation fix,
  * applied to expensive JVM expressions instead of Python UDFs).
  *
  * Why it exists here: `cand.withColumn("dist", levenshtein(a, b,
  * cap)).filter(dist >= 0 && dist*1000 <= budget)` over a join gets
  * the filter folded INTO the join condition with `dist` replaced by
  * the levenshtein call — the banded DP (the edit family's dominant
  * verify cost) then runs up to THREE times per candidate pair (twice
  * in the join condition, once in the output projection; measured as
  * two ~20 s task-time stages at sf0.1 where one suffices). Wrapping
  * the DP in EvalOnce keeps the projection intact: one evaluation,
  * filter above it on the attribute. Row-level semantics are exactly
  * the child's — only optimizer placement changes, which the oracle
  * gate proves by unchanged hashes. */
case class EvalOnceExpr(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "eval_once"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)

  override protected def withNewChildInternal(newChild: Expression): EvalOnceExpr =
    copy(child = newChild)
}

object EvalOnce {
  /** Column form: identity, evaluated exactly where it is projected. */
  def evalOnce(c: Column): Column = Bridge.column(EvalOnceExpr(Bridge.expression(c)))
}
