package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graftfns.DotProductL

/** SparkSessionExtensions entry point — how a cluster user plugs graft
  * into ANY session (`--conf spark.sql.extensions=graft.GraftExtensions`)
  * without touching application code.
  *
  * Registers the library's native Catalyst expressions as SQL functions
  * so `spark.sql("SELECT dot_l(a, b) ...")` reaches the codegen'd
  * implementation. This is deliberately the ONLY extension point in
  * use: graft's design principle (SURVEY.md §3) is declarative plans
  * that Catalyst already optimizes — custom `Expression`s where
  * built-ins are interpreted fallbacks (the vector hot path), and no
  * custom Strategy/LogicalPlan because no operator here has semantics
  * the built-in operators cannot express.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_l"),
      new ExpressionInfo(classOf[DotProductL].getName, "dot_l"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "dot_l(arrayOfLong, arrayOfLong)")
        DotProductL(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("hex_slice"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graftfns.HexSliceToLong]
        .getName, "hex_slice"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // start/len are plan-time Int parameters of the expression (the
        // codegen loop is unrolled against them), so the SQL form
        // requires BARE integer literals — foldable expressions like
        // 1+0 are rejected too, because constant folding runs after
        // function resolution
        require(children.length == 3,
          "hex_slice(hexString, startLiteral, lenLiteral)")
        def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
                   what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"hex_slice: $what must be an integer literal, got $other")
        }
        org.apache.spark.sql.graftfns.HexSliceToLong(children.head,
          intLit(children(1), "start"), intLit(children(2), "len"))
      }))
  }
}
