package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension installing graft's native expressions into the SQL
  * function registry, so `spark.sql("... vector_dot(a, b) ...")` plans
  * the codegen'd expression directly — the Catalyst-idiomatic way to ship
  * engine functions (usable via `.config("spark.sql.extensions",
  * "graft.functions.GraftExtensions")` on ANY session, no code changes),
  * rather than session-local UDF registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vectorDot)
    ext.injectFunction(GraftExtensions.vectorDotLong)
    ext.injectFunction(GraftExtensions.simHashAgg)
    ext.injectFunction(GraftExtensions.hllAgg)
    ext.injectFunction(GraftExtensions.mgSketch)
    ext.injectFunction(GraftExtensions.hash60)
    ext.injectFunction(GraftExtensions.minHashSig)
    // generator (UDTF) category: usable in LATERAL VIEW / generator position
    ext.injectFunction(GraftExtensions.shingleRows)
    // whole-operator extension: the native per-key top-k planner rule
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    // and its optimizer rewrite: window row_number<=k patterns with the
    // rank column dropped plan through the heap operator automatically
    ext.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)
  }
}

object GraftExtensions {
  val vectorDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vector_dot"),
    new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"vector_dot requires exactly 2 arguments, got ${children.length}")
      VectorDot(children.head, children(1))
    })

  val hash60: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hash60"),
    new ExpressionInfo(classOf[Hash60].getName, "hash60"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"hash60 requires exactly 1 argument, got ${children.length}")
      Hash60(children.head)
    })

  val minHashSig: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        s"minhash_sig requires exactly 3 arguments, got ${children.length}")
      MinHashSig(children.head, children(1), children(2))
    })

  val shingleRows: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("shingle_rows"),
    new ExpressionInfo(classOf[ShingleRows].getName, "shingle_rows"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"shingle_rows requires exactly 2 arguments, got ${children.length}")
      ShingleRows(children.head, children(1))
    })

  val simHashAgg: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash_agg"),
    new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_agg"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"simhash_agg requires exactly 1 argument, got ${children.length}")
      SimHashAgg(children.head)
    })

  val hllAgg: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hll_agg"),
    new ExpressionInfo(classOf[HllAgg].getName, "hll_agg"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"hll_agg requires exactly 1 argument, got ${children.length}")
      HllAgg(children.head)
    })

  val mgSketch: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("mg_sketch"),
    new ExpressionInfo(classOf[MgAgg].getName, "mg_sketch"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"mg_sketch requires exactly 2 arguments, got ${children.length}")
      require(children(1).foldable,
        "mg_sketch's second argument (k counters) must be a literal")
      val k = children(1).eval() match {
        case i: Int => i
        case other => throw new IllegalArgumentException(
          s"mg_sketch k must be an integer literal, got $other")
      }
      MgAgg(children.head, k)
    })

  val vectorDotLong: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vector_dot_long"),
    new ExpressionInfo(classOf[VectorDotLong].getName, "vector_dot_long"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"vector_dot_long requires exactly 2 arguments, got ${children.length}")
      VectorDotLong(children.head, children(1))
    })
}
