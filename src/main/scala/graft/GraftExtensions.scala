package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{DotProductD, MinHashSigExpr, ShingleHashesExpr}
import graft.operators.Dedup

/** SQL surface for the engine's custom expressions.
  *
  * Two registration paths with identical function sets:
  *  - `spark.sql.extensions=graft.GraftExtensions` (cluster config /
  *    builder.withExtensions) — the SparkSessionExtensions route;
  *  - `GraftFunctions.register(spark)` — imperative, for an already
  *    running session.
  *
  * After either, plain SQL can call the codegen'd engine primitives:
  *   SELECT graft_dot(a.embedding, b.embedding) FROM ...
  *   SELECT graft_minhash_sig(text) FROM documents
  */
object GraftFunctions {
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> ((es: Seq[Expression]) => DotProductD(es(0), es(1))),
    "graft_minhash_sig" -> ((es: Seq[Expression]) => MinHashSigExpr(es.head, Dedup.ShingleK)),
    "graft_shingle_hashes" -> ((es: Seq[Expression]) => ShingleHashesExpr(es.head, Dedup.ShingleK)))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        (es: Seq[Expression]) => builder(es)))
    }
    // whole-operator planner rule (CosineTopK → CosineTopKExec)
    ext.injectPlannerStrategy(_ => graft.plans.CosineTopKStrategy)
  }
}
