package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Add, Expression, Subtract}
import org.apache.spark.sql.types.DecimalType

/** Build-time guard for the invariant the r07 q_jl_projection bug broke:
  * any operator claiming an "order-independent decimal fold" must keep
  * its scale through Spark's decimal type derivation. A chained decimal
  * Add grows precision by 1 per node; once the chain hits the
  * 38-precision cap, `spark.sql.decimal.operations.allowPrecisionLoss`
  * (default true) silently DROPS scale digits for the remaining adds —
  * diverging from an exact-decimal oracle while still returning rows.
  *
  * The check walks every analyzed plan of the modules that use decimal
  * arithmetic (Similarity, Analytics, TextAnalysis) and asserts that no
  * decimal Add/Subtract node's result scale is below the natural scale
  * max(s_left, s_right) — the exact symptom of a capped fold. `Sum`
  * aggregates are structurally safe (precision+10, scale preserved) and
  * single adds can't cap unless already at precision 38, so a violation
  * here always means a too-long expression-tree fold that must move to
  * fixed-point Long arithmetic (the q_pca_top / q_kmeans / q_jl pattern).
  */
class DecimalFoldSpec extends SparkSpec {

  private def assertNoScaleLoss(name: String, df: DataFrame): Unit = {
    def check(e: Expression): Unit = e.foreach {
      case b @ (_: Add | _: Subtract) =>
        val ba = b.asInstanceOf[org.apache.spark.sql.catalyst.expressions.BinaryArithmetic]
        (ba.left.dataType, ba.right.dataType, ba.dataType) match {
          case (l: DecimalType, r: DecimalType, o: DecimalType) =>
            val natural = math.max(l.scale, r.scale)
            assert(o.scale >= natural,
              s"$name: decimal fold lost scale — ($l ± $r) -> $o; " +
                "precision capped at 38 mid-fold, switch to fixed-point Longs")
          case _ => ()
        }
      case _ => ()
    }
    df.queryExecution.analyzed.foreach(p => p.expressions.foreach(check))
  }

  private def sweep(mod: String,
                    qs: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame]): Unit =
    test(s"$mod: no decimal Add/Subtract drops scale in any query plan") {
      qs.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        assertNoScaleLoss(name, fn(spark, sfDir))
        CacheScope.drain()
      }
    }

  sweep("Similarity", operators.Similarity.queries)
  sweep("Analytics", operators.Analytics.queries)
  sweep("TextAnalysis", operators.TextAnalysis.queries)
}
