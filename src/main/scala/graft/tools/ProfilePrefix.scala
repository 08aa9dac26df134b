package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Dev scratch: stage-by-stage timing of the prefix-Jaccard pipeline. */
object ProfilePrefix {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window
    val tau = 0.5
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pp] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    val corpus = Dedup.plantedCorpus(graft.Tables.documents(spark, sfDir))
    val base = corpus.select(col("doc_id").as("id"),
        graft.functions.NativeExpressions.shingleHashesMd5(spark,
          TextAnalysis.tokens(col("text"))).as("hs"))
      .persist()
    t("base count")(base.count())
    val ex = base.select(col("id"), explode(col("hs")).as("h"))
    val dfc = ex.groupBy("h").agg(count(lit(1)).as("df"))
    t("dfc count")(dfc.count())
    val w = Window.partitionBy("id")
    val ranked = ex.join(dfc, Seq("h"))
      .select(col("id"), col("h"),
        row_number().over(w.orderBy(col("df"), col("h"))).as("rn"),
        count(lit(1)).over(w).as("sz"))
    val pref = ranked
      .filter(col("rn") <= col("sz") - ceil(col("sz") * tau) + 1)
      .select(col("id"), col("sz"), col("h"))
    t("pref count")(pref.count())
    val cand = pref.as("a").join(pref.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
          col("b.sz") >= ceil(col("a.sz") * tau) &&
          col("a.sz") >= ceil(col("b.sz") * tau))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    t("cand count")(cand.count())
    val out = cand
      .join(base.select(col("id").as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Dedup.jaccard(col("hs_a"), col("hs_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= tau)
    t("verify+full")(out.count())
    t("full end-to-end")(out.count())
    spark.stop()
  }
}
