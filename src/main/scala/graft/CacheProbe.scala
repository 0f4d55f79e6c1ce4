package graft
import org.apache.spark.sql.functions._
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.newSession("cacheprobe", "local[32]", 32)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(l: String)(f: => Unit): Unit = {
      val t0=System.nanoTime(); f
      println(f"[cp] $l%-44s wall=${(System.nanoTime()-t0)/1e9}%6.3f")
    }
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents")
    noop(docs.select("doc_id")) // warm
    t("scan documents (all cols)") { noop(docs) }
    t("scan documents (all cols) again") { noop(docs) }
    t("scan doc_id only") { noop(docs.select("doc_id")) }
    t("scan text only") { noop(docs.select("text")) }
    t("scan + repartition(32)") { noop(docs.repartition(32)) }
    t("scan + length(text)") { noop(docs.select(length(col("text")))) }
    println(docs.columns.mkString(","))
    spark.stop()
  }
}
