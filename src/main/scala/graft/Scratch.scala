package graft

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Tables.newSession("scratch", "local[8]", 8)
    val p = SparkEntry.queries("d12_registry_dedup")(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/d12_plan.txt"), p)
    println("[scratch] wrote")
    spark.stop()
  }
}
