package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Throwaway isolation bench for the graph-tier cpu mystery: times each
  * piece of one HITS half-step under different structures. Not part of
  * any query path; deleted (or ignored) after the optimization round.
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Tables.newSession("graft-scratch", s"local[$cpus]", cpus)
    val cpuNs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null)
            cpuNs.addAndGet(m.executorCpuTime + m.executorDeserializeCpuTime)
        }
      })
    def time(label: String)(f: => Unit): Unit = {
      org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark)
      cpuNs.set(0)
      val t0 = System.nanoTime()
      f
      val w = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark)
      println(f"[scratch] $label%-50s wall=$w%7.3f cpu=${cpuNs.get / 1e9}%7.3f")
    }

    val parts = spark.sessionState.conf.numShufflePartitions
    val edges = Tables(spark, sfDir, "documents")
      .select(col("doc_id").as("src"),
        explode(array(
          pmod(col("doc_id") * 7 + 3, lit(1000)),
          pmod(col("doc_id") * 7 + 34, lit(1000)),
          pmod(col("doc_id") * 7 + 65, lit(1000)))).as("dst"))
    val eSrc = edges.select(col("src").as("e_src"), col("dst").as("e_dst"))
      .repartition(parts, col("e_src")).persist(StorageLevel.DISK_ONLY)
    val nodes = eSrc.select(col("e_src").as("node"))
      .union(eSrc.select(col("e_dst").as("node")))
      .distinct().persist(StorageLevel.DISK_ONLY)
    println(s"[scratch] nodes=${nodes.count()} edges=${eSrc.count()}")

    val h0 = nodes.withColumn("h_s", lit(164473684210L)).localCheckpoint()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmups
    noop(h0.join(eSrc, h0("node") === col("e_src"))
      .groupBy(col("e_dst").as("node")).agg(sum(col("h_s")).as("raw")))

    for (i <- 1 to 3) {
      time(s"half-step join+agg (run $i)") {
        noop(h0.join(eSrc, h0("node") === col("e_src"))
          .groupBy(col("e_dst").as("node")).agg(sum(col("h_s")).as("raw")))
      }
    }
    time("eSrc cache scan only") { noop(eSrc) }
    time("h0 scan only") { noop(h0) }
    time("join only (no agg)") {
      noop(h0.join(eSrc, h0("node") === col("e_src")))
    }
    time("agg over eSrc only (no join)") {
      noop(eSrc.groupBy(col("e_dst").as("node")).agg(count(lit(1))))
    }
    val eUnpersisted = edges.select(col("src").as("e_src"), col("dst").as("e_dst"))
      .repartition(parts, col("e_src")).localCheckpoint()
    time("half-step vs localCheckpoint edges") {
      noop(h0.join(eUnpersisted, h0("node") === col("e_src"))
        .groupBy(col("e_dst").as("node")).agg(sum(col("h_s")).as("raw")))
    }
    val eMem = edges.select(col("src").as("e_src"), col("dst").as("e_dst"))
      .repartition(parts, col("e_src")).persist(StorageLevel.MEMORY_AND_DISK)
    eMem.count()
    time("half-step vs MEMORY_AND_DISK edges") {
      noop(h0.join(eMem, h0("node") === col("e_src"))
        .groupBy(col("e_dst").as("node")).agg(sum(col("h_s")).as("raw")))
    }
    // shuffled-hash style: no broadcast of the vector
    time("half-step, broadcast disabled") {
      val s2 = org.apache.spark.sql.graftbridge.Bridge.cloneSession(spark)
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val h2 = s2.createDataFrame(h0.rdd, h0.schema)
      val e2 = s2.createDataFrame(eMem.rdd, eMem.schema)
      noop(h2.join(e2, h2("node") === col("e_src"))
        .groupBy(col("e_dst").as("node")).agg(sum(col("h_s")).as("raw")))
    }
    // --- aggregation drill-down ---
    def withConf(k: String, v: String)(body: org.apache.spark.sql.SparkSession => Unit): Unit = {
      val s2 = org.apache.spark.sql.graftbridge.Bridge.cloneSession(spark)
      s2.conf.set(k, v)
      body(s2)
    }
    time("agg count() over eSrc") {
      noop(eSrc.groupBy(col("e_dst")).count())
    }
    time("agg over eSrc, twolevel hashmap OFF") {
      withConf("spark.sql.codegen.aggregate.map.twolevel.enabled", "false") { s2 =>
        val e2 = s2.createDataFrame(eSrc.rdd, eSrc.schema)
        noop(e2.groupBy(col("e_dst")).agg(sum(col("e_src"))))
      }
    }
    time("agg over eSrc, vectorized map ON") {
      withConf("spark.sql.codegen.aggregate.map.vectorized.enable", "true") { s2 =>
        val e2 = s2.createDataFrame(eSrc.rdd, eSrc.schema)
        noop(e2.groupBy(col("e_dst")).agg(sum(col("e_src"))))
      }
    }
    time("agg over eSrc, codegen OFF") {
      withConf("spark.sql.codegen.wholeStage", "false") { s2 =>
        val e2 = s2.createDataFrame(eSrc.rdd, eSrc.schema)
        noop(e2.groupBy(col("e_dst")).agg(sum(col("e_src"))))
      }
    }
    time("agg over eSrc via RDD reduceByKey") {
      import spark.implicits._
      eSrc.as[(Long, Long)].rdd.map { case (s, d) => (d, s) }
        .reduceByKey(_ + _).foreach(_ => ())
    }
    time("agg repeat (cached codegen?)") {
      noop(eSrc.groupBy(col("e_dst")).agg(sum(col("e_src"))))
    }
    time("agg repeat 2") {
      noop(eSrc.groupBy(col("e_dst")).agg(sum(col("e_src"))))
    }
    spark.stop()
  }
}
