package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Warehouse.optimizeZorder: the bucketed-table curve rewrite must (1)
  * change no rows, (2) preserve the bucket spec (co-location contract) at
  * one file per bucket, and (3) actually buy row-group pruning — a box
  * predicate on the curve columns must intersect a small fraction of row
  * groups, where the pre-optimize layout (bucket-key sort) intersects
  * nearly all of them.
  */
class WarehouseZorderSpec extends SparkSpec {
  import spark.implicits._

  private def rowGroupRanges(dir: String)
      : Seq[(Long, Long, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    val files = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("part-"))
    files.toSeq.flatMap { p =>
      val rd = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try rd.getFooter.getBlocks.asScala.map { b =>
        def range(c: String): (Long, Long) = {
          val st = b.getColumns.asScala
            .find(_.getPath.toDotString == c).get.getStatistics
          (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
        }
        val (xmin, xmax) = range("x"); val (ymin, ymax) = range("y")
        (xmin, xmax, ymin, ymax)
      }.toSeq
      finally rd.close()
    }
  }

  private def boxSurvivors(rgs: Seq[(Long, Long, Long, Long)],
                           lo: Long, hi: Long): Int =
    rgs.count { case (xmin, xmax, ymin, ymax) =>
      xmax >= lo && xmin <= hi && ymax >= lo && ymin <= hi }

  test("optimizeZorder: rows identical, spec preserved, row groups prune") {
    val table = "wh_zorder_spec"
    Warehouse.dropTableAndLocation(spark, table)
    val df = spark.range(200000).select(
      col("id"),
      pmod(xxhash64(col("id")), lit(4096L)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(4096L)).as("y"),
      sha2(col("id").cast("string"), 256).as("payload"))
    Warehouse.writeBucketed(df, table, "id", 4)
    val before = spark.table(table).orderBy("id").collect().toSeq
    val loc = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table)).location.toString
    val rgBefore = rowGroupRanges(loc)

    Warehouse.optimizeZorder(spark, table, Seq("x", "y"),
      rowGroupBytes = 128 * 1024)

    // (1) rows identical
    val after = spark.table(table).orderBy("id").collect().toSeq
    assert(after == before)
    // (2) bucket spec preserved, one file per bucket
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    assert(meta.bucketSpec.get.numBuckets == 4)
    assert(meta.bucketSpec.get.bucketColumnNames == Seq("id"))
    assert(Warehouse.maxFilesPerBucket(spark, table) == 1)
    // (3) pruning: a 64x64 box out of a 4096x4096 domain must intersect a
    // small fraction of the curve-ordered row groups; the bucket-key
    // layout has ~full-domain x/y stats in every group
    val rgAfter = rowGroupRanges(meta.location.toString)
    assert(rgAfter.size >= 8, s"need multiple row groups, got ${rgAfter.size}")
    val sBefore = boxSurvivors(rgBefore, 1000L, 1063L)
    val sAfter = boxSurvivors(rgAfter, 1000L, 1063L)
    // before: every group spans the whole domain → all survive
    assert(sBefore == rgBefore.size, s"$sBefore of ${rgBefore.size}")
    // a 64x64 box touches a handful of curve fragments per bucket file;
    // with ~36 groups per file that must prune the large majority
    assert(sAfter * 3 <= rgAfter.size,
      s"z-order pruning too weak: $sAfter of ${rgAfter.size} row groups")
    // and the filtered answer is unchanged by layout
    val p = col("x").between(1000, 1063) && col("y").between(1000, 1063)
    assert(spark.table(table).filter(p).count() ==
      df.filter(p).count())
    Warehouse.dropTableAndLocation(spark, table)
  }

  test("optimizeZorder refuses non-bucketed and partitioned tables") {
    val t = "wh_zorder_plain"
    Warehouse.dropTableAndLocation(spark, t)
    spark.range(10).toDF("id").write.saveAsTable(t)
    intercept[IllegalArgumentException] {
      Warehouse.optimizeZorder(spark, t, Seq("id", "id"))
    }
    Warehouse.dropTableAndLocation(spark, t)
  }

  test("curve = hilbert: rows identical, spec preserved, pruning at least " +
    "as strong as the bucket-key layout; bad curve args refused") {
    val table = "wh_hilbert_spec"
    Warehouse.dropTableAndLocation(spark, table)
    val df = spark.range(200000).select(
      col("id"),
      pmod(xxhash64(col("id")), lit(4096L)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(4096L)).as("y"),
      sha2(col("id").cast("string"), 256).as("payload"))
    Warehouse.writeBucketed(df, table, "id", 4)
    val before = spark.table(table).orderBy("id").collect().toSeq
    Warehouse.optimizeZorder(spark, table, Seq("x", "y"),
      rowGroupBytes = 128 * 1024, curve = "hilbert")
    val after = spark.table(table).orderBy("id").collect().toSeq
    assert(after == before)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    assert(meta.bucketSpec.get.numBuckets == 4)
    assert(Warehouse.maxFilesPerBucket(spark, table) == 1)
    val rg = rowGroupRanges(meta.location.toString)
    assert(rg.size >= 8, s"need multiple row groups, got ${rg.size}")
    val s = boxSurvivors(rg, 1000L, 1063L)
    assert(s * 3 <= rg.size,
      s"hilbert pruning too weak: $s of ${rg.size} row groups")
    intercept[IllegalArgumentException] {
      Warehouse.optimizeZorder(spark, table, Seq("x", "y", "x"),
        curve = "hilbert")
    }
    intercept[IllegalArgumentException] {
      Warehouse.optimizeZorder(spark, table, Seq("x", "y"), curve = "peano")
    }
    Warehouse.dropTableAndLocation(spark, table)
  }
}
