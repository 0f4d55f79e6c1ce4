package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-style hashed-feature linear quality classifier: logistic
  * regression over hashed bag-of-tokens features, trained distributed.
  * The model-based complement of the heuristic filters — label a few
  * thousand documents (good reference vs crawl junk), train, score the
  * whole corpus with one broadcast pass. This is the shape behind the
  * public CCNet/fastText quality classifiers, re-expressed as Spark
  * aggregations instead of a single-node SGD loop.
  *
  * Scale design: the feature space is a fixed 2^bits hash domain, so the
  * dense weight vector is a few hundred KB — broadcast to executors for
  * scoring, and each iteration's gradient is folded into ONE dense
  * 2^bits-slot array per task and reduced to the driver (the
  * IVF-centroid precedent: the driver holds model-sized state, never
  * data-sized). Each iteration is one single-stage pass over the cached
  * feature rows; the corpus text is tokenized and hashed exactly once
  * up front.
  *
  * Batch gradient descent, not SGD, on purpose: gradients are sums over
  * the full training frame, so convergence does not depend on partition
  * order and training is reproducible run to run (up to float-sum
  * associativity, ~1 ulp — spec-pinned with a tolerance).
  */
object Classifier {

  /** Trained model: dense weights indexed by token bucket, plus a bias.
    * `bits` is carried so scoring can never probe with a mismatched hash
    * domain (the Int8Dot dim-guard contract).
    */
  final case class LinearModel(weights: Array[Double], bias: Double, bits: Int)

  /** Hashed Bernoulli bag-of-tokens features as a (buckets, values)
    * struct column: one entry per DISTINCT token bucket, value 1.0
    * (presence, not frequency). Presence features on purpose: the signal
    * a quality classifier learns is vocabulary MEMBERSHIP (junk/boiler
    * tokens vs reference prose), and presence keeps that signal at full
    * strength regardless of document length — a count/length tf feature
    * dilutes a 10-token junk suffix on a 500-token page to ~0.02 and
    * full-batch GD then needs thousands of iterations to move it.
    */
  private def featUdf(bits: Int) = udf { (s: String) =>
    val m = new java.util.HashSet[Int]
    if (s != null) {
      val toks = s.split("\\s+")
      var i = 0
      while (i < toks.length) {
        if (toks(i).nonEmpty)
          m.add(scala.util.hashing.MurmurHash3.stringHash(toks(i)) >>> (32 - bits))
        i += 1
      }
    }
    val ks = new Array[Int](m.size)
    val vs = new Array[Double](m.size)
    val it = m.iterator()
    var j = 0
    while (it.hasNext) { ks(j) = it.next(); vs(j) = 1.0; j += 1 }
    (ks, vs)
  }

  /** Train by full-batch gradient descent on `df`: `labelCol` must be
    * 0.0/1.0. One tokenize+hash pass is cached; each of `iters`
    * iterations runs one single-stage pass (broadcast weights) folding
    * dense per-task gradient arrays, reduced at the driver.
    */
  def train(df: DataFrame, textCol: String, labelCol: String,
            bits: Int = 18, iters: Int = 30, lr: Double = 2.0,
            l2: Double = 1e-6): LinearModel = {
    require(bits >= 4 && bits <= 24, s"bits=$bits outside [4,24]")
    val spark = df.sparkSession
    val dim = 1 << bits
    // the featurize pass is heavy row-local work on a fresh scan — spread
    // an under-split input across cores first (no-op on well-split input)
    val feats = graft.operators.Balance.input(df)
      .select(col(labelCol).cast("double").as("__y"),
        featUdf(bits)(col(textCol)).as("__f"))
      .select(col("__y"), col("__f._1").as("__ks"), col("__f._2").as("__vs"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val n = feats.count().toDouble
    val w = new Array[Double](dim)
    var b = 0.0
    if (n == 0) { feats.unpersist(); return LinearModel(w, b, bits) }
    // each iteration is ONE single-stage RDD job: every task folds its
    // partition's rows into a dense gradient array (2^bits + 1 doubles —
    // model-sized, the bias rides the last slot) and the driver merges
    // the partials. The former expression pipeline (residual UDF →
    // explode → groupBy(bucket) → collect) computed the same sums but
    // paid, PER ITERATION, a Catalyst analyze/optimize/codegen round
    // (~60 ms of driver gap between iterations, OptProbe r19), an
    // exchange job under AQE, and the explode's row blow-up. 20-iteration
    // training ran 47 sequential driver jobs; this shape runs 1 + iters.
    // Gradient values differ from the expression path only in float-sum
    // ORDER (per-bucket fold vs shuffled partial sums) — the same
    // associativity freedom the shuffle already had run-to-run; the spec
    // pins convergence with a tolerance, and consumers (t14, the c-tier
    // gates) re-score with whatever weights the run trained.
    val featRdd = feats.select(col("__y"), col("__ks"), col("__vs")).rdd
    var it = 0
    while (it < iters) {
      val bw = spark.sparkContext.broadcast(w)
      val bb = b
      val grad = featRdd.mapPartitions { rows =>
        val wv = bw.value
        val g = new Array[Double](wv.length + 1)
        rows.foreach { r =>
          val y = r.getDouble(0)
          val ks = r.getSeq[Int](1)
          val vs = r.getSeq[Double](2)
          var m = bb
          var i = 0
          while (i < ks.length) { m += wv(ks(i)) * vs(i); i += 1 }
          val res = 1.0 / (1.0 + math.exp(-m)) - y
          i = 0
          while (i < ks.length) { g(ks(i)) += res * vs(i); i += 1 }
          g(wv.length) += res
        }
        Iterator.single(g)
      }.reduce { (a, bArr) =>
        var i = 0
        while (i < a.length) { a(i) += bArr(i); i += 1 }
        a
      }
      var bk = 0
      while (bk < dim) {
        if (grad(bk) != 0.0 || w(bk) != 0.0)
          w(bk) = w(bk) - lr * (grad(bk) / n + l2 * w(bk))
        bk += 1
      }
      b -= lr * (grad(dim) / n)
      bw.destroy()
      it += 1
    }
    feats.unpersist()
    LinearModel(w, b, bits)
  }

  /** Persist a trained classifier as a warehouse table — the model
    * becomes a versionable cross-run artifact like the BPE merge table
    * and the dedup registries: a daily pipeline loads the blessed model
    * instead of retraining, and every cluster scores with bit-identical
    * weights. One row per feature bucket (idx ≥ 0 → weight); idx −1
    * carries the bias and idx −2 the feature-hash bit width — the whole
    * model in one schema-stable table.
    */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: LinearModel,
                table: String): Unit = {
    import spark.implicits._
    val rows = model.weights.zipWithIndex.map { case (w, i) => (i, w) }.toSeq ++
      Seq((-1, model.bias), (-2, model.bits.toDouble))
    rows.toDF("idx", "weight")
      .coalesce(1)
      .write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  /** Load a [[saveModel]] table back; weights land in bucket order. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                table: String): LinearModel = {
    val rows = spark.table(table).collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toMap
    val bits = rows(-2).toInt
    val w = new Array[Double](1 << bits)
    rows.foreach { case (i, v) => if (i >= 0) w(i) = v }
    LinearModel(w, rows(-1), bits)
  }

  /** P(label=1) per row under `model` — one broadcast row-local pass, no
    * shuffle; safe inside any scan→filter pipeline.
    */
  def score(spark: org.apache.spark.sql.SparkSession, model: LinearModel,
            text: Column): Column = {
    val bw = spark.sparkContext.broadcast(model.weights)
    val bits = model.bits
    val bias = model.bias
    val u = udf { (s: String) =>
      val wv = bw.value
      var m = bias
      if (s != null) {
        val seen = new java.util.HashSet[Int]
        val toks = s.split("\\s+")
        var i = 0
        while (i < toks.length) {
          if (toks(i).nonEmpty) {
            val b = scala.util.hashing.MurmurHash3.stringHash(toks(i)) >>> (32 - bits)
            if (seen.add(b)) m += wv(b)
          }
          i += 1
        }
      }
      1.0 / (1.0 + math.exp(-m))
    }
    u(text)
  }
}
