package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.feature.{StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** The reference's ML surface (SURVEY §2.9) on the modern `spark.ml`
  * pipeline API — all models seeded for reproducibility (the reference
  * relied on default random init, HogDNS.scala:204-208; SURVEY §7.4 calls
  * out seeding as a required determinism fix).
  */
object Models {

  /** M1/M2/M5: z-normalized K-Means with the reference's cluster-taint
    * rule (HogDNS.scala:112-324): a cluster is "tainted" when it is small
    * (count < taintFraction·N) and dirty (mean of `dirtyCol` ≥
    * minDirtyRate). Returns the input plus (prediction, tainted).
    */
  def kmeansFlagger(
      df: DataFrame, featureCols: Seq[String], dirtyCol: String,
      k: Int, seed: Long = 42L,
      taintFraction: Double = 0.05, minDirtyRate: Double = 0.001): DataFrame = {
    val pipeline = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(featureCols.toArray).setOutputCol("rawFeatures"),
      new StandardScaler().setInputCol("rawFeatures").setOutputCol("features")
        .setWithMean(true).setWithStd(true), // A9's z-normalization (HogDNS.scala:168-199)
      new KMeans().setK(k).setSeed(seed).setFeaturesCol("features").setPredictionCol("prediction"),
    ))
    // the input feeds 3 stage fits + transform + stats: cache it so the
    // upstream aggregation isn't recomputed per pass
    df.cache()
    val out = pipeline.fit(df).transform(df).cache()
    val n = out.count()
    val taints = out.groupBy(col("prediction"))
      .agg(count(lit(1)).as("cluster_n"), avg(col(dirtyCol)).as("dirty_rate"))
      .withColumn("tainted",
        (col("cluster_n") < taintFraction * n && col("dirty_rate") >= minDirtyRate).cast("int"))
    val joined = out.join(broadcast(taints), Seq("prediction"))
    df.unpersist() // `out` stays cached: it backs the returned frame
    joined
  }

  /** M3: K-Means over histogram profiles (HogSFlowHistograms.scala:107-265):
    * buckets above `minWeight` form the vocabulary; each profile becomes a
    * dense vector of bucket frequencies ×100; members get their Euclidean
    * distance to the centroid. Input needs (key, buckets: map<string,double>).
    * The vocabulary is collected to the driver — it is the union of
    * significant bucket names (ports in the reference), small by
    * construction, and becomes a broadcast literal in the row-local
    * vectorizer.
    */
  def histogramKMeans(hist: DataFrame, k: Int, seed: Long = 42L,
      minWeight: Double = 0.001, maxVocab: Int = 10000): DataFrame = {
    hist.cache() // feeds vocab collect + fit + transform
    // vocabulary = significant bucket names; capped at the `maxVocab`
    // heaviest (by total weight) so a high-cardinality bucket domain at
    // scale can't OOM the driver — the cap is a distributed top-N, the
    // collect is bounded by construction
    val vocab: Seq[String] = hist
      .select(explode(map_filter(col("buckets"), (_, v) => v > minWeight)).as(Seq("b", "w")))
      .groupBy(col("b")).agg(sum(col("w")).as("tw"))
      .orderBy(col("tw").desc, col("b")).limit(maxVocab)
      .select("b").collect().map(_.getString(0)).sorted.toSeq
    val toVec = udf { (m: Map[String, Double]) =>
      Vectors.dense(vocab.map(b => m.getOrElse(b, 0.0) * 100).toArray)
    }
    val vecd = hist.withColumn("features", toVec(col("buckets")))
    val model = new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("prediction")
      .fit(vecd)
    val centers = model.clusterCenters
    val dist = udf { (v: Vector, c: Int) => math.sqrt(Vectors.sqdist(v, centers(c))) }
    model.transform(vecd).withColumn("distance", dist(col("features"), col("prediction")))
  }

  /** M4: the Snort-style supervised detector (HogSnort.scala:183-232):
    * StringIndexer per categorical column (+"IDX"), VectorAssembler, then
    * a seeded RandomForest. Rows with label < 0 (the reference's "discard"
    * class, P6) train nothing and get predictions only.
    *
    * Defaults are the reference's tuned knobs (HogSnort.scala:40,197-201):
    * maxBins=500, maxDepth=30 (Spark's depth ceiling), mtry=90 features
    * per split (clamped to the actual feature count when the surface is
    * narrower), and the 80% "malicious" decision threshold expressed as
    * per-class thresholds — pass e.g. Array(0.2, 0.8) for a binary label.
    */
  def randomForestLabeler(
      df: DataFrame, labelCol: String, catCols: Seq[String], numCols: Seq[String],
      numTrees: Int = 100, maxDepth: Int = 30, maxBins: Int = 500,
      featureSubsetStrategy: String = "90",
      thresholds: Option[Array[Double]] = None, seed: Long = 42L): DataFrame = {
    val indexers = catCols.map(c =>
      new StringIndexer().setInputCol(c).setOutputCol(c + "IDX").setHandleInvalid("keep"))
    val featCols = numCols ++ catCols.map(_ + "IDX")
    val assembler = new VectorAssembler()
      .setInputCols(featCols.toArray).setOutputCol("rawFeatures")
    val rf = rfEstimator(labelCol, featCols.size, numTrees, maxDepth, maxBins,
      featureSubsetStrategy, thresholds, seed)
    val pipeline = new Pipeline().setStages((indexers :+ assembler :+ rf).toArray)
    df.cache() // feeds indexer fits + RF fit + final transform
    val train = df.filter(col(labelCol) >= 0) // U1: labeled union only
    val model = pipeline.fit(train)
    model.transform(df)
  }

  /** The configured RF estimator — exposed so parity with the
    * reference's knobs is assertable (HogSnort.scala:40,197-201).
    */
  def rfEstimator(labelCol: String, numFeatures: Int,
      numTrees: Int = 100, maxDepth: Int = 30, maxBins: Int = 500,
      featureSubsetStrategy: String = "90",
      thresholds: Option[Array[Double]] = None,
      seed: Long = 42L): RandomForestClassifier = {
    // "90" asks for more features than narrow surfaces have; clamp like
    // mtry = min(90, p) so the strategy stays valid on any input
    val subset = featureSubsetStrategy match {
      case s if s.nonEmpty && s.forall(_.isDigit) =>
        math.max(1, math.min(s.toInt, numFeatures)).toString
      case s => s
    }
    val rf = new RandomForestClassifier()
      .setLabelCol(labelCol).setFeaturesCol("rawFeatures").setPredictionCol("prediction")
      .setNumTrees(numTrees).setMaxDepth(maxDepth).setMaxBins(maxBins)
      .setFeatureSubsetStrategy(subset).setSeed(seed)
      .setImpurity("gini")
    thresholds.foreach(rf.setThresholds)
    rf
  }

  /** Probability of the predicted class as a plain double column. */
  def predictionConfidence(scored: DataFrame): DataFrame =
    scored.withColumn("confidence",
      element_at(vector_to_array(col("probability")), col("prediction").cast("int") + 1))

  /** M6: the reference's dormant SVM-with-SGD path (HogDNS.scala:483-486)
    * on the modern API: z-scaled features → L2 LinearSVC, seeded.
    */
  def linearSvc(df: DataFrame, labelCol: String, numCols: Seq[String],
      maxIter: Int = 20, regParam: Double = 0.01): DataFrame = {
    val pipeline = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(numCols.toArray).setOutputCol("rawFeatures"),
      new StandardScaler().setInputCol("rawFeatures").setOutputCol("features")
        .setWithMean(true).setWithStd(true),
      new org.apache.spark.ml.classification.LinearSVC()
        .setLabelCol(labelCol).setFeaturesCol("features").setPredictionCol("prediction")
        .setMaxIter(maxIter).setRegParam(regParam),
    ))
    // cache feeds the multi-pass fit (scaler stats + SVC iterations);
    // the single transform pass after it doesn't need the cache, so
    // release before returning — same contract as kmeansFlagger (:44)
    df.cache()
    val model = pipeline.fit(df.filter(col(labelCol) >= 0))
    val out = model.transform(df)
    df.unpersist()
    out
  }
}
