package graft.ts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A labeled univariate series. The canonical DataFrame schema across the
  * engine is `(id LONG, label DOUBLE, data ARRAY<DOUBLE>)`; multivariate
  * series use long format `(id, dim, label, data)` so per-dimension fitting
  * is a `groupBy(dim)` (SURVEY §1.5).
  */
final case class TSRecord(id: Long, label: Double, data: Array[Double])

/** Readers for the reference's text formats
  * (/root/reference/src/main/java/sfa/timeseries/TimeSeriesLoader.java):
  *  - S1 UCR: `label,v1,...,vn` (`,` or whitespace separated, sniffed),
  *    `@` header lines and NaN/empty cells skipped, ragged rows allowed,
  *    each series z-normed on load (:31-83);
  *  - S2 multivariate: `sampleId ts label dim1..dimK`, timestamp ignored
  *    (:169-223);
  *  - S5/S6 plain value-per-line / series-per-line readers (:258-315).
  *
  * z-normalization is an explicit parameter here, not the reference's
  * global `APPLY_Z_NORM` static (SURVEY §1.4).
  */
object Loaders {

  private def parseUcrLine(line: String): Option[(Double, Array[Double])] = {
    val t = line.trim
    if (t.isEmpty || t.startsWith("@")) None
    else {
      val sep = if (t.contains(",")) "[,\\s]+" else "\\s+"
      val cells = t.split(sep).filter(c => c.nonEmpty && !c.equalsIgnoreCase("NaN"))
      if (cells.length < 2) None
      else Some((cells(0).toDouble, cells.drop(1).map(_.toDouble)))
    }
  }

  /** z-norm a whole series in place semantics of TimeSeries.norm(true):
    * subtract mean, divide by population σ (σ==0 ⇒ divide by 1).
    */
  def znorm(data: Array[Double], normMean: Boolean = true): Array[Double] = {
    var sum = 0.0
    var sq = 0.0
    data.foreach { x => sum += x; sq += x * x }
    val mean = sum / data.length
    val buf = sq / data.length - mean * mean
    val std = if (buf > 0) math.sqrt(buf) else 0.0
    val inv = if (std != 0) 1.0 / std else 1.0
    if (normMean) data.map(x => (x - mean) * inv) else data.map(_ * inv)
  }

  /** S1, local form (tests, golden fixtures): ragged rows supported. */
  def loadUcrLocal(path: String, applyZNorm: Boolean = true): Array[TSRecord] = {
    val src = scala.io.Source.fromFile(path)
    try {
      src.getLines().flatMap(parseUcrLine).zipWithIndex.map { case ((label, data), i) =>
        TSRecord(i.toLong, label, if (applyZNorm) znorm(data) else data)
      }.toArray
    } finally src.close()
  }

  /** S1, Spark form: `spark.read.text` + per-line parse. The file order
    * gives series ids (UCR fixtures are small; at scale ids would come
    * from the storage layout).
    */
  def loadUcr(spark: SparkSession, path: String, applyZNorm: Boolean = true): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path)
    val z = applyZNorm
    lines.rdd.zipWithIndex().flatMap { case (line, i) =>
      parseUcrLine(line).map { case (label, data) =>
        TSRecord(i, label, if (z) znorm(data) else data)
      }
    }.toDF()
  }

  /** S2, Spark form: space-separated `sampleId ts label dim1..dimK` →
    * long format (id, dim, label, data), point order by timestamp column
    * position; timestamp values themselves are ignored (reference reads
    * and discards them).
    */
  def loadMultivariate(spark: SparkSession, path: String, applyZNorm: Boolean = true): DataFrame = {
    val raw = spark.read
      .option("delimiter", " ")
      .option("inferSchema", "false")
      .csv(path)
    val cols = raw.columns
    val dims = cols.length - 3
    val z = applyZNorm
    import spark.implicits._
    val parsed = raw.select(
      col(cols(0)).cast("long").as("id"),
      col(cols(1)).cast("double").as("ts"),
      col(cols(2)).cast("double").as("label"),
      array((3 until cols.length).map(i => col(cols(i)).cast("double")): _*).as("vals"))
    val long = parsed
      .select(col("id"), col("ts"), col("label"), posexplode(col("vals")).as(Seq("dim", "v")))
      .groupBy("id", "dim", "label")
      .agg(sort_array(collect_list(struct(col("ts"), col("v")))).as("pts"))
      .select(col("id"), col("dim"), col("label"),
        expr("transform(pts, p -> p.v)").as("data"))
    if (!z) long
    else {
      val znormUdf = udf((d: Seq[Double]) => znorm(d.toArray))
      long.withColumn("data", znormUdf(col("data")))
    }
    // dims recorded for callers that need the channel count
  }

  /** S4: derivative channels |x[i]−x[i−1]| appended with dim offset —
    * doubles the dimensionality (TimeSeriesLoader.java:225-241). Pure
    * built-ins: no shuffle beyond the input's. The reference allocates
    * double[n] and fills d[0..n−2], so the derivative series KEEPS the
    * original length with a trailing 0.0 — dropping it would lose one
    * sliding window per derivative dimension.
    */
  def withDerivatives(mts: DataFrame, numDims: Int): DataFrame = {
    val deriv = mts
      .withColumn("dim", col("dim") + lit(numDims))
      .withColumn("data",
        expr("concat(transform(slice(data, 2, size(data) - 1), (x, i) -> abs(x - data[i])), array(0.0D))"))
    mts.unionByName(deriv)
  }

  /** S3, local form: ARFF multivariate rows — `\\n`-escaped dimension
    * blocks, `?` = missing (skipped), string labels mapped to doubles via
    * the shared `classMapping` (novel labels get size+1), `@`/`%`/empty
    * lines ignored (TimeSeriesLoader.java:93-167). Returns long-format
    * records (id, dim, label, data).
    */
  def loadArffLocal(
      path: String,
      name: String,
      classMapping: scala.collection.mutable.Map[String, Double]): Array[(Long, Int, Double, Array[Double])] = {
    val src = scala.io.Source.fromFile(path)
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Double, Array[Double])]
      var id = 0L
      for (raw <- src.getLines()) {
        if (!(raw.contains("@") || raw.contains("%") || raw.isEmpty)) {
          val line = raw.replaceAll("\\\\n", ";")
          val labelStr = line.substring(line.lastIndexOf(",") + 1)
          val label = labelStr.toDoubleOption.getOrElse {
            val key = s"${name}_$labelStr"
            classMapping.getOrElseUpdate(key, classMapping.size + 1.0)
          }
          val body = line.substring(1, line.lastIndexOf(",") - 1)
          body.split(";").zipWithIndex.foreach { case (dimension, dim) =>
            val vals = dimension.split(",").filter(_ != "?").flatMap(_.toDoubleOption)
            out += ((id, dim, label, vals))
          }
          id += 1
        }
      }
      out.toArray
    } finally src.close()
  }

  /** S5: one long series, first whitespace-separated value per line. */
  def readSampleSubsequenceLocal(path: String): Array[Double] = {
    val src = scala.io.Source.fromFile(path)
    try src.getLines().map(_.trim).filter(_.nonEmpty)
      .map(_.split("\\s+")(0).toDouble).toArray
    finally src.close()
  }

  /** S6: one query series per whitespace-separated line (no label). */
  def readQuerySeriesLocal(path: String): Array[Array[Double]] = {
    val src = scala.io.Source.fromFile(path)
    try src.getLines().map(_.trim).filter(_.nonEmpty)
      .map(_.split("\\s+").map(_.toDouble)).toArray
    finally src.close()
  }

  /** S7: seeded Gaussian random walk (TimeSeriesLoader.java:321-332). */
  def randomWalk(n: Int, seed: Long): Array[Double] = {
    val rnd = new java.util.Random(seed)
    val out = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += rnd.nextGaussian(); out(i) = acc; i += 1 }
    out
  }
}
