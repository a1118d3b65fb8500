package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the distributed BPE trainer's symbolization
  * checkpoint cadence ([[Bpe.ReprCkptEvery]]): runs the over-cap fixture
  * (BpeSpec's >MaxTypes synthetic dictionary) through
  * [[Bpe.fitMergesDistributed]] at several cadences, repeats each inside
  * ONE JVM (no per-point sbt/JVM overhead, shared JIT warm-up), and
  * reports first/min per cadence. Run raw-java with the spark-jars
  * classpath (scripts/bench.sh shows the flags); results recorded in
  * PLANS.md and reflected in the [[Bpe.ReprCkptEvery]] doc.
  *
  * Args: [reps] [cadences-csv] — defaults 3 and 1,2,4,8.
  */
object BpeCadenceBench {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(3)
    val cadences = args.drop(1).headOption
      .map(_.split(",").toSeq.map(_.toInt)).getOrElse(Seq(1, 2, 4, 8))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dictDf = spark.range(Bpe.MaxTypes + 5)
      .select(concat(lit("w"), col("id").cast("string")).as("w"), lit(1L).as("f"))
      .cache()
    dictDf.count() // pay the input build once, outside every timed run

    def run(cadence: Int): Double = {
      val t0 = System.nanoTime()
      val ms = Bpe.fitMergesDistributed(dictDf, Bpe.Merges, cadence)
      val dt = (System.nanoTime() - t0) / 1e9
      require(ms.nonEmpty)
      dt
    }
    run(cadences.last) // JIT/codegen warm-up round, untimed

    val rows = cadences.map { c =>
      val ts = (1 to reps).map(_ => run(c))
      (c, ts.head, ts.min, ts)
    }
    println(f"${"cadence"}%8s ${"first"}%8s ${"min"}%8s  all")
    rows.foreach { case (c, first, mn, ts) =>
      println(f"$c%8d $first%8.1f $mn%8.1f  ${ts.map(t => f"$t%.1f").mkString(" ")}")
    }
    spark.stop()
  }
}
