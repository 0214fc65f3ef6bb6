package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: recall@10 and scanned-candidate counts for the
  * cross-modal retrieval paths — the q236 catalog default and the
  * promoted [[SimilarityQueries.xmTopK]] point — against the EXACT
  * cosine top-10 over the full folded corpus, at any SF directory.
  *
  * XmTopKSpec pins these numbers on the sf0.01 fixture (0.950 vs
  * 0.833 at a smaller candidate set); this probe extends the
  * measurement to the 10×/100× replicas, where the ADAPTIVE plane
  * policy moves the operating point (xmPlanes grows with the corpus,
  * xmTopK adds its boost on top) — the scale question a fixed-fixture
  * spec cannot answer.
  *
  * Usage: sbt "runMain graft.sim.XmRecallProbe /tmp/graft_sf1"
  */
object XmRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window

    def sets(df: DataFrame): Map[Long, Set[Long]] =
      df.select(col("media_id").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (m, rs) => m -> rs.map(_._2).toSet }

    val corpus = graft.core.Tables.embeddings(spark, dir).count()
    val basePlanes = SimilarityQueries.xmPlanes(corpus)
    println(s"[xmrecall] dir=$dir corpus=$corpus basePlanes=$basePlanes")

    // exact cosine top-10 per media (brute force; rank filters get the
    // map-side WindowGroupLimit, so the 1B-row 100x case stays bounded)
    val exact = sets(SimilarityQueries.xmQueryFeatures(spark, dir)
      .select(col("media_id"), col("qv"))
      .crossJoin(SimilarityQueries.xmDocIndex(spark, dir, basePlanes)
        .select(col("vec_id"), col("dv")))
      .withColumn("cos", expr("cosine_similarity(dv, qv)"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("media_id")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rk") <= 10))
    println(s"[xmrecall] fleet=${exact.size}")

    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.toSeq.map { case (m, ex) =>
        approx.getOrElse(m, Set.empty).intersect(ex).size.toDouble / ex.size }
      per.sum / per.size
    }
    def candCount(planes: Int, tables: Int): Long = {
      val qf = SimilarityQueries.xmQueryFeatures(spark, dir)
      (0 until tables).map { t =>
        val probes = qf
          .withColumn("qbucket",
            expr(SimilarityQueries.xmBucketExpr("qv", planes, 90 + t * planes)).cast("int"))
          .select(col("media_id"),
            explode(array(col("qbucket") +: (0 until planes).map(p =>
              col("qbucket").bitwiseXOR(lit(1 << p)).cast("int")): _*)).as("probe"))
        SimilarityQueries.xmDocIndex(spark, dir, planes, 90 + t * planes)
          .join(probes, col("bucket") === col("probe"))
          .select(col("media_id"), col("vec_id"))
      }.reduce(_ unionAll _).distinct().count()
    }

    val rDefault = recall(sets(SimilarityQueries.q236Plan(spark, dir)))
    val cDefault = candCount(basePlanes, 1)
    println(f"[xmrecall] default  planes=$basePlanes%d tables=1 recall@10=$rDefault%.3f candidates=$cDefault%d")
    val boosted = math.min(12, basePlanes + 2)
    val rTopK = recall(sets(SimilarityQueries.xmTopK(spark, dir)))
    val cTopK = candCount(boosted, 4)
    println(f"[xmrecall] promoted planes=$boosted%d tables=4 recall@10=$rTopK%.3f candidates=$cTopK%d")
    // optional extra operating points: "<tables>:<planesBoost>" args
    args.drop(1).foreach { spec =>
      val Array(tb, pb) = spec.split(":").map(_.toInt)
      val p = math.min(12, basePlanes + pb)
      val r = recall(sets(SimilarityQueries.xmTopK(spark, dir, tables = tb, planesBoost = pb)))
      val c = candCount(p, tb)
      println(f"[xmrecall] extra    planes=$p%d tables=$tb%d recall@10=$r%.3f candidates=$c%d")
    }
    spark.stop()
  }
}
