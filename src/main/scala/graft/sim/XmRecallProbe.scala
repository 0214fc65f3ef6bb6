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
  * spec cannot answer. Candidate generation and the exact ground
  * truth are the SHARED production helpers
  * ([[SimilarityQueries.xmCandidatePairs]] /
  * [[SimilarityQueries.xmExactTop10]]), same as the spec.
  *
  * Usage: sbt "runMain graft.sim.XmRecallProbe /tmp/graft_sf1"
  * Optional extra operating points as "<tables>:<planesBoost>" args.
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

    def sets(df: DataFrame): Map[Long, Set[Long]] =
      df.select(col("media_id").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (m, rs) => m -> rs.map(_._2).toSet }

    val corpus = graft.core.Tables.embeddings(spark, dir).count()
    val basePlanes = SimilarityQueries.xmPlanes(corpus)
    println(s"[xmrecall] dir=$dir corpus=$corpus basePlanes=$basePlanes")

    val exact = sets(SimilarityQueries.xmExactTop10(spark, dir))
    println(s"[xmrecall] fleet=${exact.size}")

    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.toSeq.map { case (m, ex) =>
        approx.getOrElse(m, Set.empty).intersect(ex).size.toDouble / ex.size }
      per.sum / per.size
    }
    def point(label: String, tables: Int, boost: Int, df: DataFrame): Unit = {
      val p = math.min(12, basePlanes + boost)
      val r = recall(sets(df))
      val c = SimilarityQueries.xmCandidatePairs(spark, dir, p, tables).count()
      println(f"[xmrecall] $label%-8s planes=$p%d tables=$tables%d recall@10=$r%.3f candidates=$c%d")
    }

    point("default", 1, 0, SimilarityQueries.q236Plan(spark, dir))
    // the promoted point's table count is ADAPTIVE (r20): derive it
    // exactly as xmTopK does so the probe labels the operating point
    // actually shipped
    val promotedTables = SimilarityQueries.xmTables(math.min(12, basePlanes + 2))
    point("promoted", promotedTables, 2, SimilarityQueries.xmTopK(spark, dir))
    args.drop(1).foreach { spec =>
      val Array(tb, pb) = spec.split(":").map(_.toInt)
      point("extra", tb, pb, SimilarityQueries.xmTopK(spark, dir, tables = tb, planesBoost = pb))
    }
    spark.stop()
  }
}
