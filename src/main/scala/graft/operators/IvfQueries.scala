package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style ANN (the coarse-quantizer scale path beside q29's
  * hyperplane LSH): k-means cells + nprobe search.
  *
  * Index build = 2 fixed Lloyd iterations, fully relational:
  *  - seed centroids: the K vectors with smallest md5(vec_id) —
  *    deterministic, engine-independent "random" init
  *  - assign: vectors × broadcast(centroids) → argmax cosine (window)
  *  - update: posexplode to (cell, dim, x) → avg → rebuild arrays;
  *    components rounded to 1e-6 so double-sum partition order can't
  *    drift cell boundaries between runs
  *
  * Search: queries probe the nprobe nearest cells, then scan ONLY those
  * cells via an equi-join on cell id — at 100 TB the candidate set per
  * query is |table|·nprobe/K instead of |table|, and the join is a hash
  * shuffle on cell, never a cross join. Storing vectors clustered by
  * cell (writeParquet partitionBy(cell)) makes the probe a partition-
  * pruned scan.
  */
object IvfQueries {

  private val K = 16
  private val Iterations = 2
  private val NProbe = 4
  private val TopK = 3

  private def normed(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", VectorMath.norm(s, "v"))

  /** argmax-cosine cell assignment against a broadcast centroid table
    * (cell, cv, cnrm). */
  private def assign(s: SparkSession, vectors: DataFrame, centroids: DataFrame): DataFrame =
    vectors.crossJoin(broadcast(centroids))
      .withColumn("sim", VectorMath.dot(s, "v", "cv") / (col("nrm") * col("cnrm")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cell"))))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))

  /** Build (vec_id, v, nrm, cell) assignments + final centroids. */
  def buildIndex(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val vectors = normed(s, dir).persist()
    var centroids = vectors
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(K)
      .withColumn("cell", row_number().over(Window.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))) - 1)
      .select(col("cell"), col("v").as("cv"), col("nrm").as("cnrm"))
      .persist()
    for (_ <- 1 to Iterations) {
      val assigned = assign(s, vectors, centroids)
      val updated = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(Det.rate(avg(col("x"))).as("cx"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pc"))
        .select(col("cell"), expr("transform(pc, p -> p.cx)").as("cv"))
      centroids = updated
        .withColumn("cnrm", VectorMath.norm(s, "cv"))
        .persist()
    }
    (assign(s, vectors, centroids).persist(), centroids)
  }

  /** q42: nprobe ANN search for the sampled query set. */
  private def q42(s: SparkSession, dir: String): DataFrame = {
    val (assigned, centroids) = buildIndex(s, dir)
    val queries = assigned.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    // probe the nprobe nearest cells per query
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("csim", VectorMath.dot(s, "qv", "cv") / (col("qn") * col("cnrm")))
      .withColumn("prk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("cell"))))
      .filter(col("prk") <= NProbe)
      .select(col("qid"), col("qv"), col("qn"), col("cell"))
    // equi-join on cell: scan only probed cells
    probes.join(
        assigned.select(col("vec_id").as("cid"), col("v").as("cv2"), col("nrm").as("cn"), col("cell")),
        Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", Det.rate(VectorMath.dot(s, "qv", "cv2") / (col("qn") * col("cn"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))).cast("long"))
      .filter(col("rn") <= TopK)
      .select(col("qid"), col("rn"), col("cid"), col("sim"), col("cell").cast("long").as("cell"))
      .orderBy(col("qid"), col("rn"))
  }

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q42_cosine_ivf", None, q42),
  )
}
