package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("vector ops: dot/norm/cosine on known values; zero-norm guarded") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(2.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f))
    ).toDF("a", "b")
    val r = df.select(
      VectorOps.dot(col("a"), col("b")),
      VectorOps.cosine(col("a"), col("b"))).collect()
    assert(r(0).getDouble(0) == 4.0 && math.abs(r(0).getDouble(1) - 0.8) < 1e-12)
    assert(r(1).getDouble(1) == 0.0)
    assert(r(2).getDouble(1) == 0.0) // zero-norm → 0, not NaN
  }

  test("brute-force top-k ranks by cosine with id tiebreak") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val r = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0),
        "vec_id", "embedding", k = 3)
      .orderBy("rank").collect().map(_.getLong(1))
    assert(r.toSeq == Seq(1L, 3L, 2L))
  }

  test("IVF ANN: cells partition the corpus; probed search never beats brute force") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val (cells, centroids) = Similarity.ivfAssign(emb, "vec_id", "embedding", nCells = 8)
    assert(centroids.length == 8)
    assert(cells.count() == emb.count()) // every vector lands in exactly one cell
    assert(cells.select("cell").distinct().count() <= 8)
    val queries = emb.filter($"vec_id" < 5)
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nCells = 8, nProbe = 2)
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 1)
      .select($"query_id", $"cos".as("best_cos"))
    val cmp = ivf.groupBy($"query_id").agg(max($"cos").as("ivf_cos"))
      .join(bf, Seq("query_id"))
    assert(cmp.filter($"ivf_cos" > $"best_cos" + 1e-9).isEmpty)
    assert(ivf.groupBy($"query_id").count().collect().forall(_.getLong(1) <= 5))
  }

  test("LSH ANN: same-vector pairs always share a bucket; recall vs brute force sane") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val ann = Similarity.lshTopK(emb, "vec_id", "embedding", k = 5)
    // every query's ANN cosines must be <= its brute-force best
    val bf = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 10),
      "vec_id", "embedding", k = 1)
      .select($"query_id", $"cos".as("best_cos"))
    val joined = ann.filter($"query_id" < 10)
      .groupBy($"query_id").agg(max($"cos").as("ann_cos"))
      .join(bf, Seq("query_id"))
      .withColumn("le", $"ann_cos" <= $"best_cos" + 1e-9)
    assert(joined.filter(!$"le").isEmpty)
    // signature is deterministic across evaluations
    val s1 = emb.select(Similarity.hyperplaneSignature($"embedding", 16).as("s"))
      .agg(sum($"s")).head().getLong(0)
    val s2 = emb.select(Similarity.hyperplaneSignature($"embedding", 16).as("s"))
      .agg(sum($"s")).head().getLong(0)
    assert(s1 == s2)
  }
}
