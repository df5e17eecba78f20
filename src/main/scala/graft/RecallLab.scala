package graft

import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** ANN recall lab (dev tool, not part of the driver contract): measures
  * recall@5 of each approximate path against the exact brute-force top-k
  * on a given sf dir, so recall floors in `SimilarityQueries` are set
  * from measured values, not guesses.
  *
  * Usage: runMain graft.RecallLab [sfDir]
  */
object RecallLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Engine.session()
    import spark.implicits._

    val emb = Tables(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" % 20 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteTopK(emb, queries, "embedding", "vec_id", 5))
    def report(name: String, ann: org.apache.spark.sql.DataFrame): Unit = {
      val p = pairs(ann)
      println(f"RECALL $name ${(exact & p).size.toDouble / exact.size}%.4f " +
        s"(exact=${exact.size}, ann=${p.size})")
    }
    report("srp", Similarity.srpTopK(emb, queries, "embedding", "vec_id", 5, probes = 2))
    report("ivf", Similarity.ivfTopK(emb, queries, "embedding", "vec_id", 5))
    report("ivfpq", Similarity.ivfPqTopK(emb, queries, "embedding", "vec_id", 5))
    for (nmax <- Seq(6, 8, 10); band <- Seq(0.15, 0.25, 0.4))
      report(f"ivfpq-adaptive nmax=$nmax band=$band rerank=60",
        Similarity.ivfPqTopK(emb, queries, "embedding", "vec_id", 5,
          rerank = 60, nprobeMax = nmax, adaptiveBand = band))
    spark.stop()
  }
}
