package graft.tools

import org.apache.spark.sql.functions._
import graft._
import graft.sources.IndexStore
import graft.streaming.EventStreams

/** End-to-end demo of the persistence + SQL + streaming surfaces:
  * build/save/load/search a vector index, call the registered SQL
  * functions, run the stateful sessionizer. Mirrors the reference's
  * build→persist→query lifecycle (build_faiss_db.py → app.py).
  *
  * Usage: runMain graft.tools.IndexDemo [sfDir] [indexPath]
  */
object IndexDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val path = args.drop(1).headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_demo").toString + "/idx")
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, dir)
    IndexStore.write(emb, "vec_id", "embedding", path, dim = 64)
    IndexStore.writeMetadata(emb.select(col("vec_id"), col("label")), path)
    val index = IndexStore.read(spark, path)
    println(s"[demo] index persisted: ${index.count()} vectors, " +
      s"${index.select("band0").distinct().count()} band partitions at $path")

    val queries = emb.filter(col("vec_id") < 3)
    val exact = IndexStore.search(index, queries, "vec_id", "embedding", 5)
    println("[demo] exact top-5 via persisted index:")
    exact.orderBy("query_id", "rnk").show(15, truncate = false)

    val ann = IndexStore.searchAnn(index, queries, "vec_id", "embedding", 3, dim = 64)
    println(s"[demo] ann hits: ${ann.count()}")

    GraftFunctions.register(spark)
    Tables.documents(spark, dir).createOrReplaceTempView("docs")
    println("[demo] SQL surface:")
    spark.sql("""SELECT doc_id, graft_minhash_sig(text)[0] AS mh0,
                 size(graft_shingle_hashes(text)) AS n_shingles
                 FROM docs ORDER BY doc_id LIMIT 3""").show()

    val q = EventStreams.sessionizeStream(spark, dir)
      .writeStream.outputMode("append").format("memory").queryName("demo_sessions")
      .start()
    q.processAllAvailable()
    println(s"[demo] streamed closed sessions: ${spark.table("demo_sessions").count()}")
    q.stop()
    spark.stop()
  }
}
