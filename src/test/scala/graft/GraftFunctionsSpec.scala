package graft

import org.apache.spark.sql.functions._

class GraftFunctionsSpec extends SparkSpec {

  test("registered SQL functions expose the codegen expressions") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_fn_test")
    val viaSql = spark.sql("""
      SELECT vec_id, graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
                               CAST(embedding AS ARRAY<DOUBLE>)) AS d
      FROM emb_fn_test ORDER BY vec_id LIMIT 5""").collect()
    assert(viaSql.length == 5)
    assert(viaSql.forall(_.getDouble(1) > 0.0))

    Tables.documents(spark, sf).createOrReplaceTempView("docs_fn_test")
    val sig = spark.sql(
      "SELECT graft_minhash_sig(text) AS sig FROM docs_fn_test LIMIT 3").collect()
    assert(sig.forall(_.getSeq[Long](0).length == graft.functions.HashFns.numPerms))

    val sh = spark.sql(
      "SELECT size(graft_shingle_hashes(text)) AS n FROM docs_fn_test LIMIT 3").collect()
    assert(sh.forall(_.getInt(0) > 0))
  }

  test("vector/hash family: norm, cosine, hamming match their Scala twins") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_fam_test")
    val rows = spark.sql("""
      SELECT a.vec_id,
        graft_norm(CAST(a.embedding AS ARRAY<DOUBLE>)) AS nrm,
        graft_cosine(CAST(a.embedding AS ARRAY<DOUBLE>),
                     CAST(b.embedding AS ARRAY<DOUBLE>)) AS cos_ab,
        graft_cosine(CAST(a.embedding AS ARRAY<DOUBLE>),
                     CAST(a.embedding AS ARRAY<DOUBLE>)) AS cos_aa
      FROM emb_fam_test a JOIN emb_fam_test b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id < 5 ORDER BY a.vec_id""").collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getDouble(1) > 0.0))
    assert(rows.forall(r => math.abs(r.getDouble(3) - 1.0) < 1e-9))
    assert(rows.forall(r => r.getDouble(2) >= -1.0 - 1e-9 && r.getDouble(2) <= 1.0 + 1e-9))
    // hamming over code words: popcount(xor), long-typed
    val h = spark.sql(
      "SELECT graft_hamming(CAST(5 AS BIGINT), CAST(3 AS BIGINT)) AS h").collect()
    assert(h.head.getLong(0) == 2L) // 101 xor 011 = 110
  }

  test("extensions class injects the same function set") {
    val names = GraftFunctions.all.map(_._1).toSet
    assert(names == Set("graft_dot", "graft_norm", "graft_cosine",
      "graft_hamming", "graft_minhash_sig", "graft_shingle_hashes"))
    // the extensions route is exercised by constructing the injector
    new GraftExtensions() // must instantiate cleanly for spark.sql.extensions
  }
}
