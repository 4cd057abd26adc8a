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

  test("extensions class injects the same function set") {
    val names = GraftFunctions.all.map(_._1).toSet
    assert(names == Set("graft_dot", "graft_minhash_sig", "graft_shingle_hashes"))
    // the extensions route is exercised by constructing the injector
    new GraftExtensions() // must instantiate cleanly for spark.sql.extensions
  }
}
