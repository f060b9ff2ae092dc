package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSimilarity, HllDistinct, KmvDistinct, MinHashSig, NfcNormalize, QtComponent}

/** Session-extensions entry point: installs graft's native Catalyst
  * functions at session BUILD time via
  * `--conf spark.sql.extensions=graft.GraftExtensions`, the idiomatic
  * deployment route for a Spark library (no per-session register()
  * calls, works from pure-SQL clients like Thrift/Connect, survives in
  * every new session of the cluster).
  *
  * The per-session `X.register(spark)` helpers remain for programmatic
  * use; both routes resolve to the same Expression classes, so plans and
  * results are identical. ExtensionsSpec drives a fresh session through
  * this class and cross-checks against the register() route.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

    // each function's SQL builder lives on its object and is SHARED with
    // the per-session register() route — defaults and arity checks exist
    // in exactly one place, so the two routes cannot diverge
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two numeric arrays"),
      CosineSimilarity.builder _))

    QtComponent.names.zipWithIndex.foreach { case (n, i) =>
      ext.injectFunction((FunctionIdentifier(n),
        info(n, s"$n(t) - the ${Seq("subject", "predicate", "object")(i)} " +
          "of a quoted RDF-star triple"),
        QtComponent.builder(i) _))
    }

    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(text) - Unicode NFC canonicalization"),
      NfcNormalize.builder _))

    ext.injectFunction((FunctionIdentifier("kmv_distinct"),
      info("kmv_distinct",
        "kmv_distinct(hash, k[, domainBits]) - KMV distinct-count sketch"),
      KmvDistinct.builder _))

    ext.injectFunction((FunctionIdentifier("hll_distinct"),
      info("hll_distinct",
        "hll_distinct(hash, p[, domainBits]) - HyperLogLog distinct-count sketch"),
      HllDistinct.builder _))

    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(text[, k[, numHashes[, portable]]]) - per-row MinHash signature"),
      MinHashSig.builder _))
  }
}
