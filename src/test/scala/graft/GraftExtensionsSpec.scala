package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions entry point: constructible by the reflective
  * no-arg path Spark uses, and injects every spec'd function without
  * touching a live session. (Live-session behavior of the same builders is
  * covered by every suite that calls GraftFunctions.register.) */
class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions is no-arg constructible and injects all functions") {
    val cls = Class.forName("graft.GraftExtensions")
    val ext = cls.getConstructor().newInstance()
      .asInstanceOf[SparkSessionExtensions => Unit]
    ext(new SparkSessionExtensions) // must not throw
  }

  test("function specs are unique and total") {
    val names = graft.functions.GraftFunctions.specs.map(_._1)
    assert(names.distinct == names)
    assert(names.toSet == Set("double_raw_bits", "float_raw_bits", "graft_dot",
      "graft_idot",
      "graft_minhash", "graft_simhash", "graft_word_hashes", "graft_shingles",
      "graft_shingles_all", "graft_shingles_all_wide", "graft_text_counts",
      "nearest_centroids",
      "graft_bloom_contains", "graft_bpe_tokens", "graft_byte_bpe_ids",
      "graft_byte_map_syms", "graft_lsh_buckets", "graft_nfc",
      "graft_unigram_tokens", "graft_gram_buckets"))
  }
}
