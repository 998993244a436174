package graft

import graft.ext.Dedup
import org.apache.spark.sql.functions._

/** Line-level exact dedup (CCNet/RefinedWeb boilerplate removal). */
class LineDedupSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "welcome to example dot com\nunique first body line\nshort"),
    (2L, "welcome to example dot com\nanother body entirely here\nshort"),
    (3L, "welcome to example dot com\nwelcome to example dot com\nthird doc body text"),
    (4L, "only original content here\nnothing shared with others")
  ).toDF("doc_id", "text")

  test("duplicatedLines finds cross-document lines with df counts") {
    val inv = Dedup.duplicatedLines(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().toSet
    // the banner is in 3 docs, 4 occurrences (doc 3 has it twice);
    // 'short' is exactly 5 chars, so it clears the default minChars
    assert(inv === Set(
      ("welcome to example dot com", 3L, 4L), ("short", 2L, 2L)))
  }

  test("duplicatedLines respects minDf and minChars") {
    assert(Dedup.duplicatedLines(docs, "doc_id", "text", minDf = 4)
      .count() === 0)
    // raising minChars past 5 drops 'short' from the inventory
    val longOnly = Dedup.duplicatedLines(docs, "doc_id", "text",
      minChars = 6).as[(String, Long, Long)].collect().toSet
    assert(longOnly === Set(("welcome to example dot com", 3L, 4L)))
  }

  test("stripDuplicatedLines removes every occurrence, keeps order") {
    val out = Dedup.stripDuplicatedLines(docs, "doc_id", "text")
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(out(0) === ((1L, "unique first body line", 2)))
    assert(out(1) === ((2L, "another body entirely here", 2)))
    assert(out(2) === ((3L, "third doc body text", 2)))
    assert(out(3) === ((4L,
      "only original content here\nnothing shared with others", 0)))
  }

  test("hashed and unhashed strip agree") {
    val a = Dedup.stripDuplicatedLines(docs, "doc_id", "text",
      hashed = true).orderBy("doc_id").collect().toSeq
    val b = Dedup.stripDuplicatedLines(docs, "doc_id", "text",
      hashed = false).orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("leading/trailing spaces trim for matching, lines drop whole") {
    val d2 = Seq(
      (1L, "  padded banner line  \nbody one"),
      (2L, "padded banner line\nbody two")).toDF("doc_id", "text")
    val inv = Dedup.duplicatedLines(d2, "doc_id", "text")
      .as[(String, Long, Long)].collect().toSet
    assert(inv === Set(("padded banner line", 2L, 2L)))
    val out = Dedup.stripDuplicatedLines(d2, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, Int)].collect()
    assert(out(0) === ((1L, "body one", 1)))
    assert(out(1) === ((2L, "body two", 1)))
  }

  test("pruneDuplicatesByScore keeps the best-scoring cluster member") {
    val docs = Seq(
      (1L, "a", 10), (2L, "b", 30), (3L, "c", 30),
      (4L, "d", 5), (5L, "solo", 1)).toDF("doc_id", "text", "quality")
    // cluster {1,2,3} (2 and 3 tie on score -> smaller id wins), {4}, {5}
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.pruneDuplicatesByScore(docs, pairs, "doc_id",
      col("quality")).select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 4L, 5L))
  }

  test("pruneDuplicatesByScore equals pruneDuplicates when score is -id") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (9L, "z"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 3L), (3L, 2L)).toDF("id_a", "id_b")
    val byScore = Dedup.pruneDuplicatesByScore(docs, pairs, "doc_id",
      -col("doc_id")).select("doc_id").as[Long].collect().toSet
    val byMin = Dedup.pruneDuplicates(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(byScore === byMin)
    assert(byMin === Set(1L, 9L))
  }

  test("doc reduced to nothing rebuilds as empty text") {
    val d3 = Seq(
      (1L, "the shared banner"),
      (2L, "the shared banner")).toDF("doc_id", "text")
    val out = Dedup.stripDuplicatedLines(d3, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, Int)].collect()
    assert(out.toSeq === Seq((1L, "", 1), (2L, "", 1)))
  }
}
