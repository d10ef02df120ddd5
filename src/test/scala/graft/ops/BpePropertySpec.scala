package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Distributed BPE must equal a straightforward driver-side reference
  * (greedy leftmost merging, count-desc/lexicographic rule selection) on
  * random corpora — including merge rules that produce multi-character
  * symbols and adjacent self-pairs.
  */
class BpePropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bpe-prop-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Reference BPE: vocab of (word, count), k merge rounds. */
  private def referenceBpe(
      words: Map[String, Long], k: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Seq[String], Long] =
      words.toSeq
        .groupMapReduce[Seq[String], Long] { case (w, _) =>
          w.map(_.toString).toSeq
        } { case (_, n) => n }(_ + _)
    (1 to k).flatMap { step =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.indices.dropRight(1).foreach { i =>
          val p = (syms(i), syms(i + 1))
          pc(p) = pc.getOrElse(p, 0L) + n
        }
      }
      if (pc.isEmpty) None
      else {
        val ((a, b), cnt) = pc.minBy { case ((x, y), c) => (-c, x, y) }
        vocab = vocab.toSeq.groupMapReduce[Seq[String], Long] { case (syms, _) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.toSeq
        } { case (_, n) => n }(_ + _)
        Some((step, a, b, cnt))
      }
    }
  }

  test("distributed BPE == reference on random corpora (3 seeds)") {
    import spark.implicits._
    // tiny alphabet → heavy pair collisions, multi-char merges, self-pairs
    val alphabet = "abc"
    for (seed <- Seq(11, 42, 77)) {
      val rnd = new scala.util.Random(seed)
      val words = (1 to 60).map { _ =>
        (1 to (1 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(3))).mkString
      }
      val text = words.mkString(" ")
      val docs = Seq((1L, text)).toDF("doc_id", "text")
      val k = 5
      val got = TextOps.bpeTrainMerges(docs, k)
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      val wordCounts = words.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val expected = referenceBpe(wordCounts, k)
      assert(got === expected, s"seed $seed corpus: $text")
    }
  }

  /** Reference encode: apply the learned rules in rank order, each by
    * greedy leftmost merging — the convention [[referenceBpe]] trains
    * under — and return the token count of the word's final split.
    */
  private def referenceEncode(
      merges: Seq[(Int, String, String, Long)])(w: String): Int = {
    var syms: Seq[String] = w.map(_.toString)
    merges.foreach { case (_, a, b, _) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += a + b; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toSeq
    }
    syms.length
  }

  test("bpeEncodeCounts == reference leftmost encode per document (3 seeds)") {
    import spark.implicits._
    val alphabet = "abc"
    for (seed <- Seq(11, 42, 77)) {
      val rnd = new scala.util.Random(seed)
      val words = (1 to 60).map { _ =>
        (1 to (1 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(3))).mkString
      }
      // three documents over the SAME corpus vocabulary the trainer sees
      val docs = words.grouped(20).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toSeq.toDF("doc_id", "text")
      val k = 5
      val wordCounts = words.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val merges = referenceBpe(wordCounts, k)
      val enc = referenceEncode(merges) _
      val expected = words.grouped(20).zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws.size.toLong, ws.map(enc(_).toLong).sum)
      }.toSeq
      val got = TextOps.bpeEncodeCounts(docs, k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(got === expected, s"seed $seed")
    }
  }

  test("bpeEncodeCounts with k=0 counts one token per character") {
    import spark.implicits._
    val docs = Seq((1L, "abc de F!G hi7")).toDF("doc_id", "text")
    // words: abc, de, f, g, hi7 → 5 words, 3+2+1+1+3 = 10 chars
    val r = TextOps.bpeEncodeCounts(docs, 0).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 5L, 10L)))
  }
}
