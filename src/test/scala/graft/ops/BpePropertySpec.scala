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
}
