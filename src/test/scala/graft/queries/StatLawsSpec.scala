package graft.queries

import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}

/** Property checks for the round-8 stats family's integer-exact
  * predicates — pure Scala mirrors of the column expressions, proven
  * against BigDecimal arithmetic so no float rounding hides a boundary
  * bug.
  */
object StatLawsSpec extends Properties("graft stats integer predicates") {

  private val centsGen = Gen.listOfN(25, Gen.chooseNum(0L, 60000L))
    .suchThat(_.nonEmpty)

  /** Exact 2×median of longs (lower+upper middle — integral always). */
  private def med2(xs: Seq[Long]): Long = {
    val s = xs.sorted
    val n = s.length
    s((n - 1) / 2) + s(n / 2)
  }

  property("MAD flag dev2*20000 > mad22*44478 == |v-med| > 3*1.4826*MAD exactly") =
    forAll(centsGen) { vc =>
      val m2 = med2(vc)
      val dev2 = vc.map(v => math.abs(2 * v - m2))
      val mad22 = med2(dev2)
      // BigDecimal ground truth: |v - med| > 4.4478 * MAD with
      // med = m2/2, MAD = mad22/4 — all exact rationals scaled by 4:
      // 4|v-med| = 2*dev2, 4*4.4478*MAD = 4.4478*mad22.
      vc.zip(dev2).forall { case (_, d2) =>
        val intFlag = d2 * 20000L > mad22 * 44478L
        val exact = BigDecimal(2L * d2) > BigDecimal("4.4478") * BigDecimal(mad22)
        intFlag == exact
      }
    }

  property("Bollinger-style squared predicate (x·n−Σx)² > 4(nΣx²−(Σx)²) matches BigDecimal") =
    forAll(Gen.listOfN(12, Gen.chooseNum(0L, 5000L)).suchThat(_.size >= 2)) { xs =>
      val n = xs.length.toLong
      val sx = xs.sum
      val sxx = xs.map(x => x * x).sum
      xs.forall { x =>
        val lhs = BigDecimal(x * n - sx).pow(2)
        val rhs = BigDecimal(4L) * (BigDecimal(n) * BigDecimal(sxx) - BigDecimal(sx).pow(2))
        val intFlag = {
          val d = x * n - sx
          d * d > 4L * (n * sxx - sx * sx)
        }
        intFlag == (lhs > rhs)
      }
    }

  property("ntile bucket arithmetic matches the spec: first n%B buckets get one extra") =
    forAll(Gen.chooseNum(1, 200), Gen.chooseNum(1, 12)) { (n, b) =>
      // the closed-form used by SparkOps.distributedNtile
      def bucketOf(k: Long, n: Long, b: Long): Long =
        if (k <= (n % b) * (n / b + 1)) (k + n / b) / (n / b + 1)
        else (n % b) + ((k - (n % b) * (n / b + 1) + n / b - 1) / (n / b))
      // reference semantics: sizes = first (n mod b) buckets have
      // ceil(n/b), the rest floor(n/b)
      val sizes = (1L to b.toLong).map(i =>
        if (i <= n % b) n / b + 1L else n / b.toLong).filter(_ > 0)
      val expected = sizes.zipWithIndex.flatMap { case (sz, i) =>
        Seq.fill(sz.toInt)(i + 1L)
      }
      (1L to n.toLong).forall(k => bucketOf(k, n, b) == expected((k - 1).toInt))
    }
}
