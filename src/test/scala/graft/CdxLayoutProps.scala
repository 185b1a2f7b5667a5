package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.sources.WarcCdx

/** Model-based property checks for the zipnum layout's PURE functions —
  * the part-selection and naming arithmetic every CDX lookup and merge
  * rides on. The r19 boundary-equality bug (selectParts' strict upper
  * bound losing a key's earlier captures when a part boundary cut inside
  * its capture run) is exactly the class these properties kill: the
  * model partitions arbitrary sorted LINE multisets at ARBITRARY cut
  * points (what maxPartLines splits do), then demands selection find
  * every matching line wherever the cuts fell.
  */
object CdxLayoutProps extends Properties("CdxLayout") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  // small alphabets force heavy key duplication (multi-capture runs) and
  // prefix overlap — the hard cases for boundary placement
  private val genKey = for {
    len <- Gen.choose(1, 3)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString
  private val genTs = Gen.choose(0, 9).map(d => s"2026010${d}000000".take(14))
  private val genLines = Gen.listOf(Gen.zip(genKey, genTs))
    .map(_.map { case (k, t) => s"$k $t" }.sorted)

  // arbitrary cut points: any partition of the sorted line list into
  // consecutive non-empty parts (exactly what range partitioning + a
  // maxPartLines split can produce)
  private def genCuts(n: Int): Gen[List[Int]] =
    if (n <= 1) Gen.const(Nil)
    else Gen.someOf(1 until n).map(_.toList.sorted)

  private def layout(lines: List[String], cuts: List[Int]): List[List[String]] = {
    val bounds = (0 :: cuts) :+ lines.length
    bounds.zip(bounds.tail).map { case (a, b) => lines.slice(a, b) }
      .filter(_.nonEmpty)
  }

  private def keyOf(line: String): String = line.takeWhile(_ != ' ')

  property("selectParts finds every line of every queried prefix, any cut placement") =
    Prop.forAll(genLines) { lines =>
      Prop.forAll(genCuts(lines.length), genKey) { (cuts, prefix) =>
        val parts = layout(lines, cuts)
        val entries = parts.zipWithIndex
          .map { case (p, i) => (keyOf(p.head), s"part-$i") }
        val picked = WarcCdx.selectParts(entries, prefix).toSet
        // model: a part must be selected whenever it holds a matching line
        val missed = parts.zipWithIndex.exists { case (p, i) =>
          p.exists(l => keyOf(l).startsWith(prefix)) && !picked.contains(s"part-$i")
        }
        !missed
      }
    }

  property("selectParts over-reads at most the two boundary neighbours") =
    Prop.forAll(genLines) { lines =>
      Prop.forAll(genCuts(lines.length), genKey) { (cuts, prefix) =>
        val parts = layout(lines, cuts)
        val entries = parts.zipWithIndex
          .map { case (p, i) => (keyOf(p.head), s"part-$i") }
        val picked = WarcCdx.selectParts(entries, prefix)
        val holding = parts.zipWithIndex.collect {
          case (p, i) if p.exists(l => keyOf(l).startsWith(prefix)) => s"part-$i"
        }
        // pruning stays real: the selection is the holding set plus at
        // most one neighbour on each side (the closed-bound slack), never
        // a broad scan
        picked.size <= holding.size + 2
      }
    }

  property("canonical part names: number order == name order, round-trip exact") =
    Prop.forAll(Gen.listOf(Gen.choose(0L, 999999999999L))) { ns =>
      val distinct = ns.distinct
      val names = distinct.map(WarcCdx.partName)
      (names.map(n => WarcCdx.partNum(n).get) == distinct) :| "round-trip" &&
        (names.sorted.map(n => WarcCdx.partNum(n).get) == distinct.sorted) :|
        "name order == number order"
    }

  property("partNum rejects foreign names") =
    Prop.forAll(Gen.alphaNumStr) { s =>
      val name = s"part-$s"
      WarcCdx.partNum(name).isDefined ==
        (s.length == 12 && s.forall(_.isDigit))
    }
}
