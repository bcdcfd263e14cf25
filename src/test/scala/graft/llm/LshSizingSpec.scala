package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Pins the occupancy-sized LSH signature policy — in particular the
  * ORACLE-COMPATIBILITY invariant: every gate scale factor's corpus size
  * must resolve to exactly (16, 8), the static parameters the q50/q86
  * DuckDB oracles replicate. Pure function, no Spark session needed. */
class LshSizingSpec extends AnyFunSuite {

  test("gate scale factors resolve to the oracle's (16, 8)") {
    // sf0.001 = 500, sf0.01 = 500, sf0.1 = 2000 vectors; headroom to 2048
    for (n <- Seq(1L, 100L, 500L, 2000L, 2048L))
      assert(AnnOps.autoBandParams(n, 16, 0.4) == (16, 8), s"n=$n")
  }

  test("bits grow with log2(n), bands compensate and cap at 64") {
    val sizes = Seq(2049L, 20000L, 200000L, 2000000L)
    val params = sizes.map(AnnOps.autoBandParams(_, 16, 0.4))
    // bits strictly non-decreasing, occupancy n/2^bits stays ≤ ~8
    assert(params.map(_._2) == params.map(_._2).sorted)
    sizes.zip(params).foreach { case (n, (_, bits)) =>
      assert(n.toDouble / (1L << bits) <= 8.01, s"occupancy blew up at n=$n")
    }
    // bands never exceed the cap
    assert(params.forall(_._1 <= 64))
    // and a 10x corpus gets a wider signature than a gate corpus
    assert(AnnOps.autoBandParams(20000L, 16, 0.4)._2 > 8)
  }
}
