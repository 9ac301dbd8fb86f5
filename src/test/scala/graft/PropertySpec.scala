package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfns.{DotProductL, HexSliceToLong}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based specs for the native Catalyst expressions — the
  * codegen'd kernels every sketch/vector op rides. A subtle byte or
  * overflow bug here silently poisons minhash, KMV, winnowing, bloom,
  * ANN and every oracle hash at once, so these are checked against
  * independent references over GENERATED inputs, not just the fixed
  * corpus: the interpreted path against a pure-Scala model, and the
  * whole-stage-codegen path against the interpreted path (the two are
  * separate implementations inside the expression).
  *
  * Generators draw from scalacheck with a FIXED seed: deterministic
  * runs (no flaky CI), while still covering the adversarial shapes —
  * non-hex bytes, out-of-range slices, empty strings, length-mismatched
  * and overflow-wrapping vectors. */
class PropertySpec extends AnyFunSuite {
  import TestSession._

  private def samples[T](g: Gen[T], n: Int, seed: Long): Seq[T] = {
    var s = rng.Seed(seed)
    (1 to n).flatMap { _ =>
      val r = g.apply(Gen.Parameters.default, s)
      s = s.next
      r
    }
  }

  // ---- hex_slice_to_long --------------------------------------------
  /** Pure-Scala model of the documented contract: digit −1 for a
    * non-hex char, 0 for out-of-range, Horner over 16. */
  private def hexModel(s: String, start: Int, len: Int): Long = {
    var v = 0L
    for (i <- 0 until len) {
      val p = start - 1 + i
      v *= 16L
      if (p < s.length) {
        val c = s.charAt(p)
        v += (if (c >= '0' && c <= '9') c - '0'
              else if (c >= 'a' && c <= 'f') c - 'a' + 10
              else -1)
      }
    }
    v
  }

  private val hexishChar: Gen[Char] =
    Gen.frequency(8 -> Gen.oneOf(('0' to '9') ++ ('a' to 'f')),
      1 -> Gen.oneOf('g', 'z', 'A', 'F', '!', ' '))
  private val hexishString: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.stringOfN(n, hexishChar))

  test("hex_slice interpreted path matches the pure model on generated inputs") {
    val cases = samples(for {
      s <- hexishString
      start <- Gen.chooseNum(1, 34)
      len <- Gen.chooseNum(1, 15)
    } yield (s, start, len), 2000, seed = 42L)
    assert(cases.size > 1500)
    cases.foreach { case (s, start, len) =>
      val got = HexSliceToLong(Literal(UTF8String.fromString(s)), start, len)
        .eval(null).asInstanceOf[Long]
      assert(got == hexModel(s, start, len), s"hexSlice('$s', $start, $len)")
    }
  }

  test("hex_slice codegen path matches the interpreted path") {
    import spark.implicits._
    val strs = samples(hexishString, 300, seed = 7L)
    Seq((1, 15), (1, 8), (5, 4), (30, 15)).foreach { case (start, len) =>
      val df = strs.toDF("s")
        .select(col("s"),
          graft.functions.VectorExprs.hexSlice(col("s"), start, len).as("v"))
      df.collect().foreach { r =>
        assert(r.getLong(1) == hexModel(r.getString(0), start, len),
          s"codegen hexSlice('${r.getString(0)}', $start, $len)")
      }
    }
  }

  test("hex_slice equals the composed-builtin oracle form on md5 output") {
    // the EXACT strpos arithmetic every DuckDB oracle uses — the parity
    // contract the whole sketch family depends on
    val composed = (1 to 15).map { i =>
      s"(CAST(instr('0123456789abcdef', substr(h, $i, 1)) AS BIGINT) - 1) * CAST(${java.lang.Long.parseLong("1" + "0" * (15 - i), 16)} AS BIGINT)"
    }.mkString(" + ")
    val df = spark.range(500).select(md5(col("id").cast("string")).as("h"))
      .select(graft.functions.VectorExprs.hexSlice(col("h"), 1, 15).as("fast"),
        expr(composed).as("slow"))
    assert(df.filter(col("fast") =!= col("slow")).count() == 0)
  }

  // ---- dot_product_l ------------------------------------------------
  private val vecGen: Gen[Seq[Long]] = for {
    n <- Gen.chooseNum(0, 80)
    v <- Gen.listOfN(n, Gen.chooseNum(-1000000L, 1000000L))
  } yield v

  private def dotModel(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).foldLeft(0L) { case (s, (x, y)) => s + x * y } // wraps like the expr

  test("dot_l interpreted path matches the pure model, mismatched lengths truncate") {
    val cases = samples(Gen.zip(vecGen, vecGen), 1000, seed = 11L)
    cases.foreach { case (a, b) =>
      val at = org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType)
      val got = DotProductL(Literal.create(a.toArray, at),
        Literal.create(b.toArray, at)).eval(null).asInstanceOf[Long]
      assert(got == dotModel(a, b), s"dot_l($a, $b)")
    }
  }

  test("dot_l codegen path matches the interpreted path incl. overflow wrap") {
    import spark.implicits._
    val big = Gen.oneOf(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2),
      Gen.chooseNum(-10L, 10L))
    val cases = samples(Gen.zip(
      Gen.listOfN(8, big), Gen.listOfN(8, big)), 300, seed = 13L)
    val df = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.functions.VectorExprs.dotL(col("a"), col("b")).as("d"))
    df.collect().foreach { r =>
      val a = r.getSeq[Long](0); val b = r.getSeq[Long](1)
      assert(r.getLong(2) == dotModel(a, b), s"codegen dot_l($a, $b)")
    }
  }
}
