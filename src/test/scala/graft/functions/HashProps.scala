package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties (run by sbt's native ScalaCheck framework). */
object HashProps extends Properties("TextHash") {

  private val text: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr.map(_.take(8)), Gen.const(" ")))
      .map(_.mkString(" ")).map(_.take(200))

  property("tokenHash in [0, P)") = Prop.forAll(text) { s =>
    val h = TextHash.tokenHash(s)
    h >= 0L && h < TextHash.P
  }

  property("shingleSet never empty; distinct; bounded by token count") =
    Prop.forAll(text) { s =>
      val sh = TextHash.shingleSet(s)
      val nTok = s.split(" ", -1).length
      sh.nonEmpty && sh.toSeq == sh.toSeq.distinct &&
        sh.length <= math.max(1, nTok - 2)
    }

  property("shingleMin == min(tokenHash over shingleSet)") =
    Prop.forAll(text) { s =>
      TextHash.shingleMin(s) == TextHash.shingleSet(s).map(TextHash.tokenHash).min
    }

  property("simhash32 in [0, 2^32); permutation-invariant") =
    Prop.forAll(text) { s =>
      val h = TextHash.simhash32(s)
      val perm = TextHash.simhash32(s.split(" ", -1).reverse.mkString(" "))
      h >= 0L && h < (1L << 32) && h == perm
    }

  property("affine universal hash stays in [0, P)") =
    Prop.forAll(Gen.chooseNum(0L, TextHash.P - 1), Gen.chooseNum(1L, 10000L),
      Gen.chooseNum(0L, 10000L)) { (h, a, b) =>
      val v = TextHash.affine(h, a, b)
      v >= 0L && v < TextHash.P
    }
}

/** Pure-Scala mirrors of the vector kernels' arithmetic, property-checked
  * (the Catalyst expressions themselves are covered by
  * VectorExpressionsSpec's codegen-vs-interpreted test).
  */
object VectorProps extends Properties("VectorKernels") {

  private val vec: Gen[Array[Float]] =
    Gen.chooseNum(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10f, 10f)).map(_.toArray))

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  property("dot is symmetric") = Prop.forAll(vec, vec) { (a, b) =>
    dot(a, b) == dot(b, a)
  }

  property("cauchy-schwarz: |dot| <= norm*norm (cosine in [-1,1])") =
    Prop.forAll(vec) { a =>
      val b = a.map(x => -x * 0.5f)
      val na = math.sqrt(dot(a, a)); val nb = math.sqrt(dot(b, b))
      na == 0 || nb == 0 || math.abs(dot(a, b)) <= na * nb * (1 + 1e-12)
    }

  property("norm >= 0 and 0 only for the zero vector") = Prop.forAll(vec) { a =>
    val n = math.sqrt(dot(a, a))
    n >= 0 && (n > 0 || a.forall(_ == 0f))
  }
}
