package graft.wells

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties (run by ScalaCheck's own sbt framework — the
  * scalatest bridge isn't in the offline artifact cache). */
object CleaningProps extends Properties("Cleaning") {
  import Cleaning._

  property("cleanNum output shape") = Prop.forAll { (s: String) =>
    val r = cleanNumStr(s)
    r == null || r.matches("[\\d.]+")
  }

  property("normStr idempotent") = Prop.forAll { (s: String) =>
    normStr(normStr(s)) == normStr(s)
  }

  property("normalizeApi idempotent on its own output") =
    Prop.forAll(Gen.option(Gen.alphaNumStr)) { so =>
      val r = normalizeApi(so.orNull)
      normalizeApi(r) == r
    }

  private val apiGen: Gen[(String, String)] = for {
    a <- Gen.listOfN(2, Gen.numChar).map(_.mkString)
    b <- Gen.listOfN(3, Gen.numChar).map(_.mkString)
    c <- Gen.listOfN(5, Gen.numChar).map(_.mkString)
    sep <- Gen.oneOf("", "-", " - ")
  } yield (s"$a$sep$b-$c", s"$a-$b-$c")

  property("normalizeApi canonicalizes any separator variant") =
    Prop.forAll(apiGen) { case (raw, want) => normalizeApi(raw) == want }

  property("key normalization idempotent") = Prop.forAll { (s: String) =>
    val n = SchemaResolver.normalizeKey(s)
    SchemaResolver.normalizeKey(n) == n
  }
}
