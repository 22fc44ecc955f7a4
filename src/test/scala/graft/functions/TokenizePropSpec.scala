package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the tokenizer UDTF surface. */
object TokenizePropSpec extends Properties("Tokenize") {

  private val genText: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf(" ", "\t", ",", ".", "-", "!", "  "),
    Gen.oneOf("手机", "小米", "苹果", "口红"))).map(_.mkString)

  property("never emits empty tokens") = Prop.forAll(genText) { t =>
    Tokenize.tokenize(t).forall(_.nonEmpty)
  }

  property("deterministic") = Prop.forAll(genText) { t =>
    Tokenize.tokenize(t) == Tokenize.tokenize(t)
  }

  property("tokens are lowercase and contain no separators") =
    Prop.forAll(genText) { t =>
      Tokenize.tokenize(t).forall(w =>
        w == w.toLowerCase && !w.exists(c => " \t,.!-".contains(c)))
    }

  property("pure ASCII words round-trip: tokens = lowercased words") =
    Prop.forAll(Gen.listOf(Gen.alphaStr.suchThat(_.nonEmpty).map(_.take(6)))) { ws =>
      Tokenize.tokenize(ws.mkString(" ")) == ws.map(_.toLowerCase)
    }

  property("CJK runs of length n yield n-1 bigrams (n>1)") =
    Prop.forAll(Gen.choose(2, 6)) { n =>
      val run = "手机电脑平板相机".take(n)
      val toks = Tokenize.tokenize(run)
      toks.size == n - 1 && toks.forall(_.length == 2)
    }
}
