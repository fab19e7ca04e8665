package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Input/output pairs transcribed by hand from the reference JS semantics
  * (app.js:99-112, 342, 553-563, 579-582, 626-634, 669-674, 702).
  */
class NormalizeSpec extends AnyFunSuite {
  import Normalize._

  /** Minimal deterministic property driver (the scalatest/scalacheck bridge
    * artifact isn't in the offline cache; plain Gen sampling suffices). */
  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  test("toKey maps whitespace and punctuation to _ (app.js:99)") {
    assert(toKey("Wi-Fi 802.11 a/b") == "wi_fi_802_11_a_b")
    assert(toKey("Display Type") == "display_type")
    assert(toKey("CPU (cores)") == "cpu__cores_")       // not collapsed
    assert(toKey("a,b-c.d") == "a_b_c_d")               // ,-. range
    assert(toKey("x_y") == "x_y")                       // _ preserved
    assert(toKey("a\\b") == "a\\b")                     // backslash NOT in class
    assert(toKey("A\tB\nC") == "a_b_c")                 // all whitespace
    assert(toKey("!\"#$%&'()*+,-./:;<=>?@[]^`{|}~") == "_" * 30)
  }

  test("trimTrailingUnderscores strips only trailing runs (app.js:100)") {
    assert(trimTrailingUnderscores("cpu__cores___") == "cpu__cores")
    assert(trimTrailingUnderscores("__x__") == "__x")
    assert(trimTrailingUnderscores("x") == "x")
    assert(trimTrailingUnderscores("____") == "")
  }

  test("mergeSpecs is last-wins with trailing-underscore-trimmed keys") {
    val merged = mergeSpecs(Seq("a_" -> "1", "a" -> "2", "b__" -> "3"))
    assert(merged == Map("a" -> "2", "b" -> "3"))
    // order matters: reversed input gives the other winner
    assert(mergeSpecs(Seq("a" -> "2", "a_" -> "1")) == Map("a" -> "1"))
  }

  test("splitBrandModel: first token brand, rest model; single token keeps both") {
    assert(splitBrandModel("Samsung Galaxy S21 Ultra") == ("Samsung", "Galaxy S21 Ultra"))
    assert(splitBrandModel("iPhone") == ("iPhone", "iPhone"))
    assert(splitBrandModel("Google Pixel") == ("Google", "Pixel"))
    // doubled space: JS split(' ') keeps the empty token
    assert(splitBrandModel("A  B") == ("A", " B"))
  }

  test("deviceFromUrl + iOS override (app.js:630-634)") {
    assert(deviceFromUrl("https://browser.geekbench.com/ios_devices/5") == "ios")
    assert(deviceFromUrl("https://browser.geekbench.com/android_devices/9") == "android")
    assert(brandForDevice("ios", "whatever") == "Apple")
    assert(brandForDevice("android", "Samsung") == "Samsung")
    assert(deviceFromUrl("no-marker") == "")
  }

  test("normalizeUrl strips query and fragment (app.js:73)") {
    assert(normalizeUrl("http://x.com/a?b=1#c") == "http://x.com/a")
    assert(normalizeUrl("http://x.com/a#c?b=1") == "http://x.com/a")
    assert(normalizeUrl("http://x.com/a") == "http://x.com/a")
  }

  test("foldSpecRows: continuation rows append to previous key (app.js:553-563)") {
    val rows = foldSpecRows(
      "Platform",
      Seq("OS", "C", "Chipset"),
      Seq("Android 12", "One UI 4.1", "Snapdragon"))
    assert(rows == Seq(
      "platform_os" -> "Android 12 One UI 4.1",
      "platform_chipset" -> "Snapdragon"))
    // continuation at position 0 falls back to bare title key
    assert(foldSpecRows("Network", Seq("T"), Seq("GSM / HSPA")) ==
      Seq("network" -> "GSM / HSPA"))
  }

  test("zipSpecs backfills missing values with '' (app.js:626-627)") {
    assert(zipSpecs(Seq("a", "b", "c"), Seq("1", "2")) ==
      Seq("a" -> "1", "b" -> "2", "c" -> ""))
    assert(zipSpecs(Seq("a"), Seq("1", "extra")) == Seq("a" -> "1"))
  }

  test("findDifference: anti-join; empty a returns b; falsy dropped (app.js:101-112)") {
    assert(findDifference(Seq("u1", "u2", "", "u3"), Seq("u2")) == Seq("u1", "u3"))
    assert(findDifference(Seq(), Seq("b1", "b2")) == Seq("b1", "b2"))
  }

  test("chunkKeys: ceil(n/w) chunks, each <= w, concat = input") {
    val keys = (1 to 400).map(i => s"k$i")
    val chunks = chunkKeys(keys, 150)
    assert(chunks.length == 3)
    assert(chunks.map(_.length) == Seq(150, 150, 100))
    assert(chunks.flatten == keys)
  }

  test("partNumber parses _pN suffix (app.js:342)") {
    assert(partNumber("gsmarena_p3") == Some(3))
    assert(partNumber("gsmarena") == None)
    assert(partNumber("x_p12") == Some(12))
  }

  test("valuesWithUnit: comma join + unit + trim (app.js:702)") {
    assert(valuesWithUnit(Seq("1", "2"), Some(" GHz")) == "1,2 GHz")
    assert(valuesWithUnit(Seq("yes"), None) == "yes")
  }

  // ---- properties ----

  private val word = Gen.alphaNumStr.suchThat(_.nonEmpty)

  test("property: toKey output contains no uppercase, whitespace, or class punct") {
    forAll(Gen.asciiPrintableStr) { s =>
      val k = toKey(s)
      assert(!k.exists(c => c.isUpper || c.isWhitespace))
      assert(!k.exists("!\"#$%&'()*+,-./:;<=>?@[]^`{|}~".contains(_)))
    }
  }

  test("property: mergeSpecs keys are trim-stable and values come from input") {
    forAll(Gen.listOf(Gen.zip(word, word))) { pairs =>
      val m = mergeSpecs(pairs)
      m.keys.foreach(k => assert(trimTrailingUnderscores(k) == k))
      m.values.foreach(v => assert(pairs.exists(_._2 == v)))
    }
  }

  test("property: findDifference result is disjoint from b and subset of a") {
    forAll2(Gen.nonEmptyListOf(word), Gen.listOf(word)) { (a, b) =>
      val d = findDifference(a, b)
      assert(d.forall(x => !b.contains(x)))
      assert(d.forall(a.contains))
    }
  }

  test("property: chunkKeys covers input with bounded chunks") {
    forAll2(Gen.listOf(word), Gen.choose(1, 10)) { (keys, w) =>
      val ch = chunkKeys(keys, w)
      assert(ch.flatten == keys)
      assert(ch.forall(_.length <= w))
      if (keys.nonEmpty) assert(ch.length == (keys.length + w - 1) / w)
    }
  }

  test("normalizeUrl is total on delimiter-only URLs (JS split keeps empties)") {
    // Java split drops TRAILING empty strings — "?".split('?') is the
    // EMPTY array, and the pre-r13 .head threw NoSuchElementException
    // on one malformed row. JS returns "" for all of these, as does
    // ColFns.normalizeUrlCol's regexp_replace.
    assert(normalizeUrl("?") == "")
    assert(normalizeUrl("??") == "")
    assert(normalizeUrl("#") == "")
    assert(normalizeUrl("?#") == "")
    assert(normalizeUrl("#?") == "")
    assert(normalizeUrl("") == "")
    assert(normalizeUrl("a?") == "a")
    assert(normalizeUrl("a#b?c") == "a")
  }

  test("deviceFromUrl takes the segment BETWEEN com/ occurrences (JS split)") {
    // url.split('com/')[1] is the piece up to the NEXT "com/", not
    // everything after the first — the pre-r13 substring form disagreed
    // with both the JS and ColFns.deviceCol on multi-"com/" URLs.
    assert(deviceFromUrl("cdn.com/x.com/ios_1") == "x.")
    assert(deviceFromUrl("https://b.com/ios_15") == "ios")
    assert(deviceFromUrl("no-marker") == "")
    // trailing "com/": JS [1] = "" — split with -1 keeps the empty
    assert(deviceFromUrl("https://b.com/") == "")
  }

  test("valuesWithUnit renders null elements as empty WITH the comma (JS Array.toString)") {
    // JS [\"a\", null, \"b\"].toString() === "a,,b"; mkString printed
    // "a,null,b" and the Column twin's bare array_join DROPPED the
    // element ("a,b") — three behaviors from one documented semantics.
    assert(valuesWithUnit(Seq("a", null, "b"), None) == "a,,b")
    assert(valuesWithUnit(Seq(null, null), Some(" GHz")) == ", GHz")
  }
}
