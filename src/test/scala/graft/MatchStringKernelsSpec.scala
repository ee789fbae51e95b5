package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The scan kernels in AddressCluster replaced the reference's regex forms
  * (addresscluster.js:309-359) for allocation reasons; these checks pin
  * exact equivalence to the original regexes over seeded adversarial inputs
  * (newlines, unicode digits, dashes, empty, digit-only, digit+suffix).
  */
class MatchStringKernelsSpec extends AnyFunSuite {

  private val firstNonDigit = "[^\\d]".r
  private val firstNonDigitDash = "[^\\d-]".r
  private val initialNumeric = "^(\\d+)([^\\d].*)".r

  private val alphabet =
    "0123456789abz -/.\n١２--00".toCharArray

  private def samples: Iterator[String] = {
    val rnd = new java.util.Random(42)
    val fixed = Iterator("", "12", "12a", "a12", "12-34", "12\n34", "1\n",
      "12a\nb", "-", "12-", "١٢", "100 main st", "00042")
    val random = Iterator.fill(5000) {
      val n = rnd.nextInt(12)
      val sb = new java.lang.StringBuilder(n)
      var i = 0
      while (i < n) { sb.append(alphabet(rnd.nextInt(alphabet.length))); i += 1 }
      sb.toString
    }
    fixed ++ random
  }

  test("dropFirstNonDigit == regex replaceFirstIn") {
    for (s <- samples) {
      assert(AddressCluster.dropFirstNonDigit(s, allowDash = false) ===
        firstNonDigit.replaceFirstIn(s, ""), s"input=${s.map(_.toInt)}")
      assert(AddressCluster.dropFirstNonDigit(s, allowDash = true) ===
        firstNonDigitDash.replaceFirstIn(s, ""), s"input=${s.map(_.toInt)}")
    }
  }

  test("initialOf == regex ^(\\d+)([^\\d].*) group 1") {
    for (s <- samples) {
      val expected = s match {
        case initialNumeric(d, _) => d
        case _ => s
      }
      assert(AddressCluster.initialOf(s) === expected, s"input=${s.map(_.toInt)}")
    }
  }
}
