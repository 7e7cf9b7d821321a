package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact must be valid JSON on ANY default locale: a
  * comma-decimal locale (fr_FR et al.) turns f-interpolated doubles
  * into "0,123" and silently corrupts target/bench.json. Bench.fmt is
  * pinned to Locale.ROOT; this spec proves it by flipping the JVM
  * default under it.
  */
class BenchFormatSpec extends AnyFunSuite {

  test("Bench.fmt emits dot-decimal JSON numbers under a comma-decimal default locale") {
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.FRANCE)
      assert(f"${0.123}%.3f" == "0,123",
        "precondition: this locale formats with a comma — else the test proves nothing")
      assert(Bench.fmt(0.123) == "0.123")
      assert(Bench.fmt(1234.5) == "1234.500")
      assert(Bench.fmt(-1.0) == "-1", "failure sentinel must stay bare -1")
    } finally java.util.Locale.setDefault(saved)
  }
}
