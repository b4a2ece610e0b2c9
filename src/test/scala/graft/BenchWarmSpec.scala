package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench warmup-isolation contract: a deliberately broken
  * artifact build must not prevent later builds from warming (round 8's
  * all-or-nothing try did exactly that and corrupted the round's perf
  * signal), and the failure must name itself on stderr.
  */
class BenchWarmSpec extends AnyFunSuite {

  test("a failing warm does not stop subsequent warms") {
    val built = scala.collection.mutable.ArrayBuffer[String]()
    BenchWarm.each("a") { built += "a" }
    BenchWarm.each("broken") { throw new IllegalStateException("schema drift") }
    BenchWarm.each("b") { built += "b" }
    assert(built.toSeq == Seq("a", "b"))
  }

  test("the failure prints one stderr line naming the artifact and cause") {
    val buf = new java.io.ByteArrayOutputStream()
    val orig = System.err
    try {
      System.setErr(new java.io.PrintStream(buf, true))
      BenchWarm.each("oriented_edges") { throw new RuntimeException("boom") }
    } finally System.setErr(orig)
    val line = buf.toString
    assert(line.contains("warmup 'oriented_edges' FAILED"), line)
    assert(line.contains("RuntimeException") && line.contains("boom"), line)
  }

  test("a null exception message does not itself throw") {
    val orig = System.err
    try {
      System.setErr(new java.io.PrintStream(new java.io.ByteArrayOutputStream()))
      BenchWarm.each("npe") { throw new NullPointerException() }
    } finally System.setErr(orig)
  }
}
