package graft.telemetry

import org.scalatest.funsuite.AnyFunSuite

class SpansSpec extends AnyFunSuite {

  test("nesting, attributes, and error recording") {
    Spans.flush()
    val out = Spans.withSpan("cli_main") {
      Spans.setAttribute("argv", "export mock")
      Spans.withSpan("export") { 41 } + 1
    }
    assert(out == 42)
    val spans = Spans.flush()
    assert(spans.map(_.name) == Seq("export", "cli_main"))
    assert(spans.find(_.name == "export").get.parent.contains("cli_main"))
    val root = spans.find(_.name == "cli_main").get
    assert(root.parent.isEmpty && root.attributes("argv") == "export mock")
    assert(spans.forall(s => s.error.isEmpty && s.durationNanos >= 0))
  }

  test("a throw is recorded on the span and rethrown") {
    Spans.flush()
    val e = intercept[RuntimeException] {
      Spans.withSpan("boom") { throw new RuntimeException("nope") }
    }
    assert(e.getMessage == "nope")
    val Seq(s) = Spans.flush()
    assert(s.error.exists(_.contains("nope")))
  }

  test("DISABLE_TELEMETRY_VECTORIO gate turns spans into pass-throughs") {
    Spans.flush()
    System.setProperty("graft.telemetry.disable", "1")
    try {
      assert(Spans.withSpan("off") { 7 } == 7)
      assert(Spans.collected.isEmpty)
    } finally System.clearProperty("graft.telemetry.disable")
  }
}
