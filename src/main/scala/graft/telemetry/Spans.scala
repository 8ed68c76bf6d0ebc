package graft.telemetry

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

/** Operation tracing in the shape the reference wraps its CLI with
  * (`export_vdf_cli.py:68-96`): a tracer opens a root span around the
  * whole run (`start_as_current_span("export_vdf_cli_main")`), nested
  * spans mark phases, errors are recorded on the active span, and the
  * whole thing is DISABLED by `DISABLE_TELEMETRY_VECTORIO=1`.
  *
  * The reference exports through Sentry's OTel bridge; that transport
  * is out-of-env here, so the exporter is pluggable: the default sink
  * collects finished spans in memory (what tests assert against), and
  * a real deployment registers an exporter callback instead. The span
  * model (name, parent, start/end, status, attributes) is the OTel
  * one, so wiring a real `opentelemetry-java` exporter is a sink
  * implementation away.
  */
object Spans {

  final case class Span(name: String, parent: Option[String],
      startNanos: Long, endNanos: Long, error: Option[String],
      attributes: Map[String, String]) {
    def durationNanos: Long = endNanos - startNanos
  }

  /** `DISABLE_TELEMETRY_VECTORIO=1` turns every span into a pure
    * pass-through, exactly the reference's gate
    * (`export_vdf_cli.py:68`). Read per call so tests can flip it. */
  def enabled: Boolean =
    sys.env.get("DISABLE_TELEMETRY_VECTORIO").forall(_ != "1") &&
      sys.props.get("graft.telemetry.disable").forall(_ != "1")

  private val finished = new ConcurrentLinkedQueue[Span]()
  private val active = new ThreadLocal[List[(String, Long, scala.collection.mutable.Map[String, String])]] {
    override def initialValue = Nil
  }
  @volatile private var exporter: Span => Unit = finished.add(_)

  /** Replace the in-memory sink (a real deployment's exporter). */
  def setExporter(f: Span => Unit): Unit = exporter = f

  /** Attribute on the innermost active span (OTel `span.set_attribute`). */
  def setAttribute(key: String, value: String): Unit = active.get() match {
    case (_, _, attrs) :: _ => attrs.update(key, value)
    case Nil => ()
  }

  /** `start_as_current_span`: runs `body` inside a span; the span ends
    * when the body returns or throws, a throw is recorded as the span
    * status (and rethrown — tracing never swallows the error, matching
    * the reference's try/finally + flush shape). */
  def withSpan[A](name: String)(body: => A): A =
    if (!enabled) body
    else {
      val parent = active.get().headOption.map(_._1)
      val attrs = scala.collection.mutable.Map.empty[String, String]
      val t0 = System.nanoTime()
      active.set((name, t0, attrs) :: active.get())
      var error: Option[String] = None
      try body
      catch { case e: Throwable => error = Some(e.toString); throw e }
      finally {
        active.set(active.get().tail)
        exporter(Span(name, parent, t0, System.nanoTime(), error, attrs.toMap))
      }
    }

  /** Spans collected by the default in-memory sink, oldest first. */
  def collected: Seq[Span] = finished.iterator().asScala.toSeq

  /** Drop collected spans (test isolation) — the `sentry_sdk.flush()`
    * slot in a run's lifecycle. */
  def flush(): Seq[Span] = {
    val out = collected
    finished.clear()
    out
  }
}
