package graft.etl

import java.io.PrintStream
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

/** Live run dashboard (SURVEY §2.12 O6; reference `main.py:55-94,116-188`
  * renders per-table status with `rich.Live`): every table moves through
  * pending → running → success | error, and each transition re-renders a
  * compact status table. On a TTY the board redraws in place with ANSI
  * cursor movement (the `rich.Live` analog); on a pipe/CI log each
  * render prints sequentially, so the history stays readable.
  *
  * Rendering is pure ([[render]] returns the table as a string) so the
  * spec can assert on it without a terminal.
  */
final class StatusBoard(
    tables: Seq[String],
    out: PrintStream = System.out,
    ansi: Boolean = System.console() != null,
) {

  private val state = new ConcurrentHashMap[String, String]()
  private var linesDrawn = 0

  def transition(table: String, status: String): Unit = synchronized {
    state.put(table, status)
    redraw()
  }

  def statusOf(table: String): String = state.getOrDefault(table, "pending")

  def snapshot: Map[String, String] =
    tables.map(t => t -> statusOf(t)).toMap ++ state.asScala

  def render(): String = {
    val rows = tables.map { t =>
      val tag = statusOf(t) match {
        case "pending" => "  - waiting"
        case "running" => " >> running"
        case "success" => " ok done"
        case other     => s" !! $other"
      }
      f"$tag%-12s| $t"
    }
    (f"${"status"}%-12s| table" +: f"${"-" * 12}%s+------" +: rows).mkString("\n")
  }

  private def redraw(): Unit = {
    val body = render()
    if (ansi && linesDrawn > 0) out.print(s"\u001b[${linesDrawn}A\u001b[J")
    out.println(body)
    linesDrawn = body.count(_ == '\n') + 1
  }
}
