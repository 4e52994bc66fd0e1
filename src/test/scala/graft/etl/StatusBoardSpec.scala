package graft.etl

import java.io.{ByteArrayOutputStream, PrintStream}

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.io.ServiceLogger

/** O5/O6 orchestration furniture: per-service file logs and the live
  * status board (no SparkSession needed).
  */
class StatusBoardSpec extends AnyFlatSpec with Matchers {

  "StatusBoard" should "track pending -> running -> success transitions in the render" in {
    val out = new PrintStream(new ByteArrayOutputStream())
    val board = new StatusBoard(Seq("customer", "orders"), out, ansi = false)
    board.render() should include("- waiting")
    board.render() should include("customer")

    board.transition("customer", "running")
    board.render() should include(">> running")
    board.transition("customer", "success")
    board.transition("orders", "error")
    val r = board.render()
    r should include("ok done")
    r should include("!! error")
    board.statusOf("customer") shouldBe "success"
    board.statusOf("orders") shouldBe "error"
    board.snapshot shouldBe Map("customer" -> "success", "orders" -> "error")
  }

  it should "redraw in place with ANSI on a tty and append without" in {
    val buf = new ByteArrayOutputStream()
    val board = new StatusBoard(Seq("t1"), new PrintStream(buf), ansi = true)
    board.transition("t1", "running")
    board.transition("t1", "success")
    val s = buf.toString
    // second render rewinds over the first (ESC [nA cursor-up + ESC [J clear)
    s should include("[")
    s should include("ok done")

    val buf2 = new ByteArrayOutputStream()
    val plain = new StatusBoard(Seq("t1"), new PrintStream(buf2), ansi = false)
    plain.transition("t1", "running")
    plain.transition("t1", "success")
    buf2.toString should not include "["
  }

  "ServiceLogger" should "write whole timestamped lines per service file, get-or-create" in {
    val dir = java.nio.file.Files.createTempDirectory("graft-logs").toString
    val lg = ServiceLogger("customer", dir)
    ServiceLogger("customer", dir) shouldBe theSameInstanceAs(lg)

    val threads = (1 to 4).map { i =>
      new Thread(() => (1 to 25).foreach(j => lg.info(s"msg-$i-$j")))
    }
    threads.foreach(_.start()); threads.foreach(_.join())

    val lines = scala.io.Source.fromFile(s"$dir/etl_customer.log").getLines().toSeq
    // configured line + 100 concurrent writes, none torn
    lines.length shouldBe 101
    all(lines) should include("ETL_customer - ")
    lines.count(_.contains("[INFO]")) shouldBe 101
  }

}
