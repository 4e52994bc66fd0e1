package graft.io

import java.io.{File, FileWriter, PrintWriter}
import java.time.format.DateTimeFormatter
import java.time.LocalDateTime
import java.util.concurrent.ConcurrentHashMap

/** Per-service file logger (SURVEY §2.12 O5; reference
  * `setup_service_logger`, `utils.py:42-71`): one append-mode log file
  * `<dir>/etl_<SERVICE>.log` per service, get-or-create so repeated
  * lookups reuse the same writer (the reference's duplicate-handler
  * guard). Nothing goes to the console — that belongs to the status
  * board ([[graft.etl.StatusBoard]]), exactly as the reference comments
  * out its console handler in favor of the rich dashboard.
  *
  * Writes are line-atomic (synchronized per writer + flush) because
  * `Pipeline.runAll` logs from one thread per table.
  */
final class ServiceLogger private[io] (service: String, writer: PrintWriter) {

  def info(msg: String): Unit = log("INFO", msg)
  def error(msg: String): Unit = log("ERROR", msg)

  private def log(level: String, msg: String): Unit = writer.synchronized {
    val ts = LocalDateTime.now().format(ServiceLogger.tsFormat)
    writer.println(s"$ts [$level] ETL_$service - $msg")
    writer.flush()
  }
}

object ServiceLogger {

  private val tsFormat = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
  private val loggers = new ConcurrentHashMap[String, ServiceLogger]()

  /** Get or create the logger for `service`, writing under `logDir`. */
  def apply(service: String, logDir: String): ServiceLogger =
    loggers.computeIfAbsent(s"$logDir/$service", { _ =>
      val dir = new File(logDir)
      dir.mkdirs()
      val file = new File(dir, s"etl_$service.log")
      val lg = new ServiceLogger(service,
        new PrintWriter(new FileWriter(file, /* append = */ true)))
      lg.info(s"Service log configured. Output -> ${file.getPath}")
      lg
    })
}
