package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Alert delivery: the reference ships alerts to humans through a
  * template mailer (`scripts/auth/sendmail.php`: per-alert placeholder
  * substitution into a message body, one send per row). Here that
  * becomes a Spark-side renderer plus a pluggable executor-side sink —
  * the engine renders the payload text distributively and hands each
  * partition's alerts to whatever transport the deployment plugs in
  * (SMTP relay, webhook, syslog, pager); the non-Spark PHP transport
  * itself is out of scope by design.
  *
  * Scale shape: rendering is pure column expressions (codegen'd
  * concat), delivery is `foreachPartition` — no driver collect, so an
  * alert storm can't OOM the driver; a sink wanting global order or
  * batching does it per partition.
  */
object AlertSink {

  /** One rendered notification. `body` follows the reference template's
    * field set (who/where/what/evidence).
    */
  final case class Rendered(signatureId: java.lang.Long, title: String,
                            priority: java.lang.Integer, body: String)

  /** Executor-side transport. Implementations must be serializable
    * (instantiated on the driver, invoked per partition on executors).
    */
  trait Sink extends Serializable {
    def deliver(alerts: Iterator[Rendered]): Unit
  }

  /** Default transport: one stderr line per alert — the "it's wired,
    * plug in a real transport" placeholder.
    */
  object LogSink extends Sink {
    override def deliver(alerts: Iterator[Rendered]): Unit =
      alerts.foreach(a => System.err.println(
        s"[alert] sig=${a.signatureId} prio=${a.priority} ${a.title}"))
  }

  /** File-backed transport: the minimal REAL implementation of the
    * reference mailer's role (sendmail.php renders a template per alert
    * and hands it to a delivery agent; here the rendered payload lands
    * as JSON lines under `dir/delivered/`, one file per task attempt).
    *
    * Delivery contract — at-least-once with a dead-letter escape:
    *  - each partition's batch is written to a UNIQUE per-task-attempt
    *    file via stage-then-rename, so concurrent executors never
    *    contend on a shared file and readers never see a partial file
    *    (a retried Spark task writes a new file — duplicates are the
    *    at-least-once cost, deduplicable downstream on signature/time);
    *  - a failed write retries up to `maxAttempts` with linear backoff
    *    (transient FS hiccups — the common case — resolve here);
    *  - a batch that STILL can't be delivered is parked as JSON under
    *    `dir/dead_letter/` for the operator instead of failing the job
    *    (alerting must not take down the pipeline that produces the
    *    alerts); only if even the dead-letter write fails does the task
    *    throw, handing redelivery to Spark's task retry.
    */
  class FileSink(dir: String, maxAttempts: Int = 3, backoffMs: Long = 50L)
      extends Sink {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")

    private def esc(s: String): String =
      if (s == null) "null"
      else "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""

    private def jsonLine(a: Rendered): String =
      s"""{"signature_id":${a.signatureId},"priority":${a.priority},""" +
        s""""title":${esc(a.title)},"body":${esc(a.body)}}"""

    /** One write attempt: stage to a sibling `.tmp`, fsync-free local
      * rename (atomic on POSIX; object-store deploys override with a
      * conditional put). Overridable so tests can inject failures.
      */
    protected def writeOnce(path: java.nio.file.Path, lines: Seq[String]): Unit = {
      java.nio.file.Files.createDirectories(path.getParent)
      val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
      java.nio.file.Files.write(tmp, (lines.mkString("\n") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, path,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

    override def deliver(alerts: Iterator[Rendered]): Unit = {
      val lines = alerts.map(jsonLine).toSeq
      if (lines.isEmpty) return
      val tc = org.apache.spark.TaskContext.get()
      val name =
        if (tc == null) s"part-driver-${java.util.UUID.randomUUID()}.jsonl"
        else f"part-${tc.partitionId()}%05d-attempt-${tc.taskAttemptId()}.jsonl"
      var attempt = 0
      var lastEx: Throwable = null
      var delivered = false
      while (!delivered && attempt < maxAttempts) {
        attempt += 1
        try {
          writeOnce(java.nio.file.Paths.get(dir, "delivered", name), lines)
          delivered = true
        } catch {
          case e: Exception =>
            lastEx = e
            if (attempt < maxAttempts) Thread.sleep(backoffMs * attempt)
        }
      }
      if (!delivered) {
        try writeOnce(java.nio.file.Paths.get(dir, "dead_letter", name), lines)
        catch { case e: Exception => e.addSuppressed(lastEx); throw e }
        System.err.println(s"[alert] delivery failed after $maxAttempts attempts; " +
          s"dead-lettered ${lines.size} alert(s) as $name: $lastEx")
      }
    }
  }

  /** Render alert rows (the HogzillaBatch/GraftContinuousApp event
    * schema) to the mailer's message shape: adds a `body` column built
    * from the same fields the reference template substitutes
    * ([USERNAME]/[IP]/[LOCATION]/[DATE] + title/note/flow evidence).
    * Pure column expressions — stays inside whole-stage codegen.
    */
  def render(alerts: DataFrame): DataFrame = {
    def field(name: String) =
      if (alerts.columns.contains(name)) col(name).cast("string") else lit(null).cast("string")
    alerts.withColumn("body", concat_ws("\n",
      concat(lit("Alert: "), coalesce(field("title"), field("detector"), lit("unknown"))),
      concat(lit("Priority: "), coalesce(field("priority"), lit("-"))),
      concat(lit("Time: "), coalesce(field("time"), lit("-"))),
      concat(lit("Host: "), coalesce(field("my_ip"), field("alien_ip"), lit("-"))),
      concat(lit("User: "), coalesce(field("username"), lit("-"))),
      concat(lit("Location: "), coalesce(field("coords"), lit("-"))),
      concat(lit("Note: "), coalesce(field("note"), lit("-"))),
      concat(lit("Flows:"), lit("\n"), coalesce(field("flows"), lit("(none)")))))
  }

  /** Render and hand every alert to `sink`, partition by partition. */
  def deliver(alerts: DataFrame, sink: Sink): Unit =
    render(alerts)
      .select(col("signature_id").cast("long"), col("title"),
        col("priority").cast("int"), col("body"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        sink.deliver(rows.map(r => Rendered(
          if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0)),
          r.getString(1),
          if (r.isNullAt(2)) null else java.lang.Integer.valueOf(r.getInt(2)),
          r.getString(3))))
      }
}
