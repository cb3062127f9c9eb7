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
