package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

/** Minimal Socrata-shaped CSV endpoint for ingest tests: serves `header`
  * plus the rows whose `updated_on` exceeds the bound in the request's
  * SoQL `$where=updated_on > '<ts>'` parameter — the server-side filtering
  * contract of the reference's ingest Lambda
  * (Additional_Data_Function/get_data_api.py:13). Also honors `$select`
  * (column projection) and `$limit` (paging) so pushdown tests can prove
  * bytes never crossed the wire, records every decoded query string plus
  * the row count it served, and can be told to fail the next N requests
  * with an HTTP error (transient-503 laxity tests). JDK-built-in
  * HttpServer; no dependencies. */
object SoqlTestServer {

  /** One servable row: the value the server filters on + its CSV line. */
  final case class Row(updatedOn: String, csv: String)

  /** What the server observed: decoded query strings in arrival order and
    * the data-row count served per request (header excluded; -1 for
    * injected-error responses). */
  final class ServerLog {
    private[SoqlTestServer] val reqs = new ConcurrentLinkedQueue[String]
    private[SoqlTestServer] val served = new ConcurrentLinkedQueue[Integer]
    private[SoqlTestServer] val failNextN = new AtomicInteger(0)
    def requests: Seq[String] = { import scala.jdk.CollectionConverters._; reqs.asScala.toSeq }
    def rowsServed: Seq[Int] = { import scala.jdk.CollectionConverters._; served.asScala.toSeq.map(_.toInt) }
    /** Make the server answer the next `n` requests with `status`. */
    def failNext(n: Int): Unit = failNextN.set(n)
  }

  private val WherePattern = """updated_on > '(.*)'""".r

  private def param(query: String, name: String): Option[String] =
    query.split("&").collectFirst {
      case p if p.startsWith(s"%24$name=") || p.startsWith(s"$$$name=") =>
        java.net.URLDecoder.decode(p.substring(p.indexOf('=') + 1), "UTF-8")
    }

  /** Start a server on an ephemeral port, hand `f` the resource URL and
    * the request log, stop the server afterwards. */
  def withInstrumentedServer[A](header: String, rows: Seq[Row],
      errorStatus: Int = 503)(f: (String, ServerLog) => A): A = {
    val log = new ServerLog
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/resource", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val query = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        log.reqs.add(java.net.URLDecoder.decode(query, "UTF-8"))
        if (log.failNextN.getAndUpdate(n => math.max(0, n - 1)) > 0) {
          log.served.add(-1)
          val body = "upstream unavailable".getBytes("UTF-8")
          ex.sendResponseHeaders(errorStatus, body.length.toLong)
          ex.getResponseBody.write(body)
          ex.close()
          return
        }
        // $where: the one predicate shape the reference pushes
        val keep0 = param(query, "where") match {
          case Some(WherePattern(since)) => rows.filter(_.updatedOn > since)
          case _                         => rows
        }
        // $select=count(*): the page-grid sizing probe
        if (param(query, "select").exists(_.trim == "count(*)")) {
          log.served.add(1)
          val body = s"count\n${keep0.size}".getBytes("UTF-8")
          ex.getResponseHeaders.add("Content-Type", "text/csv")
          ex.sendResponseHeaders(200, body.length.toLong)
          ex.getResponseBody.write(body)
          ex.close()
          return
        }
        // $offset + $limit: offset-window paging ($order accepted and
        // logged; the fixture rows are already served in a stable order)
        val off = param(query, "offset").map(_.trim.toInt).getOrElse(0)
        val keep = param(query, "limit").map(_.trim.toInt) match {
          case Some(n) => keep0.drop(off).take(n)
          case None    => keep0.drop(off)
        }
        // $select: project columns by header position
        val headerCols = header.split(",", -1)
        val (outHeader, project) = param(query, "select") match {
          case Some(sel) =>
            val want = sel.split(",").map(_.trim).filter(_.nonEmpty)
            val idx = want.map(c => headerCols.indexOf(c)).filter(_ >= 0)
            (idx.map(headerCols).mkString(","),
              (line: String) => { val cells = line.split(",", -1); idx.map(cells).mkString(",") })
          case None => (header, identity[String] _)
        }
        log.served.add(keep.size)
        val body = (outHeader +: keep.map(r => project(r.csv))).mkString("\n").getBytes("UTF-8")
        ex.getResponseHeaders.add("Content-Type", "text/csv")
        ex.sendResponseHeaders(200, body.length.toLong)
        ex.getResponseBody.write(body)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/resource", log)
    finally server.stop(0)
  }

  /** Uninstrumented variant (original signature). */
  def withServer[A](header: String, rows: Seq[Row])(f: String => A): A =
    withInstrumentedServer(header, rows) { (url, _) => f(url) }
}
