package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress

/** Minimal Socrata-shaped CSV endpoint for ingest tests: serves `header`
  * plus the rows whose `updated_on` exceeds the bound in the request's
  * SoQL `$where=updated_on > '<ts>'` parameter — the server-side filtering
  * contract of the reference's ingest Lambda
  * (Additional_Data_Function/get_data_api.py:13). JDK-built-in HttpServer;
  * no dependencies. */
object SoqlTestServer {

  /** One servable row: the value the server filters on + its CSV line. */
  final case class Row(updatedOn: String, csv: String)

  private val WherePattern = """updated_on > '(.*)'""".r

  /** Start a server on an ephemeral port, hand `f` the resource URL, stop
    * the server afterwards. */
  def withServer[A](header: String, rows: Seq[Row])(f: String => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/resource", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val query = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        val where = query.split("&").collectFirst {
          case p if p.startsWith("%24where=") || p.startsWith("$where=") =>
            java.net.URLDecoder.decode(p.substring(p.indexOf('=') + 1), "UTF-8")
        }
        val keep = where match {
          case Some(WherePattern(since)) => rows.filter(_.updatedOn > since)
          case _                         => rows
        }
        val body = (header +: keep.map(_.csv)).mkString("\n").getBytes("UTF-8")
        ex.getResponseHeaders.add("Content-Type", "text/csv")
        ex.sendResponseHeaders(200, body.length.toLong)
        ex.getResponseBody.write(body)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/resource")
    finally server.stop(0)
  }
}
