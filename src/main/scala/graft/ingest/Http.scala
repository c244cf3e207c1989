package graft.ingest

import graft.etl.ApiError
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path}
import java.time.Duration

/** Driver-side streaming HTTP ingestion (reference: src/api.rs).
  *
  * The reference stages each payload on disk with constant memory
  * before any columnar processing (reference: src/api.rs:103-107,
  * README.md:13); we keep that split: the JDK HttpClient streams the
  * body straight to a file (`BodyHandlers.ofFile`), and Spark only ever
  * reads the staged file — so executor parallelism starts at the scan,
  * not the download. One shared keep-alive client per run
  * (reference: src/api.rs:29-34, src/main.rs:49-50).
  */
object Http {

  /** 300 s request timeout, as the reference (reference: src/api.rs:31). */
  val RequestTimeout: Duration = Duration.ofSeconds(300)

  val UserAgent = "graft-client/1.0"

  /** Shared keep-alive client (reference: src/api.rs:29-34). The JDK
    * client pools connections internally.
    */
  lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(30)).build()

  /** HTTPS-only gate — pure and unit-testable; the reference rejects
    * plain HTTP with status 426 Upgrade Required
    * (reference: src/api.rs:61-66).
    */
  def validateHttps(url: String): Either[ApiError, String] =
    if (url.startsWith("https://")) Right(url)
    else Left(ApiError.InsecureUrl(url))

  /** Stream `url` to `dest`, returning bytes written
    * (reference: src/api.rs:56-117). Failure modes map one-to-one to
    * the reference's gates: HTTPS-only, HTTP status, zero-byte payload
    * (staged file removed on empty, src/api.rs:109-113).
    */
  def fetchToDisk(url: String, dest: Path, httpClient: HttpClient = client): Either[ApiError, Long] =
    validateHttps(url).flatMap { u =>
      try {
        Option(dest.getParent).foreach(Files.createDirectories(_))
        val req = HttpRequest
          .newBuilder(URI.create(u))
          .timeout(RequestTimeout)
          .header("User-Agent", UserAgent)
          .header("Accept", "*/*")
          .GET()
          .build()
        val resp = httpClient.send(req, HttpResponse.BodyHandlers.ofFile(dest))
        val status = resp.statusCode()
        if (status < 200 || status >= 300) {
          Files.deleteIfExists(dest)
          Left(ApiError.HttpStatusError(u, status))
        } else {
          val size = Files.size(dest)
          if (size == 0L) {
            Files.deleteIfExists(dest)
            Left(ApiError.EmptyResponse(u))
          } else Right(size)
        }
      } catch {
        case e: java.io.IOException =>
          Files.deleteIfExists(dest)
          Left(ApiError.NetworkError(u, String.valueOf(e.getMessage)))
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          Left(ApiError.NetworkError(u, String.valueOf(e.getMessage)))
      }
    }
}
