package graft.etl

import graft.config.Config
import graft.ingest.Http
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Orchestrator: config tree → per-route ingest → normalize → Parquet
  * (reference: src/main.rs:25-119).
  *
  * Fail-soft throughout (reference: src/main.rs:89-105): one route's
  * failure is recorded and the loop continues. Output layout matches
  * the reference: `{outRoot}/{api}/{group}/{key}.parquet`
  * (reference: src/main.rs:62, 84-85), with a `{key}_temp.json` staging
  * file that is deleted only after a successful Parquet write
  * ("Atomização", reference: src/main.rs:10, src/processor.rs:94).
  */
object Pipeline {

  final case class RouteResult(
      api: String,
      group: String,
      key: String,
      outcome: Either[GraftError, Long], // Right(rows written)
      seconds: Double
  )

  /** Run every resolvable, non-templated route. Each route becomes one
    * Spark job (read.json → normalize → write.parquet), internally
    * distributed across executors; routes themselves are driver-side
    * sequential like the reference's loop.
    */
  def run(spark: SparkSession, config: Config, outRoot: String): Seq[RouteResult] = {
    val results = for {
      (apiName, api) <- config.apis.toSeq.sortBy(_._1)
      (groupName, group) <- api.endpoints.toSeq.sortBy(_._1)
      (key, routePath) <- group.routes.toSeq.sortBy(_._1)
    } yield {
      val t0 = System.nanoTime()
      val outcome: Either[GraftError, Long] =
        if (Config.isTemplatedRoute(routePath))
          Left(ProcessorError.Config(s"templated route skipped: $routePath"))
        else
          config.resolveEndpointUrl(apiName, groupName, key).flatMap { url =>
            val groupDir = Paths.get(outRoot, apiName, groupName)
            val staging = groupDir.resolve(s"${key}_temp.json")
            val target = groupDir.resolve(s"$key.parquet")
            val progress = Http.loggedProgress(s"$apiName.$groupName.$key")
            Http.fetchToDisk(url, staging, onProgress = progress).flatMap { _ =>
              processStaged(spark, staging.toString, target.toString, group.rootPath)
            }
          }
      RouteResult(apiName, groupName, key, outcome, (System.nanoTime() - t0) / 1e9)
    }
    results.foreach {
      case RouteResult(a, g, k, Left(err), _) =>
        System.err.println(s"[pipeline] $a.$g.$k failed (continuing): ${err.message}")
      case RouteResult(a, g, k, Right(n), s) =>
        println(f"[pipeline] $a.$g.$k ok: $n rows in $s%.2fs")
    }
    results
  }

  /** Transform one staged JSON file to Parquet
    * (reference: src/processor.rs:17-97). Kept public so local files
    * can be processed without the HTTP leg (used by tests).
    */
  def processStaged(
      spark: SparkSession,
      stagingPath: String,
      targetPath: String,
      rootPath: Option[String]
  ): Either[GraftError, Long] =
    try {
      val raw = Normalize.readEnvelope(spark, stagingPath)
      Normalize.requireNonEmpty(raw, stagingPath).map { df =>
        val normalized = Normalize.normalize(df, rootPath)
        Normalize.writeParquet(normalized, targetPath)
        val rows = spark.read.parquet(targetPath).count()
        // staging removed only after a successful write (processor.rs:94)
        Files.deleteIfExists(Paths.get(stagingPath))
        rows
      }
    } catch {
      case NonFatal(e) =>
        Left(ProcessorError.Engine(stagingPath, String.valueOf(e.getMessage)))
    }
}
