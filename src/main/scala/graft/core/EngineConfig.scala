package graft.core

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The reference's runtime config surface (O14): a space-separated
  * `KEY value` text file carrying `N_WORKER` / `INPUTFILE` / `DATADIR`
  * (`config/config_WordCounter.txt:1-2`, parsed inline in `main` at
  * `src/WordCounter.cpp:51-70`).
  *
  * `N_WORKER` maps to the engine's partition knob (shuffle partitions /
  * sink partition count); by the facade's partition-invariance law
  * (MapReducePropertySpec) it can never change answers — only layout.
  */
final case class EngineConfig(nWorker: Int, inputFile: String, dataDir: String)

object EngineConfig {
  val DefaultNWorker = 2 // config/config_WordCounter.txt:1

  def parse(lines: Seq[String]): EngineConfig = {
    val kv = lines.iterator
      .map(_.trim).filter(_.nonEmpty)
      .map(_.split("\\s+", 2))
      .collect { case Array(k, v) => (k, v.trim) }
      .toMap
    EngineConfig(
      nWorker = kv.get("N_WORKER").map(_.toInt).getOrElse(DefaultNWorker),
      inputFile = kv.getOrElse("INPUTFILE", ""),
      dataDir = kv.getOrElse("DATADIR", "."))
  }

  def load(path: String): EngineConfig =
    parse(Files.readAllLines(Paths.get(path)).asScala.toSeq)
}
