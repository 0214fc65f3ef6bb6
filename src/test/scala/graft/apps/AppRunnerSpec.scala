package graft.apps

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import graft.SparkTestBase

/** The executable entry points (config file → facade → O8 output dir),
  * mirroring how a reference user invokes `./WordCounter config.txt`. */
class AppRunnerSpec extends SparkTestBase {

  private def write(path: java.nio.file.Path, text: String) = {
    Files.writeString(path, text); path.toString
  }

  test("WordCountMain pipeline: config -> input -> O8 output files") {
    spark // ensure the shared session exists so the runner reuses it
    val dir = Files.createTempDirectory("apprun")
    val input = write(dir.resolve("input.txt"), "b a\na c\n")
    val cfg = write(dir.resolve("config.txt"),
      s"N_WORKER 2\nINPUTFILE $input\nDATADIR $dir\n")
    val shuffleBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val rc = AppRunner.run(cfg, (s, in, _) =>
      WordCount.viaFacade(s.read.textFile(in)).toDF("key", "values"))
    assert(rc == 0)
    // reuse path must not leave the shared session's parallelism
    // mutated to the config file's N_WORKER
    assert(spark.conf.get("spark.sql.shuffle.partitions") == shuffleBefore)
    val outFiles = new java.io.File(s"$dir/output").listFiles()
      .filter(_.getName.startsWith("part-"))
    // ≤ N_WORKER files (Spark skips empty reducer partitions — the
    // declared parity is the merged output, SURVEY.md §7.4)
    assert(outFiles.nonEmpty && outFiles.length <= 2)
    val merged = outFiles.flatMap(f => Files.readAllLines(f.toPath).asScala).sorted.toSeq
    assert(merged == Seq("a 2 ", "b 1 ", "c 1 "))
  }

  test("missing input file returns the reference's -1") {
    val dir = Files.createTempDirectory("apprun2")
    val cfg = write(dir.resolve("config.txt"),
      s"N_WORKER 2\nINPUTFILE $dir/nope.txt\nDATADIR $dir\n")
    val rc = AppRunner.run(cfg, (s, in, _) =>
      WordCount.viaFacade(s.read.textFile(in)).toDF("key", "values"))
    assert(rc == -1)
  }
}
