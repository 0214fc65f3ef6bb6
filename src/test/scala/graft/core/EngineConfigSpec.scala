package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** O14 parity: the reference's space-separated config format
  * (`config/config_WordCounter.txt`, parsed at `src/WordCounter.cpp:51-70`). */
class EngineConfigSpec extends AnyFunSuite {

  test("parses the reference's shipped config verbatim (config_WordCounter.txt)") {
    val cfg = EngineConfig.parse(Seq(
      "N_WORKER 2",
      "INPUTFILE WordCounterInput.txt",
      "DATADIR WordCounterData"))
    assert(cfg == EngineConfig(2, "WordCounterInput.txt", "WordCounterData"))
  }

  test("scale-out config (N_WORKER 15, README scale-out proof)") {
    val cfg = EngineConfig.parse(Seq(
      "N_WORKER 15",
      "INPUTFILE /data/in.txt",
      "DATADIR /data/out"))
    assert(cfg == EngineConfig(15, "/data/in.txt", "/data/out"))
  }

  test("defaults when keys are missing") {
    val cfg = EngineConfig.parse(Seq.empty)
    assert(cfg.nWorker == EngineConfig.DefaultNWorker) // config_WordCounter.txt:1
    assert(cfg.dataDir == ".")
  }

  test("blank lines and padding are tolerated") {
    val cfg = EngineConfig.parse(Seq("", "  N_WORKER   7  ", ""))
    assert(cfg.nWorker == 7)
  }
}
