package graft.mr

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The reference engine's API, re-expressed as a Spark library.
  *
  * ganmol123/multithreaded_map_reduce exposes exactly one abstraction
  * (`include/MapReduceMaster.h:75-112`): a user subclass providing
  * `map_fn(k1, v1)` + `emitIntermediate`, and `reduce_fn(k2, values)` +
  * `emit`, run as two phases over the lines of a text file, with
  * intermediate pairs hash-partitioned by key
  * (`include/MapReduceMaster.h:480-496`) and reducer output key-sorted
  * (`:510-543`, std::map iteration order).
  *
  * Here that contract is a pair of lambdas over a `Dataset[String]`:
  *  - `mapFn(lineNo, line)` emits intermediate (key, value) pairs
  *    (≅ map_fn + emitIntermediate; lineNo is the 0-based global line
  *    number, `include/MapReduceMaster.h:461-478`);
  *  - `reduceFn(key, values)` folds one group to its output value list
  *    (≅ reduce_fn + emit).
  *
  * What Spark gives for free over the reference: input splits instead of
  * N full file scans (O1/O2), a real shuffle service instead of NFS temp
  * files (O4/O5), task retry instead of the fork+heartbeat master (O10),
  * and — via [[runFold]] — map-side partial aggregation, which the
  * reference lacks entirely (every ("word","1") crosses its shuffle).
  *
  * Scale note: [[run]] (arbitrary reduceFn) must materialize each group
  * stream, exactly like the reference — prefer [[runFold]] for algebraic
  * reducers so Catalyst plans partial+final aggregation and only |keys|
  * rows cross the shuffle.
  */
object MapReduce {

  /** Arbitrary user map/reduce — the reference's full generality.
    * Output is (key, values) sorted by key (O6 semantics: byte-wise
    * string order, matching std::string operator<).
    *
    * The O4 hash-partition-by-key exchange is delivered by the
    * `groupByKey` shuffle itself — an explicit `repartition(n, key)`
    * before it would be a second, pure-waste exchange of the same
    * data. `numPartitions` (≅ nr_reducer) is advisory on Spark: the
    * shuffle width comes from `spark.sql.shuffle.partitions` and the
    * one-file-per-reducer layout from the sink
    * ([[graft.sinks.TextKVSink]] repartitions on write); per the
    * reference's contract (and the partition-invariance property test)
    * it never changes answers. */
  def run(lines: Dataset[String],
          mapFn: (Long, String) => Iterator[(String, String)],
          reduceFn: (String, Iterator[String]) => Seq[String],
          numPartitions: Int): Dataset[(String, Seq[String])] = {
    val spark = lines.sparkSession
    import spark.implicits._
    val indexed = lines.rdd.zipWithIndex() // (line, 0-based global line number)
    val kv: Dataset[(String, String)] =
      spark.createDataset(indexed.flatMap { case (line, no) => mapFn(no, line) })
    kv.groupByKey(_._1)
      .mapGroups((k, vs) => (k, reduceFn(k, vs.map(_._2)).toList: Seq[String]))
      .orderBy(col("_1"))
  }

  /** The reference's mapper input shard (O2): mapper `i` of `n` keeps
    * line iff `hash(record_number) % n == i`, and libstdc++'s
    * `std::hash<int>` is the identity ⇒ round-robin by line number
    * (`include/MapReduceMaster.h:434-440,:465`). Spark's input splits
    * make this unnecessary (each split is read once), but the exact
    * record-to-task assignment is reproducible when bit-parity matters. */
  def mapperShard(lines: Dataset[String], nrMapper: Int, mapperId: Int): Dataset[String] = {
    val spark = lines.sparkSession
    import spark.implicits._
    spark.createDataset(
      lines.rdd.zipWithIndex().collect { case (l, no) if no % nrMapper == mapperId => l })
  }

  /** Algebraic variant: when the user reduce is a fold (zero/step/merge),
    * run it as a typed Aggregator so Spark performs map-side combine —
    * the optimization the reference explicitly lacks
    * (`src/WordCounter.cpp:24-29` ships one pair per word occurrence). */
  def runFold[B](lines: Dataset[String],
                 mapFn: (Long, String) => Iterator[(String, String)],
                 foldZero: B,
                 foldStep: (B, String) => B,
                 foldMerge: (B, B) => B,
                 foldFinish: B => Seq[String])(implicit benc: Encoder[B]): Dataset[(String, Seq[String])] = {
    val spark = lines.sparkSession
    import spark.implicits._
    val indexed = lines.rdd.zipWithIndex()
    val kv: Dataset[(String, String)] =
      spark.createDataset(indexed.flatMap { case (line, no) => mapFn(no, line) })
    val agg = new Aggregator[(String, String), B, Seq[String]] {
      override def zero: B = foldZero
      override def reduce(b: B, a: (String, String)): B = foldStep(b, a._2)
      override def merge(b1: B, b2: B): B = foldMerge(b1, b2)
      override def finish(b: B): Seq[String] = foldFinish(b)
      override def bufferEncoder: Encoder[B] = benc
      override def outputEncoder: Encoder[Seq[String]] = implicitly[Encoder[Seq[String]]]
    }
    kv.groupByKey(_._1)
      .agg(agg.toColumn.name("values"))
      .orderBy(col("key"))
  }
}
