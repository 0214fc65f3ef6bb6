package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's text KV sink (O8), reproduced byte-for-byte.
  *
  * Format per `include/Utility.h:61-76`: each row is
  * `key␣v1␣v2␣...␣\n` — single-space separated with a **trailing
  * space** after every token (the write loop appends `" "` after the key
  * and after each value). One file per reducer partition
  * (`output_<r>.txt`), rows key-sorted within each file
  * (`include/MapReduceMaster.h:510,:545`, std::map iteration order).
  *
  * Spark mapping: `repartition(n, key)` reproduces the hash partitioning
  * (O4; partition *assignment* differs from std::hash — SURVEY.md §7.4
  * declares merged output the contract), `sortWithinPartitions` the
  * per-file key order, and `.write.text` the one-file-per-partition
  * layout.
  */
object TextKVSink {

  /** Write `df` (a key column + an array-of-string values column) in the
    * reference output format. */
  def write(df: DataFrame, keyCol: String, valuesCol: String, dir: String, numPartitions: Int): Unit =
    df.select(col(keyCol).cast("string").as("k"), col(valuesCol).as("vs"))
      .repartition(numPartitions, col("k"))
      .sortWithinPartitions(col("k"))
      .select(concat(array_join(concat(array(col("k")), col("vs")), " "), lit(" ")).as("value"))
      .write.mode("overwrite").text(dir)

  /** Format a single row the way `write_key_val_vector` does — exposed
    * for golden tests. */
  def formatRow(key: String, values: Seq[String]): String =
    (key +: values).mkString("", " ", " ")
}
