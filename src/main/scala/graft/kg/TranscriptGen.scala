package graft.kg

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.schema.TranscriptTurn

/** Distributed deterministic transcript generator.
  *
  * `spark.range` gives a perfectly partitioned id space; each row is a pure
  * function of its id (Corpus.turnAt), so generation is embarrassingly
  * parallel, reproducible at any parallelism, and needs no shuffle. The hot
  * conversation ("conv-hot", ~30% of turns) lands contiguously in the low id
  * range — deliberately skewed input for the salting/AQE story downstream.
  */
object TranscriptGen {
  def turns(spark: SparkSession, nTurns: Long, partitions: Int = 0): Dataset[TranscriptTurn] = {
    import spark.implicits._
    val base =
      if (partitions > 0) spark.range(0L, nTurns, 1L, partitions)
      else spark.range(nTurns)
    base.map(id => Corpus.turnAt(id, nTurns))
  }
}
