package graft.streaming

import org.apache.spark.sql.DataFrame

/** Package bridge for dev tooling: exposes the private[streaming]
  * epoch appliers to `graft.tools` stress drivers without widening the
  * maintainers' own visibility.
  */
private[graft] object StreamingBridge {
  def indexEpoch(batch: DataFrame, batchId: Long, tablePath: String,
                 idCol: String, textCol: String, maxPostings: Int): Unit =
    StreamingIndex.applyBatch(batch, batchId, tablePath, idCol, textCol,
      maxPostings)
}
