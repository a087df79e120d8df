package graft.spark.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism floor (optimization guide §2.5 "input skew" / §6
  * `spark.sql.files.minPartitionNum`): the local test tables are single
  * small parquet files, so a scan arrives as ONE partition and every
  * per-row CPU-heavy stage downstream of it (image/audio codecs, MD5
  * hashing, shingling, interpreted-HOF cosine) runs on one core of the
  * whole cluster. At 100 TB the same scan carries thousands of
  * partitions and this helper is a NO-OP (the `<` guard); below the
  * floor it hash-repartitions on the given deterministic key up to the
  * cluster's default parallelism — keyed rather than round-robin, so
  * there is no sort-before-repartition pass and task retries are
  * deterministic (guide §2.5 on rand-derived keys). The floor is derived
  * from the cluster (`defaultParallelism`), never a constant.
  */
object Par {
  def spreadBy(df: DataFrame, key: Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p, key) else df
  }
}
