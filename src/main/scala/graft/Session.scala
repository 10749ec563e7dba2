package graft

import org.apache.spark.sql.SparkSession

/** Shared session bootstrap: local[cpus] for the harness, but every knob is
  * the one you'd set on a real cluster (AQE, skew handling, shuffle
  * partitions sized to parallelism instead of the 200 default).
  */
object Session {
  def builder(master: String, cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Explicit, not inherited: every sum/multiply in the engine runs
      // under ANSI overflow semantics (Spark 4's default, pinned here so
      // a default change or ambient conf can never silently turn the
      // LongSumAuditSpec boundedness arguments into wraparounds —
      // VERDICT r12 #5's runtime net).
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.parquet.compression.codec", "snappy")
      // events.ts is TIMESTAMP(NANOS); Spark can only read it as bigint.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
