package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sink / materialization / maintenance operators (SURVEY §2.1 rows
  * S5-S11, §2.9 row T7, §2.10 row M4).
  *
  * The reference's layer materializations map onto Spark as: raw append
  * (dlt `write_disposition="append"`), mart full-refresh overwrite (dbt
  * `materialized: table` + `full_refresh: True`), staging/intermediate
  * lazy views (`materialized: view`), 90-day retention DELETE as a
  * filter-rewrite, and post-run ANALYZE for CBO statistics.
  */
object Sinks {

  /** (url, index-name) pairs this process has already ensured — see
    * jdbcMerge.indexIfAbsent. Never trusted for correctness (an external
    * DROP INDEX is re-healed by the duplicate-tolerant CREATE on the next
    * cold process), only for skipping the per-batch exception round-trip. */
  private val ensuredIndexes =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()

  /** S5: append sink (reference: iot_temperature_pipeline.py:19-23). At
    * scale, partition by ingest date so retention rewrites touch only
    * expired partitions. */
  def append(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("append")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** S6: full-refresh table materialization
    * (reference: dbt mart config, mart_temperature_readings.sql:1-12;
    * full refresh at iot_temperature_dag.py:236-239). */
  def overwrite(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** S6 (catalog flavor): CREATE TABLE AS into the session catalog. */
  def saveTable(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").saveAsTable(table)

  /** S7: view materialization — lazy, recomputed per query, exactly the
    * semantics of the reference's staging/intermediate views
    * (reference: dbt_project.yml:20-26). */
  def asView(df: DataFrame, name: String): Unit =
    df.createOrReplaceTempView(name)

  /** S10/T7: retention filter-rewrite — keep only rows younger than
    * `days` relative to `now` (reference deletes raw rows older than 90
    * days, iot_temperature_dag.py:263-272). Rewrites to a staging path
    * then swaps, since parquet can't delete in place. */
  def retentionRewrite(
      spark: SparkSession, path: String, tsCol: String, days: Int,
      now: java.sql.Timestamp): Unit = {
    val kept = spark.read.parquet(path)
      .filter(col(tsCol) >= lit(now) - expr(s"INTERVAL $days DAYS"))
    val tmp = path.stripSuffix("/") + "__rewrite"
    kept.write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  /** Small-file compaction: rewrite a table path to ~`targetFileRows` rows
    * per file. The append sink accumulates one file per batch per
    * partition; at scale the resulting small-files problem throttles the
    * scan (footer fetches dominate), so periodic compaction is part of the
    * sink contract. */
  def compact(spark: SparkSession, path: String, targetFiles: Int): Unit = {
    val df = spark.read.parquet(path)
    val tmp = path.stripSuffix("/") + "__compact"
    df.repartition(targetFiles).write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  /** Dynamic partition overwrite: replace only the partitions present in
    * `df`, leaving sibling partitions untouched — the backfill/late-data
    * write pattern (vs the default static mode which would drop every
    * partition). */
  def overwritePartitions(df: DataFrame, path: String, partitionBy: Seq[String]): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write.mode("overwrite").partitionBy(partitionBy: _*).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** S5 (relational flavor): JDBC sink — the reference's actual landing
    * target is a Postgres table (dlt destination,
    * iot_temperature_pipeline.py:262-267). Plain `df.write.jdbc`: each
    * partition opens its own connection and batch-inserts, so the write
    * parallelism is the partition count — repartition to the target's
    * acceptable connection count before calling at scale. */
  def jdbc(df: DataFrame, url: String, table: String,
      mode: String = "append",
      properties: java.util.Properties = new java.util.Properties): Unit =
    df.write.mode(mode).jdbc(url, table, properties)

  /** S5 idempotent flavor: keyed JDBC MERGE (upsert). The reference's
    * landing table carries a `file_record_id` primary key precisely so a
    * re-run of the same extraction cannot double-land rows
    * (iot_temperature_pipeline.py:19-23,70); `df.write.jdbc` alone has no
    * such guarantee. Strategy — stage + delete-matched + insert, all
    * set-based on the database side:
    *
    *  1. the batch lands in `<table>__stage` (parallel partition inserts —
    *     the only step whose cost scales with batch size, and it scales on
    *     Spark's side); the stage table and its merge-key index persist
    *     across batches (TRUNCATE + append, not overwrite), so the
    *     per-batch DDL floor is one truncate, not a table+index rebuild;
    *  2. one `DELETE ... WHERE EXISTS` removes target rows matching the
    *     staged keys (no-op on first run / pure re-runs land zero extra
    *     rows);
    *  3. one `INSERT ... SELECT` copies the stage in;
    *  4. the stage is emptied for the next batch.
    *
    * Steps 2-4 run as single SQL statements on one driver-side connection:
    * constant per-batch statement count, with the row work inside the
    * database's own executor. Re-running the same batch is a fixpoint —
    * exactly-once landing semantics over an at-least-once scheduler. The
    * portable EXISTS form is used instead of `ON CONFLICT` / `MERGE`
    * because the test harness speaks Derby while the reference target is
    * Postgres; both (and every ANSI database) accept this shape.
    */
  def jdbcMerge(df: DataFrame, url: String, table: String, keys: Seq[String],
      properties: java.util.Properties = new java.util.Properties): Unit = {
    require(keys.nonEmpty, "jdbcMerge needs at least one key column")
    val stage = table + "__stage"
    val conn = java.sql.DriverManager.getConnection(url, properties)
    try {
      val st = conn.createStatement()
      // Spark's JDBC writer creates columns QUOTED (case-sensitive in
      // Derby/Postgres) — qualify with quoted identifiers to match
      def q(c: String) = "\"" + c + "\""
      def exists(t: String): Boolean =
        try { st.executeQuery(s"SELECT 1 FROM $t WHERE 1=0").close(); true }
        catch { case _: java.sql.SQLException => false }
      // index the merge keys: without it the matched-row DELETE's
      // correlated EXISTS is a nested-loop over |target|×|stage| —
      // measured as a multi-hour wedge at the sf10 tier (500k strided
      // rows), where the indexed probe finishes in seconds. (A PRIMARY
      // KEY would be the production choice, but Spark's JDBC writer
      // creates nullable columns and Derby/Postgres reject PKs on them;
      // a plain index gives the same probe.) Tolerate a pre-existing
      // index — a crash between CREATE INDEX and a later step must leave
      // the merge retry-safe under every overwrite configuration
      // (ADVICE r14) — but rethrow anything that isn't the
      // duplicate-object SQLState (Derby X0Y32, Postgres 42P07,
      // H2 42S11, ANSI 42710).
      // the index NAME carries a digest of the key-column list: with a
      // fixed name, a caller changing `keys` for an existing table would
      // hit the duplicate-object catch (the stale same-named index covers
      // the OLD columns) and the memo would pin the skip — the merge
      // silently degrading back to the nested-loop DELETE probe the index
      // exists to prevent (ADVICE r15). A key-set change now derives a
      // fresh name and builds a fresh index.
      val keyDigest = {
        val md = java.security.MessageDigest.getInstance("MD5")
        md.digest(keys.mkString(",").getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
      }
      def idxName(t: String) = s"${t}_mk_$keyDigest"
      def indexIfAbsent(name: String, t: String): Unit = {
        val k = (url, name)
        if (!Sinks.ensuredIndexes.contains(k)) {
          try st.executeUpdate(
            s"CREATE INDEX $name ON $t (${keys.map(q).mkString(", ")})")
          catch {
            case e: java.sql.SQLException
                if Set("X0Y32", "42P07", "42S11", "42710")(e.getSQLState) => ()
          }
          // remember per (url, index): the duplicate-object catch above is
          // the correctness mechanism, this memo only avoids paying a
          // thrown-and-caught exception on EVERY micro-batch
          Sinks.ensuredIndexes.add(k)
        }
      }
      // The stage table (and its index) is KEPT across batches: the
      // overwrite-per-batch shape rebuilt both every micro-batch, and the
      // index rebuild alone was ~0.9 s/batch of pure floor at sf0.1
      // (VERDICT r14 #4). TRUNCATE preserves table + index; the batch
      // then lands with parallel partition appends exactly as before.
      // A batch carrying the same key twice would land both copies (the
      // DELETE removes target rows, not intra-stage duplicates) — dedupe
      // on the keys before staging so the merge is key-idempotent
      // regardless of upstream batch composition.
      val stageExisted = exists(stage)
      // a freshly (re)created table starts index-less whatever this
      // process remembers — drop the memo so indexIfAbsent re-runs
      if (!stageExisted) Sinks.ensuredIndexes.remove((url, idxName(stage)))
      if (stageExisted) st.executeUpdate(s"TRUNCATE TABLE $stage")
      df.dropDuplicates(keys).write
        .mode(if (stageExisted) "append" else "overwrite")
        .jdbc(url, stage, properties)
      if (!exists(table)) {
        Sinks.ensuredIndexes.remove((url, idxName(table)))
        st.executeUpdate(s"CREATE TABLE $table AS SELECT * FROM $stage WITH NO DATA")
      }
      indexIfAbsent(idxName(table), table)
      indexIfAbsent(idxName(stage), stage)
      val pred = keys.map(k => s"$stage.${q(k)} = $table.${q(k)}").mkString(" AND ")
      // delete-matched + insert are ONE transaction: autocommitting them
      // separately leaves a window where a crash after the DELETE loses
      // the matched target rows until the batch is retried
      conn.setAutoCommit(false)
      try {
        st.executeUpdate(
          s"DELETE FROM $table WHERE EXISTS (SELECT 1 FROM $stage WHERE $pred)")
        val cols = df.columns.map(q).mkString(", ")
        st.executeUpdate(s"INSERT INTO $table ($cols) SELECT $cols FROM $stage")
        conn.commit()
      } catch {
        case e: Throwable =>
          try conn.rollback() catch { case _: java.sql.SQLException => () }
          throw e
      } finally conn.setAutoCommit(true)
      // empty (don't drop) the stage so the next batch reuses table+index;
      // a crash before this truncate is harmless — the next batch
      // truncates first
      st.executeUpdate(s"TRUNCATE TABLE $stage")
      st.close()
    } finally conn.close()
  }

  /** JDBC source (round-trip / backfill-from-warehouse path). For parallel
    * reads pass a `partitionColumn`/bounds via `options`; a bare read is a
    * single-connection scan. */
  def readJdbc(spark: SparkSession, url: String, table: String,
      properties: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, properties)

  /** S11: statistics collection for the cost-based optimizer
    * (reference: ANALYZE post-run, iot_temperature_dag.py:274-287). */
  def analyze(spark: SparkSession, table: String): Unit =
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")

  /** M4: catalog existence probe (reference: macros/table_exists.sql:1-15). */
  def tableExists(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(table)
}
