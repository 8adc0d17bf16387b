package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact prefix sum (global running total) — the two-level
  * scan that replaces the single-partition global window Spark would
  * otherwise plan for `sum() OVER (ORDER BY ...)` with no PARTITION BY.
  *
  * Plan shape:
  *   1. rows are assigned a coarse `chunk` of the total order (e.g. the
  *      day of a timestamp) and the running sum WITHIN each chunk is an
  *      ordinary key-partitioned window — fully parallel;
  *   2. per-chunk totals (one row per chunk) are collected to the
  *      driver, prefix-scanned there, and rejoined as a broadcast
  *      chunk→offset table;
  *   3. running = chunk offset + within-chunk running sum.
  *
  * The only sequential state is the chunk-offset scan, which is
  * O(#chunks) — bounded by timespan/chunkWidth, NOT by row count (a year
  * of day-chunks is 365 rows at any data scale). This is the classic
  * scan-primitive decomposition (Blelloch-style up-sweep/down-sweep with
  * the tiny middle level on the driver), the same shape Spark itself
  * uses for `zipWithIndex`.
  *
  * Exactness/determinism: values are accumulated as DECIMAL(18,2) —
  * chunk totals and offsets are exact and order-independent, so the
  * result is identical however rows are partitioned (PrefixSumSpec
  * proves equality to the single-partition global window under random
  * repartitioning). The within-chunk window orders by
  * (orderCol, tieCol); the caller must make that pair a total order.
  */
object PrefixSum {

  /** Adds `runningName` = exact running total of `value` (a money-like
    * double) over the total order (orderCol, tieCol), chunked by
    * `chunk(orderCol)`. The chunk expression must be monotone in the
    * order columns (all rows of chunk c precede all rows of chunk c+1),
    * long-castable, and NON-NULL on every row (a null chunk has no
    * position in the chunk order — rows with a null orderCol must be
    * filtered or defaulted by the caller first). */
  def runningTotal(df: DataFrame, orderCol: String, tieCol: String,
                   value: Column, chunk: Column,
                   runningName: String): DataFrame = {
    val d = df.withColumn("_psum_chunk", chunk.cast("long"))
      .withColumn("_psum_v", value.cast("decimal(18,2)"))

    // level 1: parallel within-chunk running sums
    val w = Window.partitionBy("_psum_chunk")
      .orderBy(col(orderCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inChunk = d.withColumn("_psum_run", sum(col("_psum_v")).over(w))

    // level 2: one exact DECIMAL total per chunk — O(#chunks) rows by
    // the chunk contract, collected and prefix-scanned on the driver
    // (driver-scale by contract, like the IVF centroid sidecar)
    val totals = d.groupBy("_psum_chunk").agg(sum("_psum_v").as("_psum_tot"))
      .collect()
      .map { r =>
        require(!r.isNullAt(0),
          "PrefixSum: chunk expression produced NULL — filter or default " +
            "null-order rows before calling runningTotal")
        (r.getLong(0),
          Option(r.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO))
      }
      .sortBy(_._1)
    var acc = java.math.BigDecimal.ZERO
    val offsets = totals.map { case (c, tot) =>
      val off = acc; acc = acc.add(tot); (c, off)
    }

    val spark = df.sparkSession
    val offDf = spark.createDataFrame(offsets.toSeq)
      .toDF("_psum_chunk", "_psum_off")
      .withColumn("_psum_off", col("_psum_off").cast("decimal(38,2)"))

    inChunk.join(broadcast(offDf), "_psum_chunk")
      .withColumn(runningName,
        (col("_psum_off") + col("_psum_run")).cast("double"))
      .drop("_psum_chunk", "_psum_v", "_psum_run", "_psum_off")
  }

  /** Integer variant of [[runningTotal]] for LONG values (counts, char
    * masses, token budgets): the identical two-level scan with BIGINT
    * accumulation throughout — no DECIMAL round-trip and no double at
    * the end, so downstream integer arithmetic (`div`, `%`) stays
    * exact. The caller guarantees the grand total fits a long (char
    * mass at 100 TB is ~1e14, four decades under 2^63). Same chunk
    * contract: monotone in the order column, long-castable, non-null,
    * O(#chunks) driver scan. */
  def runningTotalLong(df: DataFrame, orderCol: String, tieCol: String,
                       value: Column, chunk: Column,
                       runningName: String): DataFrame = {
    val d = df.withColumn("_psum_chunk", chunk.cast("long"))
      .withColumn("_psum_v", value.cast("long"))

    val w = Window.partitionBy("_psum_chunk")
      .orderBy(col(orderCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inChunk = d.withColumn("_psum_run", sum(col("_psum_v")).over(w))

    val totals = d.groupBy("_psum_chunk").agg(sum("_psum_v").as("_psum_tot"))
      .collect()
      .map { r =>
        require(!r.isNullAt(0),
          "PrefixSum: chunk expression produced NULL — filter or default " +
            "null-order rows before calling runningTotalLong")
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      .sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (c, tot) =>
      val off = acc; acc = Math.addExact(acc, tot); (c, off)
    }

    val spark = df.sparkSession
    val offDf = spark.createDataFrame(offsets.toSeq)
      .toDF("_psum_chunk", "_psum_off")

    inChunk.join(broadcast(offDf), "_psum_chunk")
      .withColumn(runningName, col("_psum_off") + col("_psum_run"))
      .drop("_psum_chunk", "_psum_v", "_psum_run", "_psum_off")
  }
}
