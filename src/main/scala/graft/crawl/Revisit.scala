package graft.crawl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Freshness-driven revisit scheduling — the recrawl policy layer above
 * [[Crawl.recrawlChanged]]: given each URL's observed fetch history
 * `(url, round, changed)`, compute when to fetch it next. The classic
 * exponential-backoff freshness model (Cho & Garcia-Molina's change-
 * frequency estimation collapsed to its production form): a URL that
 * changed on its last fetch is rechecked after `baseInterval` rounds;
 * every consecutive unchanged observation since the last change doubles
 * the interval, capped at `baseInterval · 2^maxDoublings` — stable pages
 * decay to the cap, churning pages stay hot.
 *
 * Shape: a per-url window (hash-partitioned BY KEY — per-url history is a
 * handful of rounds, nothing like the forbidden global window) marks the
 * last changed round, then ONE aggregate per url; Spark reuses the
 * window's hash partitioning for the groupBy, so the whole operator is a
 * single exchange. All-integer arithmetic ⇒ exact DuckDB oracle (q68).
 * At the design point the history is the fetch_log the catalog already
 * commits, and `next_due_round` joins back into the frontier as the
 * fetch-eligibility filter (`round >= next_due_round`) — the same
 * priority seam ops 16/47 use.
 *
 * Per url: last_round = max(round); unchanged_streak = observations
 * strictly after the last change (all of them if it never changed);
 * interval = baseInterval · 2^min(streak, maxDoublings);
 * next_due_round = last_round + interval.
 */
object Revisit {

  def schedule(
      history: DataFrame,
      baseInterval: Int = 1,
      maxDoublings: Int = 6,
      urlCol: String = "url"): DataFrame = {
    require(baseInterval >= 1, s"baseInterval must be >= 1, got $baseInterval")
    require(maxDoublings >= 0, s"maxDoublings must be >= 0, got $maxDoublings")
    val w = Window.partitionBy(col(urlCol))
    val annotated = history.withColumn("__lc",
      max(when(col("changed"), col("round"))).over(w))
    annotated.groupBy(col(urlCol))
      .agg(
        max(col("round")).as("last_round"),
        // every observation after the last change is unchanged BY
        // definition of "last change"; never-changed urls count everything
        sum(when(col("__lc").isNull || col("round") > col("__lc"), 1L)
          .otherwise(0L)).as("unchanged_streak"))
      .withColumn("interval",
        expr(s"$baseInterval * shiftleft(CAST(1 AS BIGINT), " +
          s"CAST(least(unchanged_streak, $maxDoublings) AS INT))"))
      .withColumn("next_due_round", col("last_round") + col("interval"))
  }
}
