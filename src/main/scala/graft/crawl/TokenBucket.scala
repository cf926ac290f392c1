package graft.crawl

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Per-host token-bucket politeness scheduler (SURVEY.md op 48) as a typed
 * `mapPartitions` — the one inherently stateful-sequential piece of the
 * round, hence the one place the engine drops out of Catalyst.
 *
 * Semantics: each host owns a bucket with capacity `burst` tokens refilling
 * at `ratePerSec`. Fetches consume one token; when the bucket is empty the
 * fetch is scheduled at the earliest virtual time a token exists. The clock
 * is VIRTUAL (starts at 0 per host per round) so the schedule is a pure
 * function of each candidate's rank within its host — never wall time.
 * Closed form: offset_ms(rank) = max(0, rank − burst) · ceil(1000/rate)
 * with 1-based rank (see [[offsetByRank]] — the per-step ceil matters for
 * non-integral 1000/rate), which the property suite asserts equals this
 * stateful implementation for random inputs (the stateful form is kept
 * because it generalizes to variable cost / per-host rates; the closed
 * form would not).
 *
 * Scale contract: callers repartition by host and sort within partitions by
 * (host, priority) first, so one host's candidates arrive consecutively in
 * one partition and per-partition state is a single live bucket at a time.
 */
object TokenBucket {

  final case class Bucket(burst: Int, ratePerSec: Double) {
    private var tokens: Double = burst.toDouble
    private var vclockMs: Long = 0L

    /** Schedule the next fetch; returns its offset in virtual ms. */
    def next(): Long = {
      if (tokens >= 1.0) { tokens -= 1.0; vclockMs }
      else {
        val waitMs = math.ceil((1.0 - tokens) / ratePerSec * 1000.0).toLong
        vclockMs += waitMs
        tokens = 0.0 // the refilled token is consumed immediately
        vclockMs
      }
    }
  }

  /** The stateful bucket's schedule as a CLOSED-FORM column: once the burst
    * is consumed the bucket always refills from exactly 0 tokens, so every
    * subsequent fetch waits the same integral `ceil(1000/rate)` ms and
    *
    *   offset_ms(host_rank) = max(0, host_rank − burst) · ceil(1000/rate)
    *
    * (1-based host_rank) equals [[Bucket.next]]'s accumulation step for
    * step. Equivalence with [[schedule]] is property-asserted by CrawlSpec.
    *
    * This form is a pure per-row projection (codegen'd, no mapPartitions
    * boundary) and — the scale point — STATELESS: it needs no host
    * contiguity, so a Zipf-hot host's candidates can be salted across
    * partitions (op 47) while every row still receives its globally-correct
    * politeness offset. The stateful [[schedule]] remains the general
    * primitive (it extends to variable per-host rates / per-fetch costs,
    * where no closed form exists). */
  def offsetByRank(hostRank: org.apache.spark.sql.Column, burst: Int,
      ratePerSec: Double): org.apache.spark.sql.Column =
    greatest(lit(0L), (hostRank - burst).cast("long")) *
      lit(math.ceil(1000.0 / ratePerSec).toLong)

  /** [[schedule]]'s closed form over a frame carrying `host_rank`: appends
    * `scheduled_offset_ms`. No layout requirement (see [[offsetByRank]]). */
  def scheduleByRank(cands: DataFrame, burst: Int, ratePerSec: Double): DataFrame =
    cands.withColumn("scheduled_offset_ms",
      offsetByRank(col("host_rank"), burst, ratePerSec))

  /** Candidates → Scheduled. Input MUST be host-clustered and host-sorted
    * within each partition (see class doc). */
  def schedule(cands: Dataset[Candidate], burst: Int, ratePerSec: Double): Dataset[Scheduled] = {
    import cands.sparkSession.implicits._
    cands.mapPartitions { it =>
      var curHost: String = null
      var bucket: Bucket = null
      it.map { c =>
        if (c.host != curHost) { curHost = c.host; bucket = Bucket(burst, ratePerSec) }
        Scheduled(c.canon_url, c.host, c.host_rev, c.depth, c.discovery_round,
          c.host_rank, bucket.next())
      }
    }
  }
}
