package graft.meta

/**
 * The daemon's latency self-metric histogram (reference
 * net.opentsdb.stats.Histogram, src/stats/Histogram.java:38-270):
 * linear fixed-size buckets up to a cutoff, exponential doubling
 * buckets past it, one overflow bucket — `/api/stats` reports each
 * tracked latency as `<name>_50pct/_75pct/_90pct/_95pct`
 * (StatsCollector.record(name, histo), src/stats/StatsCollector
 * .java:118-125; HttpQuery keeps `http.latency` this way,
 * src/tsd/HttpQuery.java:71-113,701).
 *
 * This is driver-side serving-tier state (O(buckets) ints per tracked
 * name, like [[Introspect.incr]]'s counters) — never a per-row data
 * structure. Percentile math is the reference's exact integer walk,
 * including its quirks: `count * p / 100` truncates, the walk returns
 * the bucket's EXCLUSIVE high bound, and an empty histogram reports 0.
 */
final class LatencyHistogram(max: Int, interval: Short, cutoff: Int) {
  if (interval > max) throw new IllegalArgumentException(
    s"interval > max! interval=$interval, max=$max")
  if (cutoff > max) throw new IllegalArgumentException(
    s"cutoff > max! cutoff=$cutoff, max=$max")
  if (interval < 1) throw new IllegalArgumentException(
    s"interval < 1! interval=$interval")
  if (cutoff < 0) throw new IllegalArgumentException(
    s"cutoff < 0! interval=$cutoff")

  import LatencyHistogram.{log2rounddown, log2roundup}

  private val numLinearBuckets: Int = cutoff / interval
  // the EFFECTIVE cutoff snaps down to a bucket boundary
  private val cut: Int = numLinearBuckets * interval
  private val expBucketShift: Int = log2rounddown(interval)
  private val bucketCounts: Array[Int] =
    new Array[Int](numLinearBuckets
      + log2roundup((max - cut) >> expBucketShift) + 1)

  /** Number of buckets (linear + exponential + overflow). */
  def buckets: Int = bucketCounts.length

  /** O(1) insert; negatives are the reference's error. */
  def add(value: Int): Unit = {
    if (value < 0)
      throw new IllegalArgumentException(s"negative value: $value")
    bucketCounts(bucketIndexFor(value)) += 1
  }

  /** The pth percentile's bucket high bound (exclusive), p in [1,100];
    * 0 for an empty histogram. */
  def percentile(p: Int): Int = {
    if (p < 1 || p > 100)
      throw new IllegalArgumentException(s"invalid percentile: $p")
    var count = bucketCounts.sum
    if (count == 0) return 0
    val rank = count * p / 100
    var i = bucketCounts.length - 1
    while (i >= 0) {
      count -= bucketCounts(i)
      if (count <= rank) return bucketHighInterval(i)
      i -= 1
    }
    0
  }

  /** Test hook (the reference's valueInBucket). */
  private[graft] def valueInBucket(index: Int): Int = bucketCounts(index)

  private def bucketIndexFor(value: Int): Int = {
    if (value < cut) value / interval
    else {
      val b = numLinearBuckets +
        log2rounddown((value - cut) >> expBucketShift)
      if (b >= bucketCounts.length) bucketCounts.length - 1 else b
    }
  }

  private def bucketLowInterval(index: Int): Int =
    if (index <= numLinearBuckets) index * interval
    else cut + (1 << (index - numLinearBuckets + expBucketShift))

  private def bucketHighInterval(index: Int): Int =
    if (index == bucketCounts.length - 1) Int.MaxValue
    else bucketLowInterval(index + 1)
}

object LatencyHistogram {
  /** ceil(log2(n)); 0 for n <= 1 (Histogram.log2roundup). */
  private[meta] def log2roundup(n: Int): Int = {
    var log2 = 0
    while (n > (1 << log2)) log2 += 1
    log2
  }

  /** floor(log2(n)); 0 for n <= 1 (Histogram.log2rounddown). */
  private[meta] def log2rounddown(n0: Int): Int = {
    var n = n0; var log2 = 0
    while (n > 1) { n >>>= 1; log2 += 1 }
    log2
  }
}
