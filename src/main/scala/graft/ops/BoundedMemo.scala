package graft.ops

/** Bounded, LRU-evicting memo map for the session-scoped driver caches
  * (mining pair lists, prefix projections, hot-token salt widths, trained
  * quantizers, BPE merge tables, …).
  *
  * The unbounded `ConcurrentHashMap` predecessors were fine per session —
  * every entry is bounded and keyed by (session id, plan hash, params) —
  * but a weeks-lived production driver churning sessions/corpora would
  * grow them monotonically (explicit `clearCaches` exists, yet nothing
  * forced a caller to use it). This wrapper adds:
  *
  *  - an ENTRY-COUNT BOUND with least-recently-used eviction: inserting
  *    past the bound evicts the LRU entries, running each evicted value's
  *    discard (e.g. `unpersist`) outside the lock. The default bound (64,
  *    `graft.cache.maxEntries` system property) is far above any real
  *    session's key count (the full 288-query registry uses < 10 keys per
  *    cache), so eviction only fires in the long-lived multi-corpus
  *    drivers the bound exists for. Eviction inherits the cache contract:
  *    an evicted value is never handed out again, and a later lookup
  *    rebuilds it from source — identical results, one extra build.
  *  - a SIZE GAUGE through [[graft.core.Tel]] (`graft.cache.<name>.entries`)
  *    updated on every mutation, so a deployment watching telemetry sees
  *    cache growth without instrumenting the driver.
  *
  * Same compute-outside-the-lock discipline as the predecessor
  * (`DedupOps.memoize`): `build` launches full Spark jobs, so it must not
  * run under the map lock; a lost race discards the loser's copy.
  */
private[graft] final class BoundedMemo[K, V](
    val name: String, maxOverride: Option[Int] = None) {
  private final case class Entry(value: V, discard: V => Unit)
  // accessOrder = true: iteration order is least-recently-USED first,
  // and both get() and put() refresh recency.
  private val map = new java.util.LinkedHashMap[K, Entry](16, 0.75f, true)

  private def maxEntries: Int =
    maxOverride.getOrElse(BoundedMemo.defaultMaxEntries)

  private def gauge(n: Int): Unit =
    graft.core.Tel.setGauge(s"graft.cache.$name.entries", n.toDouble)

  def get(key: K): Option[V] =
    map.synchronized(Option(map.get(key)).map(_.value))

  def size: Int = map.synchronized(map.size)

  /** Memoize `build` under `key`; on a lost build race the loser is
    * discarded and the winner returned; inserting past the bound evicts
    * (and discards) the least-recently-used entries.
    */
  def memoize(key: K)(build: => V)(discard: V => Unit): V =
    get(key).getOrElse {
      val built = build
      var evicted = List.empty[Entry]
      var lostRace = false
      val (result, n) = map.synchronized {
        val prev = map.get(key)
        if (prev != null) { lostRace = true; (prev.value, map.size) }
        else {
          map.put(key, Entry(built, discard))
          val bound = math.max(1, maxEntries)
          val it = map.entrySet().iterator()
          while (map.size > bound && it.hasNext) {
            val e = it.next()
            if (e.getKey != key) { evicted ::= e.getValue; it.remove() }
          }
          (built, map.size)
        }
      }
      gauge(n)
      if (lostRace) discard(built)
      evicted.foreach(e => e.discard(e.value))
      result
    }

  /** Remove (and discard) every entry whose key matches `pred` — the
    * per-session clear primitive behind `DedupOps.clearCaches`.
    */
  def clearIf(pred: K => Boolean): Unit = {
    var dropped = List.empty[Entry]
    val n = map.synchronized {
      val it = map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (pred(e.getKey)) { dropped ::= e.getValue; it.remove() }
      }
      map.size
    }
    gauge(n)
    dropped.foreach(e => e.discard(e.value))
  }

  /** Point-in-time (key, value) snapshot — does NOT refresh recency (used
    * by loosest-threshold lookups that scan rather than address a key).
    */
  def snapshot: Seq[(K, V)] = map.synchronized {
    val out = Seq.newBuilder[(K, V)]
    val it = map.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); out += ((e.getKey, e.getValue.value)) }
    out.result()
  }
}

private[graft] object BoundedMemo {
  /** Global entry bound per cache; read dynamically so a deployment (or a
    * spec) can tighten it without rebuilding the caches.
    */
  def defaultMaxEntries: Int =
    sys.props.get("graft.cache.maxEntries")
      .flatMap(s => scala.util.Try(s.toInt).toOption)
      .getOrElse(64)
}
