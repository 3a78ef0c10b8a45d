package graft.operators

/** Counter of memo-cache consultations (hits AND builds) across the
  * session-scoped frame/count memos ([[Dedup]]'s shingle-index and
  * verified-pair caches, [[CorpusCount]]). One purpose: let the bench
  * harness detect which queries are MEMO-BACKED — for every other
  * query cold ≡ warm, so a cache-cold arm is pure duplicated work.
  * Round 14's bench ran the cold arm over all 293 queries and blew the
  * driver's 60-minute budget (BENCH_r14.json rc=124); scoping it to
  * the queries whose warm run actually touched a memo keeps the
  * cold-vs-warm signal (the only queries where the two differ) at a
  * fraction of the cost.
  *
  * `touches` is monotonic; callers diff it around a query run. Bumped
  * only when caching is enabled (disabled ⇒ cold ≡ warm by
  * construction, so the query is correctly classified as not
  * memo-backed). */
object MemoStats {
  val touches = new java.util.concurrent.atomic.AtomicLong(0L)
  def touch(): Unit = { touches.incrementAndGet(); () }
}
