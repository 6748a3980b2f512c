package org.apache.spark.sql.jdbc

/** Derby JDBC dialect with DSv2 join pushdown enabled — the offline
  * stand-in for the reference's PostgreSQL connector join pushdown
  * (reference: results/q004/workers-1/explain.txt:70 — the whole
  * LEFT JOIN shipped to psql as one `Query[...]` fragment; likewise
  * q005 explain.txt:129).
  *
  * Spark 4's JDBC source implements `SupportsPushDownJoin`: with
  * `spark.sql.optimizer.datasourceV2JoinPushdown` on and a dialect
  * whose `supportsJoin` is true, adjacent scans over the same JDBC
  * source collapse into a single join subquery executed by the remote
  * database. `PostgresDialect` — what a production deployment of this
  * engine would use against the reference's psql catalog — already
  * answers true; embedded Derby is the only JDBC engine available
  * offline and its stock dialect leaves the capability off even though
  * Derby executes the standard join-subquery SQL the pushdown
  * generates.
  *
  * Lives in the spark.sql.jdbc package (same bridge pattern as
  * GraftBridge) so it can extend the package-private [[DerbyDialect]]
  * and inherit its type mappings, FETCH-FIRST limit clause, and
  * supported-function list unchanged. [[register]] must REPLACE the
  * built-in instance: if both dialects stayed registered, both match
  * `jdbc:derby:` URLs and Spark folds them into an [[AggregatedDialect]]
  * whose `supportsJoin` is the AND of the members — false again.
  */
object GraftDerbyJoinDialect {
  // DerbyDialect is package-private; keep the subclass at the same
  // visibility and expose only the JdbcDialect-typed singleton
  private[jdbc] class JoinDialect extends DerbyDialect {
    override def supportsJoin: Boolean = true
  }
  private val instance: JdbcDialect = new JoinDialect

  /** Idempotently swap this dialect in for the built-in Derby one.
    * DerbyDialect is an arity-0 case class, so one unregister call
    * removes every equal instance (built-in and ours) before ours is
    * re-added. */
  def register(): Unit = synchronized {
    JdbcDialects.unregisterDialect(DerbyDialect())
    JdbcDialects.registerDialect(instance)
  }

  /** Restore the stock Derby dialect (tests call this in `finally` so
    * the global JdbcDialects registry never leaks the swapped dialect
    * into unrelated suites — plan shape must not depend on suite
    * execution order). */
  def unregister(): Unit = synchronized {
    JdbcDialects.unregisterDialect(instance)
    JdbcDialects.unregisterDialect(DerbyDialect())
    JdbcDialects.registerDialect(DerbyDialect())
  }
}
