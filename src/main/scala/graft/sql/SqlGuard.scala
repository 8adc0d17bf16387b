package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Command, LogicalPlan}

/** Read-only SQL surface: plan-walk guard + LIMIT injection.
  *
  * Reference behavior being reproduced
  * (mofdbsql_database/Mofdb_Server/server.py:103-129, utils.py:23-50):
  * only SELECT/WITH may run; INSERT/UPDATE/DELETE/DDL/transaction control
  * are rejected; a trailing ';' is stripped; `LIMIT n_results` is appended
  * when absent and an existing `LIMIT k` is rewritten to n_results.
  *
  * The reference enforces read-only with a substring blocklist, which also
  * rejects legitimate queries (a column literally named "created" trips the
  * CREATE check). Here the parsed LogicalPlan is walked instead: any
  * Command/statement node (DML, DDL, SET, EXPLAIN-as-command, scripting)
  * is rejected, while pure relational plans pass — strictly better than
  * keyword grep (SURVEY §3.1) and it composes with Spark's own parser, so
  * multi-statement strings fail to parse and are rejected for free.
  */
object SqlGuard {

  final case class GuardError(message: String) extends RuntimeException(message)

  /** Validate that `sql` parses to a pure read-only relational plan. */
  def validate(spark: SparkSession, sql: String): Either[String, LogicalPlan] = {
    val trimmed = stripTrailingSemicolon(sql)
    if (trimmed.isEmpty) return Left("empty SQL")
    val parsed =
      try Right(spark.sessionState.sqlParser.parsePlan(trimmed))
      catch { case e: Exception => Left(s"SQL parse error: ${e.getMessage}") }
    parsed.flatMap { plan =>
      val offending = plan.collectFirst {
        case c: Command => c.nodeName
        case p if isStatementNode(p) => p.nodeName
      }
      offending match {
        case Some(node) => Left(s"read-only violation: statement node $node not allowed")
        case None       => Right(plan)
      }
    }
  }

  // DML parse nodes (InsertIntoStatement & friends) live outside the
  // Command hierarchy pre-analysis; they all sit in the ParsedStatement /
  // *Statement family.
  private def isStatementNode(p: LogicalPlan): Boolean =
    p.getClass.getSimpleName.endsWith("Statement")

  private def stripTrailingSemicolon(sql: String): String = {
    var s = sql.trim
    while (s.endsWith(";")) s = s.dropRight(1).trim
    s
  }

  private val TrailingLimitRe =
    "(?i)\\s+LIMIT\\s+\\d+(\\s+OFFSET\\s+\\d+)?\\s*$".r

  /** Reference LIMIT policy: append `LIMIT n` when absent, rewrite an
    * existing numeric LIMIT to n (server.py:110-117). Only the OUTERMOST
    * (trailing) LIMIT is rewritten — an earlier blanket regex also
    * rewrote LIMITs inside subqueries/CTEs, silently changing query
    * semantics. A LIMIT that only occurs in a subquery is not the
    * statement's result cap, so the policy appends a fresh outer one.
    * A trailing OFFSET rides along unchanged (appending after it would
    * produce invalid SQL). */
  def applyLimit(sql: String, nResults: Int): String = {
    val s = stripTrailingSemicolon(sql)
    if (TrailingLimitRe.findFirstIn(s).isDefined)
      TrailingLimitRe.replaceAllIn(s,
        m => s" LIMIT $nResults${Option(m.group(1)).getOrElse("")}")
    else s"$s LIMIT $nResults"
  }

  /** Full §3.1 entry point: guard → limit injection → spark.sql. */
  def fetchSql(spark: SparkSession, sql: String, nResults: Int = 10): DataFrame =
    validate(spark, sql) match {
      case Left(err) => throw GuardError(err)
      case Right(_)  => spark.sql(applyLimit(sql, nResults))
    }
}
