package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Name resolution for manifest tables — the catalog face the TVFs
  * are sugar over. `register("orders", "/lake/orders")` makes
  *
  * {{{
  *   SELECT * FROM graft.orders            -- the current head
  *   SELECT * FROM orders                  -- one-part, if nothing else claims it
  *   SELECT * FROM graft.`orders@v3`       -- version time travel
  * }}}
  *
  * resolve — at QUERY time, to the same analyzed plan
  * [[ManifestTable.read]] builds, so a name always reads the head as
  * of the query (a temp view would freeze the file list of whatever
  * head existed at registration). Resolution rides the sanctioned
  * `injectResolutionRule` extension point (graft.GraftExtensions):
  * the rule only sees relations the built-in resolver left
  * UNRESOLVED, so real tables and temp views always win a name clash
  * — registering `orders` can never shadow an existing table.
  * Timestamp travel stays on `graft_table_at(path, ms)`.
  *
  * The registry is JVM-wide and name-keyed (Spark SQL identifiers are
  * case-insensitive; names are folded to lowercase) — the same scope
  * as a session-catalog temp function, intended for the
  * one-application-per-JVM deployment Spark local/driver processes
  * are. At 100 TB this is operational sugar, not a data path: the
  * cost of a named read is identical to the path read it resolves
  * to. */
object GraftCatalog {

  private val reg = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def norm(name: String): String = name.toLowerCase(java.util.Locale.ROOT)

  def register(name: String, path: String): Unit = {
    require(name.nonEmpty && !name.contains(".") && !name.contains("@"),
      s"table name '$name' must be a plain identifier (no '.' or '@' — " +
        "'@v<N>' is reserved for time travel)")
    reg.put(norm(name), path)
  }

  def unregister(name: String): Unit = reg.remove(norm(name))

  def lookup(name: String): Option[String] = Option(reg.get(norm(name)))

  def registered: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    reg.asScala.toMap
  }

  /** `name` or `name@v<N>` → (path, version); -1 = head. */
  private def resolveSpec(ident: String): Option[(String, Int)] = {
    val at = ident.lastIndexOf("@v")
    // toIntOption, not toInt: a version literal past Int.MaxValue must
    // fall through as an ordinary unresolved name (the standard
    // table-not-found error), never throw NumberFormatException out of
    // an analyzer rule and abort the whole statement
    val parsed =
      if (at > 0 && ident.length > at + 2 &&
          ident.substring(at + 2).forall(_.isDigit))
        ident.substring(at + 2).toIntOption.map(v =>
          (ident.substring(0, at), v))
      else None
    val (name, v) = parsed.getOrElse((ident, -1))
    lookup(name).map(_ -> v)
  }

  /** The analyzer rule (injected by GraftExtensions): rewrites
    * still-unresolved `graft.<name>` (and bare `<name>`, when
    * registered) relations into the manifest read's analyzed plan. */
  final class Resolution(session: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.resolveOperatorsUp {
        case u: UnresolvedRelation if !u.isStreaming =>
          val spec = u.multipartIdentifier match {
            case Seq(ns, ident) if norm(ns) == "graft" => resolveSpec(ident)
            case Seq(ident) => resolveSpec(ident)
            case _ => None
          }
          spec match {
            case Some((path, v)) =>
              ManifestTable.read(session, path, v).queryExecution.analyzed
            case None => u
          }
      }
  }
}
