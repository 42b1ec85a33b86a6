package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, ShowViews, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

import graft.spark.GraftCatalog

/** V2 view DDL for graft catalogs.
  *
  * OSS Spark's `ResolveSessionCatalog` rejects CREATE/DROP/SHOW VIEWS on
  * any non-session catalog before `ViewCatalog` is even consulted, so —
  * like Iceberg's Spark extensions — the engine rewrites those statements
  * itself. The rewrite rule runs in the HINT-resolution batch, which the
  * analyzer executes before the resolution batch that throws; at that
  * point identifiers are still `UnresolvedIdentifier`, so the rule does
  * its own catalog lookup and substitutes command nodes that talk to
  * [[GraftCatalog]]'s `ViewCatalog` surface directly. Reads substitute
  * the stored SQL text inline (`SELECT * FROM graft.db.v` behaves as a
  * parenthesized subquery), so nested views resolve through the same
  * fixed point. */
class ResolveGraftViews(session: SparkSession) extends Rule[LogicalPlan] {

  private def catalogManager = session.sessionState.catalogManager

  /** (catalog, catalogName, ident) when nameParts addresses a graft
    * catalog — explicitly (`graft.db.v`) or through the session's current
    * catalog (`db.v` after `USE graft`) */
  private def graftCatalogOf(nameParts: Seq[String]): Option[(GraftCatalog, String, Identifier)] = {
    if (nameParts.length >= 2 && catalogManager.isCatalogRegistered(nameParts.head)) {
      catalogManager.catalog(nameParts.head) match {
        case g: GraftCatalog =>
          val rest = nameParts.tail
          return Some((g, nameParts.head, Identifier.of(rest.init.toArray, rest.last)))
        case _ => return None
      }
    }
    catalogManager.currentCatalog match {
      case g: GraftCatalog if nameParts.length >= 2 =>
        Some((g, g.name(), Identifier.of(nameParts.init.toArray, nameParts.last)))
      case _ => None
    }
  }

  /** Substitute graft views with their parsed SQL, expanding NESTED view
    * references eagerly with an explicit ancestor chain: one pass fully
    * resolves any view depth (the analyzer's fixed point never re-expands,
    * so no per-iteration filesystem probes), and a cycle surfaces as a
    * clear error instead of "max iterations reached". `memo` bounds
    * view-existence filesystem checks to one per distinct name per apply. */
  private def expand(
      plan: LogicalPlan,
      chain: Set[String],
      memo: scala.collection.mutable.Map[String, Boolean]): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if graftCatalogOf(u.multipartIdentifier).exists {
          case (cat, catName, ident) =>
            memo.getOrElseUpdate(s"$catName.$ident", cat.viewExists(ident)) } =>
        val (cat, catName, ident) = graftCatalogOf(u.multipartIdentifier).get
        val key = s"$catName.$ident"
        if (chain.contains(key))
          sys.error(s"recursive view reference: ${(chain + key).mkString(" -> ")}")
        val view = cat.loadView(ident)
        val parsed = session.sessionState.sqlParser.parsePlan(view.query)
        val aliased =
          if (view.columnAliases() != null && view.columnAliases().nonEmpty)
            UnresolvedSubqueryColumnAliases(view.columnAliases().toIndexedSeq, parsed)
          else parsed
        SubqueryAlias(u.multipartIdentifier.last, expand(aliased, chain + key, memo))
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val ddlRewritten = plan.resolveOperatorsUp {
      case CreateView(UnresolvedIdentifier(parts, _), userCols, comment, _, props,
          originalText, query, allowExisting, replace, _)
          if graftCatalogOf(parts).isDefined =>
        val (cat, catName, ident) = graftCatalogOf(parts).get
        GraftCreateViewCommand(cat, catName, ident, userCols, comment,
          props, originalText.getOrElse(
            sys.error("CREATE VIEW without SQL text is not supported")),
          query, allowExisting, replace)

      case DropView(UnresolvedIdentifier(parts, _), ifExists)
          if graftCatalogOf(parts).isDefined =>
        val (cat, _, ident) = graftCatalogOf(parts).get
        GraftDropViewCommand(cat, ident, ifExists)

      case org.apache.spark.sql.catalyst.plans.logical.SetViewProperties(
          org.apache.spark.sql.catalyst.analysis.UnresolvedView(parts, _, _, _), props)
          if graftCatalogOf(parts).isDefined =>
        val (cat, _, ident) = graftCatalogOf(parts).get
        GraftAlterViewCommand(cat, ident,
          props.map { case (k, v) =>
            org.apache.spark.sql.connector.catalog.ViewChange.setProperty(k, v) }.toSeq)

      case org.apache.spark.sql.catalyst.plans.logical.UnsetViewProperties(
          org.apache.spark.sql.catalyst.analysis.UnresolvedView(parts, _, _, _),
          keys, ifExists)
          if graftCatalogOf(parts).isDefined =>
        val (cat, _, ident) = graftCatalogOf(parts).get
        GraftAlterViewCommand(cat, ident,
          keys.map(org.apache.spark.sql.connector.catalog.ViewChange.removeProperty),
          requireKeys = if (ifExists) Nil else keys)

      case org.apache.spark.sql.catalyst.plans.logical.RenameTable(
          u: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView, newName, true)
          if graftCatalogOf(u.multipartIdentifier)
            .exists { case (cat, _, ident) => cat.viewExists(ident) } =>
        val (cat, catName, from) = graftCatalogOf(u.multipartIdentifier).get
        val to = graftCatalogOf(newName) match {
          case Some((_, catName2, toIdent)) if catName2 == catName => toIdent
          case None if newName.length == 1 => Identifier.of(from.namespace, newName.head)
          case _ => sys.error(
            s"cannot rename view across catalogs: ${newName.mkString(".")}")
        }
        GraftRenameViewCommand(cat, from, to)

      case ShowViews(UnresolvedNamespace(parts, _), pattern, output)
          if parts.nonEmpty && catalogManager.isCatalogRegistered(parts.head) &&
            catalogManager.catalog(parts.head).isInstanceOf[GraftCatalog] =>
        GraftShowViewsCommand(
          catalogManager.catalog(parts.head).asInstanceOf[GraftCatalog],
          parts.tail, pattern, output)
    }
    expand(ddlRewritten, Set.empty,
      scala.collection.mutable.Map.empty[String, Boolean])
  }
}

/** CREATE [OR REPLACE] VIEW for a graft catalog; the query stays
  * unanalyzed until run time (mirrors Spark's own CreateViewCommand). */
case class GraftCreateViewCommand(
    catalog: GraftCatalog,
    catalogName: String,
    ident: Identifier,
    userCols: Seq[(String, Option[String])],
    comment: Option[String],
    props: Map[String, String],
    originalText: String,
    query: LogicalPlan,
    allowExisting: Boolean,
    replace: Boolean) extends LeafRunnableCommand {

  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] = Seq(query)

  override def run(session: SparkSession): Seq[Row] = {
    if (allowExisting && !replace && catalog.viewExists(ident)) return Nil
    // a PERSISTED view must not capture session-local state: its SQL text
    // re-parses in other sessions where the temp view doesn't exist
    // walk subquery-expression plans too (EXISTS/IN/scalar subqueries) —
    // a temp view hidden inside one breaks the stored SQL on re-parse
    (query +: query.subqueriesAll).foreach(_.foreach {
      case u: UnresolvedRelation
          if session.sessionState.catalog.isTempView(u.multipartIdentifier) =>
        sys.error(s"cannot create persistent view $ident: it references " +
          s"temporary view ${u.multipartIdentifier.mkString(".")}")
      case _ => ()
    })
    val analyzed = session.sessionState.executePlan(query).analyzed
    val aliases = userCols.map(_._1)
    require(aliases.isEmpty || aliases.length == analyzed.schema.length,
      s"view column list has ${aliases.length} names, query produces ${analyzed.schema.length}")
    val schema =
      if (aliases.isEmpty) analyzed.schema
      else StructType(analyzed.schema.fields.zip(aliases).map { case (f, a) => f.copy(name = a) })
    val allProps = new java.util.LinkedHashMap[String, String]()
    props.foreach { case (k, v) => allProps.put(k, v) }
    comment.foreach(c => allProps.put("comment", c))
    val info = new ViewInfo(ident, originalText,
      session.sessionState.catalogManager.currentCatalog.name(),
      session.sessionState.catalogManager.currentNamespace,
      schema,
      analyzed.schema.fieldNames,
      aliases.toArray,
      userCols.map(_._2.orNull).toArray,
      allProps)
    if (replace) catalog.replaceView(info, orCreate = true)
    else catalog.createView(info)
    Nil
  }
}

case class GraftAlterViewCommand(
    catalog: GraftCatalog,
    ident: Identifier,
    changes: Seq[org.apache.spark.sql.connector.catalog.ViewChange],
    requireKeys: Seq[String] = Nil) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (requireKeys.nonEmpty) {
      // UNSET without IF EXISTS must fail on a missing key (a silent no-op
      // would mask property-name typos)
      val present = catalog.loadView(ident).properties()
      val missing = requireKeys.filterNot(present.containsKey)
      if (missing.nonEmpty)
        sys.error(s"cannot unset nonexistent propert${
          if (missing.size == 1) "y" else "ies"}: ${missing.mkString(", ")} " +
          "(use IF EXISTS to ignore)")
    }
    catalog.alterView(ident, changes: _*)
    Nil
  }
}

case class GraftDropViewCommand(
    catalog: GraftCatalog,
    ident: Identifier,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val dropped = catalog.dropView(ident)
    if (!dropped && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    Nil
  }
}

case class GraftRenameViewCommand(
    catalog: GraftCatalog,
    from: Identifier,
    to: Identifier) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    catalog.renameView(from, to)
    Nil
  }
}

case class GraftShowViewsCommand(
    catalog: GraftCatalog,
    namespace: Seq[String],
    pattern: Option[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val ns = namespace.mkString(".")
    catalog.listViews(namespace: _*)
      .filter(id => pattern.forall(p =>
        org.apache.spark.sql.catalyst.util.StringUtils.filterPattern(
          Seq(id.name()), p).nonEmpty))
      .map(id => Row(ns, id.name(), false)).toSeq
  }
}
