package graft.tables

import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Iceberg name mapping (`schema.name-mapping.default`): maps field ids to
  * the column NAMES files written without ids use for them. Imported
  * (`add_files`) parquet carries no Iceberg field ids, so id-based
  * resolution finds nothing; without a mapping the engine falls back to
  * resolving by the CURRENT column name — which silently nulls the column
  * after a rename. The mapping pins each field id to the name the imported
  * files actually use, so renames stay metadata-only even over imports.
  *
  * Spec shape (mirrored from the Iceberg spec's name-mapping serialization;
  * reference context: the reference parses table metadata but leaves
  * name mapping to engines — icelake/src/types/in_memory.rs keeps only the
  * properties map): `[{"field-id": 1, "names": ["a"]}, ...]`, entries may
  * nest under "fields" for struct children.
  */
object NameMapping {

  val PropertyKey = "schema.name-mapping.default"

  case class Entry(fieldId: Option[Int], names: List[String], fields: List[Entry])

  def parse(json: String): List[Entry] = {
    def entry(v: JValue): Entry = {
      val id = v \ "field-id" match {
        case JInt(i) => Some(i.toInt)
        case _ => None
      }
      val names = v \ "names" match {
        case JArray(items) => items.collect { case JString(s) => s }
        case _ => Nil
      }
      val children = v \ "fields" match {
        case JArray(items) => items.map(entry)
        case _ => Nil
      }
      Entry(id, names, children)
    }
    JsonMethods.parse(json) match {
      case JArray(items) => items.map(entry)
      case _ => Nil
    }
  }

  def serialize(entries: List[Entry]): String = {
    def toJ(e: Entry): JValue = JObject(
      List(
        e.fieldId.map(i => "field-id" -> (JInt(i): JValue)),
        Some("names" -> (JArray(e.names.map(JString)): JValue)),
        if (e.fields.nonEmpty) Some("fields" -> (JArray(e.fields.map(toJ)): JValue))
        else None).flatten)
    JsonMethods.compact(JsonMethods.render(JArray(entries.map(toJ))))
  }

  /** Default mapping for a schema: every field id maps to its name AT
    * MAPPING TIME — exactly what files imported now contain. */
  def fromSchema(schema: IceSchema): List[Entry] = {
    def ofType(t: IceType): List[Entry] = t match {
      case IceStruct(fs) => fs.map(f => Entry(Some(f.id), List(f.name), ofType(f.fieldType)))
      case IceList(eid, e, _) => List(Entry(Some(eid), List("element"), ofType(e)))
      case IceMap(kid, k, vid, v, _) =>
        List(Entry(Some(kid), List("key"), ofType(k)),
          Entry(Some(vid), List("value"), ofType(v)))
      case _ => Nil
    }
    schema.fields.map(f => Entry(Some(f.id), List(f.name), ofType(f.fieldType)))
  }

  /** Rewrite a field-id-carrying Spark read schema to the names the
    * mapping assigns those ids (recursing through structs), so BY-NAME
    * parquet resolution finds the imported files' columns regardless of
    * later renames. A field whose id has NO mapping entry is ABSENT from
    * the mapped files (Iceberg rule: mapping-absent ⇒ read as null), so
    * it is renamed to a sentinel the files cannot contain — keeping its
    * POSITION (row layout is positional) while by-name resolution yields
    * null. Resolving it by current name instead would break after
    * rename-a-to-b-then-add-new-a: the read schema would hold 'a' twice
    * (mapped old id → a, plus the unmapped new a) — an ambiguous
    * duplicate-column parquet read. Field-id metadata is STRIPPED (these
    * files have none — stale ids would re-trigger id resolution).
    * Readers use the rewritten schema directly and hand rows back under
    * the table's current names. */
  def toFileNames(entries: List[Entry], schema: StructType): StructType = {
    val byId: Map[Int, Entry] =
      entries.flatMap(e => e.fieldId.map(_ -> e)).toMap
    def renameField(f: StructField): StructField = {
      val id =
        if (f.metadata.contains(SchemaConvert.FieldIdKey))
          Some(f.metadata.getLong(SchemaConvert.FieldIdKey).toInt)
        else None
      val entry = id.flatMap(byId.get)
      val newName = entry.flatMap(_.names.headOption).getOrElse {
        id match {
          case Some(i) => s"_graft_absent_$i" // mapping-absent ⇒ null
          case None => f.name
        }
      }
      val newType = f.dataType match {
        case st: StructType =>
          toFileNames(entry.map(_.fields).getOrElse(Nil), st)
        case other => other
      }
      val md = new MetadataBuilder().withMetadata(f.metadata)
        .remove(SchemaConvert.FieldIdKey).build()
      // an absent column reads null even if the table column is required
      val nullable = f.nullable || newName.startsWith("_graft_absent_")
      StructField(newName, newType, nullable, md)
    }
    StructType(schema.fields.map(renameField))
  }

  /** The table's mapping, if any. */
  def of(meta: TableMetadata): Option[List[Entry]] =
    meta.properties.get(PropertyKey).map(parse).filter(_.nonEmpty)
}
