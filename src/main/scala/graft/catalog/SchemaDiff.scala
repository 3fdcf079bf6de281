package graft.catalog

import org.apache.spark.sql.types._

/** Run-over-run schema evolution logic.
  *
  * Reproduces the reference's merge/diff semantics
  * (pipelinewise/cli/pipelinewise.py:493-692 `merge_schemas`;
  * target_snowflake/db_sync.py:767-860 `update_columns`/`version_column`;
  * docs/user_guide/schema_changes.rst):
  *  - new source column        -> added to target
  *  - dropped source column    -> KEPT in target (never dropped)
  *  - type-changed column      -> old column renamed `col_<yyyyMMdd_HHmm>`,
  *                                new column added with the new type
  */
final case class SchemaDelta(
    added: Seq[StructField],
    removed: Seq[StructField],   // informational only; engine keeps them
    typeChanged: Seq[(StructField, StructField)]) {
  def isNoop: Boolean = added.isEmpty && typeChanged.isEmpty
}

object SchemaDiff {

  def diff(target: StructType, incoming: StructType): SchemaDelta = {
    val t = target.fields.map(f => f.name.toLowerCase -> f).toMap
    val i = incoming.fields.map(f => f.name.toLowerCase -> f).toMap
    val added = incoming.fields.filterNot(f => t.contains(f.name.toLowerCase))
    val removed = target.fields.filterNot(f => i.contains(f.name.toLowerCase))
    val changed = incoming.fields.flatMap { f =>
      t.get(f.name.toLowerCase) match {
        case Some(old) if old.dataType != f.dataType => Some((old, f))
        case _ => None
      }
    }
    SchemaDelta(added.toSeq, removed.toSeq, changed.toSeq)
  }

  /** Evolved target schema: keep everything, version type-changes, append
    * new columns. `versionSuffix` is injected (not wall-clock) so tests are
    * deterministic; production passes `yyyyMMdd_HHmm`.
    */
  def evolve(target: StructType, incoming: StructType,
             versionSuffix: String): StructType = {
    val delta = diff(target, incoming)
    val changedNames = delta.typeChanged.map(_._1.name.toLowerCase).toSet
    val versioned = target.fields.flatMap { f =>
      if (changedNames(f.name.toLowerCase)) {
        val renamed = f.copy(name = s"${f.name}_$versionSuffix")
        val newType = delta.typeChanged
          .find(_._1.name.toLowerCase == f.name.toLowerCase).get._2
        Seq(renamed, f.copy(dataType = newType.dataType, nullable = true))
      } else Seq(f)
    }
    StructType(versioned ++ delta.added.map(_.copy(nullable = true)))
  }
}
