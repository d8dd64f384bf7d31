package graft.table

import graft.core.{Field, TableSchema}
import org.apache.spark.sql.types.DataType

/** Transactional schema evolution (reference: paimon-core
  * schema/SchemaChange.java:36-512 applied via SchemaManager.commitChanges
  * :76,179). Each change commits a new numbered schema file; data files keep
  * their original schemaId and reads remap by persistent field id
  * (see GraftTable.rawUnion / alignRaw).
  */
trait SchemaEvolution { self: GraftTable =>

  private def commitEvolved(f: TableSchema => TableSchema): TableSchema = {
    val cur = schema
    val next = f(cur).copy(id = cur.id + 1)
    store.commitSchema(next)
    next
  }

  def addColumn(name: String, dataType: DataType, nullable: Boolean = true): TableSchema =
    commitEvolved { s =>
      require(!s.fields.exists(_.name == name), s"column $name already exists")
      val fid = s.highestFieldId + 1
      s.copy(fields = s.fields :+ Field(fid, name, dataType.sql, nullable),
        highestFieldId = fid)
    }

  def renameColumn(from: String, to: String): TableSchema =
    commitEvolved { s =>
      require(s.fields.exists(_.name == from), s"no column $from")
      require(!s.fields.exists(_.name == to), s"column $to already exists")
      require(!s.partitionKeys.contains(from) && !s.primaryKeys.contains(from),
        "cannot rename partition/primary key columns")
      s.copy(fields = s.fields.map(f => if (f.name == from) f.copy(name = to) else f))
    }

  def dropColumn(name: String): TableSchema =
    commitEvolved { s =>
      require(s.fields.exists(_.name == name), s"no column $name")
      require(!s.partitionKeys.contains(name) && !s.primaryKeys.contains(name),
        "cannot drop partition/primary key columns")
      require(s.fields.size > 1, "cannot drop the last column")
      s.copy(fields = s.fields.filterNot(_.name == name))
    }

  /** Widen/retype a column; reads cast old files to the new type. */
  def updateColumnType(name: String, dataType: DataType): TableSchema =
    commitEvolved { s =>
      require(s.fields.exists(_.name == name), s"no column $name")
      require(!s.partitionKeys.contains(name) && !s.primaryKeys.contains(name),
        "cannot retype partition/primary key columns")
      s.copy(fields = s.fields.map(f =>
        if (f.name == name) f.copy(dataType = dataType.sql) else f))
    }

  def setOption(key: String, value: String): TableSchema =
    commitEvolved(s => s.copy(options = s.options + (key -> value)))

  def removeOption(key: String): TableSchema =
    commitEvolved(s => s.copy(options = s.options - key))
}
