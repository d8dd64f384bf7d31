package graft.core

/** Partitions one bucket's data files into key-disjoint SECTIONS: groups of
  * files whose primary-key ranges transitively overlap. Files in different
  * sections share no key, so each section merges independently — a hot
  * bucket with many non-overlapping sorted runs becomes several parallel
  * merge tasks instead of one straggler doing a whole-bucket k-way merge
  * (reference: paimon-core table/source/MergeTreeSplitGenerator.java:69 +
  * mergetree/compact/IntervalPartition.java:67).
  *
  * Key bounds come from per-file column stats of the pk columns. For a
  * multi-column pk the component-wise (min, max) tuples are OUTER bounds of
  * the lexicographic key range — a conservative overlap test that can only
  * merge sections, never split a real overlap. A truncated string max stat
  * (None) means unbounded-above. If any pk bound is unavailable the whole
  * bucket degrades to a single section (the pre-change behavior).
  */
object IntervalSections {

  private type MinKey = IndexedSeq[Comparable[Any]]
  private type MaxKey = IndexedSeq[Option[Comparable[Any]]] // None = +∞

  /** Lexicographic: does a (bounded) min tuple sort strictly above a max
    * tuple with unbounded (+∞) components?
    */
  private def minAboveMax(min: MinKey, max: MaxKey): Boolean = {
    var i = 0
    while (i < min.length) {
      max(i) match {
        case None => return false
        case Some(m) =>
          val c = min(i).compareTo(m)
          if (c != 0) return c > 0
      }
      i += 1
    }
    false // equal bounds touch → overlap
  }

  private def minCmp(a: MinKey, b: MinKey): Int = {
    var i = 0
    while (i < a.length) {
      val c = a(i).compareTo(b(i))
      if (c != 0) return c
      i += 1
    }
    0
  }

  private def maxCmp(a: MaxKey, b: MaxKey): Int = {
    var i = 0
    while (i < a.length) {
      (a(i), b(i)) match {
        case (None, None) => return 0
        case (None, _) => return 1
        case (_, None) => return -1
        case (Some(x), Some(y)) =>
          val c = x.compareTo(y)
          if (c != 0) return c
      }
      i += 1
    }
    0
  }

  private def boundsOf(schema: TableSchema, f: DataFileMeta)
      : Option[(MinKey, MaxKey)] = {
    // Stats are keyed by field NAME under the file's own schema; after a
    // rename that reuses another column's former name the lookup would read
    // a different field's stats. Only trust same-schema files — older files
    // degrade the bucket to a single section (conservative, never wrong).
    if (f.schemaId != schema.id) return None
    val fields = schema.primaryKeys.map(schema.fieldByName)
    val mins = fields.map(fd => f.stats.get(fd.name).flatMap(_.min)
      .flatMap(StatsCodec.toComparable(fd.sparkType, _)))
    if (mins.exists(_.isEmpty)) return None
    val maxs = fields.map { fd =>
      f.stats.get(fd.name) match {
        case None => return None // column has no stats at all → unknown
        case Some(cs) => cs.max.flatMap(StatsCodec.toComparable(fd.sparkType, _))
      }
    }
    Some((mins.map(_.get).toIndexedSeq, maxs.toIndexedSeq))
  }

  /** Group the files of ONE (partition, bucket) into key-disjoint sections,
    * sweep-line over files sorted by lower bound (reference:
    * IntervalPartition.partition():67).
    */
  def of(schema: TableSchema, files: Seq[DataFileMeta]): Seq[Seq[DataFileMeta]] = {
    if (files.size <= 1) return if (files.isEmpty) Nil else Seq(files)
    val bounds = files.map(f => boundsOf(schema, f))
    if (bounds.exists(_.isEmpty)) return Seq(files)
    val sorted = files.zip(bounds.map(_.get)).sortWith {
      case ((_, (m1, x1)), (_, (m2, x2))) =>
        val c = minCmp(m1, m2)
        if (c != 0) c < 0 else maxCmp(x1, x2) < 0
    }
    val sections = scala.collection.mutable.ArrayBuffer.empty[Seq[DataFileMeta]]
    var cur = scala.collection.mutable.ArrayBuffer.empty[DataFileMeta]
    var curMax: MaxKey = null
    sorted.foreach { case (f, (mn, mx)) =>
      if (cur.nonEmpty && minAboveMax(mn, curMax)) {
        sections += cur.toSeq
        cur = scala.collection.mutable.ArrayBuffer.empty[DataFileMeta]
        curMax = null
      }
      cur += f
      curMax = if (curMax == null || maxCmp(mx, curMax) > 0) mx else curMax
    }
    if (cur.nonEmpty) sections += cur.toSeq
    sections.toSeq
  }
}
