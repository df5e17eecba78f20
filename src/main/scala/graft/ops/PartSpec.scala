package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, concat, date_add, date_format,
  floor, hash, lit, lpad, pmod, substring, to_date, unix_micros}
import org.apache.spark.sql.types.{DataType, DateType, DecimalType, DoubleType,
  FloatType, IntegerType, StructType, TimestampType}

/** Partition TRANSFORMS for the versioned table — the Iceberg hidden-
  * partitioning idea (Iceberg spec §Partition Transforms): the table
  * declares `bucket(8, k)` / `days(ts)` / `trunc(4, c)` instead of a raw
  * column, every write derives the partition value from the source
  * column automatically, and every read predicate ON THE SOURCE COLUMN
  * is rewritten into a predicate on the derived value at planning time —
  * the user never sees, writes, or filters by the derived column.
  *
  * Why this matters at 100 TB: identity partitioning only prunes when
  * the query filters on the partition column itself, and min/max file
  * stats are useless for point lookups on hash-distributed keys (every
  * file's [min,max] spans the domain). `bucket(n, key)` makes a point
  * lookup or a MERGE touch 1/n of the files REGARDLESS of key
  * distribution, and `days(ts)` gives a raw-timestamp range query
  * partition-level pruning without anyone materializing a date column.
  *
  * Serialization: a transform is ONE `partcols=` entry, encoded
  * colon-separated (`bucket:8:k`, `days::ts`, `trunc:4:c` — comma-free,
  * so the manifest line format is unchanged) and carried forward by
  * every append exactly like identity partition columns. Plain column
  * names parse as [[PartSpec.Identity]], so pre-transform tables read
  * back byte-identically.
  *
  * Soundness notes, pinned by `PartTransformSpec`:
  *  - `bucket` derives `pmod(hash(src), n)` (Murmur3, seed 42 — Spark's
  *    own `hash`). Only EQUALITY/IN predicates derive (hash destroys
  *    order); the literal is cast to the source column's exact type
  *    before hashing, because Murmur3 of the same value at a different
  *    width is a different hash.
  *  - `days`/`trunc` are MONOTONE: `a <= x <= b` implies
  *    `t(a) <= t(x) <= t(b)`, so range bounds map side-by-side.
  *  - `days`/`trunc` preserve NULL (null source → null derived →
  *    `__HIVE_DEFAULT_PARTITION__` dir, recorded all-null in the stats
  *    manifest); `bucket` does NOT (Murmur3 of an all-null input row is
  *    the seed — null keys land in a real bucket), so null-checks never
  *    derive through a bucket.
  *
  * Ref: reference partitions nothing (SURVEY.md §2 Tier C — files are
  * its only layout unit); this is the scale path its folder-per-day blob
  * layout (`adffunction/__init__.py:82` folder prefixes) gestures at.
  */
sealed trait PartSpec {
  /** Source (real, user-visible) column the transform reads. */
  def srcCol: String

  /** Derived partition column name — the hive path key is `__p_<name>`
    * and synthesized stats rows record it under `<name>`.
    */
  def name: String

  /** Serialized manifest form (one comma-free `partcols=` entry). */
  def spec: String

  def isIdentity: Boolean = false

  /** Derivation expression over the source column. Temporal transforms
    * need the source TYPE: a TimestampType (instant) derives over UTC
    * with exact integer math — never the session zone (ADVICE r14: a
    * session-zoned `to_date` made the derived value depend on the
    * WRITER's zone while the reader mapped literals in ITS zone, so a
    * zone mismatch pruned files containing matching rows; Iceberg pins
    * transform evaluation to UTC for exactly this reason). Date /
    * timestamp_ntz sources are zone-free wall clocks already.
    */
  def derive(src: Column, srcType: DataType): Column

  /** Stats-manifest `typ` for synthesized rows ("" = none synthesized). */
  def statTyp: String

  /** Monotone transforms map range bounds; bucket maps only points. */
  def monotone: Boolean

  /** Derived value is null iff the source is null. */
  def preservesNull: Boolean

  /** Map one source-domain literal (stats string encoding) into the
    * derived domain; None = underivable (planning stays conservative).
    */
  def mapPoint(v: String, srcType: DataType, zoneId: String): Option[String]

  /** UPPER-bound companion of [[mapPoint]] for monotone range mapping —
    * defaults to the point value. [[Hours]] overrides to cover BOTH its
    * derived-value vintages (see the format note there).
    */
  def mapPointHi(v: String, srcType: DataType, zoneId: String): Option[String] =
    mapPoint(v, srcType, zoneId)

  /** Whether point-EQUALITY semantics on the derived values are exact
    * across every vintage of this transform's recorded values (IN-set
    * derivation and bucket equality need it). [[Hours]] answers false —
    * its pre-r15 recorded form differs — so IN-set predicates skip
    * derivation there (conservative, never mispruning).
    */
  def pointExact: Boolean = true

  /** User-facing SQL call form (`bucket(8, k)`; the plain column name
    * for identity) — what SHOW CREATE TABLE / DESCRIBE DETAIL print.
    */
  def display: String = this match {
    case PartSpec.Identity(c) => c
    case PartSpec.Bucket(n, c) => s"bucket($n, $c)"
    case PartSpec.Days(c) => s"days($c)"
    case PartSpec.Years(c) => s"years($c)"
    case PartSpec.Months(c) => s"months($c)"
    case PartSpec.Hours(c) => s"hours($c)"
    case PartSpec.Trunc(n, c) => s"trunc($n, $c)"
  }
}

object PartSpec {
  /** A plain partition column — today's behavior, unchanged. */
  final case class Identity(srcCol: String) extends PartSpec {
    override def isIdentity: Boolean = true
    val name: String = srcCol
    val spec: String = srcCol
    def derive(src: Column, srcType: DataType): Column = src
    val statTyp: String = ""
    val monotone: Boolean = true
    val preservesNull: Boolean = true
    def mapPoint(v: String, srcType: DataType, zoneId: String): Option[String] =
      Some(v)
  }

  /** `bucket(n, c)` — `pmod(hash(c), n)`, Spark's Murmur3 with seed 42. */
  final case class Bucket(n: Int, srcCol: String) extends PartSpec {
    require(n > 0, s"bucket($n, $srcCol): bucket count must be positive")
    val name: String = s"${srcCol}_bucket"
    val spec: String = s"bucket:$n:$srcCol"
    def derive(src: Column, srcType: DataType): Column =
      pmod(hash(src), lit(n))
    val statTyp: String = "long"
    val monotone: Boolean = false
    val preservesNull: Boolean = false
    def mapPoint(v: String, srcType: DataType, zoneId: String): Option[String] = {
      // float/double keys refuse at declaration; a string literal's cast
      // to the source type must round-trip EXACTLY or the driver-side
      // hash would disagree with the staged one
      import org.apache.spark.sql.catalyst.expressions.{Cast, Literal,
        Murmur3Hash}
      val castExpr = Cast(Literal.create(v,
        org.apache.spark.sql.types.StringType), srcType, Option(zoneId))
      if (castExpr.eval(null) == null) None
      else {
        val h = Murmur3Hash(Seq(castExpr), 42).eval(null).asInstanceOf[Int]
        Some((((h % n) + n) % n).toString)
      }
    }
  }

  private val DayMicros = 86400000000L
  private val HourMicros = 3600000000L
  private val EpochDate = java.sql.Date.valueOf("1970-01-01")

  /** Zone-free calendar day of the source: a TimestampType instant
    * floors its unix micros to a UTC day with EXACT arithmetic (decimal
    * floor-division — double division would round at the 2^53 boundary,
    * and `div` truncates toward zero for pre-1970 instants); date /
    * timestamp_ntz sources are wall clocks, where `to_date` never
    * consults the zone.
    */
  private def utcDay(src: Column, srcType: DataType): Column =
    srcType match {
      case TimestampType =>
        date_add(lit(EpochDate),
          floor(unix_micros(src).cast(DecimalType(28, 0)) / lit(DayMicros))
            .cast(IntegerType))
      case _ => to_date(src)
    }

  /** `days(c)` — calendar-day truncation, monotone, pinned to UTC for
    * instant sources (ADVICE r14 / Iceberg spec).
    */
  final case class Days(srcCol: String) extends PartSpec {
    val name: String = s"${srcCol}_day"
    val spec: String = s"days::$srcCol"
    def derive(src: Column, srcType: DataType): Column = utcDay(src, srcType)
    val statTyp: String = "date"
    val monotone: Boolean = true
    val preservesNull: Boolean = true
    private val DayPrefix = """^(\d{4}-\d{2}-\d{2})""".r
    def mapPoint(v: String, srcType: DataType, zoneId: String): Option[String] =
      srcType match {
        case TimestampType => utcLiteral(v, zoneId).map(_.toLocalDate.toString)
        case _ => DayPrefix.findFirstMatchIn(v).map(_.group(1))
      }
  }

  /** `years(c)` / `months(c)` — calendar truncation to the period's
    * first day, monotone, date-typed stats, UTC-pinned for instants
    * (`functions.trunc` over the zone-free day is itself zone-free).
    */
  final case class Years(srcCol: String) extends PartSpec {
    val name: String = s"${srcCol}_year"
    val spec: String = s"years::$srcCol"
    def derive(src: Column, srcType: DataType): Column =
      org.apache.spark.sql.functions.trunc(utcDay(src, srcType), "year")
    val statTyp: String = "date"
    val monotone: Boolean = true
    val preservesNull: Boolean = true
    private val YearPrefix = """^(\d{4})-\d{2}-\d{2}""".r
    def mapPoint(v: String, srcType: DataType, zoneId: String): Option[String] =
      srcType match {
        case TimestampType =>
          utcLiteral(v, zoneId).map(_.toLocalDate.getYear)
            .map(y => f"$y%04d-01-01")
        case _ => YearPrefix.findFirstMatchIn(v).map(_.group(1) + "-01-01")
      }
  }

  final case class Months(srcCol: String) extends PartSpec {
    val name: String = s"${srcCol}_month"
    val spec: String = s"months::$srcCol"
    def derive(src: Column, srcType: DataType): Column =
      org.apache.spark.sql.functions.trunc(utcDay(src, srcType), "month")
    val statTyp: String = "date"
    val monotone: Boolean = true
    val preservesNull: Boolean = true
    private val MonthPrefix = """^(\d{4}-\d{2})-\d{2}""".r
    def mapPoint(v: String, srcType: DataType, zoneId: String): Option[String] =
      srcType match {
        case TimestampType =>
          utcLiteral(v, zoneId).map(d =>
            f"${d.toLocalDate.getYear}%04d-${d.toLocalDate.getMonthValue}%02d-01")
        case _ => MonthPrefix.findFirstMatchIn(v).map(_.group(1) + "-01")
      }
  }

  /** `hours(c)` — hour truncation as a ZONE-FREE STRING `yyyy-MM-dd HH`
    * (UTC for instant sources): lexicographic order on the string equals
    * instant order, so string-typed stats compare monotonically in any
    * session zone — a timestamp-typed derived value would re-enter the
    * zone at every path-string render and literal cast.
    *
    * FORMAT NOTE (ADVICE r15 low — the v2 break, stated explicitly):
    * pre-r15 builds derived hour values as timestamp-typed
    * `yyyy-MM-dd HH:00:00`; hours() tables written by those builds carry
    * that form in hive paths and harvested stats rows. The two forms
    * differ as strings, so this vintage handles them WITHOUT mispruning:
    *
    *  - RANGE/point bounds: [[mapPointHi]] caps the upper bound at
    *    `v + ";"` — `;` is `:` + 1 in ASCII, so the cap sits strictly
    *    above both `yyyy-MM-dd HH` (v2) and any legacy
    *    `yyyy-MM-dd HH:mm:ss` of the SAME hour, and strictly below the
    *    next hour's values in either form. Both vintages prune exactly.
    *  - IN-set / point-equality derivation: [[pointExact]] = false —
    *    equality against a legacy recorded value would miss, so the
    *    derivation is skipped (conservative; the RAW column's own stats
    *    still prune).
    *  - SHOW PARTITIONS prints each dir's recorded form verbatim — a
    *    mixed-vintage table shows both shapes until an OPTIMIZE rewrite.
    */
  final case class Hours(srcCol: String) extends PartSpec {
    val name: String = s"${srcCol}_hour"
    val spec: String = s"hours::$srcCol"
    def derive(src: Column, srcType: DataType): Column = srcType match {
      case TimestampType =>
        val hourIdx = floor(
          unix_micros(src).cast(DecimalType(28, 0)) / lit(HourMicros))
          .cast("long")
        val dayIdx = floor(hourIdx.cast(DecimalType(28, 0)) / lit(24L))
          .cast(IntegerType)
        val hod = hourIdx - dayIdx.cast("long") * lit(24L)
        concat(
          date_format(date_add(lit(EpochDate), dayIdx), "yyyy-MM-dd"),
          lit(" "), lpad(hod.cast("string"), 2, "0"))
      case _ => date_format(src, "yyyy-MM-dd HH")
    }
    val statTyp: String = "string"
    val monotone: Boolean = true
    val preservesNull: Boolean = true
    private val HourPrefix = """^(\d{4}-\d{2}-\d{2})[ T](\d{2})""".r
    def mapPoint(v: String, srcType: DataType, zoneId: String): Option[String] =
      srcType match {
        case TimestampType => utcLiteral(v, zoneId).map(d =>
          d.toLocalDate.toString + " " + f"${d.getHour}%02d")
        case _ => HourPrefix.findFirstMatchIn(v).map(m =>
          s"${m.group(1)} ${m.group(2)}")
      }
    // ';' = ':'+1: caps above this hour's values in BOTH vintages
    // ("2024-01-01 05" and "2024-01-01 05:00:00" are both <= "…05;"),
    // below the next hour's in either — see the class format note
    override def mapPointHi(v: String, srcType: DataType,
        zoneId: String): Option[String] =
      mapPoint(v, srcType, zoneId).map(_ + ";")
    override def pointExact: Boolean = false
  }

  /** Parse a reader-side literal EXACTLY as the row-filter cast will
    * (Spark's own string→timestamp parser, bound to the reader's session
    * zone — honoring any explicit zone suffix in the literal), then
    * present the instant as a UTC wall clock for the derived-domain
    * comparison. None = unparseable literal → derivation stays
    * conservative.
    */
  private def utcLiteral(v: String,
      zoneId: String): Option[java.time.LocalDateTime] =
    org.apache.spark.sql.catalyst.util.DateTimeUtils
      .stringToTimestamp(
        org.apache.spark.unsafe.types.UTF8String.fromString(v),
        java.time.ZoneId.of(zoneId))
      .map(micros => java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros, 1000000L),
        (Math.floorMod(micros, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC))

  /** `trunc(len, c)` — string prefix, monotone under lexicographic order
    * (if s <= t then s.take(L) <= t.take(L): either s is a prefix of t,
    * or they first differ at i — takes differ the same way when i < L
    * and are equal when i >= L).
    */
  final case class Trunc(len: Int, srcCol: String) extends PartSpec {
    require(len > 0, s"trunc($len, $srcCol): length must be positive")
    val name: String = s"${srcCol}_trunc"
    val spec: String = s"trunc:$len:$srcCol"
    def derive(src: Column, srcType: DataType): Column = substring(src, 1, len)
    val statTyp: String = "string"
    val monotone: Boolean = true
    val preservesNull: Boolean = true
    // CODE POINTS, not UTF-16 units: Spark's substring counts code
    // points, and a String.take through an astral pair would leave a
    // lone surrogate whose UTF-8 encoding ('?') sorts BELOW the real
    // prefix — an upper bound mapped that way prunes matching files
    def mapPoint(v: String, srcType: DataType, zoneId: String): Option[String] =
      Some {
        val cps = v.codePointCount(0, v.length)
        v.substring(0, v.offsetByCodePoints(0, math.min(len, cps)))
      }
  }

  private val BucketSpecRe = """^bucket:(\d+):(.+)$""".r
  private val DaysSpecRe = """^days::(.+)$""".r
  private val YearsSpecRe = """^years::(.+)$""".r
  private val MonthsSpecRe = """^months::(.+)$""".r
  private val HoursSpecRe = """^hours::(.+)$""".r
  private val TruncSpecRe = """^trunc:(\d+):(.+)$""".r
  private val BucketSqlRe = """(?i)^bucket\s*\(\s*(\d+)\s*,\s*`?([\w]+)`?\s*\)$""".r
  private val DaysSqlRe = """(?i)^days\s*\(\s*`?([\w]+)`?\s*\)$""".r
  private val YearsSqlRe = """(?i)^years\s*\(\s*`?([\w]+)`?\s*\)$""".r
  private val MonthsSqlRe = """(?i)^months\s*\(\s*`?([\w]+)`?\s*\)$""".r
  private val HoursSqlRe = """(?i)^hours\s*\(\s*`?([\w]+)`?\s*\)$""".r
  private val TruncSqlRe = """(?i)^trunc\s*\(\s*(\d+)\s*,\s*`?([\w]+)`?\s*\)$""".r

  /** Parse a manifest `partcols=` entry (colon spec or plain name). */
  def parse(s: String): PartSpec = s match {
    case BucketSpecRe(n, c) => Bucket(n.toInt, c)
    case DaysSpecRe(c) => Days(c)
    case YearsSpecRe(c) => Years(c)
    case MonthsSpecRe(c) => Months(c)
    case HoursSpecRe(c) => Hours(c)
    case TruncSpecRe(n, c) => Trunc(n.toInt, c)
    case c => Identity(c)
  }

  /** Normalize a user-facing declaration — SQL call syntax
    * (`bucket(8, k)`), colon spec, or a plain column name — to the
    * serialized spec string the manifest records.
    */
  def normalize(s: String): String = s.trim match {
    case BucketSqlRe(n, c) => Bucket(n.toInt, c).spec
    case DaysSqlRe(c) => Days(c).spec
    case YearsSqlRe(c) => Years(c).spec
    case MonthsSqlRe(c) => Months(c).spec
    case HoursSqlRe(c) => Hours(c).spec
    case TruncSqlRe(n, c) => Trunc(n.toInt, c).spec
    case other => parse(other).spec
  }

  /** Validate a transform set against the frame's schema: source columns
    * exist, bucket keys are not floating-point (NaN/-0.0 hash equality
    * is not a promise worth making), derived names collide with nothing.
    */
  def validate(specs: Seq[PartSpec], schema: StructType): Unit = {
    specs.foreach { t =>
      require(schema.fieldNames.contains(t.srcCol),
        s"partition transform ${t.spec}: source column ${t.srcCol} is not " +
          s"in the frame: ${schema.fieldNames.mkString(",")}")
      t match {
        case Bucket(_, c) => schema(c).dataType match {
          case FloatType | DoubleType => throw new IllegalArgumentException(
            s"bucket transform on floating-point column $c is not supported")
          case _ => ()
        }
        // days on a STRING source is unsound: to_date('garbage') is null
        // while the source is not, so a derived NOT-NULL cut would prune
        // live rows; and trunc on a NUMERIC source is unsound: string
        // prefixes are not monotone in numeric order ('9' > '10'), so
        // mapped range bounds could invert and prune matching files
        case Days(c) => requireTemporal(schema, c, "days")
        case Years(c) => requireTemporal(schema, c, "years")
        case Months(c) => requireTemporal(schema, c, "months")
        case Hours(c) => requireTemporal(schema, c, "hours")
        case Trunc(_, c) => schema(c).dataType match {
          case org.apache.spark.sql.types.StringType => ()
          case dt => throw new IllegalArgumentException(
            s"trunc transform needs a string column; $c is $dt")
        }
        case _ => ()
      }
      if (!t.isIdentity)
        require(!schema.fieldNames.contains(t.name),
          s"partition transform ${t.spec}: derived name ${t.name} collides " +
            "with a real column")
    }
    val names = specs.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate partition column names: ${names.mkString(",")}")
  }

  private def requireTemporal(schema: StructType, c: String,
      verb: String): Unit = schema(c).dataType match {
    case DateType | org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType => ()
    case dt => throw new IllegalArgumentException(
      s"$verb transform needs a date/timestamp column; $c is $dt")
  }

  /** Derived-column expressions for staging: `__p_<name>` per spec. */
  def pathCol(t: PartSpec): String = s"__p_${t.name}"

  /** Derivation bound to a frame's schema (resolves the source type so
    * temporal transforms know instant vs wall-clock — see [[PartSpec
    * .derive]]).
    */
  def deriveCol(df: org.apache.spark.sql.Dataset[_], t: PartSpec): Column =
    t.derive(col(t.srcCol), df.schema(t.srcCol).dataType)

  /** Stats-manifest synthesis descriptors for the NON-identity specs:
    * (parts key, stats column name, typ) triples [[graft.ops.Layout
    * .writeStatsManifest]] turns into typed min==max rows per file.
    */
  def synthesized(specs: Seq[PartSpec]): Seq[(String, String, String)] =
    specs.filterNot(_.isIdentity).map(t => (pathCol(t), t.name, t.statTyp))
}
