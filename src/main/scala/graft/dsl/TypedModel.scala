package graft.dsl

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Compile-time-typed column properties — parity with the reference ORM's
  * generated models (lealone-test generated/model/Customer.java:28-47:
  * `public final PLong<Customer> id; …` driving chains like
  * `dao.where().id.eq(1000L).findOne()` and
  * `u.id.set(1000).name.set("Rob1").insert()`, orm/DaoTest.java:45-117,
  * OrmCrudTest.java:83-95) and the property hierarchy
  * (lealone-orm property/PBaseValueEqual → PBaseComparable →
  * PBaseNumber/PString/PBoolean, PString.java:59-211).
  *
  * The reference mutates a shared root model; here every predicate returns
  * the NEXT immutable model state (the untyped [[Model]] is already an
  * immutable builder), so the same chain shapes compile while staying
  * referentially transparent. Properties emit Catalyst predicates through
  * the untyped vocabulary, so the composed query optimizes and distributes
  * like any other plan.
  *
  * A concrete model supplies one property val per column and the two copy
  * hooks:
  * {{{
  * case class CustomerM(model: Model, sets: Seq[(String, Any)] = Nil)
  *     extends TypedModel[CustomerM] {
  *   protected def rebuild(m: Model) = copy(model = m)
  *   protected def rebuildSets(s: Seq[(String, Any)]) = copy(sets = s)
  *   val c_custkey = new PLong("c_custkey")
  *   val c_name    = new PString("c_name")
  * }
  * }}}
  */
abstract class TypedModel[Self <: TypedModel[Self]] { self: Self =>

  /** The untyped predicate/shape builder this typed view wraps. */
  def model: Model
  /** Pending `property.set(...)` values staged for insert()/update(). */
  def sets: Seq[(String, Any)]

  protected def rebuild(m: Model): Self
  protected def rebuildSets(s: Seq[(String, Any)]): Self

  // ---- structural pass-throughs (Model.java where/and/or/not/lp/rp) ----
  def where(): Self = this
  def and(): Self = rebuild(model.and())
  def or(): Self = rebuild(model.or())
  def not(): Self = rebuild(model.not())
  def lp(): Self = rebuild(model.lp())
  def rp(): Self = rebuild(model.rp())
  def orderBy(cols: Column*): Self = rebuild(model.orderByExpr(cols: _*))
  def limit(n: Int): Self = rebuild(model.limit(n))
  def offset(n: Int): Self = rebuild(model.offset(n))
  def select(cols: Column*): Self = rebuild(model.selectExpr(cols: _*))

  // ---- executors (Model.java findList :443, findOne, findCount :520;
  //      insert :736 / update :644 / delete :600 via the Engine binding) ----
  def toDF: DataFrame = model.toDF
  def findList(): Array[Row] = model.findList()
  def findCount(): Long = model.findCount()
  def findOne(): Option[Row] = model.findOne()
  def insert(): Long = model.insert(sets: _*)
  def update(): Long = model.update(sets: _*)
  def delete(): Long = model.delete()
  def explain(): String = model.explain()

  /** PBaseValueEqual.java: equality/membership every property type has.
    * Each predicate returns the next typed model state, so chains read
    * exactly like the reference's generated-model calls. */
  abstract class P[T](val name: String) {
    def eq(v: T): Self = rebuild(model.eq(name, v))
    def ne(v: T): Self = rebuild(model.ne(name, v))
    def in(vs: T*): Self = rebuild(model.in(name, vs.map(_.asInstanceOf[Any]): _*))
    def notIn(vs: T*): Self = rebuild(model.notIn(name, vs.map(_.asInstanceOf[Any]): _*))
    def isNull(): Self = rebuild(model.isNull(name))
    def isNotNull(): Self = rebuild(model.isNotNull(name))
    /** Stage a value for insert()/update() (ModelProperty set). */
    def set(v: T): Self = rebuildSets(sets :+ (name -> v))
    /** Typed column handle for select()/orderBy()/agg shaping. */
    def column: Column = col(name)
    def asc: Column = col(name).asc
    def desc: Column = col(name).desc
  }

  /** PBaseComparable.java: ordered comparisons. */
  abstract class PComparable[T](name0: String) extends P[T](name0) {
    def gt(v: T): Self = rebuild(model.gt(name, v))
    def ge(v: T): Self = rebuild(model.ge(name, v))
    def lt(v: T): Self = rebuild(model.lt(name, v))
    def le(v: T): Self = rebuild(model.le(name, v))
    def between(a: T, b: T): Self = rebuild(model.between(name, a, b))
  }

  // numeric/temporal properties (property/PLong.java, PInteger.java, …)
  final class PLong(name0: String) extends PComparable[Long](name0)
  final class PInteger(name0: String) extends PComparable[Int](name0)
  final class PShort(name0: String) extends PComparable[Short](name0)
  final class PByte(name0: String) extends PComparable[Byte](name0)
  final class PDouble(name0: String) extends PComparable[Double](name0)
  final class PFloat(name0: String) extends PComparable[Float](name0)
  final class PBigDecimal(name0: String)
    extends PComparable[java.math.BigDecimal](name0)
  final class PTimestamp(name0: String)
    extends PComparable[java.sql.Timestamp](name0)
  final class PDate(name0: String) extends PComparable[java.sql.Date](name0)

  /** property/PBoolean.java isTrue/isFalse. */
  final class PBoolean(name0: String) extends P[Boolean](name0) {
    def isTrue(): Self = rebuild(model.eq(name, true))
    def isFalse(): Self = rebuild(model.eq(name, false))
  }

  /** property/PString.java:59-211 string vocabulary. */
  final class PString(name0: String) extends PComparable[String](name0) {
    def ieq(v: String): Self = rebuild(model.ieq(name, v))
    def like(p: String): Self = rebuild(model.like(name, p))
    def ilike(p: String): Self = rebuild(model.ilike(name, p))
    def startsWith(p: String): Self = rebuild(model.startsWith(name, p))
    def istartsWith(p: String): Self = rebuild(model.istartsWith(name, p))
    def endsWith(p: String): Self = rebuild(model.endsWith(name, p))
    def iendsWith(p: String): Self = rebuild(model.iendsWith(name, p))
    def contains(p: String): Self = rebuild(model.contains(name, p))
    def icontains(p: String): Self = rebuild(model.icontains(name, p))
    /** regexp (PString.java:211 match). */
    def matches(regex: String): Self = rebuild(model.matches(name, regex))
  }

  /** property/PArray.java membership/emptiness. */
  final class PArray(name0: String) extends P[Any](name0) {
    def arrayContains(v: Any): Self = rebuild(model.arrayContains(name, v))
    def isEmpty(): Self = rebuild(model.arrayIsEmpty(name))
    def nonEmpty(): Self = rebuild(model.arrayIsNotEmpty(name))
  }
}
