package graft

/** Target for the CREATE ALIAS reflection spec — a top-level object whose
  * methods compile to public static forwarders, the same shape the
  * reference resolves (db/schema/FunctionAlias.java). */
object AliasFixture {
  def rep(s: String, n: Int): String = s * n
}
