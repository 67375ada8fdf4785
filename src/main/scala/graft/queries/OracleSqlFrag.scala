package graft.queries

/** Shared DuckDB SQL fragments that replicate the engine's native
  * kernels ([[graft.functions]]) bit-for-bit:
  *
  *  - polynomial rolling hash — exact integer arithmetic;
  *  - vector dot / norm — sequential left-to-right double reduction
  *    (`list_reduce` folds left; IEEE 754 +,*,/,sqrt are correctly
  *    rounded, so identical operand order ⇒ identical bits).
  *
  * These make the hash/float query family (MinHash, SimHash, ANN,
  * LSH) fully hash-verifiable cross-engine instead of rows-only.
  */
object OracleSqlFrag {

  val Mod = 2147483647L // 2^31 - 1

  /** Polynomial rolling hash of a string expression (ASCII corpus:
    * `ascii(char)` == byte). Twin of [[graft.functions.PolyHash]]. */
  def poly(expr: String, base: Long = 131L): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(" +
      s"regexp_split_to_array($expr, ''), phc -> ascii(phc)::BIGINT)), " +
      s"(pha, phb) -> (pha * $base + phb) % $Mod)"

  /** Sequential-double dot product of two float-list expressions.
    * Twin of [[graft.functions.VecDot]]. */
  def dot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(" +
      s"generate_series(1, least(len($a), len($b))), " +
      s"vdi -> CAST($a[vdi] AS DOUBLE) * CAST($b[vdi] AS DOUBLE))), " +
      s"(vdx, vdy) -> vdx + vdy)"

  /** L2 norm (sqrt of sequential sum of squares). Twin of
    * [[graft.functions.VecNorm]]. */
  def norm(a: String): String = s"sqrt(${dot(a, a)})"

  /** Sequential-double squared L2 distance of two float-list
    * expressions: left-to-right Σ (a_i − b_i)². Twin of the distance
    * loop in [[graft.functions.VecPqCodes]]. */
  def dist2(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(" +
      s"generate_series(1, least(len($a), len($b))), " +
      s"vqi -> (CAST($a[vqi] AS DOUBLE) - CAST($b[vqi] AS DOUBLE)) * " +
      s"(CAST($a[vqi] AS DOUBLE) - CAST($b[vqi] AS DOUBLE)))), " +
      s"(vqx, vqy) -> vqx + vqy)"
}
