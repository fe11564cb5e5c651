package graft.queries

/** Fixed minhash permutation keys: `md5(i).hex[:15]` as a 60-bit int
  * for i = 0..7. Hard-coded (not computed at runtime) so the DuckDB
  * oracle can inline the identical literals; xor with a fixed key is
  * an order-scrambling bijection, which is all a minhash permutation
  * needs.
  */
object MinhashSeeds {
  val keys: Seq[Long] = Seq(
    935853755618645598L, 886263699231969848L, 901255563090117366L,
    1066434503623691823L, 758855882668719729L, 1030659900335514164L,
    101208472399937786L, 644382284193898855L)
}
